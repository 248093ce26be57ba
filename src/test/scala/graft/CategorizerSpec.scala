package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.rules.{Categorizer, CategoryRule}

/** Rule-engine semantics ported as PROPERTIES from the reference
  * (rules/categories_bb.py:223-274): ordered first-match, recurrence =
  * hints OR matched-rule force on rule branches but forced False on the
  * parcelado / loja-física / payment fallbacks, installment detector,
  * 4-stage fallback cascade with NULL subcategory on Outros. */
class CategorizerSpec extends SparkSpec {

  private val rules = Seq(
    CategoryRule("A", "A1", Seq("FOO")),
    CategoryRule("B", "B1", Seq("FOO", "BAR")), // order: never wins on FOO
    CategoryRule("C", "C1", Seq("NETFLIX"), forceRecorrente = true),
    CategoryRule("D", None, Seq("NILSUB")))     // rule with NULL subcategory

  private def run(descs: Seq[String]): Seq[(String, String, Boolean, Boolean)] = {
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("d", StringType))),
      descs.map(Row(_)))
    df.select(Categorizer.categorize(col("d"), rules, Seq("\\bMENSAL\\b")).as("c"))
      .select("c.categoria", "c.subcategoria", "c.recorrente_suspeita", "c.parcelado_suspeito")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getBoolean(3)))
  }

  test("first match wins over later rules") {
    assert(run(Seq("foo bar"))  === Seq(("A", "A1", false, false)))
    assert(run(Seq("only bar")) === Seq(("B", "B1", false, false)))
  }

  test("normalization: case + whitespace collapse before match") {
    assert(run(Seq("  fOo\t thing "))(0)._1 === "A")
  }

  test("rule with no subcategory yields NULL subcategoria") {
    assert(run(Seq("NILSUB SHOP")) === Seq(("D", null, false, false)))
  }

  test("force_recorrente on matched rule; hints independent of rules") {
    assert(run(Seq("NETFLIX.COM"))      === Seq(("C", "C1", true, false)))
    assert(run(Seq("foo plano MENSAL")) === Seq(("A", "A1", true, false)))
    assert(run(Seq("zzz MENSAL")).head._3 === true) // hint fires on Outros
  }

  test("installment fallback: PARC dd/dd → Parcelado (loja física), recorrente forced off") {
    assert(run(Seq("LOJA ABC PARC 02/10")) ===
      Seq(("Compras", "Parcelado (loja física)", false, true)))
    // recorrente is forced False on this branch even when a hint matches
    // (categories_bb.py:242-248)
    assert(run(Seq("XYZ MENSAL PARC 02/10")) ===
      Seq(("Compras", "Parcelado (loja física)", false, true)))
    // multiple spaces before the installment digits still match (\s+)
    assert(run(Seq("XYZ PARC  03/12")).head._4 === true)
    // but a rule match takes precedence over the installment fallback
    assert(run(Seq("FOO PARC 02/10")) === Seq(("A", "A1", false, true)))
  }

  test("city-suffix + store-word fallback → Compras/Loja física") {
    assert(run(Seq("BOUTIQUE CHIQUE EUSEBIO")) ===
      Seq(("Compras", "Loja física", false, false)))
    // city must be at the END of the description
    assert(run(Seq("BOUTIQUE EUSEBIO CENTRO")).head._1 === "Outros")
    // store word alone is not enough
    assert(run(Seq("ALGUMA COISA FORTALEZA")).head._1 === "Outros")
    // recorrente forced off on this branch (categories_bb.py:251-258)
    assert(run(Seq("LOJA MENSAL SALVADOR")).head._3 === false)
  }

  test("payment fallback and final Outros fallback") {
    assert(run(Seq("PAGTO. POR DEB EM C/C")) ===
      Seq(("Financeiro", "Pagamentos/Créditos/Estornos", false, false)))
    assert(run(Seq("CANCELAMENTO DE COMPRA")) ===
      Seq(("Financeiro", "Pagamentos/Créditos/Estornos", false, false)))
    assert(run(Seq("CREDITO EM CONTA")).head._1 === "Financeiro")
    // recorrente forced off on the payment branch (categories_bb.py:261-267)
    assert(run(Seq("ESTORNO MENSAL")).head._3 === false)
    // Outros: NULL subcategory, recorrente from hints
    assert(run(Seq("mystery merchant")) === Seq(("Outros", null, false, false)))
  }

  test("null description behaves like the reference's None → empty string") {
    assert(run(Seq(null)) === Seq(("Outros", null, false, false)))
  }
}
