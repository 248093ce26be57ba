package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.rules.{Categorizer, CategoryRule}

/** Rule-engine semantics ported as PROPERTIES from the reference
  * (rules/categories_bb.py:223-274): ordered first-match, recurrence
  * computed independently (hints OR matched-rule force), installment
  * detector, fallback cascade. */
class CategorizerSpec extends SparkSpec {

  private val rules = Seq(
    CategoryRule("A", "A1", Seq("FOO")),
    CategoryRule("B", "B1", Seq("FOO", "BAR")), // order: never wins on FOO
    CategoryRule("C", "C1", Seq("NETFLIX"), forceRecorrente = true))

  private def run(descs: Seq[String]): Seq[(String, String, Boolean, Boolean)] = {
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("d", StringType))),
      descs.map(Row(_)))
    df.select(Categorizer.categorize(col("d"), rules, Seq("MENSAL")).as("c"))
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

  test("force_recorrente on matched rule; hints independent of rules") {
    assert(run(Seq("NETFLIX.COM"))      === Seq(("C", "C1", true, false)))
    assert(run(Seq("foo plano MENSAL")) === Seq(("A", "A1", true, false)))
    assert(run(Seq("zzz MENSAL")).head._3 === true) // hint fires even on fallback
  }

  test("installment fallback: PARC dd/dd → Compras/Parcelado + flag") {
    assert(run(Seq("LOJA ABC PARC 02/10")) === Seq(("Compras", "Parcelado", false, true)))
    // but a rule match takes precedence over the installment fallback
    assert(run(Seq("FOO PARC 02/10")) === Seq(("A", "A1", false, true)))
  }

  test("payment fallback and final Outros fallback") {
    assert(run(Seq("PAGTO. POR DEB EM C/C")) === Seq(("Financeiro", "Pagamentos", false, false)))
    assert(run(Seq("mystery merchant"))      === Seq(("Outros", "Geral", false, false)))
  }
}
