package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{ControlTable, EntityTransformer, TrustedLoad}
import graft.sources.TableConfig

/** The trusted-layer lifecycle (SURVEY §3.3): EntityTransformer hooks +
  * control-table incremental + dedup + version-guarded MERGE, and the
  * JSON table-config registry that drives it. */
class TrustedLoadSpec extends SparkSpec {

  private val txnSchema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType),
    StructField("valor", DoubleType), StructField("dt_ingestao", TimestampType)))
  private val dimSchema = StructType(Seq(
    StructField("cat", StringType), StructField("grupo", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def txns(rows: (Long, String, Double, String)*): DataFrame =
    LocalTable.of(spark, txnSchema,
      rows.map { case (i, c, v, t) => Row(i, c, v, ts(t)) })

  private val dim = () => LocalTable.of(spark, dimSchema,
    Seq(Row("mercado", "essencial"), Row("lazer", "supérfluo")))

  /** Concrete transformer: enrich transactions with the category dim and
    * an absolute value — two inputs, one output, a post hook. */
  private class Enricher extends EntityTransformer {
    override val entityName = "trusted.lancamentos_enriched"
    override val inputs = Seq("raw.lancamentos", "ref.categorias")
    override val primaryKey = Seq("id")
    override def transform(dfs: Map[String, DataFrame]): DataFrame =
      dfs("raw.lancamentos").join(broadcast(dfs("ref.categorias")), Seq("cat"), "left")
    override def postTransform(df: DataFrame): DataFrame =
      df.withColumn("valor_abs", abs(col("valor")))
  }

  test("full lifecycle: incremental load → transform → merge → watermark; skip on no-news") {
    val target = Files.createTempDirectory("graft-trusted-").toString + "/t"
    val enricher = new Enricher
    val inc = Map("raw.lancamentos" -> "dt_ingestao")

    // run 1: two rows land
    var source = txns((1L, "mercado", -50.0, "2025-01-01 10:00:00"),
      (2L, "lazer", -30.0, "2025-01-01 11:00:00"))
    def resolve(name: String): DataFrame =
      if (name == "raw.lancamentos") source else dim()
    val r1 = TrustedLoad.run(enricher, resolve, ControlTable.empty(spark), inc,
      "dt_ingestao", target, ts("2025-01-02 00:00:00"))
    assert(!r1.skipped && r1.rows === 2)
    val t1 = spark.read.parquet(target)
    assert(t1.count() === 2)
    assert(t1.filter(col("id") === 1).select("grupo", "valor_abs").collect()(0)
      .toSeq === Seq("essencial", 50.0))
    assert(ControlTable.currentWatermark(r1.control, enricher.entityName,
      "raw.lancamentos") === Some(ts("2025-01-01 11:00:00")))

    // run 2: nothing newer than the watermark → P13 skip, control unchanged
    val r2 = TrustedLoad.run(enricher, resolve, r1.control, inc,
      "dt_ingestao", target, ts("2025-01-03 00:00:00"))
    assert(r2.skipped && r2.rows === 0)
    assert(spark.read.parquet(target).count() === 2)

    // run 3: a correction to id=2 (newer version) + a new row
    source = txns((2L, "lazer", -35.0, "2025-01-04 09:00:00"),
      (3L, "mercado", -20.0, "2025-01-04 10:00:00"),
      (1L, "mercado", -50.0, "2024-12-31 00:00:00")) // older than watermark: filtered
    val r3 = TrustedLoad.run(enricher, resolve, r2.control, inc,
      "dt_ingestao", target, ts("2025-01-05 00:00:00"))
    assert(!r3.skipped && r3.rows === 2)
    val t3 = spark.read.parquet(target)
    assert(t3.count() === 3)
    assert(t3.filter(col("id") === 2).select("valor").collect()(0).getDouble(0) === -35.0)
    assert(ControlTable.currentWatermark(r3.control, enricher.entityName,
      "raw.lancamentos") === Some(ts("2025-01-04 10:00:00")))
  }

  test("in-batch duplicates dedup by version before the merge") {
    val target = Files.createTempDirectory("graft-trusted-dd-").toString + "/t"
    val enricher = new Enricher
    val source = txns(
      (7L, "mercado", -10.0, "2025-02-01 08:00:00"),
      (7L, "mercado", -12.0, "2025-02-01 09:00:00")) // same PK, newer version
    val r = TrustedLoad.run(enricher,
      n => if (n == "raw.lancamentos") source else dim(),
      ControlTable.empty(spark), Map("raw.lancamentos" -> "dt_ingestao"),
      "dt_ingestao", target, ts("2025-02-02 00:00:00"))
    assert(r.rows === 1)
    assert(spark.read.parquet(target).select("valor").collect()(0).getDouble(0) === -12.0)
  }

  test("carregar_source: JSON registry flattens with folded origin metadata") {
    val dir = Files.createTempDirectory("graft-cfg-")
    Files.writeString(dir.resolve("fintrack.json"),
      """{"informacoes": {"banco": "bb", "sistema": "FinTrack", "schemas": {
        |  "Raw": {
        |    "Lancamentos": {"primary_key": ["id"], "coluna_particao": "dt",
        |                    "tipo_particionamento": "DIA",
        |                    "coluna_incremental": "dt_ingestao"},
        |    "Resumos": {"primary_key": ["doc_id"]}
        |  }}}}""".stripMargin)
    Files.writeString(dir.resolve("other.json"),
      """{"informacoes": {"banco": "bradesco", "sistema": "Cards", "schemas": {
        |  "raw": {"faturas": {"primary_key": ["cartao_final", "data"]}}}}}""".stripMargin)
    val reg = TableConfig.load(dir.toString)
    assert(reg.size === 3)
    val l = reg("fintrack_raw.lancamentos")
    assert(l.banco === "bb" && l.sistema === "FinTrack" && l.schema === "Raw" &&
      l.nome === "Lancamentos")
    assert(l.primaryKey === Seq("id") && l.colunaParticao === Some("dt") &&
      l.tipoParticionamento === Some("DIA") &&
      l.colunaIncremental === Some("dt_ingestao"))
    val r = reg("fintrack_raw.resumos")
    assert(r.primaryKey === Seq("doc_id") && r.colunaParticao === None)
    assert(reg("cards_raw.faturas").banco === "bradesco")
    // invalid path fails loudly, like the reference's ValueError
    intercept[IllegalArgumentException](TableConfig.load(dir.toString + "/nope"))
  }
}
