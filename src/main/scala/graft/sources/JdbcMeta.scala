package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 — JDBC metadata-driven projection (datatrack_spark_utils.py:
  * 771-829): read the source database's column catalog, drop columns whose
  * DB-native type is excluded (LOBs, spatial types — whatever the lake
  * can't land), and build the explicit quoted column list for the
  * extraction query. The decision logic is pure and unit-tested; the JDBC
  * round-trips compose Spark's own `read.jdbc` (no database ships in this
  * environment, so `scan` is exercised only through its query builders).
  */
object JdbcMeta {

  /** One catalog row: Postgres carries `udt_name` (the real storable
    * type behind e.g. ARRAY/USER-DEFINED), Oracle only `data_type`. */
  final case class ColumnMeta(name: String, dataType: String,
      udtName: Option[String] = None)

  /** Dialect catalog subquery, ordered by the source's column position
    * (Oracle `all_tab_columns`, Postgres `information_schema.columns` —
    * the reference's two dialects). */
  def metadataQuery(origin: String, schema: String, table: String): String =
    origin.toLowerCase match {
      case "oracle" =>
        s"""(SELECT column_name, data_type
           | FROM all_tab_columns
           | WHERE owner = '$schema' AND table_name = '$table'
           | ORDER BY column_id) T""".stripMargin
      case "postgres" =>
        s"""(SELECT column_name, data_type, udt_name
           | FROM information_schema.columns
           | WHERE table_schema = '$schema' AND table_name = '$table'
           | ORDER BY ordinal_position) T""".stripMargin
      case other =>
        throw new IllegalArgumentException(s"unsupported origin type: $other")
    }

  /** The effective type name the exclusion list is matched against:
    * Postgres prefers `udt_name` when present, Oracle uses `data_type` —
    * the reference's exact dispatch. */
  def effectiveType(origin: String, c: ColumnMeta): String =
    origin.toLowerCase match {
      case "postgres" => c.udtName.filter(_.nonEmpty).getOrElse(c.dataType)
      case _ => c.dataType
    }

  /** Surviving columns in catalog order; fails loudly when the exclusion
    * list eats the whole table (the reference raises too — a silent
    * `SELECT` of nothing would land an empty frame). */
  def survivingColumns(origin: String, columns: Seq[ColumnMeta],
      excludeTypes: Set[String]): Seq[String] = {
    val kept = columns
      .filter(_.name.nonEmpty)
      .filterNot(c => excludeTypes.contains(effectiveType(origin, c)))
      .map(_.name)
    if (kept.isEmpty)
      throw new IllegalStateException("no columns survive the type exclusion")
    kept
  }

  /** Double-quoted projection list — quoting keeps case-sensitive /
    * reserved-word column names valid in both dialects. */
  def projectionList(origin: String, columns: Seq[ColumnMeta],
      excludeTypes: Set[String]): String =
    survivingColumns(origin, columns, excludeTypes)
      .map(c => "\"" + c + "\"").mkString(", ")

  /** Extraction subquery projecting only the surviving columns — the
    * pruning happens in the source database, so excluded LOB columns are
    * never transferred. */
  def extractionQuery(origin: String, schema: String, table: String,
      columns: Seq[ColumnMeta], excludeTypes: Set[String]): String =
    s"(SELECT ${projectionList(origin, columns, excludeTypes)} FROM $schema.$table) T"

  /** The composed scan: metadata read → projection build → pruned read.
    * Both reads go through Spark's JDBC source (partitionable via
    * `options`: partitionColumn/num/bounds for parallel extraction). */
  def scan(spark: SparkSession, url: String, props: java.util.Properties,
      origin: String, schema: String, table: String,
      excludeTypes: Set[String]): DataFrame = {
    val meta = spark.read.jdbc(url, metadataQuery(origin, schema, table), props)
      .collect()
      .map { r =>
        val get = (n: String) => {
          val i = r.fieldIndex(n)
          if (r.isNullAt(i)) "" else r.get(i).toString
        }
        ColumnMeta(get("column_name"), get("data_type"),
          if (origin.equalsIgnoreCase("postgres")) Some(get("udt_name")) else None)
      }.toIndexedSeq
    spark.read.jdbc(url,
      extractionQuery(origin, schema, table, meta, excludeTypes), props)
  }
}
