package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Reflection-free construction of small literal DataFrames (budget tables,
  * config registries — SURVEY §2.1 S4). Avoids `toDF`/TypeTag encoders so
  * it works identically in forked mains, tests and REPL-wrapped callers.
  * These tables are driver-local by design and always broadcast-sized.
  */
object LocalTable {

  def of(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  /** Two-column (string, double) literal table — the budget-YAML shape
    * (compare_budget.py:12-25). */
  def stringDouble(spark: SparkSession, kCol: String, vCol: String,
      rows: Seq[(String, Double)]): DataFrame =
    of(spark,
      StructType(Seq(StructField(kCol, StringType), StructField(vCol, DoubleType))),
      rows.map { case (k, v) => Row(k, v) })
}
