package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names must match exactly between the two (the driver
  * sorts columns by name and hashes values).
  *
  * Determinism contract: every query's RESULT SET is deterministic — top-K
  * queries carry a unique-key tiebreak, floating-point aggregates are
  * rounded on both sides so the two engines' summation orders cannot
  * diverge past the rounding precision.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
