package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one JVM-wide session, UTC, tiny
  * shuffle parallelism (local unit tests, not scale runs). */
object TestSpark {
  lazy val spark: SparkSession = {
    // SPARK_GRAFT_TEST_CPUS widens parallelism for concurrency-shaking
    // runs (races hide at local[4]); default stays small for speed
    val cpus = sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
