package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the final (adaptive) executed plan of one catalog
  * query — `runMain graft.tools.Explain <query> [sfDir]`.
  *
  * With `SPARK_GRAFT_PLAN_OUT=<file>` also writes the query's
  * `.explain("formatted")` output (the pre-execution formatted plan:
  * operator list with PushedFilters/ReadSchema, join strategies,
  * Exchange placement) to that file — the round's plans/rNN artifacts. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.quietBoundedWindowWarnings()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t1 = System.nanoTime()
    sys.env.get("SPARK_GRAFT_PLAN_OUT").foreach { out =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    df.write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    println(s"== construction ${(t1 - t0) / 1e9}%s  execution ${(t2 - t1) / 1e9} ==")
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    spark.stop()
  }
}
