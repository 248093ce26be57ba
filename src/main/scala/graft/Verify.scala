package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Per-row digest artifact: makes a driver-env red DIFFABLE. Each
    * line is `md5 \t canonical-row-json` (columns sorted by name, null
    * fields kept, rows sorted), computed from the parquet the driver
    * actually compares — re-read, not re-run, so lifecycle queries
    * (index appends, persisted rankings) are not executed twice. Two
    * environments running the same engine build produce byte-identical
    * digest files iff the engine outputs agree row-for-row, so a red
    * with matching digests is pinned on the ORACLE side (DuckDB
    * version skew) and one with differing digests names the rows. */
  private def writeDigest(spark: SparkSession, outDir: String,
      name: String): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val back = spark.read.parquet(s"$outDir/$name")
    val cols = back.columns.sorted
    // global sort on the Spark side, stream to the file one partition at
    // a time — the digest never materializes the whole dump on the driver
    val sortedJson = back
      .select(to_json(struct(cols.map(col): _*),
        java.util.Map.of("ignoreNullFields", "false")).as("j"))
      .orderBy(col("j"))
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = Files.newBufferedWriter(Paths.get(s"$outDir/$name.digest"))
    try sortedJson.toLocalIterator().forEachRemaining { row =>
      val r = row.getString(0)
      val h = md.digest(r.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.reset()
      val shown = if (r.length > 400) r.substring(0, 400) + "..." else r
      w.write(s"$h\t$shown\n")
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietBoundedWindowWarnings()
    new java.io.File(outDir).mkdirs()
    // Dev-loop subset filter (same contract as Bench); the driver never
    // sets it, so the gate always dumps the full catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // separate failure domain: a digest problem must not report the
        // (already successful) dump as a query failure
        try writeDigest(spark, outDir, name)
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name digest failed (dump OK): " +
            e.getMessage)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
