package graft

import java.nio.file.{Files, Paths}

/** applicationId-scoped temp artifact directories for gates that persist
  * intermediate parquet (the persisted-rankings fusion, the IVF
  * lifecycle's list layout): stable within a run (no per-call temp-dir
  * churn), disjoint across concurrent sessions and across users sharing
  * one tmpdir, and RECLAIMED at JVM exit — every gate/bench/verify
  * invocation is a fresh applicationId, so without the shutdown hook a
  * long-lived host accumulates one artifact set per run forever. */
object SessionArtifacts {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** The artifact dir for (`prefix`, this application); registered for
    * recursive deletion at JVM exit. */
  def dir(s: org.apache.spark.sql.SparkSession, prefix: String): String = {
    val p = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"$prefix-${s.sparkContext.applicationId}").getPath
    registered.add(p)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        registered.forEach { d =>
          scala.util.Try {
            val root = Paths.get(d)
            if (Files.exists(root))
              Files.walk(root)
                .sorted(java.util.Comparator.reverseOrder())
                .forEach(f => Files.deleteIfExists(f))
          }
        }))
    p
  }
}
