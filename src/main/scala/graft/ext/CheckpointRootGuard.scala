package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Guards the one piece of SparkContext-GLOBAL state the reliable-cut
  * operators share: the checkpoint directory. `setCheckpointDir` is
  * last-setter-wins, so two concurrent reliable-checkpoint operators
  * configured with DIFFERENT roots would silently redirect each other's
  * checkpoints to whichever set last — the preemption-durability the
  * caller asked for quietly lands under someone else's root (wrong
  * retention policy, wrong filesystem, wrong cleanup). This guard makes
  * that foot-gun LOUD: a root CHANGE throws while any prior-root
  * reliable-checkpoint work is still live. Two liveness sources, both
  * scoped to the engine's own operators (never unrelated jobs — a
  * streaming query churning next to a label propagation must not block
  * it):
  *
  *   - '''Leases''' — each iterative reliable-cut operator
  *     (connectedComponents, pageRank, labelPropagation, bfsHops)
  *     brackets its rounds with [[acquire]]/[[release]]: its NEXT
  *     round's checkpoint reads the global dir at materialization time,
  *     so the root must not move under a running loop.
  *   - '''Deferred cuts''' — a LAZY reliable cut
  *     (`df.checkpoint(eager = false)`, the shared-subtree strategy in
  *     minhashNearDupPairs) materializes at the caller's first action,
  *     AFTER the operator entry returns; [[registerDeferred]] tracks the
  *     checkpoint-marked RDD and the root it was promised, and the
  *     entry is live until the RDD is checkpointed or unreachable
  *     (weak-referenced — the guard never pins memory).
  *
  * Same-root concurrency is untouched (the soak's posture: one live
  * root, N operators). Sequential different-root use is untouched (the
  * sweep clears materialized/collected work). Only the silent-redirect
  * interleaving dies, with both roots named. */
private[ext] object CheckpointRootGuard {

  private final case class Deferred(root: String,
      ref: java.lang.ref.WeakReference[RDD[_]])
  private val leases = scala.collection.mutable.Map.empty[String, Int]
  private val deferred = scala.collection.mutable.ArrayBuffer.empty[Deferred]

  /** Drop deferred entries that materialized (isCheckpointed) or became
    * unreachable; the survivors are still owed a checkpoint under their
    * promised root. Caller holds the lock. */
  private def sweepPending(): Seq[String] = {
    deferred.filterInPlace { d =>
      val rdd = d.ref.get()
      rdd != null && !rdd.isCheckpointed
    }
    deferred.map(_.root).toSeq
  }

  /** Point the global checkpoint dir at `dir` (qualified: `root`) — or
    * THROW if that would move it out from under live prior-root work.
    * `setCheckpointDir` mints a fresh UUID subdirectory per call, so
    * "already pointing here" means the current dir's PARENT is the
    * requested root; only an actual change is guarded (first set and
    * same-root re-entry are free, whatever else is running). */
  def configure(sc: SparkContext, dir: String, root: String): Unit =
    synchronized {
      val currentParent = sc.getCheckpointDir.map(c =>
        new org.apache.hadoop.fs.Path(c).getParent.toString.stripSuffix("/"))
      if (currentParent.contains(root)) return
      val liveLeases = leases.collect { case (r, n) if n > 0 => s"$r ($n live)" }
      val pending = sweepPending().distinct
      if (liveLeases.nonEmpty || pending.nonEmpty)
        throw new IllegalStateException(
          s"checkpoint root change refused: $root requested while " +
            s"reliable-checkpoint work is live under " +
            s"${(liveLeases ++ pending.map(p => s"$p (deferred cut pending)"))
              .mkString("[", ", ", "]")} — the checkpoint dir is " +
            "SparkContext-global and last-setter-wins, so switching now " +
            "would silently redirect that work's checkpoints here. Use " +
            "one root per session, wait for (or materialize) the live " +
            "work, or run the operators sequentially.")
      currentParent.foreach(prev => System.err.println(
        s"[graft] checkpoint dir override: $prev -> $root " +
          "(SparkContext-global — any concurrent checkpointed operator " +
          "on this session now writes here)"))
      sc.setCheckpointDir(dir)
    }

  /** [[configure]] + take a lease for an operator's live rounds. Pair
    * with [[release]] in a finally. */
  def acquire(sc: SparkContext, dir: String, root: String): Unit =
    synchronized {
      configure(sc, dir, root)
      leases(root) = leases.getOrElse(root, 0) + 1
    }

  def release(root: String): Unit = synchronized {
    leases.get(root).foreach { n =>
      if (n <= 1) leases.remove(root) else leases(root) = n - 1
    }
  }

  /** Track a lazy reliable cut until it materializes under its promised
    * root. Extraction of the checkpoint-marked RDD from the cut Dataset
    * is best-effort ([[checkpointRdd]]); when it fails the guard
    * degrades to lease-only — fail-open, never a spurious refusal
    * (DedupSpec pins that extraction works on this Spark). */
  def registerDeferred(root: String, cut: DataFrame): Unit =
    checkpointRdd(cut).foreach { rdd =>
      synchronized {
        deferred += Deferred(root, new java.lang.ref.WeakReference(rdd))
      }
    }

  /** The checkpoint-marked RDD inside a `df.checkpoint(eager=false)`
    * result: the returned Dataset's logical plan is a LogicalRDD over
    * exactly that RDD; its case-class accessor is reached reflectively
    * (the class is private[sql]). */
  private[ext] def checkpointRdd(ds: DataFrame): Option[RDD[_]] =
    scala.util.Try {
      val plan = ds.queryExecution.logical
      plan.getClass.getMethod("rdd").invoke(plan).asInstanceOf[RDD[_]]
    }.toOption

  /** Test seam: live state snapshot (lease counts, pending roots). */
  private[ext] def liveState(): (Map[String, Int], Seq[String]) =
    synchronized { (leases.toMap, sweepPending().distinct) }
}
