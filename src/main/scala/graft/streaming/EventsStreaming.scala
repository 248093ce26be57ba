package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Structured Streaming re-expression of the reference's batch-level
  * incrementality (SURVEY §2.10): the control-table high watermark (I1)
  * becomes an event-time watermark + checkpoint; the per-file idempotent
  * reload (I2) becomes exactly-once sink semantics; `Trigger.AvailableNow`
  * replaces the modifiedTime skip (I3).
  *
  * These transforms are source-agnostic: the same DataFrame program runs
  * over `readStream` (file source / Kafka) or a batch `read` — which is how
  * the batch twins (Temporal.q14 tumbling windows) stay oracle-checkable
  * while this module adds watermarking + state.
  */
object EventsStreaming {

  /** Input shape for typed stateful ops (event-time in epoch micros). */
  final case class Event(user_id: Long, ts_us: Long, event_type: String, value: Double)

  /** One closed or in-flight user session. */
  final case class Session(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double, closed: Boolean)

  /** Tumbling 10-minute windowed aggregate with a 10-minute watermark —
    * the streaming twin of Temporal.q14TumblingWindow. Append mode: a
    * window emits once its end passes the watermark (late data beyond 10
    * minutes is dropped, bounded state). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked streaming dedup — the streaming twin of exact dedup
    * (d04) and the I2 idempotent-reload contract: duplicate keys arriving
    * within the watermark horizon are dropped with BOUNDED state (keys
    * older than the watermark are evicted; `dropDuplicates` without a
    * watermark would grow state forever on an unbounded stream). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming upsert into the lake: every micro-batch MERGEs into the
    * parquet table through the version-guarded [[graft.lake.TableFormat]]
    * verb (foreachBatch is exactly the reference's per-file
    * delete-before-append idempotency (I2) generalized — a replayed batch
    * re-merges the same keys and the newer-wins guard makes it a no-op).
    * Returns the query; callers own trigger/checkpoint via the writer. */
  def mergeToLake(events: DataFrame, path: String, keys: Seq[String],
      versionCol: String, checkpointDir: String,
      fmt: graft.lake.TableFormat = graft.lake.ParquetTableFormat)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          fmt.merge(batch.sparkSession, path,
            graft.lake.Lake.dedupByKeys(batch, keys, Some(versionCol)),
            keys, versionCol, Nil)
      }

  /** Session gap in micros (30 minutes). */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Sessionization via flatMapGroupsWithState (Update mode): events for a
    * user extend the current session while gaps stay under 30 minutes; a
    * larger gap closes the session and opens a new one. State per user is
    * O(1) — exactly the bounded-state design a 100 TB/day stream needs. */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    val fn: (Long, Iterator[Event], GroupState[Session]) => Iterator[Session] =
      (userId, it, state) => {
        val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_type))
        var cur = state.getOption.orNull
        val out = Seq.newBuilder[Session]
        sorted.foreach { e =>
          if (cur == null) {
            cur = Session(userId, e.ts_us, e.ts_us, 1L, e.value, closed = false)
          } else if (e.ts_us - cur.session_end_us > SessionGapUs) {
            out += cur.copy(closed = true)
            cur = Session(userId, e.ts_us, e.ts_us, 1L, e.value, closed = false)
          } else {
            cur = cur.copy(session_end_us = math.max(cur.session_end_us, e.ts_us),
              n_events = cur.n_events + 1, sum_value = cur.sum_value + e.value)
          }
        }
        if (cur != null) { state.update(cur); out += cur }
        out.result().iterator
      }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[Session], Encoders.product[Session])
  }

  /** A user's funnel progress: completion timestamps of the stages
    * reached so far (prefix of the step list), in order. */
  final case class FunnelProgress(
      user_id: Long, stages_completed: Int, stage_ts: Seq[Long])

  /** Streaming twin of [[graft.operators.Temporal.funnel]] (q50):
    * per-user ordered-stage matching as O(steps) state — each arriving
    * event can only advance the NEXT incomplete stage, and only when
    * strictly after the previous stage's completion. Under per-user
    * event-time-ordered delivery this reproduces the batch operator's
    * greedy-earliest matching exactly (the StreamingSpec equivalence);
    * out-of-order arrivals within a micro-batch are repaired by the
    * per-batch sort, cross-batch stragglers are a watermark decision the
    * caller owns (drop = this operator; repair = re-run the batch twin).
    * State per user is `steps.length` longs — bounded regardless of
    * stream length, the property that lets this run on an unbounded
    * clickstream. */
  def funnelStream(events: Dataset[Event], steps: Seq[String])
      : Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct == steps)
    val fn: (Long, Iterator[Event], GroupState[FunnelProgress]) =>
        Iterator[FunnelProgress] =
      (userId, it, state) => {
        val done = advanceFunnel(
          state.getOption.map(_.stage_ts.toVector).getOrElse(Vector.empty),
          steps, it)
        val p = FunnelProgress(userId, done.length, done)
        state.update(p)
        Iterator.single(p)
      }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[FunnelProgress], Encoders.product[FunnelProgress])
  }

  /** The funnel's state transition, shared verbatim by both stateful
    * APIs (the two twins cannot drift). */
  private def advanceFunnel(done0: Vector[Long], steps: Seq[String],
      rows: Iterator[Event]): Vector[Long] = {
    var done = done0
    rows.toSeq.filter(e => steps.contains(e.event_type))
      .sortBy(e => (e.ts_us, e.event_type))
      .foreach { e =>
        val next = done.length
        if (next < steps.length && e.event_type == steps(next) &&
            (done.isEmpty || e.ts_us > done.last))
          done = done :+ e.ts_us
      }
    done
  }

  /** [[funnelStream]] on Spark 4's `transformWithState` — the same
    * O(steps) per-user state held in a named ValueState (RocksDB-backed,
    * TTL-capable), kept alongside the flatMapGroupsWithState form so
    * both stateful surfaces stay exercised (same pairing as
    * sessionize / sessionizeTws). */
  final class FunnelProcessor(steps: Seq[String])
      extends StatefulProcessor[Long, Event, FunnelProgress] {
    @transient private var prog: ValueState[FunnelProgress] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prog = getHandle.getValueState[FunnelProgress](
        "funnel", Encoders.product[FunnelProgress], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[FunnelProgress] = {
      val done0 = if (prog.exists()) prog.get().stage_ts.toVector
        else Vector.empty[Long]
      val done = advanceFunnel(done0, steps, rows)
      val p = FunnelProgress(userId, done.length, done)
      prog.update(p)
      Iterator.single(p)
    }
  }

  /** Streaming funnel via transformWithState (Update mode). */
  def funnelStreamTws(events: Dataset[Event], steps: Seq[String])
      : Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct == steps)
    implicit val enc: org.apache.spark.sql.Encoder[FunnelProgress] =
      Encoders.product[FunnelProgress]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new FunnelProcessor(steps), TimeMode.None(),
        OutputMode.Update())
  }

  /** The same sessionization on Spark 4's `transformWithState` — the
    * successor API to flatMapGroupsWithState: named state variables
    * created against a handle (RocksDB-backed, TTL-capable, live
    * schema-evolvable) instead of one opaque GroupState blob. Kept
    * alongside [[sessionize]] so both stateful surfaces stay exercised. */
  final class SessionProcessor extends StatefulProcessor[Long, Event, Session] {
    @transient private var session: ValueState[Session] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[Session](
        "session", Encoders.product[Session], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_type))
      var cur = if (session.exists()) session.get() else null
      val out = Seq.newBuilder[Session]
      sorted.foreach { e =>
        if (cur == null) {
          cur = Session(userId, e.ts_us, e.ts_us, 1L, e.value, closed = false)
        } else if (e.ts_us - cur.session_end_us > SessionGapUs) {
          out += cur.copy(closed = true)
          cur = Session(userId, e.ts_us, e.ts_us, 1L, e.value, closed = false)
        } else {
          cur = cur.copy(session_end_us = math.max(cur.session_end_us, e.ts_us),
            n_events = cur.n_events + 1, sum_value = cur.sum_value + e.value)
        }
      }
      if (cur != null) { session.update(cur); out += cur }
      out.result().iterator
    }
  }

  /** Sessionization via transformWithState (Update mode, processing-time
    * semantics — no timers used, state transitions are input-driven like
    * [[sessionize]]). */
  def sessionizeTws(events: Dataset[Event]): Dataset[Session] = {
    implicit val sessionEnc: org.apache.spark.sql.Encoder[Session] =
      Encoders.product[Session]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** One observed user-journey edge. */
  final case class Transition(user_id: Long, prev_type: String, next_type: String)

  /** Streaming twin of [[graft.operators.Temporal.eventTransitions]]
    * (q53): each arriving event pairs with the user's PREVIOUS event to
    * emit one journey edge; the only state is that last event — O(1) per
    * user, bounded on an unbounded clickstream. Counting the emitted
    * edges (a plain downstream aggregation, associative) maintains the
    * transition matrix incrementally; under per-user in-order delivery
    * the edge multiset equals the batch operator's lag-window pairs
    * exactly (StreamingSpec). Out-of-order arrivals within a micro-batch
    * are repaired by the per-batch sort; cross-batch stragglers are the
    * caller's watermark decision, same contract as [[funnelStream]]. */
  def transitionsStream(events: Dataset[Event]): Dataset[Transition] = {
    val fn: (Long, Iterator[Event], GroupState[Event]) => Iterator[Transition] =
      (userId, it, state) => {
        var last = state.getOption.orNull
        val out = Seq.newBuilder[Transition]
        it.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
          if (last != null) out += Transition(userId, last.event_type, e.event_type)
          last = e
        }
        if (last != null) state.update(last)
        out.result().iterator
      }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[Event], Encoders.product[Transition])
  }

  /** One keyed upsert/tombstone arriving on the CDC input stream. `seq`
    * orders rows within a micro-batch (arrival order is not guaranteed
    * after the shuffle); `tombstone = true` deletes the key. */
  final case class Upsert(k: Long, seq: Long, payload: String, tombstone: Boolean)

  /** One emitted change. `old_payload`/`new_payload` are null for
    * added/removed respectively — same contract as
    * [[graft.lake.Lake.snapshotDiff]]'s change rows. */
  final case class Change(k: Long, change: String,
      old_payload: String, new_payload: String)

  /** Streaming twin of [[graft.lake.Lake.snapshotDiff]] (q60): where the
    * batch operator diffs two materialized snapshots, this maintains the
    * "previous snapshot" as per-key state and emits each change the
    * moment its upsert arrives — added / changed / removed (tombstone),
    * with no-op upserts suppressed exactly like the batch diff's
    * unchanged rows. State is one payload per live key (removed keys
    * clear their state), so the memory bound is the LIVE key set — the
    * streaming analogue of the batch operator's O(churn) output. After
    * any prefix of batches, replaying the emitted changes reconstructs
    * the table; StreamingSpec proves each batch's emissions equal
    * `snapshotDiff(state before, state after)`. */
  def changeCaptureStream(rows: Dataset[Upsert]): Dataset[Change] = {
    val fn: (Long, Iterator[Upsert], GroupState[String]) => Iterator[Change] =
      (k, it, state) => {
        var cur = state.getOption.orNull
        val out = Seq.newBuilder[Change]
        it.toSeq.sortBy(_.seq).foreach { r =>
          if (r.tombstone) {
            if (cur != null) { out += Change(k, "removed", cur, null); cur = null }
          } else if (cur == null) {
            out += Change(k, "added", null, r.payload); cur = r.payload
          } else if (cur != r.payload) {
            out += Change(k, "changed", cur, r.payload); cur = r.payload
          } // identical payload: no-op, nothing emitted
        }
        if (cur == null) state.remove() else state.update(cur)
        out.result().iterator
      }
    rows.groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.STRING, Encoders.product[Change])
  }

  /** One aggregated series point arriving on the stream (e.g. a daily
    * count emitted by an upstream windowed aggregation). */
  final case class SeriesPoint(k: String, day: Long, cnt: Long)

  /** One scored point — identical contract to the batch operator. */
  final case class Anomaly(k: String, day: Long, cnt: Long,
      z: Double, is_anomaly: Boolean)

  /** Ring buffer of the trailing counts, newest last. */
  final case class TailState(vals: Seq[Long])

  /** Streaming twin of [[graft.operators.Temporal.anomalyZScores]]
    * (q61): each arriving point z-scores against the key's trailing
    * `lookback` points held as O(lookback) state, then joins the buffer
    * — the point never contaminates its own baseline, exactly like the
    * batch frame's `1 PRECEDING` bound. The arithmetic is the batch
    * operator's to the bit: integer sums first, then single IEEE
    * divisions/sqrt — so under per-key in-order delivery the emitted
    * rows equal the batch output exactly (StreamingSpec proves it
    * across micro-batch boundaries). Points below `minObs` history or
    * with a zero-variance baseline are absorbed into state but emit
    * nothing, same as the batch skips. */
  def anomalyStream(points: Dataset[SeriesPoint], lookback: Int = 7,
      minObs: Int = 3, threshold: Double = 2.0): Dataset[Anomaly] = {
    require(lookback >= minObs && minObs >= 2,
      "need lookback >= minObs >= 2 for a sample variance")
    val fn: (String, Iterator[SeriesPoint], GroupState[TailState]) => Iterator[Anomaly] =
      (k, it, state) => {
        var tail = state.getOption.map(_.vals.toVector).getOrElse(Vector.empty)
        val out = Seq.newBuilder[Anomaly]
        it.toSeq.sortBy(_.day).foreach { p =>
          val n = tail.length
          if (n >= minObs) {
            val s = tail.sum
            val ss = tail.map(v => v * v).sum
            val v = (ss.toDouble - s.toDouble * s.toDouble / n) / (n - 1)
            if (v > 0) {
              val z = (p.cnt.toDouble - s.toDouble / n) / math.sqrt(v)
              out += Anomaly(k, p.day, p.cnt, z, math.abs(z) > threshold)
            }
          }
          tail = (tail :+ p.cnt).takeRight(lookback)
        }
        state.update(TailState(tail))
        out.result().iterator
      }
    points.groupByKey(_.k)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[TailState], Encoders.product[Anomaly])
  }

  /** Stream-STREAM event-time interval join — the attribution primitive
    * (purchase within N minutes of a click, per user) and the one
    * Structured Streaming join mode the twins above don't cover. Both
    * sides carry watermarks and the join condition bounds purchase time
    * to [click, click + within]; together those two facts are what let
    * Spark EVICT join state (a click older than watermark + within can
    * never match again, a purchase older than watermark can never find a
    * new click) — without the time bound a stream-stream join buffers
    * both streams forever. `joinType` "left_outer" additionally emits
    * unmatched clicks (with NULL purchase columns) once the watermark
    * proves no purchase can still arrive — outer emission timing is
    * exactly the state-eviction boundary.
    *
    * The SAME DataFrame program runs over batch inputs (withWatermark is
    * a no-op there), which is how StreamingSpec proves stream ≡ batch on
    * identical data — the module's standing twin contract. */
  def attributionJoinStream(clicks: Dataset[Event], purchases: Dataset[Event],
      withinMinutes: Int, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(withinMinutes >= 1, "withinMinutes must be positive")
    val l = clicks
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("click_ts"))
      .withWatermark("click_ts", watermark)
    val r = purchases
      .select(col("user_id").as("__ru"),
        timestamp_micros(col("ts_us")).as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    l.join(r,
        col("user_id") === col("__ru") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") +
            expr(s"INTERVAL '$withinMinutes' MINUTE"),
        joinType)
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("purchase_value"))
  }

  /** One token observation in group `g` (the d36 shape, streamed). */
  final case class TokenObs(g: String, token: String)

  /** Misra-Gries counters + total observation count carried between
    * micro-batches. */
  final case class HHState(items: Map[String, Long], n_seen: Long)

  /** One current-top-k entry; `n_seen` is the group's total observation
    * count, monotone per group — consumers keep each group's max-n_seen
    * emission as "latest". */
  final case class HHEntry(g: String, token: String, est: Long, rank: Int,
      n_seen: Long)

  /** Streaming twin of the d36 heavy-hitters sketch: the per-group
    * Misra-Gries counter map rides GroupState (bounded at `capacity`
    * counters — state never grows with the stream, the property that
    * makes a standing top-tokens view over an unbounded ingest
    * feasible), each arriving token runs the SAME single-observation
    * update the batch aggregate runs
    * ([[graft.plans.MisraGriesAgg.observe]] — one code path, two
    * runtimes), and each micro-batch re-emits the group's current top-k
    * with its observation count. Exact-regime equality with the batch
    * aggregate and the capacity-starved N/(k+1) bound both survive
    * micro-batching because MG error depends only on the observation
    * MULTISET, not its batching (StreamingSpec proves both). */
  /** One observed double in group `g` with a per-group sequence for
    * deterministic in-batch ordering. */
  final case class ValueObs(g: String, seq: Long, v: Double)

  /** Serialized quantile-sketch ladder carried between micro-batches. */
  final case class QskState(bytes: Array[Byte])

  /** One emitted quantile row; `n_seen` is the sketch's exact total
    * weight (monotone per group — max-n_seen is latest). */
  final case class QskQuantiles(g: String, n_seen: Long, p25: Double,
      p50: Double, p75: Double)

  /** Streaming twin of the d64 quantile sketch: the level ladder rides
    * GroupState serialized (bounded at capacity·levels doubles — the
    * same never-grows-with-the-stream property as
    * [[heavyHittersStream]]), each arriving value runs the SAME
    * deterministic MRL update the batch aggregate runs
    * ([[graft.plans.QuantileSketchOps]] — one code path, two runtimes),
    * and each micro-batch re-emits the group's current p25/p50/p75.
    * Below capacity the sketch IS the sorted history, so streamed
    * quantiles equal the batch aggregate's exactly regardless of
    * batching; above it the MRL rank bound holds because compaction
    * error depends on the observation multiset and fold order, both
    * preserved by per-group in-order delivery (StreamingSpec proves the
    * exact regime across batch boundaries). */
  def quantileSketchStream(values: Dataset[ValueObs],
      capacity: Int): Dataset[QskQuantiles] = {
    require(capacity >= 4, "capacity must be >= 4")
    import graft.plans.QuantileSketchOps
    val fn: (String, Iterator[ValueObs], GroupState[QskState]) => Iterator[QskQuantiles] =
      (g, it, state) => {
        val buf = state.getOption
          .map(s => QuantileSketchOps.deserializeBuf(s.bytes))
          .getOrElse(QuantileSketchOps.newBuf())
        it.toSeq.sortBy(_.seq).foreach(o =>
          QuantileSketchOps.add(buf, o.v, 0, capacity))
        state.update(QskState(QuantileSketchOps.serializeBuf(buf)))
        // artifact-side estimation, driver-free: same rank rule as the
        // Column estimator (smallest value with cum weight >= ceil(q n))
        val art = {
          val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
          var i = 0
          while (i < buf.levels.size) {
            val w = 1L << i
            buf.levels(i).foreach(v => out += ((v, w)))
            i += 1
          }
          out.sortBy(identity).toArray
        }
        val total = art.map(_._2).sum
        if (total == 0L) Iterator.empty
        else {
          def q(p: Double): Double = {
            val target = math.max(1L, math.ceil(p * total).toLong)
            var cum = 0L
            var ans = art.last._1
            var found = false
            var i = 0
            while (i < art.length && !found) {
              cum += art(i)._2
              if (cum >= target) { ans = art(i)._1; found = true }
              i += 1
            }
            ans
          }
          Iterator.single(QskQuantiles(g, total, q(0.25), q(0.50), q(0.75)))
        }
      }
    values.groupByKey(_.g)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[QskState], Encoders.product[QskQuantiles])
  }

  /** Streaming twin of q78's trailing EWMA: the last `window−1` values
    * per key ride GroupState (bounded — the batch scaladoc's
    * "streaming-ready formulation" made literal), each arriving event
    * recomputes the SAME newest-first weighted fold over its frame, so
    * under per-key in-order delivery every emitted row equals the batch
    * operator's bit-for-bit (same values, same fold order, same libm
    * pow calls — StreamingSpec proves it across micro-batch
    * boundaries). In-batch ordering uses the SAME (ts_us, event_id)
    * sort key as the batch window — a value-based tiebreak would fold
    * same-timestamp events in a different order and break the
    * bit-for-bit claim — and event_id is emitted so output rows stay
    * unambiguous under timestamp ties. */
  /** One observed value for the EWMA stream — the batch operator's
    * (event_id, user_id, ts_us, value) input row. */
  final case class EwmaObs(event_id: Long, user_id: Long, ts_us: Long,
      value: Double)

  /** Trailing value frame per user (newest last), window-bounded. */
  final case class Frame(vals: Seq[Double])

  def ewmaStream(events: Dataset[EwmaObs], alpha: Double,
      window: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(window >= 1, "window must be positive")
    val fn: (Long, Iterator[EwmaObs], GroupState[Frame]) => Iterator[(Long, Long, Long, Double)] =
      (user, it, state) => {
        var frame = state.getOption.map(_.vals.toVector).getOrElse(Vector.empty)
        val out = Seq.newBuilder[(Long, Long, Long, Double)]
        it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          frame = (frame :+ e.value).takeRight(window)
          var ew = 0.0
          var i = 0
          val n = frame.length
          while (i < n) {
            // newest-first: element i steps back (n-1-i)... iterate reversed
            ew += frame(n - 1 - i) * alpha * math.pow(1 - alpha, i)
            i += 1
          }
          out += ((e.event_id, user, e.ts_us, math.floor(ew * 1e6 + 0.5) / 1e6))
        }
        state.update(Frame(frame))
        out.result().iterator
      }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[Frame],
        Encoders.product[(Long, Long, Long, Double)])
      .toDF("event_id", "user_id", "ts_us", "ewma")
  }

  def heavyHittersStream(tokens: Dataset[TokenObs], capacity: Int,
      topK: Int): Dataset[HHEntry] = {
    require(capacity > 0 && topK > 0, "capacity and topK must be positive")
    val fn: (String, Iterator[TokenObs], GroupState[HHState]) => Iterator[HHEntry] =
      (g, it, state) => {
        val buf = scala.collection.mutable.HashMap[String, Long]()
        var nSeen = 0L
        state.getOption.foreach { s =>
          s.items.foreach { case (k, v) => buf(k) = v }
          nSeen = s.n_seen
        }
        it.foreach { t =>
          graft.plans.MisraGriesAgg.observe(buf, t.token)(capacity)
          nSeen += 1
        }
        val top = buf.toArray.sortBy { case (k, c) => (-c, k) }.take(topK)
        state.update(HHState(buf.toMap, nSeen))
        top.iterator.zipWithIndex.map { case ((tok, est), i) =>
          HHEntry(g, tok, est, i + 1, nSeen)
        }
      }
    tokens.groupByKey(_.g)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)(
        Encoders.product[HHState], Encoders.product[HHEntry])
  }
}
