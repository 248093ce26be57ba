package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Time/window/JSON operators over the `events` stream-shaped table —
  * running aggregates (analytic windows), tumbling-window rollups, JSON
  * scalar extraction (F16) and the high-watermark incremental read (I1/P4).
  *
  * Timestamp parity note: events.ts is nanosecond parquet; the engine reads
  * it through `Tables` as microsecond timestamps, and every oracle
  * comparison is expressed over `epoch µs` BIGINTs so both engines hash the
  * identical integer regardless of their native timestamp width.
  */
object Temporal {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Running balance + previous value per user over purchase events —
    * the lag/lead + cumulative-sum family SURVEY §2.5 notes as the natural
    * extension of the reference's single window op. One shuffle on
    * user_id. */
  val q13RunningBalance: Q = Q(
    "q13_running_balance",
    Some("""
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             round(sum(value) OVER wf, 4) AS running_total,
             round(coalesce(lag(value, 1) OVER wo, 0.0), 4) AS prev_value,
             row_number() OVER wo AS seq
      FROM events
      WHERE event_type = 'purchase'
      WINDOW wo AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
             wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """),
    (s, dir) => {
      val wo = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          round(sum(col("value")).over(wf), 4).as("running_total"),
          round(coalesce(lag(col("value"), 1).over(wo), lit(0.0)), 4).as("prev_value"),
          row_number().over(wo).as("seq"))
    })

  /** 10-minute tumbling-window aggregate — the batch shape of the
    * Structured Streaming windowed agg (SURVEY §2.10 I1 note; `events`
    * fixture). Window start is emitted as epoch seconds so both engines
    * agree without timezone semantics. */
  val q14TumblingWindow: Q = Q(
    "q14_tumbling_window",
    Some("""
      SELECT (epoch_us(ts) // 600000000) * 600 AS window_start,
             event_type,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
    """),
    (s, dir) =>
      ev(s, dir)
        .groupBy(
          (expr("unix_micros(ts) DIV 600000000") * 600).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value")))

  /** JSON scalar extraction (F16 — to_json/from_json family;
    * json_writer.py:153,195): pull `props.k`, aggregate by it. */
  val q15JsonExtract: Q = Q(
    "q15_json_extract",
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1
    """),
    (s, dir) =>
      ev(s, dir)
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))

  /** I1/P4 — high-watermark incremental read: rows strictly newer than the
    * last control-table watermark, plus the new watermark per group
    * (datatrack_spark_utils.py:118-188). The range predicate is
    * partition-prunable at scale. */
  val q20WatermarkIncremental: Q = Q(
    "q20_watermark_incremental",
    Some("""
      SELECT event_type,
             count(*) AS n_new,
             max(epoch_us(ts)) AS new_watermark_us
      FROM events
      WHERE epoch_us(ts) > epoch_us(TIMESTAMP '2024-01-15 00:00:00')
      GROUP BY event_type
    """),
    (s, dir) =>
      graft.lake.Lake.incrementalAfter(
          ev(s, dir), "ts", to_timestamp(lit("2024-01-15 00:00:00")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_new"),
          max(unix_micros(col("ts"))).as("new_watermark_us")))

  val all: Seq[Q] = Seq(
    q13RunningBalance, q14TumblingWindow, q15JsonExtract, q20WatermarkIncremental)
}
