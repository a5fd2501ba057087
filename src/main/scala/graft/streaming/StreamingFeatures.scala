package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming counterpart of the batch point-in-time features: the batch
  * engine's cumulative/EXCLUSIVE operators are prefix aggregates in event time, which
  * is exactly per-key streaming state (SURVEY.md §1.2). This module computes the same
  * per-url features incrementally over a stream of page snapshots:
  * snapshot index, seconds since last snapshot, gap-based session id, text-change flag,
  * running text-length mean — each value uses only rows at-or-before its snapshot, so
  * zero temporal leakage holds by construction here too.
  *
  * Batch/stream parity is tested: replaying the synthetic page table through
  * `MemoryStream` must reproduce the batch job's values for the shared features.
  */
object StreamingFeatures {

  final case class PageEvent(url: String, warc_ts: Timestamp, text: String, lang: String)

  final case class UrlState(
      snapshots: Long,
      lastTsSeconds: Long,
      sessionId: Long,
      lastTextHash: Long,
      lengthSum: Double)

  final case class PageFeature(
      url: String,
      warc_ts: Timestamp,
      snapshot_idx: Long, // 1-based, == batch inclusive_cum_count_over_url
      secs_since_last_snapshot: Option[Long],
      session_id: Long,
      text_changed: Boolean,
      text_length_running_mean: Double)

  /** Per-url incremental feature computation. Events within a micro-batch are
    * processed in event-time order; state carries across batches.
    */
  def features(pages: Dataset[PageEvent], sessionGapSeconds: Long): Dataset[PageFeature] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.groupByKey(_.url).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (url: String, events: Iterator[PageEvent], state: GroupState[UrlState]) =>
        var s = state.getOption.getOrElse(UrlState(0L, Long.MinValue, -1L, 0L, 0.0))
        val out = events.toSeq.sortBy(_.warc_ts.getTime).map { e =>
          val ts = e.warc_ts.toInstant.getEpochSecond
          val gap = if (s.snapshots == 0) None else Some(ts - s.lastTsSeconds)
          val newSession = gap.forall(_ > sessionGapSeconds)
          val textHash = graft.functions.HashKernels.hashString(e.text, 0L)
          val f = PageFeature(
            url = url,
            warc_ts = e.warc_ts,
            snapshot_idx = s.snapshots + 1,
            secs_since_last_snapshot = gap,
            session_id = if (newSession) s.sessionId + 1 else s.sessionId,
            text_changed = s.snapshots == 0 || textHash != s.lastTextHash,
            text_length_running_mean = (s.lengthSum + e.text.length) / (s.snapshots + 1))
          s = UrlState(s.snapshots + 1, ts,
            if (newSession) s.sessionId + 1 else s.sessionId, textHash,
            s.lengthSum + e.text.length)
          f
        }
        state.update(s)
        out.iterator
    }
  }

  // ---------------------------------------------------------- streaming as-of backfill

  /** One unified timeline row: a page snapshot (`isPage`) or an event to backfill. */
  final case class TimelineRow(url: String, ts: Timestamp, isPage: Boolean,
      text: String, lang: String, value: Double)

  final case class SnapshotState(warcTsMillis: Long, text: String, lang: String)

  final case class BackfilledEvent(url: String, ts: Timestamp, value: Double,
      warc_ts: Option[Timestamp], text: Option[String], lang: Option[String])

  /** Streaming counterpart of [[graft.web.AsOfJoin.backward]] for the backfill shape:
    * per-url state carries the LATEST page snapshot seen; each event row emits
    * enriched with it — the same inclusive as-of contract (a snapshot at exactly the
    * event's timestamp matches, because pages order before events at equal ts within
    * a batch). Requires per-key event-time-ordered arrival ACROSS micro-batches (the
    * usual log-compaction/kafka-partition-by-url setup); within a batch any order is
    * fine. Batch/stream parity is tested in StreamingSpec.
    */
  def backfill(timeline: Dataset[TimelineRow]): Dataset[BackfilledEvent] = {
    val spark = timeline.sparkSession
    import spark.implicits._
    timeline.groupByKey(_.url).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (url: String, rows: Iterator[TimelineRow], state: GroupState[SnapshotState]) =>
        var s = state.getOption
        val out = rows.toSeq
          .sortBy(r => (r.ts.getTime, if (r.isPage) 0 else 1))
          .flatMap { r =>
            if (r.isPage) { s = Some(SnapshotState(r.ts.getTime, r.text, r.lang)); None }
            else Some(BackfilledEvent(url, r.ts, r.value,
              s.map(st => new Timestamp(st.warcTsMillis)), s.map(_.text), s.map(_.lang)))
          }
        s.foreach(state.update)
        out.iterator
    }
  }

  /** Streaming exact dedup: the first page with a given content hash survives; later
    * duplicates within the watermark horizon drop. Uses
    * `dropDuplicatesWithinWatermark`, whose state IS evicted once event time passes
    * the watermark — plain `dropDuplicates(hash)` would keep every hash ever seen
    * forever (the event-time column isn't part of the key, so nothing ages out).
    */
  def dedupStream(pages: Dataset[PageEvent], watermark: String): org.apache.spark.sql.DataFrame =
    pages.toDF()
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  /** Watermarked per-url tumbling-window snapshot counts — the streaming analogue of
    * the batch rolling count, with late data dropped past the watermark.
    */
  def windowedCounts(pages: Dataset[PageEvent], windowDuration: String,
      watermark: String): org.apache.spark.sql.DataFrame =
    pages.toDF()
      .withWatermark("warc_ts", watermark)
      .groupBy(col("url"), window(col("warc_ts"), windowDuration))
      .agg(count(lit(1)).as("snapshots_in_window"),
        approx_count_distinct(col("lang")).as("langs_in_window"))

  /** Streaming counterpart of [[graft.web.Sessionize.sessionStats]]: one row per
    * CLOSED (key, session), via Spark's native `session_window` — sessions merge as
    * events arrive and a session emits once the watermark passes its end + gap, after
    * which its state is evicted (bounded state at any corpus rate; the
    * mapGroupsWithState path in [[features]] assigns per-ROW ids instead and never
    * closes sessions). Same gap semantics as the batch operator: an event at exactly
    * `gapSeconds` after the previous one still EXTENDS the session (batch cuts only
    * on `delta > gap`), hence the `gap + 1s` window. Exact parity holds at
    * whole-second timestamps (the page table's granularity); with fractional seconds
    * the batch operator compares FLOOR-second deltas while `session_window` measures
    * real time, so events within the same second can group differently.
    */
  def sessionStats(pages: Dataset[PageEvent], gapSeconds: Long,
      watermark: String): org.apache.spark.sql.DataFrame =
    pages.toDF()
      .withWatermark("warc_ts", watermark)
      .groupBy(col("url"), session_window(col("warc_ts"), s"${gapSeconds + 1} seconds"))
      .agg(
        count(lit(1)).as("session_num_events"),
        min(col("warc_ts")).as("session_start"),
        max(col("warc_ts")).as("session_end"))
      .select(col("url"), col("session_num_events"), col("session_start"),
        col("session_end"),
        (col("session_end").cast("timestamp").cast("long") -
          col("session_start").cast("timestamp").cast("long")).as("session_duration_seconds"))
}
