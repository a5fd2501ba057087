package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the event-time delta within a
  * key exceeds `gapSeconds` (north rule: session cut on warc_ts deltas per url).
  *
  * Pure window composition — exactly the reference-primitive decomposition noted in
  * SURVEY.md §2.8: lag + comparison + running sum. One shuffle on the key.
  */
object Sessionize {

  /** Adds `{prefix}id` (0-based per key), `{prefix}event_idx` (0-based within
    * session), and `{prefix}gap_seconds` (delta to previous event, null on first).
    */
  def withSessionIds(df: DataFrame, keys: Seq[String], tsCol: String, gapSeconds: Long,
      prefix: String = "session_"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    val delta = col(tsCol).cast("timestamp").cast("long") - lag(col(tsCol), 1).over(w).cast("timestamp").cast("long")
    val isNew = when(delta.isNull || delta > gapSeconds, 1L).otherwise(0L)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df
      .withColumn(s"${prefix}gap_seconds", delta)
      .withColumn(s"${prefix}id", sum(isNew).over(run) - 1)
    out.withColumn(s"${prefix}event_idx",
      row_number().over(Window.partitionBy((keys.map(col) :+ out(s"${prefix}id")): _*)
        .orderBy(col(tsCol).asc)) - 1)
  }

  /** One row per (key, session): span, event count, mean gap. */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String, gapSeconds: Long,
      prefix: String = "session_"): DataFrame = {
    val withIds = withSessionIds(df, keys, tsCol, gapSeconds, prefix)
    withIds.groupBy(keys.map(col) :+ col(s"${prefix}id"): _*)
      .agg(
        count(lit(1)).as(s"${prefix}num_events"),
        min(col(tsCol)).as(s"${prefix}start"),
        max(col(tsCol)).as(s"${prefix}end"),
        (max(col(tsCol)).cast("timestamp").cast("long") - min(col(tsCol)).cast("timestamp").cast("long")).as(s"${prefix}duration_seconds"))
  }
}
