package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval / range join: pair each left row `(keys, ts)` with every right row whose
  * timestamp lies within `[ts - before, ts + after]`.
  *
  * The naive formulation is a non-equi join (a per-key cross product at scale). This
  * is the standard bucketed formulation: with bucket width `w = before + after`, a
  * left row's window spans at most two buckets, so the left side explodes into ≤2
  * `(keys, bucket)` rows while each right row lands in exactly ONE bucket — the join
  * becomes an equality join on `(keys, bucket)` plus an exact range filter, and every
  * qualifying pair meets exactly once (in the right row's own bucket). One shuffle per
  * side, no duplicate elimination needed.
  *
  * No reference counterpart (the reference has no joins); the driver gate checks it
  * against DuckDB's native inequality join (q_range_join).
  *
  * @param valueCols right columns to attach; names must not collide with left columns
  * @return inner join: left columns + valueCols, one row per qualifying pair
  */
object RangeJoin {
  def byKeyAndTime(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      leftTs: String,
      rightKeys: Seq[String],
      rightTs: String,
      beforeSeconds: Long,
      afterSeconds: Long,
      valueCols: Seq[String]): DataFrame = {
    require(leftKeys.size == rightKeys.size)
    require(beforeSeconds >= 0 && afterSeconds >= 0 && beforeSeconds + afterSeconds > 0)
    val w = beforeSeconds + afterSeconds
    val keyNames = leftKeys
    val lCols = left.columns.toSeq

    def bucketOf(epoch: org.apache.spark.sql.Column) =
      floor(epoch.cast("double") / w).cast("long")

    val leftP = left
      .withColumn("__lts", col(leftTs).cast("timestamp").cast("long"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__lts") - beforeSeconds), bucketOf(col("__lts") + afterSeconds))))
    val rightP = right.select(
      rightKeys.zip(keyNames).map { case (r, l) => col(r).as(l) } ++
        (col(rightTs).cast("timestamp").cast("long").as("__rts") +: valueCols.map(col)): _*)
      .withColumn("__bucket", bucketOf(col("__rts")))

    leftP.join(rightP, keyNames :+ "__bucket")
      .where(col("__rts") >= col("__lts") - beforeSeconds &&
        col("__rts") <= col("__lts") + afterSeconds)
      .select((lCols ++ valueCols).map(col): _*)
  }
}
