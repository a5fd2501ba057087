package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` draws from an
  * RNG seeded per partition, so results change under repartitioning and can't be
  * reproduced by another engine; these samplers decide per ROW from a hash of a key,
  * which makes them reproducible across runs, engines (DuckDB oracle in the gate),
  * repartitions, and incremental re-runs — the property that matters when a 100-TB
  * corpus is sampled in resumable pieces.
  */
object Sampling {

  /** Uniform [0, 1) decided by md5 of the key: the first 13 hex digits (52 bits,
    * exact in a double) over 2^52. Same formula is expressible in any engine with md5.
    * NULL keys hash to NULL — samplers below totalize that to 0.0 (see
    * [[totalHashFraction]]).
    */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("double") /
      4503599627370496.0 // 2^52

  /** Total sampling decision: NULL keys map to 0.0, i.e. they are deterministically
    * KEPT at any rate > 0 (and dropped only at rate 0). A raw `hashFraction(key) <
    * rate` is null for null keys and the filter silently drops them at EVERY rate,
    * including 1.0 — rows with a nullable sampling key would vanish with no signal.
    */
  def totalHashFraction(key: Column): Column = coalesce(hashFraction(key), lit(0.0))

  /** Keep ~`rate` of rows, decided by the key's hash. Deterministic: the same key is
    * always in or always out, so joins between independently-sampled tables keyed the
    * same way stay consistent. NULL keys are kept at any rate > 0 (documented choice —
    * see [[totalHashFraction]]).
    */
  def byHash(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(totalHashFraction(key) < rate)
  }

  /** Per-stratum rates (e.g. downsample "en" to 5%, keep the rest): rows whose
    * stratum is missing from `rates` use `defaultRate`. NULL keys are kept whenever
    * their stratum's rate is > 0 (see [[totalHashFraction]]).
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === s, r).otherwise(acc)
    }
    df.where(totalHashFraction(key) < rateCol)
  }

  /** Per-group cap: keep the top `k` rows of each group by `order` (desc), ties
    * broken by `tieBreak` (asc) for determinism — "at most N pages per domain", the
    * standard anti-domination rule in corpus curation. One shuffle on the group key.
    */
  def capPerGroup(df: DataFrame, group: Column, order: Column, tieBreak: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(order.desc, tieBreak.asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }
}
