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

  /** What a NULL sampling key means. A raw `hashFraction(key) < rate` predicate is
    * null for null keys, so the filter would silently drop them at EVERY rate
    * including 1.0 — both policies below are explicit totalizations of that gap.
    * `Keep` treats a null key as fraction 0.0 (always in at rate > 0): right when the
    * key identifies the ROW (ids — dropping rows for having a null id is data loss).
    * `Drop` excludes them at every rate: right when a null key means the row can't be
    * deterministically re-selected (e.g. sampling keyed on a join column). NOTE for
    * cross-engine reproduction (the DuckDB oracle recipe): `Keep` is
    * `coalesce(frac, 0.0) < rate` — the other engine must apply the same coalesce.
    */
  sealed trait NullKeys
  object NullKeys {
    case object Keep extends NullKeys
    case object Drop extends NullKeys
  }

  /** Uniform [0, 1) decided by md5 of the key: the first 13 hex digits (52 bits,
    * exact in a double) over 2^52. Same formula is expressible in any engine with md5
    * (DuckDB: `('0x' || substr(md5(k::VARCHAR), 1, 13))::UBIGINT::DOUBLE / 2^52`).
    * NULL keys hash to NULL — samplers below totalize that per their `nullKeys`
    * policy (see [[NullKeys]]).
    */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("double") /
      4503599627370496.0 // 2^52

  /** Sampling decision made total per the null policy: `Keep` maps a null key to
    * fraction 0.0 (kept at any rate > 0, dropped only at rate 0); `Drop` maps it to
    * 1.0 (never kept — 1.0 is outside every `< rate` acceptance region since
    * rate ≤ 1).
    */
  def totalHashFraction(key: Column, nullKeys: NullKeys = NullKeys.Keep): Column =
    coalesce(hashFraction(key), lit(if (nullKeys == NullKeys.Keep) 0.0 else 1.0))

  /** Keep ~`rate` of rows, decided by the key's hash. Deterministic: the same key is
    * always in or always out, so joins between independently-sampled tables keyed the
    * same way stay consistent. NULL-key rows follow `nullKeys` (default Keep — see
    * [[NullKeys]] for when to pick which).
    */
  def byHash(df: DataFrame, key: Column, rate: Double,
      nullKeys: NullKeys = NullKeys.Keep): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(totalHashFraction(key, nullKeys) < rate)
  }

  /** Per-stratum rates (e.g. downsample "en" to 5%, keep the rest): rows whose
    * stratum is missing from `rates` use `defaultRate`. NULL-key rows follow
    * `nullKeys`: under Keep they are kept whenever their stratum's rate is > 0.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      nullKeys: NullKeys = NullKeys.Keep): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === s, r).otherwise(acc)
    }
    df.where(totalHashFraction(key, nullKeys) < rateCol)
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
