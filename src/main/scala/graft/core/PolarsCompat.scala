package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Float semantics shims.
  *
  * The reference delegates arithmetic to Polars (Rust/IEEE-754 semantics); Spark SQL's
  * non-ANSI semantics differ in exactly three places that the reference's golden tests
  * pin down (e.g. /root/reference/src/auto_featurs/pipeline/tests/test_pipeline.py:320,338):
  *   - division by zero: Spark → null, IEEE → NaN (0/0) or ±Inf (x/0)
  *   - log of zero:      Spark → null, IEEE → -Inf
  *   - log of negatives: Spark → null, IEEE → NaN
  * These helpers reproduce the IEEE behaviour with `when` wrappers, which Catalyst
  * constant-folds and codegens like any other expression tree.
  */
object PolarsCompat {
  val NaN: Column = lit(Double.NaN)
  val PosInf: Column = lit(Double.PositiveInfinity)
  val NegInf: Column = lit(Double.NegativeInfinity)

  /** IEEE-754 division: 0/0 → NaN, x/0 → ±Inf, else l/r. Inputs cast to double.
    * The zero divisor keeps its sign (x / -0.0 → ∓Inf); signum can't see it
    * (signum(-0.0) = 0), so the sign comes from the string form ("-0.0").
    */
  def ieeeDiv(lRaw: Column, rRaw: Column): Column = {
    val l = lRaw.cast("double")
    val r = rRaw.cast("double")
    val divisorSign = when(r.cast("string").startsWith("-"), -1.0).otherwise(1.0)
    when(isnan(l) || isnan(r), NaN)
      .when(r === 0.0, when(l === 0.0, NaN).otherwise(signum(l) * divisorSign * PosInf))
      .otherwise(l / r)
  }

  /** IEEE log_base: log(0) → -Inf, log(<0) → NaN. */
  def ieeeLog(base: Double, cRaw: Column): Column = {
    val c = cRaw.cast("double")
    when(isnan(c), NaN)
      .when(c === 0.0, NegInf)
      .when(c < 0.0, NaN)
      .otherwise(log(base, c))
  }

  /** IEEE log2 of an already-double expression (used by PMI). */
  def ieeeLog2(c: Column): Column =
    when(isnan(c), NaN)
      .when(c === 0.0, NegInf)
      .when(c < 0.0, NaN)
      .otherwise(log2(c))

  /** NaN → 0.0 (Polars fill_nan), preserving nulls. */
  def fillNaN0(c: Column): Column = when(isnan(c), 0.0).otherwise(c)
}

/** Duration grammar of the reference's time windows: `{y,mo,d,h,m,s}` concatenated,
  * e.g. "2d1h" (reference: utils/utils.py:55-79, constants.py). Months are 30 days,
  * years 365 days, matching the reference's constants.
  */
object Durations {
  val SecondsInMinute = 60L
  val SecondsInHour = 3600L
  val SecondsInDay = 86400L
  val SecondsInMonth = 30L * SecondsInDay
  val SecondsInYear = 365L * SecondsInDay

  private val token = """(\d+)(mo|y|d|h|m|s)""".r

  def parseSeconds(s: String): Long = {
    val parsed = token.findAllMatchIn(s).map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "y"  => n * SecondsInYear
        case "mo" => n * SecondsInMonth
        case "d"  => n * SecondsInDay
        case "h"  => n * SecondsInHour
        case "m"  => n * SecondsInMinute
        case "s"  => n
      }
    }.sum
    val consumed = token.findAllMatchIn(s).map(_.matched.length).sum
    require(consumed == s.length && s.nonEmpty, s"Invalid duration string: '$s'")
    parsed
  }

  /** Format seconds back to the canonical string ("0s" for zero). */
  def format(totalSeconds: Long): String = {
    var rem = totalSeconds
    val sb = new StringBuilder
    def emit(unitSeconds: Long, suffix: String): Unit = {
      val n = rem / unitSeconds
      rem %= unitSeconds
      if (n > 0) sb.append(n).append(suffix)
    }
    emit(SecondsInYear, "y"); emit(SecondsInMonth, "mo"); emit(SecondsInDay, "d")
    emit(SecondsInHour, "h"); emit(SecondsInMinute, "m")
    if (rem > 0) sb.append(rem).append("s")
    if (sb.isEmpty) "0s" else sb.toString
  }
}

/** Number formatting for generated column names (`_log10` not `_log10.0`). */
object Fmt {
  def num(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
}
