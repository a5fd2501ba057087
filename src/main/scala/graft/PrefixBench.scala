package graft

import graft.web.PrefixAgg
import graft.web.PrefixAgg.{Op, RunningSpec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused benchmark for the one deliberately-sequential operator: global running
  * aggregates over [[PrefixAgg.running]] at Stress scale (default 20M rows — well past
  * the 10⁷ bar where codec overhead dominates fixed costs). Times scan → running(count,
  * sum, min, max) → noop sink, best-of-N after one untimed warmup (same policy as
  * [[Bench.headline]]; the JSON carries the policy).
  *
  * The input mimics the events table's shape: an epoch-seconds order key in random
  * disk order, a unique tie-breaker, a nullable double input, and two string payload
  * columns wide enough that row-codec overhead (the round-3 verdict's finding on the
  * external-Row fold) is visible rather than hidden behind a skinny schema.
  *
  *   SPARK_GRAFT_PREFIX_ROWS (default 20,000,000)
  *   SPARK_GRAFT_CPUS (default 32)
  */
object PrefixBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PREFIX_ROWS", "20000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"${sys.props("java.io.tmpdir")}/graft_prefix_bench_$rows"
    if (!new java.io.File(s"$dir/_READY").exists()) {
      spark.range(rows).select(
          (pmod(xxhash64(col("id")), lit(86400L * 365)) + 1577836800L).as("ts"),
          col("id").as("event_id"),
          when(pmod(col("id"), lit(19)) === 0, lit(null))
            .otherwise(sin(col("id").cast("double")) * 100.0).as("value"),
          concat(lit("https://d"), pmod(xxhash64(col("id"), lit(1)), lit(5000)),
            lit(".example.com/p/"), col("id")).as("url"),
          concat(lit("payload "), md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string"))).as("meta"))
        .write.mode("overwrite").parquet(s"$dir/events")
      new java.io.File(dir, "_READY").createNewFile()
    }
    val df = spark.read.parquet(s"$dir/events")
    val specs = Seq(
      PrefixAgg.runningCount("running_count"),
      RunningSpec(Op.Sum, "value", "running_sum"),
      RunningSpec(Op.Min, "value", "running_min"),
      RunningSpec(Op.Max, "value", "running_max"))
    def once(): Double = {
      val t0 = System.nanoTime()
      PrefixAgg.running(df, Seq("ts", "event_id"), specs, numRanges = 64)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed warmup: JIT + codegen + parquet footers
    val secs = (1 to runs).map { r =>
      val dt = once()
      System.err.println(f"[prefix] run $r: $dt%.1fs (${rows / dt}%.0f rows/s)")
      dt
    }.min
    println(s"""{"prefix_rows":$rows,"secs":$secs,"rows_per_sec":${(rows / secs).toLong},""" +
      s""""policy":"best-of-$runs after untimed warmup","cpus":$cpus}""")
    spark.stop()
  }
}
