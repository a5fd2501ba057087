package graft

import graft.web.GraftMetricsListener
import org.apache.spark.sql.SparkSession

/** Large-input robustness probe: runs the headline job at several times the bench size
  * and reports throughput plus the listener's lineage/skew summary — the empirical
  * "would this survive a scale-up" check (spill-aware sorts, skewed hot urls).
  *
  *   SPARK_GRAFT_STRESS_URLS (default 4,000,000 → ~70M feature rows)
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val urls = sys.env.getOrElse("SPARK_GRAFT_STRESS_URLS", "4000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = GraftMetricsListener.attach(spark)
    // runs = 1: the listener aggregates per-run counters, so a best-of-3 here would
    // triple the 70M-row job AND report 3× the true per-run lineage/skew/spill totals
    val (rows, rate) = Bench.headline(spark, urls, runs = 1)
    Thread.sleep(500)
    println(s"""{"stress_urls":$urls,"rows":$rows,"rows_per_sec":${rate.toLong},""" +
      s""""metrics":${listener.summaryJson}}""")
    spark.stop()
  }
}
