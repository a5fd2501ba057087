package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the north rule (BASELINE.json: throughput
  * scaling efficiency ≥ 0.8 from N to 4N executors). No multi-node cluster exists in
  * this sandbox, so identical jobs run at local[N] and local[4N] on identical input;
  * efficiency = (rate_4N / rate_N) / 4.
  *
  * Prints one JSON line:
  * {"n":8,"rateN":…,"rate4N":…,"efficiency":…,"rows":…}
  */
object ScalingBench {
  private def run(cores: Int, urls: Long, warmup: Boolean): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", "128"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // steady-state measurement: the first full-size run pays JIT + codegen warmup
      // (measured 5-8x slower than warm); time the second run
      if (warmup) Bench.headline(spark, urls)
      val (rows, rate) = Bench.headline(spark, urls)
      System.err.println(s"[scaling] cores=$cores rows=$rows rate=${rate.toLong} rows/s")
      rate
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val urls = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_URLS", "200000").toLong
    val rateN = run(n, urls, warmup = true)
    val rate4N = run(4 * n, urls, warmup = true)
    val eff = (rate4N / rateN) / 4.0
    println(f"""{"n":$n,"rateN":${rateN.toLong},"rate4N":${rate4N.toLong},"efficiency":$eff%.3f,"urls":$urls}""")
  }
}
