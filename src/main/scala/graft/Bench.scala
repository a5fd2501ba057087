package graft

import graft.web.{Pages, WebFeatures}
import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: one JSON line with per-query seconds, plus the headline
  * north-rule metric — feature rows/sec for as-of join + window feature synthesis over
  * the synthetic page table.
  */
object Bench {
  def headline(spark: SparkSession, numUrls: Long): (Long, Double) = {
    val pages = Pages.generate(spark, numUrls,
      numPartitions = spark.sparkContext.defaultParallelism)
    val events = Pages.events(spark, pages)
    val rows = pages.count() + events.count() // output cardinalities, computed untimed
    val features = WebFeatures.pointInTime(pages)
    val backfilled = WebFeatures.backfillEvents(events, pages)
    val t0 = System.nanoTime()
    // noop sink forces FULL computation of every feature column (a bare count() would
    // let Catalyst prune the window expressions away) without measuring disk IO
    features.write.format("noop").mode("overwrite").save()
    backfilled.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    (rows, rows / secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val headlineUrls = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_URLS", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", (cpus.toInt * 4).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (hRows, hRate) = headline(spark, headlineUrls)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""headline_rows":$hRows,"headline_rows_per_sec":${hRate.toLong},""" +
      s""""headline_urls":$headlineUrls,"cpus":$cpus}""")
    spark.stop()
  }
}
