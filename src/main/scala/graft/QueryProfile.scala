package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named gate query `reps` times under the Bench session config and
  * print each wall time — the warm floor is what the recorded triple sees (the full
  * bench runs ~60 queries of JIT/codegen warmup before any one of them). Not a
  * recordable artifact; use `graft.Bench` for records.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QueryProfile q_curation_chain 4"`
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryProfile <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", (cpus.toInt * 8).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name run $r: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
