package graft

import graft.data.Sampling
import graft.web.HostGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused benchmark for the round-6 curation-prior operators at corpus scale.
  *
  * 1. PageRank over a deterministic Zipf-ish host graph (hot hosts get the bulk
  *    of in-links, like a real crawl): edge count and host count are the knobs.
  *    Reports build cost (transition matrix — paid once) and per-iteration cost
  *    (the number that multiplies by K on a 10^8-host crawl graph).
  * 2. DSIR log-weight scoring over the LmBench word-bag corpus shape: the cost
  *    must track corpus tokens (two explode passes + a bounded-key groupBy),
  *    not vocabulary or bucket count.
  *
  *   SPARK_GRAFT_GRAPH_EDGES (default 10,000,000)
  *   SPARK_GRAFT_GRAPH_HOSTS (default 100,000)
  *   SPARK_GRAFT_DSIR_DOCS  (default 500,000)
  *   SPARK_GRAFT_CPUS (default 32)
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_GRAPH_EDGES", "10000000").toLong
    val nHosts = sys.env.getOrElse("SPARK_GRAFT_GRAPH_HOSTS", "100000").toLong
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DSIR_DOCS", "500000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-ish in-link skew: dst drawn as floor(hosts * u^4) concentrates
    // P(u < 0.01^(1/4)) ≈ 31.6% of all in-links on the hottest 1% of hosts;
    // src is uniform. Deterministic.
    val dir = s"${sys.props("java.io.tmpdir")}/graft_graph_bench_${nEdges}_$nHosts"
    if (!new java.io.File(s"$dir/_READY").exists()) {
      val u = pmod(xxhash64(col("id"), lit(1)), lit(1000000)).cast("double") / 1e6
      spark.range(nEdges).select(
          concat(lit("h"), pmod(xxhash64(col("id")), lit(nHosts))).as("src"),
          concat(lit("h"), floor(pow(u, 4.0) * nHosts).cast("long")).as("dst"))
        .write.mode("overwrite").parquet(s"$dir/edges")
      new java.io.File(dir, "_READY").createNewFile()
    }
    val edges = spark.read.parquet(s"$dir/edges")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warmup (JIT + codegen for the whole operator), then best-of-2 per level —
    // the per-iteration figure is a DIFFERENCE of two wall times, so a single
    // noisy run at either level can make it meaningless on a shared host
    HostGraph.release(HostGraph.pageRank(edges, "src", "dst", iters = 1))
    def bestOf2(iters: Int): (org.apache.spark.sql.DataFrame, Double) = {
      val (ra, ta) = timed(HostGraph.pageRank(edges, "src", "dst", iters))
      val (rb, tb) = timed(HostGraph.pageRank(edges, "src", "dst", iters))
      if (ta <= tb) { HostGraph.release(rb); (ra, ta) }
      else { HostGraph.release(ra); (rb, tb) }
    }
    val (r1, t1) = bestOf2(1)
    HostGraph.release(r1)
    val (r5, t5) = bestOf2(5)
    val perIter = (t5 - t1) / 4.0
    println(f"[graphbench] pagerank edges=$nEdges hosts=$nHosts " +
      f"build+1iter=${t1}%.2fs 5iter=${t5}%.2fs perIter=${perIter}%.2fs " +
      f"edgesPerIterSec=${(nEdges / perIter).toLong}")
    val top = r5.orderBy(col("rank").desc).limit(3).collect()
      .map(r => f"${r.getString(0)}:${r.getDouble(1)}%.6f").mkString(" ")
    println(s"[graphbench] top hosts: $top")

    val docsDir = s"${sys.props("java.io.tmpdir")}/graft_lm_bench_$nDocs"
    if (!new java.io.File(s"$docsDir/_READY").exists()) {
      spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            i => concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(50000))))).as("text"))
        .write.mode("overwrite").parquet(s"$docsDir/docs")
      new java.io.File(docsDir, "_READY").createNewFile()
    }
    val docs = spark.read.parquet(s"$docsDir/docs")
    // target = ~1/3 of docs, decided per-row
    val pred = pmod(col("doc_id"), lit(3)) === 0
    val (_, w0) = timed(
      Sampling.dsirLogWeights(docs, "doc_id", "text", pred).count())
    val (_, w1) = timed(
      Sampling.dsirLogWeights(docs, "doc_id", "text", pred).count())
    val tokens = nDocs * 40
    println(f"[graphbench] dsir docs=$nDocs tokens=$tokens cold=${w0}%.2fs " +
      f"warm=${w1}%.2fs tokensPerSec=${(tokens / w1).toLong} docsPerSec=${(nDocs / w1).toLong}")
  }
}
