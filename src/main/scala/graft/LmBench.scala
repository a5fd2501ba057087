package graft

import graft.data.LmQuality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused benchmark for the trigram LM quality screen at curation scale: train a
  * full-vocabulary (2^16) model over a deterministic word-bag corpus, then measure
  * the SCORING pass — the path that runs over every document of a 100-TB corpus.
  * Scoring is a pure codegen projection (model = one sorted-long[] reference object
  * per executor, binary search per trigram), so its cost must track corpus bytes,
  * not model size; training is one explode+count aggregation and is paid once per
  * corpus (or once per hash-sample at production scale — see
  * [[graft.data.LmQuality]]).
  *
  *   SPARK_GRAFT_LM_DOCS (default 1,000,000)
  *   SPARK_GRAFT_CPUS (default 32)
  *   SPARK_GRAFT_RUNS (default 3; best-of-N after one untimed warmup)
  */
object LmBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_LM_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same deterministic word-bag shape as DecontamBench (~40 tokens, 50k vocab):
    // realistic trigram diversity without external data
    val dir = s"${sys.props("java.io.tmpdir")}/graft_lm_bench_$nDocs"
    if (!new java.io.File(s"$dir/_READY").exists()) {
      spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50000))))).as("text"))
        .write.mode("overwrite").parquet(s"$dir/docs")
      new java.io.File(dir, "_READY").createNewFile()
    }
    val docs = spark.read.parquet(s"$dir/docs")
    val bytes = docs.agg(sum(length(col("text")))).head.getLong(0)

    // training: paid once; timed separately so the scoring number is pure scan
    val tTrain0 = System.nanoTime()
    val model = LmQuality.trainTrigramLm(docs, "text", vocab = 65536, alpha = 0.4)
    val trainSecs = (System.nanoTime() - tTrain0) / 1e9

    def scorePass(): Long =
      LmQuality.scoreTrigramLm(docs, "text", model)
        .where(col("lm_logprob") < 0).count() // forces every score; all are < 0
    scorePass() // untimed warmup: JIT + codegen + parquet footers
    var best = Double.MaxValue; var scored = 0L
    (1 to runs).foreach { _ =>
      val t0 = System.nanoTime()
      scored = scorePass()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    require(scored == nDocs, s"expected $nDocs scored docs, got $scored")

    // the word-bag corpus yields few distinct trigrams, so the 2^16 cut doesn't
    // bind; pad the model to a FULL 65536 keys (never-matching high keys — results
    // identical) to time scoring at production binary-search depth
    val padTo = 65536
    val padded = {
      val extra = padTo - model.packedSize
      if (extra <= 0) model
      else {
        val maxReal = model.keys.last
        val keys = model.keys ++ Array.tabulate(extra)(i => maxReal + 1 + i)
        val lps = model.logProbs ++ Array.fill(extra)(model.unseenLogProb)
        new graft.functions.TrigramLmModel(keys, lps, model.unseenLogProb)
      }
    }
    def scorePaddedPass(): Long =
      LmQuality.scoreTrigramLm(docs, "text", padded)
        .where(col("lm_logprob") < 0).count()
    scorePaddedPass()
    var bestPad = Double.MaxValue
    (1 to runs).foreach { _ =>
      val t0 = System.nanoTime()
      require(scorePaddedPass() == nDocs)
      bestPad = math.min(bestPad, (System.nanoTime() - t0) / 1e9)
    }

    System.err.println(f"[lm] docs=$nDocs%d vocab=${model.packedSize}%d " +
      f"train=$trainSecs%.2fs score=$best%.2fs (${nDocs / best}%.0f docs/s, " +
      f"${bytes / best / 1e6}%.1f MB/s) score@${padded.packedSize}=$bestPad%.2fs")
    println(s"""{"lm_docs":$nDocs,"vocab":${model.packedSize},""" +
      f""""train_secs":$trainSecs%.2f,"score_secs":$best%.2f,""" +
      f""""docs_per_sec":${nDocs / best}%.0f,"mb_per_sec":${bytes / best / 1e6}%.1f,""" +
      f""""score_secs_full_vocab":$bestPad%.2f,"full_vocab":${padded.packedSize},""" +
      s""""policy":"best-of-$runs after untimed warmup","cpus":$cpus}""")
    spark.stop()
  }
}
