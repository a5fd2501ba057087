package graft

import graft.data.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused benchmark for corpus-wide line-level boilerplate dedup at Stress scale:
  * N docs × 30 lines with a planted shared-boilerplate pool (~5% of lines repeat
  * corpus-wide — the production shape: a small duplicated set inside a huge unique
  * corpus). Times scan → dedupLines → noop sink, best-of-N after one untimed warmup.
  *
  * Exists to record the round-5 verdict item 4 before/after: the round-4
  * formulation re-grouped the ENTIRE exploded corpus by id to rebuild documents;
  * the round-5 formulation aggregates only the (small) dropped `(id, pos)` set and
  * drops lines from the ORIGINAL frame with an indexed-HOF filter, so the corpus
  * is never re-exploded and never re-grouped.
  *
  *   SPARK_GRAFT_LINEDEDUP_DOCS (default 1,000,000 — 30M exploded lines)
  *   SPARK_GRAFT_CPUS (default 32)
  *   SPARK_GRAFT_RUNS (default 3)
  */
object LineDedupBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_LINEDEDUP_DOCS", "1000000").toLong
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

    val dir = s"${sys.props("java.io.tmpdir")}/graft_linededup_bench_$nDocs"
    if (!new java.io.File(s"$dir/_READY").exists()) {
      // ~5% of lines come from a 50-line boilerplate pool; the rest are unique
      // (id- and position-salted) and ≥10 chars, so they are hash-eligible but
      // never duplicated — the decision set stays small, as in production
      spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws("\n", transform(sequence(lit(1), lit(30)), i =>
            when(pmod(xxhash64(col("id"), i), lit(20)) === 0,
              concat(lit("shared boilerplate navigation footer line number "),
                pmod(xxhash64(col("id"), i, lit(7)), lit(50))))
              .otherwise(concat(lit("unique content line "), col("id"), lit(" "),
                i, lit(" "), md5(concat(col("id"), i)))))).as("text"))
        .write.mode("overwrite").parquet(s"$dir/docs")
      new java.io.File(dir, "_READY").createNewFile()
    }
    val docs = spark.read.parquet(s"$dir/docs")

    def once(): Double = {
      val t0 = System.nanoTime()
      Dedup.dedupLines(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed warmup
    val secs = (1 to runs).map { r =>
      val dt = once()
      System.err.println(f"[linededup] run $r: $dt%.1fs (${nDocs * 30 / dt}%.0f lines/s)")
      dt
    }.min
    println(s"""{"linededup_docs":$nDocs,"lines":${nDocs * 30},"secs":$secs,""" +
      s""""lines_per_sec":${(nDocs * 30 / secs).toLong},""" +
      s""""policy":"best-of-$runs after untimed warmup","cpus":$cpus}""")
    spark.stop()
  }
}
