package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set against the
  *    corpus, one pass, per-query top-k via window. Scales linearly in corpus size.
  *  - [[ivfTopK]]: IVF-style scale path — partition the corpus into `nCentroids`
  *    Voronoi cells (deterministic centroid sample, one assignment pass), search only
  *    the `nProbe` cells closest to each query. Approximate: recall < 1 when the true
  *    neighbor lives outside probed cells.
  */
object Ann {

  /** Cosine similarity of two float arrays, computed in double with a sequential fold
    * (bit-compatible with DuckDB's list_cosine_similarity over DOUBLE[]).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** @param queries rows with (queryIdCol, vecCol); must be broadcast-small
    * @return (queryId, neighborId, cosine, rank) with rank 1..k, ties broken by id
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      queryIdCol: String, k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic centroid choice: the `nCentroids` corpus rows with the smallest
    * xxhash64(id) — a seeded uniform sample without an RNG.
    */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String, nCentroids: Int): DataFrame =
    corpus.select(col(idCol).as("centroid_id"), col(vecCol).as("__centroid"),
        xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h")).limit(nCentroids).drop("__h")

  /** One assignment pass: nearest centroid per corpus row.
    *
    * Up to `maxLiteralCentroids` the centroid table (tiny by contract — it was
    * sampled to nCentroids rows) collects to the driver and assignment is a MAP-ONLY
    * argmax over literal vectors: no crossJoin row explosion, no shuffle-by-id
    * window — at 10^12 corpus rows the difference between a scan and a shuffle.
    * Beyond that, one literal cosine per centroid would blow Janino's method-size
    * limits, so large centroid sets fall back to broadcast-crossJoin + per-id window.
    * Note the literal path runs `cents.collect()` at PLAN TIME (eager).
    */
  def assign(corpus: DataFrame, cents: DataFrame, idCol: String, vecCol: String,
      maxLiteralCentroids: Int = 128): DataFrame = {
    val centNamed = cents.select(col("centroid_id"), col("__centroid"))
    val n = centNamed.limit(maxLiteralCentroids + 1).count()
    require(n > 0, "no centroids")
    if (n > maxLiteralCentroids) {
      val scored = corpus.crossJoin(broadcast(centNamed))
        .withColumn("__sim", cosine(col(vecCol), col("__centroid")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
      scored.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
        .drop("__rk", "__sim", "__centroid")
    } else {
      val cRows = centNamed.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      if (cRows.length == 1) corpus.withColumn("centroid_id", lit(cRows.head._1))
      else {
        // max of (sim, -centroid_id) structs = best sim, ties to the SMALLEST id
        val best = greatest(cRows.map { case (cid, vec) =>
          struct(cosine(col(vecCol), typedlit(vec)).as("s"), lit(-cid).as("negc"))
        }: _*)
        corpus.withColumn("centroid_id", -best.getField("negc"))
      }
    }
  }

  private def typedlit(v: Seq[Float]): Column = {
    import org.apache.spark.sql.functions.{typedLit => tl}
    tl(v)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      queryIdCol: String, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nCentroids).cache()
    val assigned = assign(corpus, cents, idCol, vecCol)

    // per query: nProbe closest centroids
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    val qProbes = q.crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("__qv"), col("__centroid")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("centroid_id").asc)))
      .where(col("__rk") <= nProbe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))

    val scored = assigned.join(qProbes, Seq("centroid_id"))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"), col("rank"))
  }
}
