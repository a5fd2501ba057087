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

  /** Cosine similarity of two numeric arrays, computed in double with a sequential
    * fold (bit-compatible with DuckDB's list_dot_product composition over DOUBLE[]).
    * Native codegen'd kernel — the HOF formulation it replaces paid ~400 interpreted
    * lambda calls per pair (see [[graft.functions.VectorKernels]]).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.vecfns.cosineSim(a, b)

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
    * EAGER at plan time: runs exactly ONE `collect()` on `cents` (capped at
    * `maxLiteralCentroids + 1` rows) to decide the path and harvest the literal
    * vectors — pass a materialized/local centroid frame (as [[ivfTopK]] does) so the
    * centroid lineage is not recomputed.
    *
    * Up to `maxLiteralCentroids` centroids, assignment is a MAP-ONLY argmax over
    * literal vectors: no crossJoin row explosion, no shuffle-by-id window — at 10^12
    * corpus rows the difference between a scan and a shuffle. Beyond that, one
    * literal cosine per centroid would blow Janino's method-size limits, so large
    * centroid sets fall back to broadcast-crossJoin + per-id window. Both paths
    * accept any numeric array element type (float/double/int) for the centroid
    * vector, like [[cosine]] itself.
    */
  def assign(corpus: DataFrame, cents: DataFrame, idCol: String, vecCol: String,
      maxLiteralCentroids: Int = 128): DataFrame = {
    val centNamed = cents.select(col("centroid_id"), col("__centroid"))
    val cRowsCapped = centNamed.limit(maxLiteralCentroids + 1).collect()
    require(cRowsCapped.nonEmpty, "no centroids")
    if (cRowsCapped.length > maxLiteralCentroids) {
      val scored = corpus.crossJoin(broadcast(centNamed))
        .withColumn("__sim", cosine(col(vecCol), col("__centroid")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
      scored.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
        .drop("__rk", "__sim", "__centroid")
    } else {
      // read the vector generically: float→double is exact, so the literal path is
      // bit-identical to the crossJoin path (cosine casts to double either way)
      val cRows = cRowsCapped.map(r =>
        (r.getLong(0), r.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue())))
      if (cRows.length == 1) corpus.withColumn("centroid_id", lit(cRows.head._1))
      else
        // r7: one kernel call per row against a shared centroid bank instead of
        // `greatest` over nCentroids inlined struct(cosine) expressions — the
        // generated code is O(1) in nCentroids (the old tree grew linearly and
        // dominated compile time at 128 centroids); winner selection reproduces
        // the greatest-of-structs semantics bit-for-bit (max cosine, NaN
        // largest, null cosines lose, ties → smallest id).
        corpus.withColumn("centroid_id",
          graft.functions.vecfns.argMaxCosine(col(vecCol),
            cRows.map(_._1).toSeq, cRows.map(_._2).toSeq))
    }
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      queryIdCol: String, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    // materialize the (tiny by contract) centroid table ONCE into a local relation:
    // no cache to leak in a long-lived session, no corpus re-scan when both assign()
    // and the probe join consume it
    val centsDf = centroids(corpus, idCol, vecCol, nCentroids)
    val cents = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(centsDf.collect(): _*), centsDf.schema)
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
