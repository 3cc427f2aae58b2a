package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: brute-force cosine is the exact baseline — a broadcast of
  * the (small) query set against a linear scan of the corpus, no shuffle
  * until the per-query top-k (tiny). The IVF variant prunes the scan to the
  * nearest centroid's cluster: centroid build is one groupBy, probe is a
  * broadcast join on cluster id — the 100 TB path (scan cost / nlist).
  * All vector math is double-accumulated `zip_with`+`aggregate` — codegen'd
  * builtin higher-order functions, no UDF.
  */
object Similarity {

  /** Elementwise-double dot product, sequential accumulation (portable
    * builtin form; the hot paths below use the fused native expression).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — fused single-loop native Catalyst expression
    * ([[graft.functions.CosineSimilarity]], whole-stage codegen), bit-equal
    * to the builtin dot/norm chain (same double accumulation order).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Exact brute-force top-k neighbors for each query vector.
    * Queries (small) are broadcast against the corpus; rank is deterministic:
    * rounded similarity desc, then neighbor id. Norms are precomputed once
    * per side (not per pair), so the per-pair work is a single dot product;
    * Spark's WindowGroupLimit pushes the top-k below the shuffle.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("c_vec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** All pairs above a cosine threshold within a bounded id range —
    * blocked self-join (upper-triangle), exact, fused native cosine.
    */
  def thresholdPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** IVF-style ANN: centroids per cluster (elementwise mean via posexplode —
    * one shuffle keyed by (cluster, position)), queries probe their nearest
    * `nprobe` centroids, search restricted to those clusters' members.
    */
  def centroids(df: DataFrame, clusterCol: String, vecCol: String)
  : DataFrame = {
    val pos = df.select(col(clusterCol).as("cluster"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    pos.groupBy(col("cluster"), col("pos"))
      .agg(avg(col("v")).as("mv"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mv"))))
        .as("pairs"))
      .select(col("cluster"),
        expr("transform(pairs, p -> p.mv)").as("centroid"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, clusterCol: String, k: Int, nprobe: Int = 1)
  : DataFrame = {
    val cents = centroids(corpus, clusterCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"))
    // assign each query to its nprobe nearest centroids (broadcast: nlist
    // rows × few queries)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cluster"))
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("cdist", round(cosine(col("q_vec"), col("centroid")), 6))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("cluster"))
    // probe only the selected clusters
    val c = corpus.select(col(clusterCol).as("cluster"),
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(assigned), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("c_vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"),
        col("cluster"))
  }
}
