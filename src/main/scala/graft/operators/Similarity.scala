package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The scalar kernel ([[cosine]]) is a codegen-friendly fold over
  * `zip_with` products accumulated in double — no UDFs, so it runs
  * inside whole-stage codegen and is portable across engines (each
  * float is widened to double before multiply, left-to-right sum).
  *
  *  - [[knnBrute]] is the exact baseline: broadcast the (small) query
  *    set against the corpus — one pass, no shuffle of the big side;
  *    per-query top-k via ranking window. Correct at any scale where
  *    the query set fits in a broadcast.
  *  - [[ivfAssign]]/[[ivfSearch]] is the scale path (IVF — inverted
  *    file index): vectors are bucketed by nearest centroid once;
  *    queries probe only `nProbe` nearest buckets, cutting the scanned
  *    fraction to ~nProbe/K. At 100 TB the assignment is a broadcast
  *    join + one shuffle on centroid_id, and searches touch only the
  *    probed buckets (partition pruning on centroid_id when the index
  *    is stored partitioned by it).
  */
object Similarity {

  /** Double-precision dot product of two float vectors (left-to-right
    * accumulation — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Composable (built-ins only) cosine — the reference formulation the
    * native kernel is verified against. */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Fused native kernel ([[graft.expr.CosineSimilarity]]): one pass, no
    * intermediate array, bit-identical to [[cosineComposed]]. Requires
    * [[graft.expr.NativeFunctions.register]] / GraftExtensions on the
    * session (GraftSession does both). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Exact brute-force top-k neighbors for each query vector (the
    * correctness oracle for any ANN variant). Self-matches excluded. */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** IVF bucket assignment: nearest centroid per vector (cosine).
    * `centroids` is small (O(√N) in practice) and broadcast. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"), col("embedding").as("centv"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id"))
    corpus.crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("embedding"), col("centv")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** ANN search: probe the `nProbe` centroids nearest to each query and
    * rank only vectors assigned to those buckets. */
  def ivfSearch(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
                k: Int = 3, nProbe: Int = 2): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"), col("embedding").as("centv"))
    val probeW = Window.partitionBy("query_id").orderBy(col("pcos").desc, col("centroid_id"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(c))
      .withColumn("pcos", cosine(col("qv"), col("centv")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("centroid_id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-dup pairs within a blocking key (`label`
    * here; at scale: an LSH bucket or coarse IVF cell), threshold
    * inclusive. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("label"), col("vec_id").as("vec_i"), col("embedding").as("va"))
    val b = corpus.select(col("label"), col("vec_id").as("vec_j"), col("embedding").as("vb"))
    a.join(b, Seq("label")).filter(col("vec_i") < col("vec_j"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_i"), col("vec_j"), round(col("cos"), 6).as("cos"))
  }
}
