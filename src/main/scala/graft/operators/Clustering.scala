package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.Functions.stableAvg

/** Deterministic Lloyd k-means over an embedding column — the training
  * half of vector curation: IVF index centroids are learned this way,
  * and SemDeDup-style semantic dedup prunes near-duplicates inside the
  * learned clusters instead of over all corpus pairs.
  *
  * Every step is engine-reproducible, so an SQL oracle can replay the
  * whole iteration unrolled (the same contract as
  * [[Graph.pageRank]]'s unrolled-CTE mirror):
  *
  *  - init: the `k` vectors with the smallest ids, in id order — no RNG;
  *  - distance: d²(a,b) = a·a − 2(a·b) + b·b composed from the one
  *    trusted sequential-fold primitive ([[Similarity.dot]]), identical
  *    IEEE op order on both engines;
  *  - assignment: argmin over (d², centroid id) — total order, ties to
  *    the smaller centroid;
  *  - update: per-dimension decimal-stable mean
  *    ([[graft.expr.Functions.stableAvg]]), so the new centroid doubles
  *    are bit-identical regardless of partition-level sum order; an
  *    emptied cluster keeps its previous centroid.
  *
  * Scale shape (the MLlib layout, minus its RNG): centroids are K·d
  * driver-size state broadcast as ONE collapsed array row (the
  * [[Similarity.ivfAssign]] pattern), so assignment is a zero-shuffle
  * map pass over the corpus; the update is one posexplode +
  * (cluster, dim) exchange per iteration. Nothing is ever all-pairs and
  * no corpus-sized state lands on the driver.
  */
object Clustering {

  /** Squared Euclidean distance composed from [[Similarity.dot]]:
    * `(a·a − 2(a·b)) + b·b` — fixed association, engine-exact. */
  def sqDist(a: Column, b: Column): Column =
    Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) + Similarity.dot(b, b)

  private def centroidArray(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(col("cid"), col("cv"))).as("cs"))

  /** Nearest-centroid assignment against the broadcast centroid array:
    * map-side argmin via `array_min` over (d², cid) structs — zero
    * shuffles, no N×K window. Input must carry (vec_id, v: array<double>);
    * output appends (cid, d2). */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroidArray(cents)))
      .withColumn("best", array_min(transform(col("cs"), c =>
        struct(sqDist(col("v"), c.getField("cv")).as("d2"),
          c.getField("cid").as("cid")))))
      .select(col("vec_id"), col("v"),
        col("best.cid").as("cid"), col("best.d2").as("d2"))

  private def toDoubleVec(vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Fixed-iteration Lloyd assignment: (vec_id, v, cid, d2) after
    * `iters` rounds, d² against the FINAL centroids. */
  def kMeansAssign(vectors: DataFrame, k: Int, iters: Int): DataFrame =
    assign(toDoubleVec(vectors), kMeansCentroids(vectors, k, iters))

  /** Nearest-centroid assignment of `vectors` against an EXISTING
    * codebook (cid, cv) — the serving-path half of [[kMeansAssign]],
    * for consumers that already hold the trained centroids (PQ
    * encoding, IVF routing). Zero-shuffle broadcast pass. */
  def assignToCentroids(vectors: DataFrame, cents: DataFrame): DataFrame =
    assign(toDoubleVec(vectors), cents)

  /** The FINAL learned centroids (cid, cv) of the same fixed-iteration
    * Lloyd loop — the codebook consumers (PQ ADC lookup tables, IVF
    * routing) read, separated out so they can reuse it without
    * re-deriving the assignment. */
  def kMeansCentroids(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be at least 1: $k")
    require(iters >= 1, s"iters must be at least 1: $iters")
    val vecs = toDoubleVec(vectors)
    var cents = vecs.orderBy(col("vec_id")).limit(k)
      // k-row frame: the un-partitioned window is a deliberate
      // single-task pass over driver-size state
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val means = assign(vecs, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(stableAvg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
    }
    cents
  }

  /** GROUPED Lloyd training: one fixed-iteration loop learns an
    * independent k-centroid codebook per `sub` group — the product-
    * quantization shape, where 8 subspace codebooks trained one loop at
    * a time would cost 8× the corpus passes this needs. Input carries
    * (sub, vec_id, embedding); output (sub, cid, cv). Every rule is the
    * per-group twin of [[kMeansCentroids]] — id-ordered init (smallest k
    * vec_ids per group), (d², cid) argmin, decimal-stable means,
    * emptied cluster keeps its centroid — so each group's codebook is
    * EXACTLY what the single-group trainer would produce, and the
    * per-subspace unrolled-CTE oracles grade it unchanged. Scale shape:
    * per iteration one broadcast of the (groups × k × subDim) codebook
    * array, one map-side assignment pass, one (sub, cid, dim) exchange. */
  def kMeansCentroidsGrouped(slices: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be at least 1: $k")
    require(iters >= 1, s"iters must be at least 1: $iters")
    val vecs = slices.select(col("sub"), col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val w = Window.partitionBy(col("sub")).orderBy(col("vec_id"))
    var cents = vecs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("sub"), (col("rn") - 1).cast("int").as("cid"), col("v").as("cv"))
    def assignG(cs: DataFrame) = {
      val ca = cs.groupBy(col("sub"))
        .agg(collect_list(struct(col("cid"), col("cv"))).as("cs"))
      vecs.join(broadcast(ca), Seq("sub"))
        .withColumn("best", array_min(transform(col("cs"), c =>
          struct(sqDist(col("v"), c.getField("cv")).as("d2"),
            c.getField("cid").as("cid")))))
        .select(col("sub"), col("vec_id"), col("v"), col("best.cid").as("cid"))
    }
    for (_ <- 1 to iters) {
      val means = assignG(cents)
        .select(col("sub"), col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(stableAvg(col("x")).as("m"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
      cents = cents.join(means, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
    }
    cents
  }

  /** SemDeDup-style semantic dedup: learn `k` clusters, then mark as
    * duplicate every vector whose cosine to ANY smaller-id member of
    * its own cluster reaches `threshold` (greedy keep-first — one
    * deterministic pass, the standard SemDeDup tie-break). The cluster
    * blocking bounds the pair space to Σ|cluster|² instead of corpus²
    * — the reason SemDeDup scales where [[Similarity.cosineDupPairs]]
    * needs a pre-existing blocking key. Output: (vec_id, cluster,
    * is_dup). */
  def semDedup(vectors: DataFrame, k: Int, iters: Int,
               threshold: Double): DataFrame = {
    // both pair sides and the final join replay the assignment —
    // entry-scoped persist, drained by the Verify/Bench harnesses
    val asg = graft.TransientCache.register(kMeansAssign(vectors, k, iters))
    val dups = asg.select(col("cid"), col("vec_id").as("vec_j"), col("v").as("vb"))
      .join(asg.select(col("cid"), col("vec_id").as("vec_i"), col("v").as("va")),
        Seq("cid"))
      .filter(col("vec_i") < col("vec_j"))
      // composed form, not the native kernel: the assignment frame
      // carries array<double>, the fused kernel takes array<float> —
      // the two are documented bit-identical ([[Similarity.cosine]])
      .filter(Similarity.cosineComposed(col("va"), col("vb")) >= threshold)
      .select(col("vec_j").as("vec_id")).distinct()
    asg.join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").as("cluster"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
  }
}
