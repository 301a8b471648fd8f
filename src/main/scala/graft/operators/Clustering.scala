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
    * re-deriving the assignment.
    *
    * Each round MATERIALIZES the K·d centroid state on the driver
    * (collect of k rows — explicitly driver-size, the same state the
    * broadcast ships anyway) and re-injects it as a local relation for
    * the next round. Leaving the rounds chained lazily instead makes
    * round i's broadcast re-execute rounds 1..i−1's whole subplan — an
    * O(iters²) cascade of tiny jobs whose scheduling latency, not
    * compute, dominated the entry's wall clock and made it swing 6×
    * between identical runs. Materialized, each round is exactly one
    * aggregation job over the (cached) corpus plus a trivial local
    * broadcast. The collect is EXACT: `stableAvg` doubles round-trip
    * bit-identically through InternalRow, so the unrolled-CTE oracle
    * grades unchanged. */
  def kMeansCentroids(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be at least 1: $k")
    require(iters >= 1, s"iters must be at least 1: $iters")
    val spark = vectors.sparkSession
    import spark.implicits._
    // every round re-reads the corpus — cache it once (entry-scoped,
    // drained by the Verify/Bench harnesses)
    val vecs = graft.TransientCache.register(toDoubleVec(vectors))
    def local(cents: Seq[(Int, Seq[Double])]): DataFrame = cents.toDF("cid", "cv")
    // init: the k smallest vec_ids in id order — collect of a global
    // top-k (TakeOrdered), row order = the ordering, no RNG
    var cents: Seq[(Int, Seq[Double])] =
      vecs.orderBy(col("vec_id")).limit(k).select(col("v")).collect()
        .toSeq.map(_.getSeq[Double](0)).zipWithIndex.map(_.swap)
    for (_ <- 1 to iters) {
      val means = assign(vecs, local(cents))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(stableAvg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      // an emptied cluster keeps its previous centroid (the left-join
      // coalesce of the lazy formulation, as a map lookup)
      cents = cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) }
    }
    local(cents)
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
    val spark = slices.sparkSession
    // per-round materialization, exactly as [[kMeansCentroids]]: the
    // (groups × k × subDim) codebook is driver-size by contract (it is
    // what the per-round broadcast ships), so collecting it breaks the
    // lazy round-over-round chaining that re-executed every earlier
    // round inside each broadcast build
    val vecs = graft.TransientCache.register(
      slices.select(col("sub"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")))
    val subType = vecs.schema("sub").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub", subType),
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    def local(cents: Seq[(Any, Int, Seq[Double])]): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        cents.map { case (s, c, v) =>
          org.apache.spark.sql.Row(s, c, v) }.asJava, schema)
    }
    val w = Window.partitionBy(col("sub")).orderBy(col("vec_id"))
    var cents: Seq[(Any, Int, Seq[Double])] =
      vecs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("sub"), (col("rn") - 1).cast("int").as("cid"), col("v"))
        .collect().toSeq
        .map(r => (r.get(0), r.getInt(1), r.getSeq[Double](2)))
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
      val means = assignG(local(cents))
        .select(col("sub"), col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(stableAvg(col("x")).as("m"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
        .collect().map(r => (r.get(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      cents = cents.map { case (s, c, cv) =>
        (s, c, means.getOrElse((s, c), cv)) } // emptied cluster keeps its centroid
    }
    local(cents)
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
