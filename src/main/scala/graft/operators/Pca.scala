package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.Functions.{stableAvg, stableSum}

/** Distributed PCA: the leading principal component of an embedding
  * column by covariance aggregation + fixed-iteration power method —
  * the dimensionality-reduction / drift-detection primitive of an
  * embedding pipeline.
  *
  * Scale shape: the only corpus-sized work is ONE map-side pass that
  * emits each row's centered upper-triangle outer product into a
  * dims²/2-cell aggregation (partial aggregation shrinks every task's
  * contribution to ≤ dims²/2 cells, the same contract as a grouped
  * sum — never an all-pairs join; the lower triangle is mirrored from
  * the symmetric result). The aggregated matrix is DIMENSION-bounded —
  * 64² cells whatever the corpus — so it is collected (with the corpus
  * count riding the same aggregation — no separate count pass) and the
  * power rounds run as constant-size literal-frame plans: the classic
  * small-dims PCA split (distribute the Gram pass, iterate on the
  * matrix). The corpus itself never reaches the driver.
  *
  * Determinism: means, covariance, matvec sums, and the norm all
  * accumulate through the decimal-stable sum (partition-order
  * independent), double arithmetic elsewhere is IEEE-pinned, and the
  * uniform start vector is an interpolated literal — so every round is
  * replayable bit-for-bit by an unrolled SQL oracle, the
  * PageRank/k-means technique. The matvec and norm run as Spark
  * expressions over the literal frames (same cast/sum path as the
  * distributed pass), and the per-round norm is a window aggregate
  * OVER the whole dims-row frame, exactly the shape the oracle uses.
  * The power method's sign is fixed by the positive start; with a
  * dominant eigenvalue the iterate is unique, and either way both
  * engines run the identical arithmetic.
  */
object Pca {

  /** (pos, loading) of the leading principal component (1-based `pos`,
    * loadings rounded to `roundTo`) of the `embedding` array column
    * (any float/double element type; `dims` elements). */
  def leadingComponent(emb: DataFrame, dims: Int, iters: Int,
                       roundTo: Int = 6): DataFrame = {
    require(dims >= 2, "need at least 2 dimensions")
    require(iters >= 1, "iters must be at least 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val asDouble = emb.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("x"))
    val means = asDouble
      .select(posexplode(col("x")).as(Seq("i", "v")))
      .groupBy(col("i")).agg(stableAvg(col("v")).as("m"))
    // means as ONE broadcast array row (ordered by dimension), so
    // centering is a zero-shuffle map over the vectors
    val meansArr = means.agg(
      transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("ms"))
    val idx = sequence(lit(0), lit(dims - 1))
    val centered = asDouble.crossJoin(broadcast(meansArr))
      .select(transform(col("x"), (v, i) =>
        v - element_at(col("ms"), i + 1)).as("c"))
    // flat upper-triangle products (pos enumerates (i, j), i ≤ j, in
    // row-major order — a plain double array, cheaper to generate than
    // dims²/2 structs per row); ONE aggregation, then the dims-bounded
    // collect
    // the corpus count rides the same aggregation (every row emits
    // exactly one product per pos, so any cell's count IS n) — no
    // separate count() pass over the corpus
    val triRows = centered
      .select(posexplode(flatten(transform(idx, i =>
        transform(sequence(i, lit(dims - 1)), j =>
          element_at(col("c"), i + 1) * element_at(col("c"), j + 1)))))
        .as(Seq("pos", "p")))
      .groupBy(col("pos"))
      .agg(stableSum(col("p")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect()
    val n = if (triRows.isEmpty) 0L else triRows.head.getLong(2)
    require(n > 1, "need at least 2 vectors for a sample covariance")
    val pairs = (for (i <- 0 until dims; j <- i until dims) yield (i, j)).toIndexedSeq
    // same arithmetic as the in-plan `cast("double") / (n - 1)`: the
    // decimal sum is already a double here, and / is one IEEE division
    val tri = triRows.map { r =>
      val (i, j) = pairs(r.getInt(0)); (i, j, r.getDouble(1) / (n - 1))
    }.toSeq
    val cellsLit = (tri ++ tri.collect { case (i, j, cv) if i != j => (j, i, cv) })
      .toDF("i", "j", "cv")
    // power rounds on literal frames: one matvec + windowed norm plan,
    // one dims-row collect per round. (Measured alternative: chaining
    // all rounds into one job via nested broadcast joins is ~25%
    // SLOWER at 64 dims — the per-round analysis/codegen of a deep
    // plan costs more than the per-job overhead it saves.)
    val byAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val start = 1.0 / math.sqrt(dims.toDouble)
    var v: Seq[(Int, Double)] = (0 until dims).map(i => (i, start))
    for (_ <- 1 to iters) {
      v = cellsLit.join(broadcast(v.toDF("j", "vj")), "j")
        .groupBy(col("i"))
        .agg(stableSum(col("cv") * col("vj")).cast("double").as("wv"))
        .select(col("i"), (col("wv") /
          sqrt(sum((col("wv") * col("wv")).cast("decimal(38,10)")).over(byAll)
            .cast("double"))).as("val"))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq.sortBy(_._1)
    }
    v.toDF("i", "val")
      .select((col("i") + 1).cast("int").as("pos"),
        round(col("val"), roundTo).as("loading"))
  }
}
