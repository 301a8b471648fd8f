package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.Functions.stableAvg

/** Distributed PCA: the leading principal component of an embedding
  * column by covariance aggregation + fixed-iteration power method —
  * the dimensionality-reduction / drift-detection primitive of an
  * embedding pipeline.
  *
  * Scale shape: the only corpus-sized work is ONE pass that folds each
  * row's centered upper-triangle outer product into a dims²/2-cell
  * buffer inside a typed [[TriCovAggregator]] (partial aggregation per
  * partition, one elementwise merge per partition boundary — the same
  * contract as a grouped sum, never an all-pairs join; the lower
  * triangle is mirrored from the symmetric result). Earlier
  * formulations were measured and rejected: nested higher-order
  * `transform` products ran interpreted per element, and even a fully
  * codegen explode-into-hash-agg paid ~1 μs/product in UnsafeRow +
  * hash-probe + Decimal-wrapper overhead (5–6 s at sf0.1's 4.2M
  * products vs well under a second for the fold). The aggregated
  * matrix is DIMENSION-bounded — 64² cells whatever the corpus — so it
  * is collected (with the corpus count riding the same buffer — no
  * separate count pass) and the power rounds run on the driver as
  * dims²-sized exact-decimal arithmetic (see below). The corpus itself
  * never reaches the driver.
  *
  * Determinism: means and covariance accumulate through the
  * decimal-stable sum (partition-order independent) and double
  * arithmetic elsewhere is IEEE-pinned, so every step is replayable
  * bit-for-bit by an unrolled SQL oracle, the PageRank/k-means
  * technique. The power rounds replicate the engines' shared decimal
  * arithmetic EXACTLY on the driver: each term is the IEEE product
  * cast to decimal(38,10) by shortest-repr string (Spark's
  * double→decimal cast is `BigDecimal(Double.toString(v))` scaled
  * HALF_UP; the DuckDB mirror is `CAST(CAST(v AS VARCHAR) AS
  * DECIMAL(38,10))` — the same shortest-repr route), summed with exact
  * decimal addition (associative and commutative, so driver order ≡
  * any engine's partition order), and only then read back as a double
  * — bit-identical to the previous per-round Spark jobs, measured ~4 s
  * faster at 64 dims × 8 rounds (job-per-round overhead dominated; the
  * work is dims²). The power method's sign is fixed by the positive
  * start; with a dominant eigenvalue the iterate is unique, and either
  * way both engines run the identical arithmetic.
  */
object Pca {

  /** EXACTLY Spark's `cast(x AS decimal(38,10))` of a finite double —
    * and therefore also DuckDB's via-VARCHAR mirror (`decSum`):
    * shortest-repr string, then scale 10 HALF_UP. */
  private[operators] def dec10(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(10, java.math.RoundingMode.HALF_UP)

  /** Partial-aggregation buffer: corpus count + one exact decimal per
    * upper-triangle cell (row-major (i, j), i ≤ j). Kryo-encoded —
    * crosses the wire only at partition merges, dims²/2 cells each. */
  private[operators] case class TriBuf(var n: Long,
                                       cells: Array[java.math.BigDecimal])

  /** The covariance pass as a typed [[Aggregator]] (the extension
    * ladder's custom-aggregate rung): per input vector, center against
    * the broadcast-by-closure `means`, form each upper-triangle IEEE
    * product, and add its [[dec10]] image into the buffer cell. Exact
    * decimal addition makes the result independent of row order and
    * partitioning — bit-identical to grouped `stableSum` over exploded
    * products (and to the DuckDB `decSum` mirror), minus the
    * per-product row materialization. Cells travel to the driver as
    * plain decimal strings (exact). */
  private[operators] class TriCovAggregator(dims: Int, means: Array[Double])
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Double], TriBuf, (Long, Seq[String])] {
    private def size = dims * (dims + 1) / 2
    override def zero: TriBuf =
      TriBuf(0L, Array.fill(size)(java.math.BigDecimal.ZERO))
    override def reduce(b: TriBuf, x: Array[Double]): TriBuf = {
      // a NULL embedding contributes no products and no count — the
      // same rows the explode formulation (and the oracle's unnest
      // self-join) silently skip; a WRONG-LENGTH vector refuses loudly
      if (x == null) return b
      require(x.length == dims,
        s"expected $dims dimensions, vector carries ${x.length}")
      val c = new Array[Double](dims)
      var i = 0
      while (i < dims) { c(i) = x(i) - means(i); i += 1 }
      var p = 0
      i = 0
      while (i < dims) {
        val ci = c(i)
        var j = i
        while (j < dims) {
          b.cells(p) = b.cells(p).add(dec10(ci * c(j)))
          p += 1; j += 1
        }
        i += 1
      }
      b.n += 1
      b
    }
    override def merge(a: TriBuf, b: TriBuf): TriBuf = {
      var p = 0
      while (p < size) { a.cells(p) = a.cells(p).add(b.cells(p)); p += 1 }
      a.n += b.n
      a
    }
    override def finish(b: TriBuf): (Long, Seq[String]) =
      (b.n, b.cells.toIndexedSeq.map(_.toPlainString))
    override def bufferEncoder: org.apache.spark.sql.Encoder[TriBuf] =
      org.apache.spark.sql.Encoders.kryo[TriBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[(Long, Seq[String])] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]())
  }

  /** (pos, loading) of the leading principal component (1-based `pos`,
    * loadings rounded to `roundTo`) of the `embedding` array column
    * (any float/double element type; `dims` elements). */
  def leadingComponent(emb: DataFrame, dims: Int, iters: Int,
                       roundTo: Int = 6): DataFrame = {
    require(dims >= 2, "need at least 2 dimensions")
    require(iters >= 1, "iters must be at least 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val asDouble = graft.TransientCache.register(emb.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("x")))
    // dimension means: dims-bounded collect, embedded as a LITERAL
    // array so the centering map needs no broadcast-join against the
    // aggregated frame (which would re-run the means pass inside the
    // covariance job)
    val meansRows = asDouble
      .select(posexplode(col("x")).as(Seq("i", "v")))
      .groupBy(col("i")).agg(stableAvg(col("v")).as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    require(meansRows.length == dims,
      s"expected $dims dimensions, embeddings carry ${meansRows.length}")
    val meansArr = meansRows.map(_._2)
    // upper-triangle covariance cells in ONE typed aggregation: each
    // partition folds its rows into a dims²/2-cell exact-decimal buffer
    // (centering and the IEEE product inline — identical arithmetic to
    // a centering projection + per-product decimal cast), partials
    // merge by elementwise exact addition, and the single final row is
    // the dims-bounded collect. Semantically ≡ posexplode + grouped
    // `stableSum` per (i, j) — exact decimal addition is associative
    // and commutative, so the fold order cannot show — but the corpus
    // pass materializes NO per-product rows: an earlier
    // explode-into-hash-agg formulation paid ~1 μs/product in UnsafeRow
    // + hash-probe + Decimal-wrapper overhead (measured 5–6 s at sf0.1
    // = 4.2M products; this shape runs the same pass in well under a
    // second). The corpus count rides the same buffer — no separate
    // count() pass.
    val covAgg = udaf(new TriCovAggregator(dims, meansArr))
    val triRow = asDouble.agg(covAgg(col("x")).as("tri")).head().getStruct(0)
    val n = triRow.getLong(0)
    require(n > 1, "need at least 2 vectors for a sample covariance")
    val cells = triRow.getSeq[String](1)
    // same arithmetic as the in-plan `cast("double") / (n - 1)`: the
    // decimal sum reads back as a double, and / is one IEEE division
    val cov = Array.ofDim[Double](dims, dims)
    var p = 0
    for (i <- 0 until dims; j <- i until dims) {
      val cv = new java.math.BigDecimal(cells(p)).doubleValue / (n - 1)
      cov(i)(j) = cv; cov(j)(i) = cv
      p += 1
    }
    // power rounds on the driver, replicating the engines' decimal
    // arithmetic exactly (see the scaladoc): wv_i = Σ_j dec10(cv·v_j)
    // as double; norm = sqrt(Σ_i dec10(wv_i²) as double); v = wv/norm
    val start = 1.0 / math.sqrt(dims.toDouble)
    var v: Array[Double] = Array.fill(dims)(start)
    for (_ <- 1 to iters) {
      val wv = Array.tabulate(dims) { i =>
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dims) { acc = acc.add(dec10(cov(i)(j) * v(j))); j += 1 }
        acc.doubleValue
      }
      var nacc = java.math.BigDecimal.ZERO
      wv.foreach(w => nacc = nacc.add(dec10(w * w)))
      val norm = math.sqrt(nacc.doubleValue)
      v = wv.map(_ / norm)
    }
    v.toSeq.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "val")
      .select((col("i") + 1).cast("int").as("pos"),
        round(col("val"), roundTo).as("loading"))
  }
}
