package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding post-processing for storage and ANN serving: unit-length
  * normalization and symmetric int8 quantization — the standard
  * shrink-before-index step (4× smaller vectors, cosine becomes a dot
  * product after normalization).
  *
  * Pure `Column => Column` higher-order-function compositions — codegen'd
  * map-side expressions, zero shuffle, and every arithmetic step is a
  * plain double op in a fixed order so a DuckDB oracle reproduces results
  * bit-exactly. */
object Embeddings {

  /** L2-normalize to unit length (double precision); NULL for zero-norm
    * vectors (guarded — ANSI mode would otherwise throw on the divide). */
  def l2Normalize(v: Column): Column = {
    val n = Similarity.l2Norm(v)
    when(n > 0, transform(v, x => x.cast("double") / n))
      .otherwise(lit(null).cast("array<double>"))
  }

  /** Per-vector max |x| — the symmetric-quantization scale reference. */
  def absMax(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization: q_i = floor(x_i / absMax · 127 + 0.5)
    * (round-half-up, deterministic in both engines — no banker's-rounding
    * ambiguity). An all-zero vector quantizes to zeros (guarded divide).
    *
    * Pass `amax` as a PROJECTED column (`select(absMax(v).as("amax"))`
    * upstream) on hot paths: higher-order-function lambdas get no
    * common-subexpression elimination, so an inline scale expression
    * would re-run the O(d) max once per element — O(d²) per vector. The
    * two references to `amax` here also keep CollapseProject from
    * inlining an expensive upstream projection back into the lambda. */
  def quantizeInt8(v: Column, amax: Column): Column =
    when(amax > 0,
      transform(v, x => floor(x.cast("double") / amax * 127 + 0.5).cast("int")))
      .otherwise(transform(v, _ => lit(0)))

  /** Convenience form computing the scale inline — fine for ad-hoc use;
    * see the two-arg overload for the projection note. */
  def quantizeInt8(v: Column): Column = quantizeInt8(v, absMax(v))
}
