package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join — the pattern behind Spark's own runtime
  * row-level filtering, exposed as an operator: when the build side is
  * selective but too large to broadcast as a hash set, a Bloom filter
  * over its keys cuts the probe side BEFORE the shuffle, and an exact
  * semi-join afterwards removes the false positives, so the output is
  * exactly `probe ⋉ build`.
  *
  * Scale shape: the filter is built DISTRIBUTED (`bloom_filter_agg`,
  * mergeable map-side partials — never a driver-side key collect); only
  * the finished bitmap (numBits/8 bytes, independent of build-side row
  * count) comes back to the driver and ships to executors as a literal
  * in the task closure. The probe scan then drops ~(1 − fpp) of its
  * non-matching rows map-side, so the exact semi-join shuffles only
  * survivors — at 100 TB the probe-side shuffle is the dominant cost
  * and the bloom cuts it by the key-selectivity factor. The residual
  * semi-join keeps the result exact whatever the fpp, so the filter is
  * purely an optimization, never a correctness knob.
  */
object BloomJoin {

  /** `probe ⋉ build` on `key` (column name present on BOTH sides),
    * bloom-pruned before the exact semi-join. `expectedItems` sizes the
    * filter for the build side's distinct key count; `fpp` is the
    * target false-positive rate at that size. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, key: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"invalid bloom sizing: items=$expectedItems fpp=$fpp")
    // xxhash64 is TYPE-sensitive: an int and a long with equal values
    // hash differently, so a width mismatch would make the bloom reject
    // true matches — and the residual semi-join can only remove false
    // positives, never recover false negatives. Refuse rather than
    // silently drop rows.
    val (pt, bt) = (probe.schema(key).dataType, build.schema(key).dataType)
    require(pt == bt,
      s"bloomSemiJoin key '$key' types differ (probe=$pt, build=$bt); cast one side first")
    // standard Bloom sizing: m = -n·ln(p) / (ln 2)²
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bf = build
      .agg(expr(s"bloom_filter_agg(xxhash64($key), " +
        s"CAST($expectedItems AS BIGINT), CAST($numBits AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]](0)
    // empty build side: the aggregate yields NULL — the join result is
    // empty, so prune everything without a pass over the probe
    if (bf == null) return probe.filter(lit(false))
    // no .distinct() on the build side: left-semi already emits each
    // probe row at most once whatever the build-side multiplicity, and
    // a distinct would cost a full extra shuffle of the build side
    probe
      .filter(call_function("might_contain", lit(bf), xxhash64(col(key))))
      .join(build.select(col(key)), Seq(key), "left_semi")
  }

  /** `probe ▷ build` (anti join) on `key`, bloom-accelerated — the
    * INGEST DEDUP GATE: which incoming rows are definitely new vs
    * possibly already stored. The asymmetry with [[bloomSemiJoin]] is
    * what makes this the scale win for dedup-at-ingest: a Bloom "no" is
    * EXACT (no false negatives), so every definitely-new row passes the
    * gate map-side with ZERO shuffle, and only the "maybe" rows — the
    * true duplicates plus an fpp-sized sliver of false positives — pay
    * the exact anti-join against the stored side. At 100 TB with a
    * mostly-novel incoming batch, that turns a full batch×store shuffle
    * into a shuffle of ~(dup rate + fpp) of the batch. Result is
    * exactly `probe anti-join build` whatever the fpp. */
  def bloomAntiJoin(probe: DataFrame, build: DataFrame, key: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"invalid bloom sizing: items=$expectedItems fpp=$fpp")
    val (pt, bt) = (probe.schema(key).dataType, build.schema(key).dataType)
    require(pt == bt,
      s"bloomAntiJoin key '$key' types differ (probe=$pt, build=$bt); cast one side first")
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bf = build
      .agg(expr(s"bloom_filter_agg(xxhash64($key), " +
        s"CAST($expectedItems AS BIGINT), CAST($numBits AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]](0)
    // empty store: everything is new
    if (bf == null) return probe
    val hit = call_function("might_contain", lit(bf), xxhash64(col(key)))
    // a null key never matches an equi-join, so it is definitely new;
    // might_contain(null-hash) would return null and drop the row from
    // BOTH branches — route nulls through the definite-new side
    val definitelyNew = probe.filter(col(key).isNull || !hit)
    val maybeDup = probe.filter(col(key).isNotNull && hit)
      .join(build.select(col(key)), Seq(key), "left_anti")
    definitelyNew.unionByName(maybeDup)
  }
}
