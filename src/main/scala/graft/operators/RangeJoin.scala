package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to every interval containing
  * them — without the O(|P|·|I|) nested-loop Spark plans for a bare
  * inequality join.
  *
  * The classic bucketing scheme: the numeric domain is cut into
  * fixed-width buckets; each point lands in exactly one bucket, each
  * interval is exploded to every bucket it overlaps, and the join becomes
  * a hash equi-join on the bucket id with the exact containment predicate
  * evaluated inside each bucket. Shuffle keys are bucket ids, so cost is
  * O(|P| + Σ spans/width + matches); each (point, interval) match is
  * produced exactly once (from the point's unique bucket). Pick
  * `bucketWidth` near the median interval span: too small explodes the
  * interval side, too large degrades to few giant buckets.
  */
object RangeJoin {

  /** Join `points` (numeric `pointCol`) to `intervals` (numeric
    * `startCol`/`endCol`, inclusive bounds). Emits all columns of both
    * inputs for every containment match. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
