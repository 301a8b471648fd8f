package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded top-k per group by `(sortVal DESC, tieId ASC)`.
  *
  * The ranking-window formulation of group-wise top-k
  * (`row_number().over(partitionBy(key).orderBy(...))`) shuffles EVERY
  * row of the group and sorts whole partitions before discarding all but
  * k rows. This aggregator keeps at most k items per group in the
  * partial (map-side) buffers, so the shuffle carries
  * `k × partitions` items per key instead of the full group — the
  * difference between moving 100 TB and moving megabytes when k is
  * small and groups are large.
  *
  * Items are `(sortVal, tieId, payload)`; the buffer is a sorted vector
  * (k is small, insertion beats heap constant-factors). Deterministic:
  * total order via the unique tie id.
  */
case class TopKAggregator(k: Int)
  extends Aggregator[(Double, Long, String), Seq[(Double, Long, String)], Seq[(Double, Long, String)]] {

  private def better(a: (Double, Long, String), b: (Double, Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long, String)],
                     x: (Double, Long, String)): Seq[(Double, Long, String)] = {
    if (buf.length >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.length
        case n => n
      }
      ((buf.take(i) :+ x) ++ buf.drop(i)).take(k)
    }
  }

  override def zero: Seq[(Double, Long, String)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long, String)],
                      x: (Double, Long, String)): Seq[(Double, Long, String)] =
    insert(buf, x)

  override def merge(a: Seq[(Double, Long, String)],
                     b: Seq[(Double, Long, String)]): Seq[(Double, Long, String)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long, String)]): Seq[(Double, Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, String)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, String)]] = bufferEncoder
}
