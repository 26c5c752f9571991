package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * engine's custom-aggregation extension surface (SURVEY §2.7 maps the
  * reference's `event-fn` extension point to `Aggregator[IN, BUF, OUT]`).
  *
  * Bounded memory: at most `capacity` counters per partial aggregate,
  * merged associatively across partitions, so it runs map-side at any
  * scale. Guarantee: any item with true frequency > n / capacity survives
  * with count undercounted by at most n / capacity. Counts are
  * order-dependent approximations (like any MG sketch) — exactness is the
  * job of groupBy+count; this is the one-pass bounded-memory path.
  */
class HeavyHitters(capacity: Int, k: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] = {
    if (buf.contains(item)) buf.updated(item, buf(item) + 1L)
    else if (buf.size < capacity) buf.updated(item, 1L)
    else {
      // decrement-all step: drop zeroed counters
      val dec = buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      dec
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (item, c)) =>
      m.updated(item, m.getOrElse(item, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // standard mergeable-summaries reduction (Agarwal et al.): subtract
      // the (capacity+1)-th largest count from everything and keep the
      // positive remainder — never more than `capacity` survivors, and the
      // per-merge undercount is bounded by that pivot (subtracting the
      // capacity-th instead would slash genuinely heavy counts by the
      // weight of the heaviest evictee's PEERS, destroying the n/capacity
      // error bound across a merge tree)
      val sorted = sum.toSeq.sortBy { case (item, c) => (-c, item) }
      val cut = sorted(capacity)._2
      sorted.take(capacity)
        .map { case (item, c) => item -> (c - cut) }
        .filter(_._2 > 0L)
        .toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
}
