package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Randomized invariants for [[Dedup.spanDedup]] — properties an
  * independent reference implementation must also satisfy, checked on
  * seeded random corpora (small vocabulary so cross-doc span collisions
  * actually occur):
  *
  *  1. kept + dropped = the doc's chunk count; kept text is the in-order
  *     concatenation of a SUBSET of the doc's chunks;
  *  2. the multiset of surviving spans corpus-wide = the DISTINCT spans of
  *     the input (lossless at span granularity, each exactly once);
  *  3. the survivor of each span is its minimal (doc_id, chunk) occurrence.
  */
class SpanDedupPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def chunksOf(text: String, w: Int): Vector[String] =
    text.split(" ").grouped(w).map(_.mkString(" ")).toVector

  test("span-dedup invariants hold on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val w = 1 + rnd.nextInt(3) // 1..3 word spans
      val docs = (0L until 40L).map { id =>
        val n = 1 + rnd.nextInt(12)
        (id, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val ref = docs.map { case (id, t) => id -> chunksOf(t, w) }.toMap
      val out = Dedup.spanDedup(docs.toDF("doc_id", "text"), w)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(out.keySet == ref.keySet, s"trial $trial: every doc must survive")
      // invariant 3 reference: first occurrence of each distinct span
      val firstOf = docs.flatMap { case (id, t) =>
        chunksOf(t, w).zipWithIndex.map { case (c, i) => (c, id, i) } }
        .groupBy(_._1).map { case (c, occ) => c -> occ.minBy(o => (o._2, o._3)) }
      for ((id, (_, newText, kept, dropped)) <- out) {
        val chunks = ref(id)
        assert(kept + dropped == chunks.size, s"trial $trial doc $id counts")
        val keptChunks = chunks.zipWithIndex
          .filter { case (c, i) => firstOf(c) == ((c, id, i)) }
        assert(newText == keptChunks.map(_._1).mkString(" "),
          s"trial $trial doc $id text")
        assert(kept == keptChunks.size, s"trial $trial doc $id kept")
      }
      // invariant 2: surviving spans == distinct input spans, once each
      val survivors = out.values.toVector.flatMap(r =>
        if (r._2.isEmpty) Vector.empty else chunksOf(r._2, w))
      assert(survivors.sorted == survivors.distinct.sorted &&
        survivors.toSet == docs.flatMap(d => chunksOf(d._2, w)).toSet,
        s"trial $trial: survivors must be the distinct spans, once each")
    }
  }

}
