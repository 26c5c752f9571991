package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[Similarity.pqEncode]] semantics on hand-built vectors: a subvector
  * identical to a codeword encodes as that code, the nearest codeword wins
  * otherwise, exact L2 ties break to the SMALLEST code, and the codes
  * column is M small ints — the 8-bytes-per-vector representation the
  * 100 TB memory story rests on.
  */
class PqAdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("argmin encoding, tie-to-smallest-code, M codes per vector") {
    import spark.implicits._
    // dim 4, M = 2 subspaces of 2 dims, K = 2 codewords from vec_id < 2:
    //   code 0 subvectors: [1,0] and [0,1]
    //   code 1 subvectors: [5,0] and [0,5]
    val e = Seq(
      (0L, "s", Array(1f, 0f, 0f, 1f)),
      (1L, "s", Array(5f, 0f, 0f, 5f)),
      // near code 1 in subspace 0, near code 0 in subspace 1
      (2L, "x", Array(4f, 0f, 0f, 2f)),
      // EQUIDISTANT in subspace 0 (3 is 2 from both 1 and 5): tie -> code 0
      (3L, "x", Array(3f, 0f, 0f, 4.9f))
    ).toDF("vec_id", "label", "embedding")
    val cb = Similarity.pqCodebookRow(e, 2, 2, 2)
    val codes = Similarity.pqEncode(e, cb, 2, 2, 2)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) === Seq(0, 0)) // a seed encodes as itself
    assert(codes(1L) === Seq(1, 1))
    assert(codes(2L) === Seq(1, 0))
    assert(codes(3L) === Seq(0, 1)) // tie in subspace 0 -> smaller code
    // the representation is M ints — what gets persisted at scale
    assert(codes.values.forall(_.length == 2))
  }

  test("codes stay in [0, K) and seeds self-encode on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 8; val m = 2; val sub = 4; val k = 4
    val e = (0L until 64L).map { id =>
      (id, "x", Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "label", "embedding")
    val cb = Similarity.pqCodebookRow(e, m, sub, k)
    val codes = Similarity.pqEncode(e, cb, m, sub, k)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 64)
    assert(codes.values.forall(cs => cs.length == m && cs.forall(c => c >= 0 && c < k)))
    // a seed's subvectors are exactly distance 0 from their own codewords
    for (id <- 0L until k.toLong) assert(codes(id) == Seq.fill(m)(id.toInt),
      s"seed $id must self-encode: ${codes(id)}")
  }
}
