package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[Similarity.dd10SemanticDedup]] keep-rule semantics on a hand-built
  * corpus: identical vectors collapse to one survivor (the smallest id),
  * orthogonal vectors survive untouched, and the per-cell stats count
  * pairs vs removals distinctly (3 pairwise dups among 3 identical
  * vectors remove exactly 2 vectors).
  */
class SemanticDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("identical vectors collapse to the smallest id; orthogonal survive") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // seeds (vec_id < k): two orthogonal directions -> two cells.
    // vec 2, 3, 4 are the SAME direction as seed 0 (identical after
    // normalization: cos = 1); vec 5 is seed 1's direction; vec 6 is a
    // mix closer to seed 1 but far from everything (no dup pair).
    val e = Seq(
      (0L, "a", Array(1f, 0f, 0f, 0f)),
      (1L, "a", Array(0f, 1f, 0f, 0f)),
      (2L, "a", Array(2f, 0f, 0f, 0f)),
      (3L, "a", Array(3f, 0f, 0f, 0f)),
      (4L, "a", Array(0.5f, 0f, 0f, 0f)),
      (5L, "a", Array(0f, 4f, 0f, 0f)),
      (6L, "a", Array(0f, 3f, 3f, 0f))
    ).toDF("vec_id", "label", "embedding")
    // call the pipeline pieces directly on the tiny frame (k = 2 seeds)
    val assigned = Similarity.assignCells(e, 2)
    val cells = assigned.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(Seq(0L, 2L, 3L, 4L).forall(cells(_) == 0), cells.toString)
    assert(Seq(1L, 5L, 6L).forall(cells(_) == 1), cells.toString)

    val a = assigned.select($"cell", $"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = assigned.select($"cell", $"vec_id".as("vec_b"), $"embedding".as("eb"))
    import org.apache.spark.sql.functions._
    val tau = 0.99
    val pairs = a.join(b, "cell").filter($"vec_a" < $"vec_b")
      .select($"cell", $"vec_b", VectorOps.cosine($"ea", $"eb").as("cos"))
    val stats = pairs.groupBy($"cell").agg(
      sum(($"cos" >= tau).cast("long")).as("n_dup_pairs"),
      countDistinct(when($"cos" >= tau, $"vec_b")).as("n_removed"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // cell 0: {0,2,3,4} all colinear -> C(4,2)=6 dup pairs, removed =
    // {2,3,4} (everything but the smallest id)
    assert(stats(0) === ((6L, 3L)), stats.toString)
    // cell 1: {1,5} colinear (1 pair, removes 5); 6 is 45 degrees off ->
    // no pair reaches tau
    assert(stats(1) === ((1L, 1L)), stats.toString)
  }
}
