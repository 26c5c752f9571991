package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** dd12's deletion-neighborhood fuzzy join against crafted edge cases and
  * a brute-force levenshtein twin. The DuckDB oracle checks it on the
  * part corpus; this spec checks the CASES the corpus may not contain —
  * every single-edit kind, duplicate groups, and distance-2 negatives.
  */
class FuzzyJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.fuzzyKeyNeighbors(rows.toDF("p_partkey", "p_name"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  /** Quadratic ground truth: neighbor = other key with levenshtein <= 1. */
  private def brute(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("k", "n")
    df.as("a").join(df.as("b"),
        col("a.k") =!= col("b.k") &&
          levenshtein(col("a.n"), col("b.n")) <= 1)
      .groupBy(col("a.k"))
      .agg(count(lit(1)).as("c"), min(col("b.k")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("every single-edit kind matches; distance-2 does not") {
    val rows = Seq(
      1L -> "spring green",   // base
      2L -> "sprint green",   // substitution (same position deletion)
      3L -> "spring greens",  // insertion at end
      4L -> "sprin green",    // deletion mid-word
      5L -> "xspring green",  // insertion at front
      6L -> "sprint greens",  // distance 2 from base (but 1 from #2? no: sub+insert => 1 from 2? "sprint green"->"sprint greens" is insertion => neighbors)
      7L -> "totally other")  // no neighbors
    val got = run(rows)
    val want = brute(rows)
    assert(got === want)
    assert(!got.contains(7L), "distance-2+ strings must not match")
    // base matches exactly the one-edit variants
    assert(got(1L)._1 === 4L, s"base neighbor count: ${got(1L)}")
  }

  test("duplicate groups: counts include every copy, nearest handles the min-key holder") {
    val rows = Seq(
      10L -> "alpha beta",
      11L -> "alpha beta",
      12L -> "alpha beta",    // 347-copy-name shape in miniature
      20L -> "alpha betas",   // insertion neighbor of the group
      30L -> "gamma delta")
    val got = run(rows)
    val want = brute(rows)
    assert(got === want)
    // the smallest key of a duplicate group must point to the SECOND
    // smallest (not itself); the others point to the smallest
    assert(got(10L)._2 === 11L)
    assert(got(11L)._2 === 10L)
    assert(got(20L)._1 === 3L && got(20L)._2 === 10L)
    assert(!got.contains(30L))
  }

  test("randomized agreement with the brute-force twin") {
    val rng = new scala.util.Random(7)
    val alphabet = "ab"
    // short strings over a 2-letter alphabet make ED<=1 collisions dense
    val rows = (1L to 60L).map { k =>
      k -> (0 until (2 + rng.nextInt(3))).map(_ => alphabet(rng.nextInt(2))).mkString
    }
    assert(run(rows) === brute(rows))
  }

  test("empty names: only the pos-0 variant, no spurious sequence(1,0) row") {
    // sequence(1, 0) is DESCENDING in Spark ([1, 0]); unguarded, an empty
    // name generated a junk i=0 variant duplicating the reserved pos-0
    // row. "" is a deletion neighbor of every 1-char name and an exact
    // duplicate of the other "" — both must match the brute twin.
    val rows = Seq(
      1L -> "",
      2L -> "",
      3L -> "x",
      4L -> "xy",    // distance 2 from "" — must NOT match it
      5L -> "y")
    assert(run(rows) === brute(rows))
  }
}
