package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-gate consistency pins: relationships between gates that the
  * per-gate oracles cannot see (each oracle checks one gate against
  * DuckDB; these check gates against EACH OTHER, so a semantics drift
  * that happened to stay oracle-consistent on both sides still fails).
  */
class CrossGateConsistencySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  test("asof03 is exactly asof01 restricted to the tolerance bound") {
    import spark.implicits._
    // the tolerance join must not CHANGE any match — only drop stale
    // ones: joining asof01's (event_id → click_value) onto asof03's rows
    // must agree on every surviving pair, and asof03's row set must be
    // the subset of asof01's where the matched click is fresh enough.
    // (Staleness is re-derivable from asof01's inputs only with the
    // matched click time, which asof01 doesn't emit — so we pin the
    // subset + agreement properties, which are the semantics.)
    val a1 = AsOf.asof01Enrich(spark, d)
      .select($"event_id".as("e1"), $"click_value".as("cv1"))
    val a3 = AsOf.asof03ToleranceEnrich(spark, d)
    val joined = a3.join(a1, $"event_id" === $"e1", "left")
    assert(joined.filter($"e1".isNull).count() === 0,
      "asof03 produced a row asof01 does not have — tolerance must only drop")
    assert(joined.filter($"click_value" =!= $"cv1").count() === 0,
      "asof03 matched a different click than asof01 for the same purchase")
    assert(a3.filter($"staleness_us" > 3600L * 1000000L).count() === 0,
      "a row outside the tolerance bound survived")
    assert(a3.count() <= a1.count())
  }

  test("txt25 epochs permute: same doc set, different order, stable per epoch") {
    import spark.implicits._
    val e1 = TextAnalysis.txt25EpochShuffle(spark, d, epoch = 1)
    val e2 = TextAnalysis.txt25EpochShuffle(spark, d, epoch = 2)
    // same population either epoch
    assert(e1.select($"doc_id").except(e2.select($"doc_id")).count() === 0)
    assert(e2.select($"doc_id").except(e1.select($"doc_id")).count() === 0)
    // the seed genuinely varies the permutation: most docs move
    val same = e1.select($"shard", $"position", $"doc_id")
      .intersect(e2.select($"shard", $"position", $"doc_id")).count()
    val total = e1.count()
    assert(same < total / 10,
      s"epochs 1 and 2 agree on $same of $total placements — the epoch " +
        "seed is not reaching the draw")
    // and re-running the same epoch is bit-stable
    val e2b = TextAnalysis.txt25EpochShuffle(spark, d, epoch = 2)
    assert(e2.orderBy($"shard", $"position").collect().toSeq ===
      e2b.orderBy($"shard", $"position").collect().toSeq)
  }

  test("sim18 filters BEFORE the cut: full k of qualifying rows, not a post-filtered top-k") {
    import spark.implicits._
    val filtered = Similarity.sim18FilteredSearch(spark, d).collect()
    assert(filtered.length === 10, "filtered search must still fill k")
    assert(filtered.forall(_.getLong(0) % 7 == 3),
      "a result violating the metadata predicate")
    // the classic filtered-search bug, demonstrated: post-filtering the
    // UNfiltered top-k under-fills k (expected ~k/7 survivors here) —
    // if this ever reaches 10, the predicate stopped being selective
    // and the gate no longer discriminates the two semantics
    val postFiltered = Similarity.sim03IvfTopK(spark, d)
      .filter($"vec_id" % 7 === 3).collect()
    assert(postFiltered.length < filtered.length,
      "predicate not selective in top-k — pick a rarer one")
  }

  test("cdcm6's incremental dup groups equal groups recomputed from cdcm1's materialized table") {
    import spark.implicits._
    // two INDEPENDENT paths to the same truth: cdcm1 materializes latest
    // images through bucketed latest-wins merges; cdcm6 never
    // materializes images at all (versioned fingerprint log + argmax).
    // Each is oracle-checked alone; this pins them against each other.
    val viaTable = CdcBinlog.cdcm1MaterializedTable(spark, d)
      .groupBy(md5(TextAnalysis.normalize($"word")).as("fp"))
      .agg(min($"id").as("keeper_doc_id"), count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2)
      .orderBy($"keeper_doc_id")
      .collect().map(_.toString).toSeq
    val viaLog = CdcBinlog.cdcm6DedupFreshness(spark, d)
      .collect().map(_.toString).toSeq
    assert(viaLog === viaTable,
      "fingerprint-log dedup state disagrees with the materialized table")
  }
}
