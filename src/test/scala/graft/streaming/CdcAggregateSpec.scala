package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Incremental aggregate-view maintenance
  * ([[CdcMaterializer.maintainAggregate]] /
  * [[CdcMaterializer.writeAggDeltas]] / [[CdcMaterializer.readAggregate]] /
  * [[CdcMaterializer.compactAggregate]]). Pinned on synthetic delta
  * batches (the fixture-stream path runs under the full DuckDB oracle as
  * gate `cdcm2_incremental_agg`):
  *  - signed-delta semantics: inserts add, deletes retract, an update
  *    whose before/after images straddle two groups MOVES the row's
  *    count and sum between them;
  *  - replay idempotence by addressing: re-writing the same batch id
  *    leaves the view unchanged (the foreachBatch at-least-once corner);
  *  - compaction: view identical before and after, deltas folded away;
  *  - a fully-retracted group (n=0) disappears from the view.
  */
class CdcAggregateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def batch(rows: (String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("_delta_type", "word", "v")
  }

  private def view(path: String): Map[String, (Long, Long)] =
    CdcMaterializer.readAggregate(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("signed deltas, group moves, replay idempotence, compaction, full retraction") {
    val tmp = java.nio.file.Files.createTempDirectory("cdcagg")
    val path = s"$tmp/agg"
    try {
      CdcMaterializer.writeAggDeltas(batch(
        ("insert", "a", 10L), ("insert", "a", 5L), ("insert", "b", 7L)),
        "word", "v", path, 0L)
      assert(view(path) == Map("a" -> (2L, 15L), "b" -> (1L, 7L)))

      // an update moving a row a -> b retracts via its before image and
      // adds via its after image ("update" is the source's envelope name
      // for the after row; the expanded-pair alias is accepted too);
      // plus a plain delete in b
      val b2 = batch(
        ("update-before", "a", 10L), ("update", "b", 12L),
        ("delete", "b", 7L))
      CdcMaterializer.writeAggDeltas(b2, "word", "v", path, 1L)
      val afterB2 = Map("a" -> (1L, 5L), "b" -> (1L, 12L))
      assert(view(path) == afterB2)

      // foreachBatch replay: same batch id rewrites its own partition
      CdcMaterializer.writeAggDeltas(b2, "word", "v", path, 1L)
      assert(view(path) == afterB2)

      // compaction folds deltas into a base without changing the view
      CdcMaterializer.compactAggregate(spark, path)
      assert(view(path) == afterB2)
      assert(new java.io.File(s"$path/base").exists())
      assert(!new java.io.File(s"$path/deltas").exists())

      // deltas keep landing after a compaction; a fully-retracted group
      // folds to n=0 and leaves the view
      CdcMaterializer.writeAggDeltas(batch(("delete", "a", 5L)),
        "word", "v", path, 2L)
      assert(view(path) == Map("b" -> (1L, 12L)))
      CdcMaterializer.compactAggregate(spark, path)
      assert(view(path) == Map("b" -> (1L, 12L)))
    } finally {
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** The compactAggregate crash seam: its cleanup runs AFTER the
    * two-rename publish, so a crash in between leaves the new base plus
    * delta partitions the fold already consumed. SUM deltas are signed
    * increments — re-summing them double-counts silently — so the base
    * carries a `_folded_through` fence and the read excludes deltas at
    * or below it. (The old delete-then-rename order had a worse window:
    * no base at all, and recovery would double-count.)
    */
  test("stale already-folded deltas surviving a crashed cleanup never double-count") {
    val tmp = java.nio.file.Files.createTempDirectory("cdcagg-fence")
    val path = s"$tmp/agg"
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val w = java.nio.file.Files.walk(from)
      try w.forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally w.close()
    }
    try {
      CdcMaterializer.writeAggDeltas(batch(
        ("insert", "a", 10L), ("insert", "b", 7L)), "word", "v", path, 0L)
      CdcMaterializer.writeAggDeltas(batch(("insert", "a", 5L)),
        "word", "v", path, 1L)
      val want = Map("a" -> (2L, 15L), "b" -> (1L, 7L))
      assert(view(path) == want)
      // snapshot the deltas, compact, then restore them — exactly the
      // state a crash between publish and cleanup leaves behind
      val snapshot = java.nio.file.Files.createTempDirectory("cdcagg-snap")
      copyTree(java.nio.file.Paths.get(s"$path/deltas"), snapshot)
      CdcMaterializer.compactAggregate(spark, path)
      assert(view(path) == want)
      copyTree(snapshot, java.nio.file.Paths.get(s"$path/deltas"))
      assert(view(path) == want,
        "stale folded deltas were re-summed — the fence failed and the " +
          "view double-counted")
      // a FRESH batch (id above the fence) still lands normally
      CdcMaterializer.writeAggDeltas(batch(("insert", "b", 3L)),
        "word", "v", path, 2L)
      val want2 = Map("a" -> (2L, 15L), "b" -> (2L, 10L))
      assert(view(path) == want2)
      // the next fold consumes only the unfenced delta and cleans up all
      CdcMaterializer.compactAggregate(spark, path)
      assert(view(path) == want2)
      assert(!new java.io.File(s"$path/deltas").exists())
    } finally {
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("empty view after total retraction survives compaction and reads as zero rows") {
    val tmp = java.nio.file.Files.createTempDirectory("cdcagg0")
    val path = s"$tmp/agg"
    try {
      CdcMaterializer.writeAggDeltas(batch(("insert", "x", 3L)), "word", "v", path, 0L)
      CdcMaterializer.writeAggDeltas(batch(("delete", "x", 3L)), "word", "v", path, 1L)
      assert(view(path).isEmpty)
      CdcMaterializer.compactAggregate(spark, path)
      assert(view(path).isEmpty)
    } finally {
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
