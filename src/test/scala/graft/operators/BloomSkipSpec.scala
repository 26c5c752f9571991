package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the bloom-manifest skipping contract behind gate q40: membership
  * has NO false negatives (for EVERY key in the table, every file that
  * physically holds the key passes the bloom test — checked exhaustively,
  * not sampled), and the false-positive side actually prunes (a key
  * living in one file keeps far fewer than all files). The first
  * property is what makes dropping non-matching files exact; the second
  * is the payoff that justifies the manifest.
  */
class BloomSkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // the contract must hold at EVERY hash-count parameterization a
  // caller can choose (q40/q41/dd13 expose kHashes with default 2):
  // exactness is k-independent, only the false-positive rate moves
  for (kHashes <- Seq(1, 2, 4))
  test(s"bloom manifest has zero false negatives and prunes point lookups (k=$kHashes)") {
    import spark.implicits._
    CdcBinlog.withRotatingWorkdir(s"graft-bloomspec-k$kHashes") { work =>
      val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.001").toDF()
      val out = work.resolve("bydate").toString
      Layout.linearCluster(o, "o_orderdate", out, nFiles = 8)
      val mBits = 3008L
      val man = Layout.bloomManifest(spark, out, "o_orderkey", mBits, kHashes)

      // ground truth: which files actually hold each key
      val actual = spark.read.parquet(out)
        .select($"o_orderkey".as("k"), input_file_name().as("file"))
        .distinct()

      // bloom verdict for every distinct key in one distributed pass:
      // positions for all keys, joined to the manifest words, a file
      // passes iff all of the key's distinct (word, bit) pairs are set
      val pos = actual.select($"k").distinct()
        .select($"k", explode(Layout.bloomPositions($"k", mBits, kHashes)).as("pos"))
        .select($"k", expr("pos div 64").as("word"),
          expr("shiftleft(1L, int(pos % 64))").as("bit"))
        .distinct()
      val need = pos.groupBy($"k").agg(count(lit(1)).as("need"))
      val kept = pos.join(man, "word")
        .filter(($"bits".bitwiseAND($"bit")) =!= 0)
        .groupBy($"k", $"file").agg(count(lit(1)).as("hits"))
        .join(need, "k")
        .filter($"hits" === $"need")
        .select($"k", $"file")

      // no false negatives: every actual (key, file) pair survives
      val missed = actual.except(kept).count()
      assert(missed === 0L, s"$missed (key, file) pairs were bloom-rejected " +
        "although the file holds the key — false negatives break exactness")

      // payoff: on average a key keeps well under half the files (each
      // key lives in 1 file here; FP at 16 bits/key stays low for every
      // k in the grid — the half-the-files bound is loose on purpose)
      val nFiles = spark.read.parquet(out)
        .select(input_file_name()).distinct().count()
      val avgKept = kept.groupBy($"k").agg(count(lit(1)).as("n"))
        .agg(avg($"n")).head().getDouble(0)
      assert(avgKept < nFiles / 2.0,
        s"bloom kept $avgKept of $nFiles files per key on average — no pruning")
      spark.emptyDataFrame // withRotatingWorkdir's block yields a DataFrame
    }
  }

  test("q40's query result is invariant under the bloom parameterization") {
    val d = "/root/testdata/sf0.001"
    val base = Layout.q40BloomPrunedScan(spark, d)
      .collect().map(_.toString).toSeq
    for (k <- Seq(1, 4)) {
      val alt = Layout.q40BloomPrunedScanWith(spark, d, 16L, k)
        .collect().map(_.toString).toSeq
      assert(alt === base,
        s"k=$k changed the query result — the bloom must only move the " +
          "false-positive rate, never correctness")
    }
  }
}
