package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Range (point-in-interval) join. Spark plans a raw inequality join as a
  * broadcast-nested-loop — O(|points|·|intervals|). The scale shape is
  * binning: explode each interval into the fixed-width bins it covers,
  * equi-join points on their bin, then apply the exact range predicate.
  * Cost becomes O(|points| + Σ interval_bins + matches): a hash join AQE
  * can tune, with the residual filter codegen'd.
  */
object RangeJoin {

  /** Join `points` (with point column `p`) to `intervals` (with `lo`/`hi`
    * columns, inclusive-lo exclusive-hi) on containment, via `binWidth`
    * bucketing. All three columns are long-valued (e.g. epoch micros).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      p: String, lo: String, hi: String,
                      binWidth: Long): DataFrame = {
    val binnedPoints = points.withColumn("_bin", col(p).divide(binWidth).cast("long"))
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(col(lo).divide(binWidth).cast("long"),
        // hi is exclusive: a bin containing hi exactly still matters when
        // hi is not bin-aligned
        col(hi).divide(binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, "_bin")
      .filter(col(p) >= col(lo) && col(p) < col(hi))
      .drop("_bin")
  }

  // rj01 — activity windows: for each user, the 2-hour window opening at
  // their first event; count all platform events (any user) inside each
  // window. Pure range predicate (no equi key) → binned equi-join.
  def rj01ActivityWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d).withColumn("ts_us", unix_micros($"ts"))
    val windows = ev.groupBy($"user_id".as("owner"))
      .agg(min($"ts_us").as("win_lo"))
      .withColumn("win_hi", $"win_lo" + lit(2L * 3600 * 1000000L))
    val points = ev.select($"event_id", $"ts_us")
    pointInInterval(points, windows, "ts_us", "win_lo", "win_hi",
        binWidth = 3600L * 1000000L)
      .groupBy($"owner")
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy($"owner")
  }

  val rj01Sql: String =
    """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
      |w AS (SELECT user_id AS owner, MIN(ts_us) AS win_lo,
      |        MIN(ts_us) + 7200000000 AS win_hi
      |      FROM ev GROUP BY user_id)
      |SELECT owner, COUNT(*) AS n_in_window
      |FROM ev JOIN w ON ev.ts_us >= w.win_lo AND ev.ts_us < w.win_hi
      |GROUP BY owner
      |ORDER BY owner""".stripMargin

  // rj02 — interval-OVERLAP self-join: per customer, pairs of orders whose
  // 7-day fulfillment windows [orderdate, orderdate+7) overlap. A raw
  // overlap predicate is again a nested loop; the scale shape is the same
  // binning as rj01 with a twist: a pair can share MANY bins, so instead
  // of a dedup shuffle the pair is kept only in its CANONICAL bin — the
  // bin of max(a.lo, b.lo), which provably lies in both intervals' bin
  // ranges. Equi-join on (custkey, bin), residual predicates codegen'd,
  // one hash join, zero post-dedup.
  def rj02OrderOverlaps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val binWidth = 7L
    val o = orders(s, d).select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("lo"))
      .withColumn("hi", $"lo" + 7)
    val binned = o.withColumn("_bin",
      explode(sequence(($"lo" / binWidth).cast("long"), ($"hi" / binWidth).cast("long"))))
    binned.as("a").join(binned.as("b"),
        $"a.o_custkey" === $"b.o_custkey" && $"a._bin" === $"b._bin" &&
          $"a.o_orderkey" < $"b.o_orderkey" &&
          $"a.lo" < $"b.hi" && $"b.lo" < $"a.hi" &&
          $"a._bin" === (greatest($"a.lo", $"b.lo") / binWidth).cast("long"))
      .select($"a.o_custkey".as("custkey"),
        $"a.o_orderkey".as("order_a"), $"b.o_orderkey".as("order_b"),
        (least($"a.hi", $"b.hi") - greatest($"a.lo", $"b.lo")).as("overlap_days"))
      .orderBy($"custkey", $"order_a", $"order_b")
  }

  val rj02Sql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    date_diff('day', DATE '1970-01-01', o_orderdate) AS lo,
      |    date_diff('day', DATE '1970-01-01', o_orderdate) + 7 AS hi
      |  FROM orders)
      |SELECT a.o_custkey AS custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
      |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_days
      |FROM o a JOIN o b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      |  AND a.lo < b.hi AND b.lo < a.hi
      |ORDER BY custkey, order_a, order_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rj01_activity_windows" -> rj01ActivityWindows _,
    "rj02_order_overlaps" -> rj02OrderOverlaps _)

  def oracles: Map[String, String] = Map(
    "rj01_activity_windows" -> rj01Sql,
    "rj02_order_overlaps" -> rj02Sql)
}
