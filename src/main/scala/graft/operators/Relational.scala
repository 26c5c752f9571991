package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables._

/** Relational operator surface (SURVEY.md §2.2, §2.4-§2.8): the full
  * scan/filter/project/join/agg/window/sort/set-op capability the reference
  * delegates to its consumer, expressed Spark-first so Catalyst handles
  * pushdown, pruning, join strategy and whole-stage codegen.
  *
  * Oracle-determinism conventions (the driver hash-compares against DuckDB):
  *  - FP sums are accumulated exactly: `CAST(x AS DECIMAL(38,10))` before SUM,
  *    cast back to DOUBLE after — kills summation-order nondeterminism.
  *  - date/timestamp outputs are formatted to strings — kills tz/precision
  *    representation drift between engines.
  *  - every query ends in a total ORDER BY.
  */
object Relational {

  /** Exact (order-independent) sum of a double expression, as double. */
  private def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(38, 10))), 2).cast("double")

  // q01 — TPC-H Q1-style pricing summary: scan + filter + hash agg.
  // At scale: partial aggregation map-side; only 7 columns read (pruning);
  // shipdate predicate pushed to parquet.
  def q01PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter(to_date($"l_shipdate") <= lit("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q02 — scan + predicate + projection (reference P1/P2 shape: equality
  // filters applied before anything else; both pushed into the parquet scan).
  def q02FilterProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .filter($"event_type" === "purchase" && $"user_id" % 2 === 0)
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id")
  }

  val q02Sql: String =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' AND user_id % 2 = 0
      |ORDER BY event_id""".stripMargin

  // q03 — TPC-H Q3-style 3-way join + agg + top-k. customer is small →
  // broadcast; lineitem⋈orders shuffles on orderkey (AQE picks strategy).
  def q03TopRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = orders(s, d)
    val l = lineitem(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"), $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // q04 — left-semi join (EXISTS): orders having a high-quantity lineitem.
  def q04SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hi = lineitem(s, d).filter($"l_quantity" >= 48).select($"l_orderkey")
    orders(s, d)
      .join(hi, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q05 — left-anti join (NOT EXISTS): customers with no orders, by nation.
  // nation is tiny → broadcast.
  def q05AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val noOrders = customer(s, d)
      .join(orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
    noOrders.join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_name")
  }

  val q05Sql: String =
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // q06 — TPC-H Q6-style single-pass filtered agg; all predicates pushed.
  def q06Forecast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_discount" >= 0.04 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q06Sql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_discount >= 0.04 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // q07 — window rank: top order per customer (row_number, total order).
  def q07WindowRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey")
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  // q08 — running (cumulative) sum per supplier over ship time; the window
  // order is total so the sequential accumulation is deterministic.
  def q08RunningSum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .filter($"l_suppkey" < 3)
      .withColumn("running_qty", round(sum($"l_quantity".cast(DecimalType(38, 10))).over(w), 2).cast("double"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  val q08Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey < 3
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // q09 — set operations: nation keys with customers vs with suppliers.
  def q09SetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val custNations = customer(s, d).select($"c_nationkey".as("nationkey")).distinct()
    val suppNations = supplier(s, d).select($"s_nationkey".as("nationkey")).distinct()
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("cust_only"))
    val union = custNations.union(suppNations).distinct().withColumn("tag", lit("any"))
    both.union(custOnly).union(union)
      .select($"tag", $"nationkey")
      .orderBy($"tag", $"nationkey")
  }

  val q09Sql: String =
    """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT 'both' AS tag, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn) t
      |UNION ALL
      |SELECT 'cust_only' AS tag, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn) t
      |UNION ALL
      |SELECT 'any' AS tag, nationkey FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn) t
      |ORDER BY tag, nationkey""".stripMargin

  // q10 — distinct aggregates (shuffle-heavy; expand + two-phase agg).
  def q10DistinctAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).agg(
      countDistinct($"l_partkey").as("n_parts"),
      countDistinct($"l_suppkey").as("n_supps"),
      countDistinct($"l_orderkey").as("n_orders"),
      count(lit(1)).as("n_rows"))
  }

  val q10Sql: String =
    """SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_rows
      |FROM lineitem""".stripMargin

  // q11 — group + HAVING.
  def q11GroupHaving(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), dsum($"p_retailprice").as("sum_price"))
      .filter($"n_parts" > 5)
      .orderBy($"p_brand")
  }

  val q11Sql: String =
    """SELECT p_brand, COUNT(*) AS n_parts,
      |  CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_price
      |FROM part GROUP BY p_brand HAVING COUNT(*) > 5
      |ORDER BY p_brand""".stripMargin

  // q12 — conditional (CASE) aggregation over a join, TPC-H Q12 shape.
  def q12CaseAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // q13 — outer join + nested agg (TPC-H Q13): order-count distribution.
  def q13OuterJoinAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perCust = customer(s, d)
      .join(orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // q14 — scalar function surface (string/math/conditional; reference §2.7
  // has only decode utilities — the user-facing scalar library is Spark's).
  def q14ScalarFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .filter($"p_partkey" <= 100)
      .select(
        $"p_partkey",
        upper($"p_name").as("name_upper"),
        substring($"p_name", 1, 8).as("name_prefix"),
        length($"p_name").as("name_len"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
        abs($"p_size" - lit(25)).as("size_dist"),
        ($"p_partkey" % 7).as("pk_mod"),
        coalesce(nullif($"p_brand", lit("Brand#11")), lit("OTHER")).as("brand_or_other"))
      .orderBy($"p_partkey")
  }

  val q14Sql: String =
    """SELECT p_partkey, UPPER(p_name) AS name_upper, SUBSTRING(p_name, 1, 8) AS name_prefix,
      |  LENGTH(p_name) AS name_len, p_brand || '#' || p_type AS brand_type,
      |  ABS(p_size - 25) AS size_dist, p_partkey % 7 AS pk_mod,
      |  COALESCE(NULLIF(p_brand, 'Brand#11'), 'OTHER') AS brand_or_other
      |FROM part WHERE p_partkey <= 100
      |ORDER BY p_partkey""".stripMargin

  // q15 — event-time bucketing (batch shape of the streaming windowed agg):
  // tumbling 1-hour windows over the events stream table.
  def q15TimeBuckets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  val q15Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  // q16 — rollup (hierarchical aggregation) over region → nation.
  def q16Rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q16Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // q17 — global top-k with total tie-break (sort + limit; Spark plans a
  // TakeOrderedAndProject — no full sort at scale).
  def q17TopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  val q17Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  // q18 — correlated scalar subquery (TPC-H Q17 shape): lineitems below
  // 20% of their part's average quantity. Decorrelated to a per-partkey
  // WINDOW over the broadcast-brand-filtered subset: the per-part mean only
  // matters for the surviving partkeys, and every lineitem of a surviving
  // part is already in the joined subset — so one lineitem scan and one
  // l_partkey shuffle replace the naive rewrite's second full scan +
  // threshold join. Thresholds use exact decimal means so both engines
  // compare against identical doubles.
  def q18AvgThreshold(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")
    val p = part(s, d).filter($"p_brand" === "Brand#21")
    lineitem(s, d).join(broadcast(p), $"l_partkey" === $"p_partkey")
      .withColumn("q_threshold",
        sum($"l_quantity".cast(DecimalType(38, 10))).over(w).cast("double") /
          count(lit(1)).over(w) * 0.2)
      .filter($"l_quantity" < $"q_threshold")
      .agg((dsum($"l_extendedprice") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  val q18Sql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_rows
      |FROM (
      |  SELECT l_extendedprice, l_quantity,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) OVER (PARTITION BY l_partkey) AS DOUBLE)
      |      / COUNT(*) OVER (PARTITION BY l_partkey) * 0.2 AS q_threshold
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#21')
      |WHERE l_quantity < q_threshold""".stripMargin

  // q19 — disjunctive multi-predicate join (TPC-H Q19 shape): OR'd groups
  // of brand/size/quantity conditions; Catalyst extracts the common
  // l_partkey = p_partkey conjunct for the join.
  def q19DisjunctivePredicates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d)
    val p = part(s, d)
    li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"l_quantity" >= 1 && $"l_quantity" <= 11 && $"p_size" <= 5) ||
        ($"p_brand" === "Brand#23" && $"l_quantity" >= 10 && $"l_quantity" <= 20 && $"p_size" <= 10) ||
        ($"p_brand" === "Brand#34" && $"l_quantity" >= 20 && $"l_quantity" <= 30 && $"p_size" <= 15))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q19Sql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
      |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
      |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)""".stripMargin

  // q20 — sketch aggregation: HyperLogLog++ approximate distinct counts
  // checked against the exact counts *inside the query*: the sketch value
  // can't hash-match a different engine's sketch, but the exact counts and
  // the "approx within 5% of exact" booleans can — so the oracle proves
  // both the exact path and that the sketch honors its error bound
  // (rsd=0.02 → 5% leaves ~2.5 sigma of margin). SketchSpec asserts the
  // tighter bound on raw values.
  def q20ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).agg(
      approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
      countDistinct($"l_partkey").as("exact_parts"),
      approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
      countDistinct($"l_orderkey").as("exact_orders"))
      .select($"exact_parts", $"exact_orders",
        (abs($"approx_parts" - $"exact_parts").cast("double") / $"exact_parts" <= 0.05)
          .as("parts_within_5pct"),
        (abs($"approx_orders" - $"exact_orders").cast("double") / $"exact_orders" <= 0.05)
          .as("orders_within_5pct"))
  }

  val q20Sql: String =
    """SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  true AS parts_within_5pct, true AS orders_within_5pct
      |FROM lineitem""".stripMargin

  // q21 — exact interpolated percentiles (distribution profiling). On the
  // integral l_quantity domain adjacent order statistics coincide, so the
  // interpolation is FP-stable across engines.
  def q21Percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .orderBy($"l_returnflag")
  }

  val q21Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // q22 — pivot: event counts per user decile, one column per event type
  // (explicit value list keeps the schema static for Catalyst).
  def q22Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, d)
      .groupBy(($"user_id" % 10).as("user_bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select($"user_bucket" +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy($"user_bucket")
  }

  val q22Sql: String =
    """SELECT user_id % 10 AS user_bucket,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY user_bucket""".stripMargin

  // q23 — cube: all grouping combinations over (returnflag, linestatus)
  // (rollup's hierarchical subset is q16; cube is the full lattice).
  def q23Cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val q23Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // q24 — unpivot (wide→long): melt the q22 pivot back to (bucket, type,
  // n) rows; zero cells survive the round trip.
  def q24Unpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    q22Pivot(s, d).unpivot(
      Array($"user_bucket"), types.map(col).toArray, "event_type", "n")
      .orderBy($"user_bucket", $"event_type")
  }

  val q24Sql: String =
    """WITH p AS (
      |  SELECT user_id % 10 AS user_bucket, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |buckets AS (SELECT DISTINCT user_id % 10 AS user_bucket FROM events),
      |types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type)
      |SELECT b.user_bucket, t.event_type, CAST(COALESCE(p.n, 0) AS BIGINT) AS n
      |FROM buckets b CROSS JOIN types t
      |LEFT JOIN p ON p.user_bucket = b.user_bucket AND p.event_type = t.event_type
      |ORDER BY b.user_bucket, t.event_type""".stripMargin

  // q25 — semi-structured (JSON) processing: extract typed fields from the
  // events props JSON column and aggregate on them.
  def q25Json(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n_with_k"),
        sum($"k".cast("long")).as("sum_k"),
        max($"k").as("max_k"),
        countDistinct($"k").as("n_distinct_k"))
      .orderBy($"event_type")
  }

  val q25Sql: String =
    """SELECT event_type,
      |  COUNT(CAST(json_extract(props, '$.k') AS INT)) AS n_with_k,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
      |  COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS n_distinct_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // q26 — RANGE window frame: per-customer trailing-30-day order revenue
  // (value-based frame, vs the ROWS frames of q08). Exact decimal
  // accumulation keeps the frame sum order-free for the oracle.
  def q26RangeFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"order_day")
      .rangeBetween(-30L, Window.currentRow)
    orders(s, d)
      .withColumn("order_day", datediff(to_date($"o_orderdate"), lit("1990-01-01")).cast("long"))
      .withColumn("trailing_30d_revenue",
        round(sum($"o_totalprice".cast(DecimalType(38, 10))).over(w), 2).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"order_day", $"trailing_30d_revenue")
      .orderBy($"o_custkey", $"order_day", $"o_orderkey")
  }

  val q26Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing_30d_revenue
      |FROM orders
      |ORDER BY o_custkey, order_day, o_orderkey""".stripMargin

  // q27 — explicit GROUPING SETS through the SQL front end (the surface
  // rollup/cube are sugar for), with grouping() flags disambiguating the
  // per-set rows. One hash aggregation expanding each row into its sets.
  def q27GroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_gsets")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio
        |FROM orders_gsets
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)
  }

  val q27Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin

  // q28 — offset + distribution window functions (lead/lag/percent_rank/
  // ntile), the remaining window family beyond q07 (rank) / q08 (ROWS
  // frame) / q26 (RANGE frame). One window spec, unique total order inside
  // each partition — all four functions compute in a single Window exec.
  def q28LeadLag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        $"o_totalprice".cast("double").as("price"),
        lag($"o_totalprice".cast("double"), 1).over(w).as("prev_price"),
        lead($"o_totalprice".cast("double"), 1).over(w).as("next_price"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        ntile(4).over(w).as("quartile"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q28Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) AS price,
      |  lag(CAST(o_totalprice AS DOUBLE), 1) OVER w AS prev_price,
      |  lead(CAST(o_totalprice AS DOUBLE), 1) OVER w AS next_price,
      |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // q29 — sessionization (gaps-and-islands): a new session starts after
  // 30 min of inactivity; session id = running count of session starts.
  // Two stacked windows (lag flag, running sum) + one aggregation — the
  // batch counterpart of the streaming session_window in StreamOps, and
  // the canonical event-log preprocessing step for behavioral data. All
  // in one shuffle on user_id.
  def q29Sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val gapUs = 1800L * 1000000L
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val ev = events(s, d).select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
    ev.withColumn("prev_ts", lag($"ts_us", 1).over(wOrd))
      .withColumn("new_sess",
        when($"prev_ts".isNull || $"ts_us" - $"prev_ts" > gapUs, 1).otherwise(0))
      .withColumn("sess_seq", sum($"new_sess")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("sess_start_us"),
        (max($"ts_us") - min($"ts_us")).as("duration_us"))
      .orderBy($"user_id", $"sess_seq")
  }

  val q29Sql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT user_id, ts_us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS sess_seq
      |  FROM f)
      |SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq, COUNT(*) AS n_events,
      |  MIN(ts_us) AS sess_start_us,
      |  MAX(ts_us) - MIN(ts_us) AS duration_us
      |FROM s
      |GROUP BY user_id, sess_seq
      |ORDER BY user_id, sess_seq""".stripMargin

  // q30 — ordered funnel (view → click → purchase): each user's furthest
  // stage with STRICTLY increasing timestamps — the event-log companion
  // to q29's sessionization and the canonical behavioral rollup. The
  // stage tests ride RUNNING windows (min qualifying view/click so far),
  // which turns the three-self-join textbook formulation into ONE
  // exchange on user_id: both stacked windows and the final per-user
  // aggregate share the same hash partitioning, so at 100 TB the event
  // log shuffles once and everything else is partition-local. Ordering
  // is the total (ts_us, event_id) — equal-timestamp frames are
  // identical cross-engine — and qualification compares integer micros
  // strictly, so stage boundaries cannot flip between Spark and the
  // oracle. ∃ v<c<p  ⟺  min-view-so-far < click and min-qualifying-
  // click-so-far < purchase: the running form is exact, not heuristic.
  def q30Funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wRun = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = events(s, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
    ev.withColumn("t1r", min(when($"event_type" === "view", $"ts_us")).over(wRun))
      .withColumn("t2r", min(when($"event_type" === "click" &&
        $"t1r".isNotNull && $"ts_us" > $"t1r", $"ts_us")).over(wRun))
      .groupBy($"user_id")
      .agg((max(when($"event_type" === "view", 1).otherwise(0)) +
        max(when($"event_type" === "click" &&
          $"t1r".isNotNull && $"ts_us" > $"t1r", 1).otherwise(0)) +
        max(when($"event_type" === "purchase" &&
          $"t2r".isNotNull && $"ts_us" > $"t2r", 1).otherwise(0))).as("stage"))
      .orderBy($"user_id")
  }

  val q30Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |w1 AS (
      |  SELECT user_id, event_id, event_type, ts_us,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_us END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS UNBOUNDED PRECEDING) AS t1r
      |  FROM e),
      |w2 AS (
      |  SELECT user_id, event_type, ts_us, t1r,
      |    MIN(CASE WHEN event_type = 'click' AND t1r IS NOT NULL AND ts_us > t1r
      |             THEN ts_us END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS UNBOUNDED PRECEDING) AS t2r
      |  FROM w1)
      |SELECT user_id,
      |  CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |     + MAX(CASE WHEN event_type = 'click' AND t1r IS NOT NULL
      |                 AND ts_us > t1r THEN 1 ELSE 0 END)
      |     + MAX(CASE WHEN event_type = 'purchase' AND t2r IS NOT NULL
      |                 AND ts_us > t2r THEN 1 ELSE 0 END) AS INT) AS stage
      |FROM w2
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // q31 — cohort retention matrix: users grouped by the month of their
  // FIRST event (the cohort), counted in every later month they were
  // active, keyed by the integer month offset k. The scale shape is two
  // slim shuffles: one exchange on user_id where the map-side partial
  // collect_set already dedups (user, month) pairs before anything moves
  // (months-per-user is calendar-bounded, so the set is tiny), then a
  // (cohort, k)-sized final aggregate — the event log itself shuffles
  // once and only as (user_id, month) pairs. k is pure integer calendar
  // arithmetic ((Δyear)*12 + Δmonth) — no months_between doubles, no
  // interval semantics to disagree on cross-engine.
  def q31Retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val um = events(s, d)
      .select($"user_id", date_trunc("month", $"ts").cast("date").as("m"))
      .groupBy($"user_id")
      .agg(min($"m").as("cohort"), collect_set($"m").as("months"))
    um.select($"cohort", explode($"months").as("m"))
      .select($"cohort",
        ((year($"m") - year($"cohort")) * lit(12) +
          (month($"m") - month($"cohort"))).cast("int").as("k"))
      .groupBy($"cohort", $"k").agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort", $"k")
  }

  val q31Sql: String =
    """WITH um AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS DATE) AS m
      |  FROM events),
      |c AS (
      |  SELECT user_id, m, MIN(m) OVER (PARTITION BY user_id) AS cohort
      |  FROM um)
      |SELECT cohort,
      |  CAST((year(m) - year(cohort)) * 12 + (month(m) - month(cohort)) AS INT) AS k,
      |  COUNT(*) AS n_users
      |FROM c
      |GROUP BY cohort, k
      |ORDER BY cohort, k""".stripMargin

  // q32 — co-purchase pair mining (frequent itemset support at size 2):
  // part pairs appearing together in >= 2 orders. The textbook
  // formulation is a basket self-join on order id; here pairs are
  // generated INSIDE each basket instead — one exchange on l_orderkey
  // collects the order's distinct parts (map-side partial collect_set),
  // combinations come from a nested HOF transform over the sorted array
  // (a < b by construction, no post-hoc dedup), and the (a, b) support
  // count aggregates map-side. A self-join would shuffle the item table
  // twice and re-discover each basket k times; the in-basket form moves
  // each basket once and emits C(k,2) pairs partition-locally. Basket
  // sizes are bounded by catalog reality (~17 parts max at every sf —
  // C(k,2) is fine); a corpus with degenerate mega-baskets would cap or
  // salt the basket stage first, trading exactness explicitly.
  // no pre-distinct: collect_set dedups repeated parts INSIDE the
  // basket aggregate (map-side partial), so the slim (order, part)
  // stream shuffles once instead of twice
  private[operators] def baskets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d).select($"l_orderkey", $"l_partkey")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"l_partkey")).as("parts"))
  }

  /** q32's frequent-pair support computed from a basket frame — shared
    * with q33 so the two gates can never disagree on pair semantics.
    */
  private[operators] def pairSupport(b: DataFrame,
                                     minSupport: Long = 2L): DataFrame = {
    import b.sparkSession.implicits._
    b.select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_orders"))
      .filter($"n_orders" >= minSupport)
  }

  def q32Copurchase(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pairSupport(baskets(s, d))
      .orderBy($"n_orders".desc, $"a", $"b")
  }

  val q32Sql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n_orders
      |FROM items a JOIN items b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 2
      |ORDER BY n_orders DESC, a, b""".stripMargin

  // q33 — association-rule scoring over q32's frequent pairs: support,
  // confidence and lift, the classic market-basket mining output. The
  // pair stream is q32's (in-basket pair generation, no self-join); the
  // per-item support table is ONE slim (part → basket-count) aggregate,
  // small by construction (|parts| ≪ |lineitem|), so BOTH enrichment
  // joins broadcast it — the frequent-pair stream never shuffles for the
  // lookup. All scores are integer fixed-point (x10^4, truncating `div`),
  // so the oracle compare is exact integer equality: no cross-engine
  // float-division or rounding-mode drift can leak in. The basket total
  // rides in as a literal from its own one-row aggregate (bounded driver
  // value, like txt19's token total).
  def q33BasketLift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // lineitem is scanned ONCE: the persisted basket frame feeds the
    // basket total, the per-item support aggregate AND the pair stream
    // (at scale this is the one orderkey exchange all three share); the
    // result detaches via an eager localCheckpoint so the cache can be
    // RELEASED here instead of pinning session storage (cdcm1's pattern)
    val b = baskets(s, d).persist()
    try q33LiftPlan(b, b.count()).localCheckpoint(true)
      .orderBy($"lift_e4".desc, $"a", $"b")
    finally b.unpersist()
  }

  /** q33's lazy scoring plan over a basket frame — the plan-shape-spec
    * entry (the gate's returned frame is checkpointed, so its plan shows
    * only the checkpoint scan).
    */
  private[operators] def q33LiftPlan(b: DataFrame, nBaskets: Long): DataFrame = {
    import b.sparkSession.implicits._
    // NO broadcast hints: the support table is item-catalog-sized —
    // data-proportional, not bounded — so a forced broadcast is the
    // opaque-OOM shape at catalog scale. AQE promotes both enrichment
    // joins to broadcast from MEASURED size when supports are actually
    // small (they are at gate scale; plan-pinned on the final adaptive
    // plan) and falls back to shuffle joins keyed on the item when not.
    val supp = b.select(explode($"parts").as("pk"))
      .groupBy($"pk").agg(count(lit(1)).as("supp"))
    pairSupport(b)
      .join(supp.select($"pk".as("a"), $"supp".as("supp_a")), "a")
      .join(supp.select($"pk".as("b"), $"supp".as("supp_b")), "b")
      .select($"a", $"b", $"n_orders", $"supp_a", $"supp_b",
        expr("(n_orders * 10000L) div supp_a").cast("long").as("conf_e4"),
        expr(s"(n_orders * ${nBaskets}L * 10000L) div (supp_a * supp_b)")
          .cast("long").as("lift_e4"))
  }

  val q33Sql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
      |supp AS (SELECT l_partkey, COUNT(*) AS s FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS n_orders
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2)
      |SELECT p.a, p.b, p.n_orders,
      |  CAST(sa.s AS BIGINT) AS supp_a, CAST(sb.s AS BIGINT) AS supp_b,
      |  CAST((p.n_orders * 10000) // sa.s AS BIGINT) AS conf_e4,
      |  CAST((p.n_orders * nb.n * 10000) // (sa.s * sb.s) AS BIGINT) AS lift_e4
      |FROM pairs p
      |JOIN supp sa ON p.a = sa.l_partkey
      |JOIN supp sb ON p.b = sb.l_partkey, nb
      |ORDER BY lift_e4 DESC, a, b""".stripMargin

  // q34 — distribution-rank window family: percent_rank, cume_dist and
  // ntile deciles of order value within each ORDER DAY (~2,400
  // partitions here; day granularity keeps partitions numerous and
  // modest — the scale shape for windows with no rank-filter cut, where
  // WindowGroupLimit can't apply and each partition pays its full sort).
  // The (o_totalprice, o_orderkey) ordering is a total order, so every
  // rank statistic is tie-free and the doubles are single integer
  // divisions — bit-identical cross-engine.
  def q34RankDistributions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"order_day")
      .orderBy($"o_totalprice", $"o_orderkey")
    orders(s, d)
      .select(date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"),
        $"o_orderkey", $"o_totalprice")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .orderBy($"order_day", $"o_orderkey")
  }

  val q34Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  o_orderkey, o_totalprice,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  CAST(ntile(10) OVER w AS BIGINT) AS decile
      |FROM orders
      |WINDOW w AS (PARTITION BY strftime(o_orderdate, '%Y-%m-%d')
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY order_day, o_orderkey""".stripMargin

  // q39 — time-series gap fill (densify + forward-fill): each user's
  // daily activity series made dense over their [first, last] active
  // day, missing days filled with 0 events, and the cumulative value
  // carried forward across the gaps — the resample/ffill shape every
  // metrics pipeline needs before joins on calendar keys. The calendar
  // is GENERATED per user with sequence(min_day, max_day) (span is
  // calendar-bounded — ~30 days here, never data-proportional, so the
  // explode fan-out is a constant factor), the daily rollup partial-
  // aggregates map-side before its one user_id exchange, and the
  // carry-forward is a running sum over (user, day) — day-unique, so
  // ROWS vs RANGE framing cannot disagree cross-engine. The daily
  // subplan feeds both the span agg and the join probe; AQE exchange
  // reuse serves the second consumer from the first's shuffle. Values
  // ride as exact long cents (round(value*100)) so the running sum is
  // order-independent.
  def q39GapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .select($"user_id", $"ts".cast("date").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n"), sum($"cents").as("v100"))
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    cal.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n", lit(0L)).as("n_events"),
        coalesce($"v100", lit(0L)).as("dv"))
      .withColumn("cum_v100", sum($"dv").over(
        Window.partitionBy($"user_id").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"user_id", $"day", $"n_events", $"cum_v100")
      .orderBy($"user_id", $"day")
  }

  val q39Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v100
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      |spans AS (
      |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      |  GROUP BY user_id),
      |cal AS (
      |  SELECT user_id,
      |    CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM spans)
      |SELECT c.user_id, c.day,
      |  CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
      |  CAST(SUM(COALESCE(d.v100, 0)) OVER (
      |    PARTITION BY c.user_id ORDER BY c.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_v100
      |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
      |ORDER BY c.user_id, c.day""".stripMargin

  // q42 — DATA-QUALITY AUDIT (the dbt/great-expectations test suite as
  // one declarative pass): referential integrity (lineitem→orders,
  // orders→customer orphans via anti joins — at scale the dimension side
  // broadcasts or AQE shuffles, the fact side never moves twice), key
  // uniqueness ((l_orderkey, l_linenumber) groups with >1 row —
  // partial-aggregated before the one key exchange), null rate and
  // domain checks (pure filtered counts, pushed into their scans). Each
  // check reads only its own pruned columns; zero is a meaningful
  // result (an audit that only reports failures can't distinguish
  // "clean" from "didn't run"). Output is the (check, violations)
  // contract a pipeline gate consumes. A production suite fuses
  // same-table scalar checks into one aggregate pass; the joins and the
  // group-by are irreducibly their own shapes.
  def q42DqAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val liOrphans = lineitem(s, d).select($"l_orderkey")
      .join(orders(s, d).select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("li_orphans").as("check_name"), $"violations")
    val ordOrphans = orders(s, d).select($"o_custkey")
      .join(customer(s, d).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("ord_orphans").as("check_name"), $"violations")
    val dupKeys = lineitem(s, d)
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(count(lit(1)).as("n")).filter($"n" > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("li_dup_keys").as("check_name"), $"violations")
    val nullProps = events(s, d).filter($"props".isNull)
      .agg(count(lit(1)).as("violations"))
      .select(lit("ev_null_props").as("check_name"), $"violations")
    val negValue = events(s, d).filter($"value" < 0)
      .agg(count(lit(1)).as("violations"))
      .select(lit("ev_neg_value").as("check_name"), $"violations")
    liOrphans.unionAll(ordOrphans).unionAll(dupKeys)
      .unionAll(nullProps).unionAll(negValue)
      .orderBy($"check_name")
  }

  val q42Sql: String =
    """SELECT check_name, violations FROM (
      |  SELECT 'li_orphans' AS check_name, COUNT(*) AS violations
      |  FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'ord_orphans', COUNT(*)
      |  FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'li_dup_keys', COUNT(*) FROM (
      |    SELECT l_orderkey, l_linenumber FROM lineitem
      |    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'ev_null_props', COUNT(*) FROM events WHERE props IS NULL
      |  UNION ALL
      |  SELECT 'ev_neg_value', COUNT(*) FROM events WHERE value < 0)
      |ORDER BY check_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_dq_audit" -> q42DqAudit _,
    "q39_gap_fill" -> q39GapFill _,
    "q32_copurchase" -> q32Copurchase _,
    "q33_basket_lift" -> q33BasketLift _,
    "q34_rank_distributions" -> q34RankDistributions _,
    "q31_retention" -> q31Retention _,
    "q30_funnel" -> q30Funnel _,
    "q29_sessionize" -> q29Sessionize _,
    "q28_lead_lag" -> q28LeadLag _,
    "q27_grouping_sets" -> q27GroupingSets _,
    "q26_range_frame" -> q26RangeFrame _,
    "q24_unpivot" -> q24Unpivot _,
    "q25_json" -> q25Json _,
    "q23_cube" -> q23Cube _,
    "q22_pivot" -> q22Pivot _,
    "q21_percentiles" -> q21Percentiles _,
    "q18_avg_threshold" -> q18AvgThreshold _,
    "q19_disjunctive" -> q19DisjunctivePredicates _,
    "q20_approx_distinct" -> q20ApproxDistinct _,
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_top_revenue" -> q03TopRevenue _,
    "q04_semi_join" -> q04SemiJoin _,
    "q05_anti_join" -> q05AntiJoin _,
    "q06_forecast" -> q06Forecast _,
    "q07_window_rank" -> q07WindowRank _,
    "q08_running_sum" -> q08RunningSum _,
    "q09_set_ops" -> q09SetOps _,
    "q10_distinct_agg" -> q10DistinctAgg _,
    "q11_group_having" -> q11GroupHaving _,
    "q12_case_agg" -> q12CaseAgg _,
    "q13_outer_join_agg" -> q13OuterJoinAgg _,
    "q14_scalar_funcs" -> q14ScalarFuncs _,
    "q15_time_buckets" -> q15TimeBuckets _,
    "q16_rollup" -> q16Rollup _,
    "q17_topk" -> q17TopK _)

  def oracles: Map[String, String] = Map(
    "q42_dq_audit" -> q42Sql,
    "q39_gap_fill" -> q39Sql,
    "q32_copurchase" -> q32Sql,
    "q33_basket_lift" -> q33Sql,
    "q34_rank_distributions" -> q34Sql,
    "q31_retention" -> q31Sql,
    "q30_funnel" -> q30Sql,
    "q29_sessionize" -> q29Sql,
    "q28_lead_lag" -> q28Sql,
    "q27_grouping_sets" -> q27Sql,
    "q26_range_frame" -> q26Sql,
    "q24_unpivot" -> q24Sql,
    "q25_json" -> q25Sql,
    "q23_cube" -> q23Sql,
    "q22_pivot" -> q22Sql,
    "q21_percentiles" -> q21Sql,
    "q18_avg_threshold" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q20_approx_distinct" -> q20Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_top_revenue" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_forecast" -> q06Sql,
    "q07_window_rank" -> q07Sql,
    "q08_running_sum" -> q08Sql,
    "q09_set_ops" -> q09Sql,
    "q10_distinct_agg" -> q10Sql,
    "q11_group_having" -> q11Sql,
    "q12_case_agg" -> q12Sql,
    "q13_outer_join_agg" -> q13Sql,
    "q14_scalar_funcs" -> q14Sql,
    "q15_time_buckets" -> q15Sql,
    "q16_rollup" -> q16Sql,
    "q17_topk" -> q17Sql)
}
