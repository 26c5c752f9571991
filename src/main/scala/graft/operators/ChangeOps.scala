package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Change-event processing operators — the reference engine's signature
  * surface (SURVEY.md §2.3): delta-type expansion, delta-type filtering and
  * latest-image compaction over a change stream.
  *
  * `rows-delta-type` (reference `jdbc.clj:104-115`) flatMaps each change
  * event to 1 output row (insert/delete) or 2 rows (update-before + update).
  * Here the same operator is expressed as a Catalyst-friendly
  * explode-of-array — a `Generate` node that whole-stage-codegens and that
  * Catalyst can push filters through — rather than an opaque typed flatMap.
  *
  * The parquet `events` table stands in for a decoded change stream in the
  * oracle-checked queries (event_type → operation kind); the real binlog
  * path uses the same operators over the mysql-binlog DSv2 source (see
  * graft.sources and graft.binlog).
  */
object ChangeOps {

  /** N1: expand one change event into its delta rows. An `update` event
    * yields two rows (before/after images, ordered), insert/delete yield
    * one, anything else is dropped. Column-level: the generated
    * `_delta_type` tag mirrors `jdbc.clj:108-114`.
    */
  def expandDeltaType(df: DataFrame, opCol: Column, insertOp: String,
                      deleteOp: String, updateOp: String): DataFrame = {
    val tags = when(opCol === insertOp, array(lit("insert")))
      .when(opCol === deleteOp, array(lit("delete")))
      .when(opCol === updateOp, array(lit("update-before"), lit("update")))
      .otherwise(array().cast("array<string>"))
    df.withColumn("_delta_type", explode(tags))
  }

  // cdc01 — delta expansion over the events stand-in stream: purchase →
  // update (2 rows), signup → insert, error → delete; clicks/views dropped.
  def cdc01DeltaExpand(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    expandDeltaType(events(s, d), $"event_type", "signup", "error", "purchase")
      .select($"event_id", $"user_id", $"value", $"_delta_type")
      .orderBy($"event_id", $"_delta_type")
  }

  val cdc01Sql: String =
    """SELECT event_id, user_id, value, _delta_type FROM (
      |  SELECT event_id, user_id, value, 'insert' AS _delta_type FROM events WHERE event_type = 'signup'
      |  UNION ALL
      |  SELECT event_id, user_id, value, 'delete' AS _delta_type FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT event_id, user_id, value, 'update-before' AS _delta_type FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT event_id, user_id, value, 'update' AS _delta_type FROM events WHERE event_type = 'purchase') t
      |ORDER BY event_id, _delta_type""".stripMargin

  // cdc02 — the reference's conformance filter (`jdbc.clj:117`): expansion
  // followed by `_delta_type = 'insert'` equality; Catalyst pushes the
  // generator-independent part into the scan.
  def cdc02InsertOnly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    expandDeltaType(events(s, d), $"event_type", "signup", "error", "purchase")
      .filter($"_delta_type" === "insert")
      .select($"event_id", $"user_id", $"value", $"_delta_type")
      .orderBy($"event_id")
  }

  val cdc02Sql: String =
    """SELECT event_id, user_id, value, 'insert' AS _delta_type FROM events
      |WHERE event_type = 'signup'
      |ORDER BY event_id""".stripMargin

  // cdc03 — latest-image compaction: collapse a keyed change stream to the
  // newest row per key ((log_file, log_pos) ordering in the binlog path;
  // (ts, event_id) here). At scale this is one shuffle on the key + a
  // per-partition top-1 — no global sort.
  def cdc03LatestImage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts").desc, $"event_id".desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  val cdc03Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // cdc04 — transaction-style grouping (reference XID commit grouping,
  // SURVEY §1.1): per (user, hour) commit batches with net effect.
  def cdc04TxnGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    expandDeltaType(events(s, d), $"event_type", "signup", "error", "purchase")
      .groupBy($"user_id", date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("txn_hour"))
      .agg(
        count(lit(1)).as("n_changes"),
        sum(when($"_delta_type" === "insert", 1L).otherwise(0L)).as("n_inserts"),
        sum(when($"_delta_type" === "delete", 1L).otherwise(0L)).as("n_deletes"),
        sum(when($"_delta_type" === "update", 1L).otherwise(0L)).as("n_updates"))
      .orderBy($"user_id", $"txn_hour")
  }

  val cdc04Sql: String =
    """SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS txn_hour,
      |  COUNT(*) AS n_changes,
      |  CAST(SUM(CASE WHEN _delta_type = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
      |  CAST(SUM(CASE WHEN _delta_type = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
      |  CAST(SUM(CASE WHEN _delta_type = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates
      |FROM (
      |  SELECT *, 'insert' AS _delta_type FROM events WHERE event_type = 'signup'
      |  UNION ALL SELECT *, 'delete' AS _delta_type FROM events WHERE event_type = 'error'
      |  UNION ALL SELECT *, 'update-before' AS _delta_type FROM events WHERE event_type = 'purchase'
      |  UNION ALL SELECT *, 'update' AS _delta_type FROM events WHERE event_type = 'purchase') t
      |GROUP BY user_id, txn_hour
      |ORDER BY user_id, txn_hour""".stripMargin

  // cdc05 — SCD Type-2 history: turn a keyed change stream into validity
  // intervals (valid_from = change time, valid_to = next change time,
  // open-ended for the current row). The standard CDC→warehouse modeling
  // op: one shuffle on the key, LEAD window inside each partition.
  def cdc05Scd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    events(s, d)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("valid_to_us", lead($"ts_us", 1).over(w))
      .select(
        $"user_id", $"event_id", $"value",
        $"ts_us".as("valid_from_us"),
        $"valid_to_us",
        $"valid_to_us".isNull.as("is_current"))
      .orderBy($"user_id", $"valid_from_us", $"event_id")
  }

  val cdc05Sql: String =
    """SELECT user_id, event_id, value,
      |  epoch_us(ts) AS valid_from_us,
      |  LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to_us,
      |  LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
      |FROM events
      |ORDER BY user_id, valid_from_us, event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc05_scd2" -> cdc05Scd2 _,
    "cdc01_delta_expand" -> cdc01DeltaExpand _,
    "cdc02_insert_only" -> cdc02InsertOnly _,
    "cdc03_latest_image" -> cdc03LatestImage _,
    "cdc04_txn_groups" -> cdc04TxnGroups _)

  def oracles: Map[String, String] = Map(
    "cdc05_scd2" -> cdc05Sql,
    "cdc01_delta_expand" -> cdc01Sql,
    "cdc02_insert_only" -> cdc02Sql,
    "cdc03_latest_image" -> cdc03Sql,
    "cdc04_txn_groups" -> cdc04Sql)
}
