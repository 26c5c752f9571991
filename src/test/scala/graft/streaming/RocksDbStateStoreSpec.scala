package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Proves the streaming gates on the RocksDB state store provider.
  *
  * The default HDFS-backed provider keeps every partition's state in
  * executor heap — fine at gate scale, the streaming scale-killer at
  * 100 TB, where keyed state (dedup keys, both sides of a stream-stream
  * join, per-user running state) outgrows memory. Spark's production
  * answer is the RocksDB provider (state on local disk, bounded
  * block-cache in memory), a pure config swap:
  *
  *   spark.sql.streaming.stateStore.providerClass =
  *     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  *
  * This spec runs the WHOLE streaming gate family — windowed aggregation
  * (st01), dedup state (st02), stream-static enrich rollup (st03),
  * session-window merge state (st04, which additionally needs the
  * provider's prefix-scan support), arbitrary keyed state via
  * flatMapGroupsWithState (st05), dual-sided stream-stream join state
  * (st06), and the outer-join null-side finalization (st07) — under BOTH
  * providers against the same input and asserts row-identical results,
  * pinning that the engine's semantics do not depend on the provider and
  * the production config is a drop-in. The conf is read at query start,
  * so setting it between gate invocations on one session is exactly how
  * a deployment would flip it. (The durable b-twins run the same state
  * operators as their base gates; the sink protocol is provider-blind.)
  */
class RocksDbStateStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def underRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try f
    finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private val gates: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "st01_sliding_window" -> (StreamOps.st01SlidingWindow _),
    "st02_stream_dedup" -> (StreamOps.st02StreamDedup _),
    "st03_stream_enrich" -> (StreamOps.st03StreamEnrich _),
    "st04_session_window" -> (StreamOps.st04SessionWindow _),
    "st05_running_state" -> (StreamOps.st05RunningState _),
    "st06_stream_join" -> (StreamOps.st06StreamJoin _),
    "st07_stream_outer_join" -> (StreamOps.st07StreamOuterJoin _),
    // st08's union+seam-dedup holds the replay's distinct keys in dedup
    // state — the state-heaviest shape after the two-sided joins, and
    // exactly what RocksDB exists for at 100 TB (st09 is stateless —
    // nothing to prove)
    "st08_backfill_union" -> (StreamOps.st08BackfillUnion _))

  for ((name, gate) <- gates)
    test(s"$name is row-identical under RocksDBStateStoreProvider") {
      val default = rows(gate(spark, dir))
      assert(default.nonEmpty, s"$name produced no rows under the default provider")
      val rocks = underRocksDb {
        assert(spark.conf.get(ProviderKey) === RocksDb)
        rows(gate(spark, dir))
      }
      assert(rocks === default)
    }
}
