package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Independent correctness check of latest-image compaction: the
  * distributed window-based cdcb4 result must equal a strictly sequential
  * replay of the change stream (fold in (log_file, log_pos, log_seq)
  * order: insert/update put, delete remove) — the semantics a CDC consumer
  * materializing a table would implement by hand.
  */
class CdcReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("windowed latest-image == sequential replay over the sf0.001 fixture") {
    val d = "/root/testdata/sf0.001"
    import spark.implicits._
    val changes = spark.read.format("mysql-binlog")
      .option("payloadDdl", CdcBinlog.payloadDdl)
      .load(CdcBinlog.fixtureDir(d))
      .select($"log_file", $"log_pos", $"log_seq", $"_delta_type", $"id", $"val", $"word")
      .orderBy($"log_file", $"log_pos", $"log_seq")
      .collect()
    assert(changes.length > 2000)

    val state = scala.collection.mutable.LinkedHashMap[Int, (java.math.BigDecimal, String)]()
    changes.foreach { r =>
      val id = r.getAs[Int]("id")
      r.getAs[String]("_delta_type") match {
        case "insert" | "update" =>
          state(id) = (r.getAs[java.math.BigDecimal]("val"), r.getAs[String]("word"))
        case "delete" => state.remove(id)
        case "update-before" => // before-image carries no state change
      }
    }

    // cdcb4 outputs val as double (the oracle-comparable type)
    val compacted = CdcBinlog.cdcb4LatestImage(spark, d).collect()
    assert(compacted.length === state.size)
    compacted.foreach { r =>
      val id = r.getAs[Int]("id")
      val (v, w) = state(id)
      assert(r.getAs[Double]("val") === v.doubleValue, s"val mismatch id=$id")
      assert(r.getAs[String]("word") === w, s"word mismatch id=$id")
    }
  }
}
