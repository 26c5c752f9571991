package graft.operators

import java.math.{BigDecimal => JBigDecimal}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.binlog.BinlogWriter._

/** Binlog CDC queries over deterministic generated fixtures — the engine's
  * reference-parity surface wired into the driver contract. These are not
  * DuckDB-expressible (the oracle reads parquet, not binlogs), so the
  * driver records rows-only checks; full semantic checks live in
  * `BinlogSourceSpec`/`BinlogDecoderSpec`.
  *
  * The fixture mirrors the reference's bench table `bench.big(id int, val
  * decimal(12,4), word varchar(50))` (`mysql_bench.clj:91-94`) and scales
  * with the sf directory: sf0.1 yields ~200k change rows across 4 rotated
  * files (≈ the reference's ≥10 MB binlog grown by doubling,
  * `mysql_bench.clj:109-114`) so the bench measures real decode throughput
  * with cross-file parallelism.
  */
object CdcBinlog {

  private val cols = Seq(ColSpec.int, ColSpec.decimal(12, 4), ColSpec.varchar(50))
  val payloadDdl = "id INT, val DECIMAL(12,4), word STRING"

  /** rows per sf dir: ~2k at sf0.001, ~20k at 0.01, ~200k at 0.1 */
  def rowsFor(sfDir: String): Int = {
    val sf = """sf([0-9.]+)""".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.001)
    math.max((sf * 2000000).toInt, 2000)
  }

  private def word(i: Int): String = {
    val ws = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    s"${ws(i % 8)}_${i % 977}"
  }

  private def dec(i: Int): JBigDecimal =
    new JBigDecimal(((i.toLong * 7919) % 100000000L).toString).movePointLeft(4)

  /** Generate (once) a rotated multi-file fixture for `sfDir`; returns the
    * directory. Deterministic: same sf -> byte-identical files.
    */
  def fixtureDir(sfDir: String): String = synchronized {
    val total = rowsFor(sfDir)
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft-binlog-v2-$total")
    val marker = dir.resolve("_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(dir)
      val nFiles = 4
      val perFile = total / nFiles
      var id = 0
      for (f <- 1 to nFiles) {
        val w = new Writer()
        w.writeFormatDescription(ts = 1700000000L)
        var written = 0
        var txn = 0
        while (written < perFile) {
          val n = math.min(100, perFile - written)
          val ts = 1700000000L + id / 10
          w.writeQuery("bench", "BEGIN", ts = ts)
          w.writeTableMap(42, "bench", "big", cols, ts = ts)
          val rows = (0 until n).map { k => Seq[Any](id + k, dec(id + k), word(id + k)) }
          w.writeInsert(42, cols, rows, ts = ts)
          if (txn % 5 == 3) // some txns also update their first 20 rows
            w.writeUpdate(42, cols, (0 until math.min(20, n)).map { k =>
              (Seq[Any](id + k, dec(id + k), word(id + k)),
               Seq[Any](id + k, dec(id + k + 1), word(id + k + 1)))
            }, ts = ts)
          if (txn % 5 == 4) // and some delete 5
            w.writeDelete(42, cols, (0 until math.min(5, n)).map { k =>
              Seq[Any](id + k, dec(id + k), word(id + k))
            }, ts = ts)
          w.writeXid(100000L + id.toLong, ts = ts)
          id += n; written += n; txn += 1
        }
        if (f < nFiles) w.writeRotate(f"binlog.${f + 1}%06d", ts = 1700000000L)
        w.save(dir.resolve(f"binlog.$f%06d").toString)
      }
      Files.writeString(dir.resolve("binlog.index"), (1 to nFiles).map(i => f"binlog.$i%06d").mkString("", "\n", "\n"))
      Files.writeString(marker, "ok")
    }
    dir.toString
  }

  private def changes(s: SparkSession, d: String): DataFrame =
    s.read.format("mysql-binlog")
      .option("payloadDdl", payloadDdl)
      .load(fixtureDir(d))

  // cdcb1 — the reference's conformance query shape (`jdbc.clj:117`):
  // inserts of one table, pushed-down equality filters.
  def cdcb1InsertScan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    changes(s, d)
      .filter($"db" === "bench" && $"table" === "big" && $"_delta_type" === "insert")
      .select($"log_file", $"log_pos", $"log_seq", $"xid", $"id", $"val", $"word")
      .orderBy($"log_file", $"log_pos", $"log_seq")
  }

  // cdcb2 — update before/after pairing survives with total order.
  def cdcb2UpdatePairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    changes(s, d)
      .filter($"_delta_type".startsWith("update"))
      .select($"log_file", $"log_pos", $"log_seq", $"_delta_type", $"id", $"val")
      .orderBy($"log_file", $"log_pos", $"log_seq")
  }

  // cdcb3 — raw event stream stats (events mode, S5/S7 surface): event
  // counts + txn count via xid.
  def cdcb3EventStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.read.format("mysql-binlog").option("mode", "events")
      .load(fixtureDir(d))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), countDistinct($"xid").as("n_xids"))
      .orderBy($"event_type")
  }

  // cdcb4 — latest-image compaction over the change stream: final state of
  // each key after applying inserts/updates/deletes in (file, pos, seq)
  // order — the materialized-table view of the CDC stream.
  def cdcb4LatestImage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"id")
      .orderBy($"log_file".desc, $"log_pos".desc, $"log_seq".desc)
    changes(s, d)
      .filter($"_delta_type" =!= "update-before")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"_delta_type" =!= "delete") // deleted keys drop out
      .select($"id", $"val", $"word")
      .orderBy($"id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdcb1_binlog_insert_scan" -> cdcb1InsertScan _,
    "cdcb2_binlog_update_pairs" -> cdcb2UpdatePairs _,
    "cdcb3_binlog_event_stats" -> cdcb3EventStats _,
    "cdcb4_binlog_latest_image" -> cdcb4LatestImage _)

  /** Not SQL-expressible over the parquet tables — no oracle entries. */
  def oracles: Map[String, String] = Map.empty
}
