package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.binlog.BinlogWriter.{ColSpec, Writer}

/** The 30-second proof of life: generate a tiny MySQL binlog fixture,
  * read it through the `mysql-binlog` DataSource, run the reference's
  * own demo query (the conformance statement, `jdbc.clj:117` —
  * `SELECT * FROM cdc WHERE db = ... AND table = ... AND _delta_type =
  * 'insert'`) via `spark.sql`, then the latest-image view every CDC
  * consumer builds next. Run it with:
  *
  * {{{ sbt "runMain graft.Demo" }}}
  *
  * Everything here is the public API a user starts from: the batch
  * reader (swap `read` for `readStream` + `writeStream.foreachBatch`
  * to tail a growing log — see `graft.streaming` and the cdcm gates
  * for the maintained-state pipelines that build on it).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // 1. a tiny binlog: two inserts, an update, a delete on foo.auto
      //    (plus a second table the filters must screen out) — three
      //    committed transactions, the reference demo's shape
      val dir = java.nio.file.Files.createTempDirectory("graft-demo")
      val cols = Seq(ColSpec.int, ColSpec.varchar(50))
      new Writer()
        .writeFormatDescription(ts = 1000)
        .writeQuery("foo", "BEGIN", ts = 1000)
        .writeTableMap(23, "foo", "auto", cols, ts = 1000)
        .writeInsert(23, cols, Seq(Seq(1, "X"), Seq(2, "in ordnung")), ts = 1000)
        .writeXid(100, ts = 1000)
        .writeQuery("bar", "BEGIN", ts = 1001)
        .writeTableMap(24, "bar", "other", cols, ts = 1001)
        .writeInsert(24, cols, Seq(Seq(9, "noise")), ts = 1001)
        .writeXid(101, ts = 1001)
        .writeQuery("foo", "BEGIN", ts = 1002)
        .writeTableMap(23, "foo", "auto", cols, ts = 1002)
        .writeUpdate(23, cols, Seq((Seq(1, "X"), Seq(1, "Y"))), ts = 1002)
        .writeDelete(23, cols, Seq(Seq(2, "in ordnung")), ts = 1002)
        .writeXid(102, ts = 1002)
        .save(dir.resolve("binlog.000001").toString)

      // 2. the change stream as a table
      spark.read.format("mysql-binlog")
        .option("payloadDdl", "id INT, value STRING")
        .load(dir.toString)
        .createOrReplaceTempView("cdc")

      println("== change stream (foo.auto) ==")
      spark.sql(
        """SELECT _delta_type, id, value, xid, log_pos
          |FROM cdc WHERE db = 'foo' AND `table` = 'auto'
          |ORDER BY log_pos, log_seq""".stripMargin).show(false)

      println("== conformance query (reference jdbc.clj:117) ==")
      spark.sql(
        """SELECT * FROM cdc
          |WHERE db = 'foo' AND `table` = 'auto' AND _delta_type = 'insert'"""
          .stripMargin)
        .select("_delta_type", "id", "value", "xid").show(false)

      println("== latest image (the materialized-table view) ==")
      val w = Window.partitionBy(col("id"))
        .orderBy(col("log_pos").desc, col("log_seq").desc)
      spark.table("cdc")
        .filter(col("db") === "foo" && col("table") === "auto" &&
          col("_delta_type") =!= "update-before")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("_delta_type") =!= "delete")
        .select("id", "value").orderBy("id").show(false)
    } finally spark.stop()
  }
}
