package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` so the same plan runs at any scale
  * factor; at cluster scale these would be external tables / catalog
  * entries, so nothing here assumes local paths beyond the read.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table carries a parquet TIMESTAMP(NANOS) column, which
    * Spark has no native type for. Read it as nano-longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and FLOOR-divide to a
    * micros TimestampType — `div` truncates toward zero, which differs
    * from DuckDB's flooring `epoch_us` for pre-epoch nanos by 1 µs, so
    * the negative remainder is compensated explicitly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr(
          "(ts div 1000) + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
