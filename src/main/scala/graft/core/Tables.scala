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
  /** The events table's `ts` column has shipped in two physical forms
    * across testdata generations: parquet TIMESTAMP(NANOS) (no native
    * Spark type — read as nano-longs via
    * `spark.sql.legacy.parquet.nanosAsLong` and floor-divided to micros;
    * `div` truncates toward zero, which differs from DuckDB's flooring
    * `epoch_us` for pre-epoch nanos by 1 µs, so the negative remainder is
    * compensated explicitly) and plain TIMESTAMP(MICROS) (read natively as
    * TIMESTAMP_NTZ). Both normalize to a session-UTC TimestampType so every
    * downstream query sees one type regardless of which generation wrote
    * the file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(
          expr("(ts div 1000) + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)")))
      case _: TimestampNTZType =>
        // session tz is UTC (GraftConf), so NTZ→LTZ keeps micros identical
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other => sys.error(s"events.ts: unsupported physical type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
