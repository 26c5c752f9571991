package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family registers its oracle-checked queries here:
  *  - [[operators.Relational]]  — scan/filter/project/join/agg/window/sort/set-op surface
  *  - [[operators.ChangeOps]]   — CDC delta expansion / filtering / compaction (SURVEY §2.3)
  *  - [[operators.TextAnalysis]] — token counting, quality, lang-ID, fingerprinting
  *  - [[operators.Dedup]]       — exact, MinHash+LSH, n-gram Jaccard, embedding near-dup
  *  - [[operators.Similarity]]  — brute-force / LSH / IVF ANN over embeddings
  *  - [[operators.Multimodal]]  — binary media columns + stubbed codec plumbing
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03TopRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ ChangeOps.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ CdcBinlog.queries ++ AsOf.queries ++ RangeJoin.queries ++
      Layout.queries ++ Quality.queries ++ Graph.queries ++ Skew.queries ++
      graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The cdcb oracles embed the binlog fixture's absolute path, derived
    * deterministically from `sfDir` (same computation the fixture generator
    * uses) — no process-global state, so rendering order doesn't matter.
    */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    Relational.oracles ++ ChangeOps.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles(sfDir) ++ Similarity.oracles(sfDir) ++ Multimodal.oracles ++
      CdcBinlog.oracles(sfDir) ++ AsOf.oracles ++ RangeJoin.oracles ++
      Layout.oracles ++ Quality.oracles ++ Graph.oracles ++ Skew.oracles ++
      graft.streaming.StreamOps.oracles

  /** No-arg contract form: the driver gate's sf0.01 fixture paths. */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")
}
