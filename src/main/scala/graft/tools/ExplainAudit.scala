// Plan audit (run with: sbt "Test / runMain graft.tools.ExplainAudit") —
// prints formatted plans for key queries so pushdown / broadcast / partial
// aggregation can be eyeballed per the 100 TB design checklist.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_top_revenue", "q06_forecast", "q17_topk")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
