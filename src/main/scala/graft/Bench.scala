package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR at local[N], prints ONE JSON line.
  *
  * Methodology (mirrors the reference's criterium-style steady-state
  * measurement, `mysql_bench.clj:166-181`): per query, one untimed warm-up
  * execution (JIT + code-gen + file-footer caches), then one timed run.
  * Binlog fixtures generate before timing starts.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftConf.local("graft-bench", cpus.toInt)

    operators.CdcBinlog.fixtureDir(sfDir) // generate outside timing

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Long = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
        System.nanoTime() - t0
      }
      once() // warm-up
      name -> once() / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Binlog decode throughput — the reference's headline metric
    // (`read-penultimate-binlog` criterium bench, mysql_bench.clj:166-181):
    // full decode of the generated fixture files in events mode.
    val fixDir = operators.CdcBinlog.fixtureDir(sfDir)
    val fixBytes = new java.io.File(fixDir).listFiles()
      .filter(_.getName.startsWith("binlog.0")).map(_.length).sum
    def decodeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.read.format("mysql-binlog").option("mode", "events").load(fixDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    decodeOnce() // warm
    val decodeSec = decodeOnce()
    val mbPerSec = fixBytes / 1e6 / decodeSec

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""binlog_decode_mb_per_sec":$mbPerSec,"binlog_bytes":$fixBytes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
