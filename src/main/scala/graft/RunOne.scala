package graft

/** Dev harness: run one `SparkEntry.queries` entry against an sf dir and
  * print row count + wall seconds. Usage:
  *   sbt "runMain graft.RunOne <queryName> <sfDir> [reps]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: RunOne <queryName> [sfDir] [reps] — names from SparkEntry.queries")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 1
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val spark = core.GraftConf.local("graft-runone",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name rep $i: $n rows in $sec%.3f s")
      // SPARK_GRAFT_EXPLAIN=1 dumps the FINAL adaptive physical plan
      // (after the count() action, so AQE re-plans are visible)
      if (i == reps && sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        df.explain("formatted")
    } finally spark.stop()
  }
}
