package graft.operators

/** Helper main for FoldLeaseSpec's two-JVM contention leg: acquire the
  * fold lease on `args(0)`, print `HELD` (the parent spec waits for it),
  * hold for `args(1)` ms — or until the parent kills this process, which
  * is the dead-holder scenario the takeover rule exists for — then
  * release. Deliberately Spark-free: the lease is pure Hadoop-FS (NIO
  * on the local scheme), so a maintenance JOB that only folds metadata
  * could hold it without a session too.
  */
object LeaseHolderMain {
  def main(args: Array[String]): Unit = {
    val live = new org.apache.hadoop.fs.Path(args(0))
    val fs = live.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val token = Layout.acquireFoldLease(fs, live)
    // the marker line the spec synchronizes on — must be the bare word
    println("HELD")
    System.out.flush()
    Thread.sleep(args.lift(1).map(_.toLong).getOrElse(60000L))
    Layout.releaseFoldLease(fs, live, token)
  }
}
