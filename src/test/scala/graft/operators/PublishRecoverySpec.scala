package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The publish protocol's crash states, reconstructed and recovered:
  * publishDir promises that a crash leaves a complete directory under
  * an adjacent name, and recoverPublish turns that promise into an
  * automated step — restore the old state if the live path vanished
  * mid-swap, publish the staged state if only it survived, vacuum
  * residues when the live path is healthy.
  */
class PublishRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkdir(p: java.nio.file.Path, name: String): org.apache.hadoop.fs.Path = {
    val d = p.resolve(name)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    new org.apache.hadoop.fs.Path(d.toString)
  }

  test("crash between the two renames: trash restores, staged residue dropped") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov")
    mkdir(work, "t.trash-999")
    mkdir(work, "t.compact-999")
    val live = new org.apache.hadoop.fs.Path(work.resolve("t").toString)
    val r = Layout.recoverPublish(fs, live)
    assert(r.startsWith("restored"))
    assert(fs.exists(live))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString)).length === 1)
  }

  test("crash after the old dir was consumed: the staged dir publishes") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov2")
    mkdir(work, "t.compact-999")
    val live = new org.apache.hadoop.fs.Path(work.resolve("t").toString)
    assert(Layout.recoverPublish(fs, live).startsWith("published"))
    assert(fs.exists(live))
  }

  test("healthy live path: residues vacuum, content untouched") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov3")
    mkdir(work, "t")
    mkdir(work, "t.trash-999")
    mkdir(work, "t.optimize-999")
    val live = new org.apache.hadoop.fs.Path(work.resolve("t").toString)
    assert(Layout.recoverPublish(fs, live).startsWith("vacuumed"))
    assert(fs.exists(live))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString)).length === 1)
    assert(Layout.recoverPublish(fs, live) === "clean")
  }
}
