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

  private def write(p: java.nio.file.Path, name: String, bytes: Byte*): Unit =
    java.nio.file.Files.write(p.resolve(name),
      bytes.toArray)

  private def names(dir: org.apache.hadoop.fs.Path): Set[String] =
    fs.listStatus(dir).map(_.getPath.getName).toSet

  /** The round-13 data-loss shape: a FILE-LEVEL swap (incrementalZorder
    * / q41) crashed after displaced files moved to trash and ONE
    * replacement renamed in. The old recovery rule ("live present ⇒
    * vacuum residues") would have deleted the only copies of the
    * displaced rows; the `_PENDING` marker now routes this to a
    * rollback that restores the exact pre-swap state.
    */
  test("incomplete file-level swap (marker present): rolls back, originals restored") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov4")
    val liveDir = work.resolve("t")
    java.nio.file.Files.createDirectories(liveDir)
    write(liveDir, "part-base.parquet", 1)       // untouched non-candidate
    write(liveDir, "part-new1.parquet", 9)       // partial swap-in (re-derivable)
    val trashDir = work.resolve("t.ftrash-777")
    java.nio.file.Files.createDirectories(trashDir)
    write(trashDir, "part-b.parquet", 2)         // displaced — the ONLY copies
    write(trashDir, "part-c.parquet", 3)
    java.nio.file.Files.write(trashDir.resolve("_PENDING"),
      "part-new1.parquet\npart-new2.parquet".getBytes("UTF-8"))
    val live = new org.apache.hadoop.fs.Path(liveDir.toString)
    val r = Layout.recoverPublish(fs, live)
    assert(r.startsWith("rolled back"))
    assert(names(live) === Set("part-base.parquet", "part-b.parquet", "part-c.parquet"))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString)).length === 1)
    assert(Layout.recoverPublish(fs, live) === "clean")
  }

  test("committed file-level swap (marker absent): trash is garbage, vacuumed") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov5")
    val liveDir = work.resolve("t")
    java.nio.file.Files.createDirectories(liveDir)
    write(liveDir, "part-new1.parquet", 9)
    val trashDir = work.resolve("t.ftrash-777")
    java.nio.file.Files.createDirectories(trashDir)
    write(trashDir, "part-b.parquet", 2)
    val live = new org.apache.hadoop.fs.Path(liveDir.toString)
    Layout.recoverPublish(fs, live)
    assert(names(live) === Set("part-new1.parquet"))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString)).length === 1)
  }

  test("fileLevelSwap end-to-end: staged files in, displaced gone, no residue") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov6")
    val liveDir = work.resolve("t")
    val stageDir = work.resolve("stage")
    java.nio.file.Files.createDirectories(liveDir)
    java.nio.file.Files.createDirectories(stageDir)
    write(liveDir, "part-base.parquet", 1)
    write(liveDir, "part-old.parquet", 2)
    write(stageDir, "part-new.parquet", 3)
    val live = new org.apache.hadoop.fs.Path(liveDir.toString)
    Layout.fileLevelSwap(fs, live,
      Seq(new org.apache.hadoop.fs.Path(stageDir.resolve("part-new.parquet").toString)),
      Seq(new org.apache.hadoop.fs.Path(liveDir.resolve("part-old.parquet").toString)))
    assert(names(live) === Set("part-base.parquet", "part-new.parquet"))
    // no ftrash residue survives a completed swap
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString))
      .map(_.getPath.getName).toSet === Set("t", "stage"))
  }

  /** The round-14 ADVICE shape: live is ABSENT (a publishDir crash left
    * the only full copy under `.trash-*`) AND an incomplete file-level
    * swap's `.ftrash-*` residue exists. Running the ftrash rollback
    * first would mkdirs a fabricated live dir holding only the displaced
    * files — and the next recovery call, seeing live present, would
    * vacuum the `.trash-*` residue holding the real old state. The
    * directory-level restore must run first.
    */
  test("live absent + trash + incomplete ftrash: directory restore precedes rollback") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov8")
    val trashDir = work.resolve("t.trash-555")
    java.nio.file.Files.createDirectories(trashDir)
    write(trashDir, "part-base.parquet", 1)      // the REAL old state
    write(trashDir, "part-old.parquet", 2)
    val ftrashDir = work.resolve("t.ftrash-777")
    java.nio.file.Files.createDirectories(ftrashDir)
    write(ftrashDir, "part-d.parquet", 3)        // displaced — only copies
    java.nio.file.Files.write(ftrashDir.resolve("_PENDING"),
      "part-new1.parquet".getBytes("UTF-8"))
    val live = new org.apache.hadoop.fs.Path(work.resolve("t").toString)
    val r = Layout.recoverPublish(fs, live)
    assert(r.contains("restored") && r.contains("rolled back"))
    // the real old state AND the displaced originals both survive in live
    assert(names(live) === Set("part-base.parquet", "part-old.parquet", "part-d.parquet"))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString)).length === 1)
    assert(Layout.recoverPublish(fs, live) === "clean")
  }

  test("pre-existing ftrash residue for this pid: swap refuses, names recoverPublish") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov9")
    val liveDir = work.resolve("t")
    val stageDir = work.resolve("stage")
    java.nio.file.Files.createDirectories(liveDir)
    java.nio.file.Files.createDirectories(stageDir)
    write(liveDir, "part-old.parquet", 2)
    write(stageDir, "part-new.parquet", 3)
    val residue = work.resolve(s"t.ftrash-${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(residue)
    val live = new org.apache.hadoop.fs.Path(liveDir.toString)
    val e = intercept[IllegalStateException](Layout.fileLevelSwap(fs, live,
      Seq(new org.apache.hadoop.fs.Path(stageDir.resolve("part-new.parquet").toString)),
      Seq(new org.apache.hadoop.fs.Path(liveDir.resolve("part-old.parquet").toString))))
    assert(e.getMessage.contains("recoverPublish"))
    // nothing moved: live and staging are untouched by the refusal
    assert(names(live) === Set("part-old.parquet"))
    assert(names(new org.apache.hadoop.fs.Path(stageDir.toString)) ===
      Set("part-new.parquet"))
  }

  test("two trash residues with live missing: refuses rather than guess") {
    val work = java.nio.file.Files.createTempDirectory("graft-recov7")
    mkdir(work, "t.trash-111")
    mkdir(work, "t.trash-222")
    val live = new org.apache.hadoop.fs.Path(work.resolve("t").toString)
    val e = intercept[IllegalArgumentException](Layout.recoverPublish(fs, live))
    assert(e.getMessage.contains("ambiguous"))
    // both residues survive the refusal — nothing was discarded
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(work.toString)).length === 2)
  }
}
