package graft.write

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[FsVersionPointer]]'s slot guards — the pieces of
  * the recreated-slot story that the end-to-end SnapshotSpec pins
  * cannot reach in isolation. Package graft.write so the
  * `private[write]` pointer is constructible directly. */
class FsPointerGuardSpec extends AnyFunSuite {

  private def freshPointer(): (FsVersionPointer, Path,
      org.apache.hadoop.fs.FileSystem) = {
    val dir = new Path(
      java.nio.file.Files.createTempDirectory("graft_ptr").toString,
      "_manifests")
    val conf = new Configuration()
    val fs = dir.getFileSystem(conf)
    (new FsVersionPointer(fs, conf, dir), dir, fs)
  }

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("publish refuses a slot at or below CURRENT without creating a file") {
    val (vp, dir, fs) = freshPointer()
    assert(vp.publish(1, bytes("v1")))
    assert(vp.publish(2, bytes("v2")))
    assert(vp.publish(3, bytes("v3")))
    vp.delete(2) // expire freed slot v2
    // the stalled writer's attempt on the freed slot: refused, and no
    // manifest file materializes (a created-then-hidden file would be
    // a wrong-rows time-travel target)
    assert(!vp.publish(2, bytes("imposter")))
    assert(!fs.exists(new Path(dir, "v00002.txt")),
      "refused publish left a manifest file on the freed slot")
    assert(vp.currentVersion().contains(3))
    assert(vp.versions() == Seq(1, 3))
  }

  test("a delayed flip regression self-heals to the newest manifest") {
    val (vp, dir, fs) = freshPointer()
    (1 to 3).foreach(v => assert(vp.publish(v, bytes(s"v$v"))))
    // simulate the delayed flip: CURRENT regressed behind the head
    val cur = new Path(dir, "CURRENT")
    val out = fs.create(cur, true); out.write(bytes("1")); out.close()
    assert(vp.currentVersion().contains(1))
    // any forward flip (here: the next publish) heals past the
    // regression instead of leaving CURRENT stale
    assert(vp.publish(4, bytes("v4")))
    assert(vp.currentVersion().contains(4))
  }

  test("publishBranch refuses to resurrect a dropped branch") {
    val (vp, _, _) = freshPointer()
    assert(vp.publish(1, bytes("v1")))
    assert(vp.publishBranch("dev", 1, bytes("b1")))
    assert(vp.publishBranch("dev", 2, bytes("b2")))
    vp.dropBranch("dev")
    // the stalled branch writer's bv-3 attempt after the drop: a
    // partial lineage with no fork marker must not come back
    assert(!vp.publishBranch("dev", 3, bytes("zombie")))
    assert(vp.branchHead("dev").isEmpty)
    // a fresh branch creation (bv = 1) is of course still allowed
    assert(vp.publishBranch("dev", 1, bytes("b1-again")))
    assert(vp.branchHead("dev").contains(1))
  }
}
