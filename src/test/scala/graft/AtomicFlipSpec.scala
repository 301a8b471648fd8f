package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.util.AtomicFlip

/** Direct hammer on the metadata-flip primitive every pointer and
  * commit path now rests on (snapshot CURRENT, manifests, tags, branch
  * manifests, catalog entries): overwrite flips must never show a
  * missing or torn file, and exclusive publishes must pick exactly one
  * winner whose content lands complete. */
class AtomicFlipSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private def localFs: FileSystem = FileSystem.getLocal(conf)

  private def readAll(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("publishExclusive: exactly one of N concurrent publishers wins, content complete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flip_pub").toString
    val fs = localFs
    val dest = new Path(dir, "COMMIT")
    // large-ish distinct payloads: a torn write would be visible as a
    // truncated or interleaved body
    val payloads = (1 to 8).map(i => i -> (s"writer-$i-" * 2000)).toMap
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = payloads.keys.toSeq.map { i =>
      new Thread(() => {
        if (AtomicFlip.publishExclusive(fs, dest, payloads(i).getBytes("UTF-8")))
          wins.add(i)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(wins.size == 1, s"expected one winner, got $wins")
    assert(readAll(fs, dest) == payloads(wins.peek()),
      "winner's content did not land complete")
    // no staging debris left behind by winner or losers
    val leftovers = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"staging debris: ${leftovers.toSeq}")
    // a later publish against the existing dest loses cleanly
    assert(!AtomicFlip.publishExclusive(fs, dest, "late".getBytes("UTF-8")))
    assert(readAll(fs, dest) == payloads(wins.peek()))
  }

  test("writeAtomic: concurrent readers always see one complete published value") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flip_wr").toString
    val fs = localFs
    val dest = new Path(dir, "POINTER")
    def payload(w: Int, i: Int) = s"w$w:i$i:" + ("x" * 4096)
    AtomicFlip.writeAtomic(fs, conf, dest, payload(0, 0).getBytes("UTF-8"))
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        try while (!stop.get()) {
          val got = readAll(fs, dest)
          // a valid observation is some writer's COMPLETE payload
          if (!(got.matches("w\\d+:i\\d+:x{4096}")))
            bad.add(s"torn read of length ${got.length}")
        } catch { case e: Throwable => bad.add(s"reader died: $e") }
      })
    }
    val writers = (1 to 2).map { w =>
      new Thread(() => {
        var i = 0
        try while (!stop.get()) {
          AtomicFlip.writeAtomic(fs, conf, dest, payload(w, i).getBytes("UTF-8"))
          i += 1
        } catch { case e: Throwable => bad.add(s"writer died: $e") }
      })
    }
    (readers ++ writers).foreach(_.start())
    Thread.sleep(1000)
    stop.set(true)
    (readers ++ writers).foreach(_.join(10000))
    assert(bad.isEmpty, s"$bad")
  }
}
