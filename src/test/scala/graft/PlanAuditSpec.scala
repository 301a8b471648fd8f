package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI enforcement for the generated plan-audit document: `docs/plans.md`
  * must equal what `graft.tools.PlanAudit` generates from the RUNNING
  * code right now. Plan-shape drift — a pushdown silently lost, an
  * exchange appearing, a join strategy flipping — therefore fails the
  * build instead of aging in a committed doc.
  *
  * The regeneration runs in a FORKED FRESH JVM (the exact `runMain`
  * path that generates the committed artifact, proven byte-stable
  * across runs). An in-suite render cannot be byte-compared: plan
  * rendering captures the session's cache state (memoized model layers,
  * shared fixture persists, transient caches left by whichever suites
  * ran first), so the same code renders different-but-equally-correct
  * trees mid-suite — the fork normalizes all of it by construction. */
class PlanAuditSpec extends AnyFunSuite {

  test("docs/plans.md matches a fresh regeneration of every audited plan") {
    val committedPath = java.nio.file.Paths.get("docs/plans.md")
    assert(java.nio.file.Files.exists(committedPath),
      "docs/plans.md missing — generate it: sbt \"runMain graft.tools.PlanAudit\"")
    val committed = new String(
      java.nio.file.Files.readAllBytes(committedPath), "UTF-8")

    val out = java.nio.file.Files.createTempFile("graft_plans_fresh", ".md")
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    // re-use this (forked) test JVM's own flags — the --add-opens set
    // Spark 4 needs on JDK 17 — and its full classpath
    import scala.jdk.CollectionConverters._
    val jvmFlags = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmFlags ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.PlanAudit", out.toString, "/root/testdata/sf0.001")
    val proc = new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true).start()
    val log = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val exit = proc.waitFor()
    assert(exit == 0, s"PlanAudit regeneration failed (exit $exit):\n" +
      log.linesIterator.toSeq.takeRight(30).mkString("\n"))
    val fresh = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")

    if (committed != fresh) {
      // full fresh render kept on disk so the drift is diffable, not
      // just the one-line excerpt below
      val keep = java.nio.file.Paths.get("target/plans_fresh.md")
      java.nio.file.Files.createDirectories(keep.getParent)
      java.nio.file.Files.copy(out, keep,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val cs = committed.split("\n## ").toSeq
      val fs = fresh.split("\n## ").toSeq
      val drifted = fs.zipAll(cs, "<missing>", "<missing>")
        .find { case (a, b) => a != b }
        .map { case (a, b) =>
          val name = a.linesIterator.nextOption().getOrElse("?")
          val firstDiff = a.linesIterator.zipAll(b.linesIterator, "<+>", "<->")
            .find { case (x, y) => x != y }
          s"section '$name', first differing line:\n  fresh:     " +
            s"${firstDiff.map(_._1).getOrElse("")}\n  committed: " +
            s"${firstDiff.map(_._2).getOrElse("")}"
        }.getOrElse("(section structure differs)")
      fail("docs/plans.md is stale — a plan shape drifted from the " +
        "committed audit. Regenerate with sbt \"runMain graft.tools." +
        "PlanAudit\" and review the diff (fresh render written to " +
        s"target/plans_fresh.md). Drift at $drifted")
    }
    java.nio.file.Files.deleteIfExists(out)
  }
}
