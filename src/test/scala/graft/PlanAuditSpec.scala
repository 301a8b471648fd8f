package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI enforcement for the generated plan-audit document: `docs/plans.md`
  * must equal what `graft.tools.PlanAudit` renders from the RUNNING code
  * right now. Plan-shape drift — a pushdown silently lost, an exchange
  * appearing, a join strategy flipping — therefore fails the build
  * instead of aging in a committed doc. Rendering is deterministic from
  * any JVM state (expression IDs renumbered, generated-at literals
  * masked), so the in-suite render is byte-comparable to a fresh
  * `runMain`'s output. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("docs/plans.md matches a fresh render of every audited plan") {
    val committedPath = java.nio.file.Paths.get("docs/plans.md")
    assert(java.nio.file.Files.exists(committedPath),
      "docs/plans.md missing — generate it: sbt \"runMain graft.tools.PlanAudit\"")
    val committed = new String(
      java.nio.file.Files.readAllBytes(committedPath), "UTF-8")
    val fresh = graft.tools.PlanAudit.render(spark, "/root/testdata/sf0.001")
    if (committed != fresh) {
      // surface the first drifting section, not a 3000-line dump
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
        s"PlanAudit\" and review the diff. Drift at $drifted")
    }
  }
}
