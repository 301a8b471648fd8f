package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.SnapshotTable

/** Model-based fuzz over SCHEMA EVOLUTION composed with the mutation
  * surface — the era-scoped column-mapping fold is the subtlest part
  * of the read path, and [[ColumnMappingSpec]] pins it pairwise; this
  * suite pins its composition with appends, merges (COW and MOR),
  * deletes, compaction, retention, and rollback's schema-era RESTORE.
  *
  * The model carries rows as name-keyed maps and a (name, type)
  * schema per retained version: rename rekeys rows, drop removes the
  * key, add appends the column with nulls for existing rows — and
  * time travel must replay each version under ITS schema, with dirs
  * written before an add reading the column as typed nulls.
  * Fixed seeds; schedules force every op kind (coverage asserted on
  * EXECUTED ops).
  */
class SnapshotSchemaFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // a row is a name-keyed map (null = SQL NULL); state is a multiset
  private type RowM = Map[String, Any]
  private type MS = Map[RowM, Int]
  private type Schema = Vector[(String, String)] // (name, "int"|"double")

  private val core = Set("id", "year", "month")
  private val baseSchema: Schema =
    Vector("id" -> "int", "year" -> "int", "month" -> "int", "fare" -> "double")

  private def ms(rows: Seq[RowM]): MS =
    rows.groupBy(identity).map { case (k, v) => k -> v.size }
  private def add(a: MS, rows: Seq[RowM]): MS =
    rows.foldLeft(a)((m, r) => m + (r -> (m.getOrElse(r, 0) + 1)))
  private def removeWhere(a: MS, p: RowM => Boolean): MS =
    a.filterNot { case (r, _) => p(r) }

  private def msOf(df: DataFrame): MS = {
    val cols = df.columns
    ms(df.collect().toSeq.map { r =>
      cols.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) null else r.get(i)) }.toMap
    })
  }

  private def toDF(schema: Schema, rows: Seq[RowM]): DataFrame = {
    val st = StructType(schema.map { case (n, t) =>
      StructField(n, t match {
        case "int" => IntegerType
        case _     => DoubleType
      }, nullable = !core(n))
    })
    spark.createDataFrame(
      rows.map(r => Row.fromSeq(schema.map { case (n, _) => r(n) })).asJava, st)
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/tbl"

  /** A batch under the CURRENT schema: core columns from the small
    * collision-prone domain, every extra column an integral double or
    * (1 in 4) null — so null semantics ride through merge and the
    * era fold. */
  private def randBatch(rnd: scala.util.Random, schema: Schema, n: Int): Seq[RowM] =
    Seq.fill(n) {
      schema.map {
        case ("id", _)    => "id" -> (1 + rnd.nextInt(20))
        case ("year", _)  => "year" -> 2024
        case ("month", _) => "month" -> (1 + rnd.nextInt(3))
        case (c, _) =>
          c -> (if (rnd.nextInt(4) == 0) null else rnd.nextInt(100).toDouble)
      }.toMap[String, Any]
    }

  /** Predicates stay on never-renamed columns so they resolve in every
    * era (purge evaluates them against raw physical schemas). */
  private def randCond(rnd: scala.util.Random)
      : (org.apache.spark.sql.Column, RowM => Boolean) =
    if (rnd.nextBoolean()) {
      val m = 1 + rnd.nextInt(3)
      (col("month") === m, r => r("month") == m)
    } else {
      val k = 2 + rnd.nextInt(3)
      (col("id") % k === 0, r => r("id").asInstanceOf[Int] % k == 0)
    }

  private def runFuzz(seed: Long, steps: Int): Set[String] = {
    val rnd = new scala.util.Random(seed)
    val t = new SnapshotTable(spark, freshRoot(s"schemafuzz$seed"))

    var schema: Schema = baseSchema
    val init = randBatch(rnd, schema, 4)
    var model: MS = ms(init)
    var cur = t.commitOverwrite(toDF(schema, init))
    var versions: Map[Int, (Schema, MS)] = Map(cur -> ((schema, model)))

    def record(v: Int): Unit = { cur = v; versions += v -> ((schema, model)) }

    def extras: Vector[String] = schema.map(_._1).filterNot(core)

    def checkCurrent(step: Int, op: String): Unit = {
      val df = t.read()
      assert(df.columns.toSet == schema.map(_._1).toSet,
        s"seed=$seed step=$step after $op: schema diverged " +
          s"(got ${df.columns.mkString(",")}, want ${schema.map(_._1).mkString(",")})")
      assert(msOf(df) == model, s"seed=$seed step=$step after $op")
    }

    def checkRetained(step: Int, op: String): Unit = {
      val live = t.history.map(_._1).toSet
      versions = versions.filter { case (v, _) => live(v) }
      versions.foreach { case (v, (sch, st)) =>
        val df = t.readVersion(v)
        assert(df.columns.toSet == sch.map(_._1).toSet,
          s"seed=$seed step=$step after $op: v$v schema diverged")
        assert(msOf(df) == st,
          s"seed=$seed step=$step after $op: time travel v$v diverged")
      }
    }

    val menu = Seq(
      "append", "append", "append",
      "merge", "merge",
      "merge_mor",
      "delete",
      "rename", "rename",
      "add_col", "add_col",
      "drop_col",
      "compact_files",
      "expire", "vacuum", "rollback", "purge")

    val schedule = rnd.shuffle(menu.distinct ++
      Seq.fill(math.max(0, steps - menu.distinct.size))(
        menu(rnd.nextInt(menu.size))))
    val drawn = scala.collection.mutable.Set.empty[String]
    for ((op, step0) <- schedule.zipWithIndex) {
      val step = step0 + 1
      var executed = true
      op match {
        case "append" =>
          val b = randBatch(rnd, schema, 1 + rnd.nextInt(3))
          val v = t.commitAppend(toDF(schema, b))
          model = add(model, b)
          record(v)
        case "merge" | "merge_mor" =>
          val b = randBatch(rnd, schema, 1 + rnd.nextInt(4))
            .groupBy(_("id")).map(_._2.head).toSeq
          val keys = b.map(_("id")).toSet
          val v = if (op == "merge") t.commitMerge(toDF(schema, b), Seq("id"))
                  else t.commitMergeMor(toDF(schema, b), Seq("id"))
          model = add(removeWhere(model, r => keys(r("id"))), b)
          record(v)
        case "delete" =>
          val (c, p) = randCond(rnd)
          val v = t.commitDelete(c)
          model = removeWhere(model, p)
          record(v)
        case "rename" =>
          val from = extras(rnd.nextInt(extras.size))
          val to = s"r$step"
          val v = t.renameColumn(from, to)
          schema = schema.map { case (n, ty) =>
            (if (n == from) to else n) -> ty }
          model = model.map { case (r, c) =>
            (r - from + (to -> r(from))) -> c }
          record(v)
        case "add_col" =>
          if (extras.size >= 4) executed = false // bound schema width
          else {
            val name = s"c$step"
            val v = t.addColumn(name, "double")
            schema = schema :+ (name -> "double")
            model = model.map { case (r, c) => (r + (name -> null)) -> c }
            record(v)
          }
        case "drop_col" =>
          // keep >= 1 extra so rename always has a target; when only
          // one remains, add-then-drop so the op still executes (and
          // exercises add/drop adjacency in one era step)
          val victim =
            if (extras.size >= 2) extras(rnd.nextInt(extras.size))
            else {
              val name = s"c${step}d"
              val v0 = t.addColumn(name, "double")
              schema = schema :+ (name -> "double")
              model = model.map { case (r, c) => (r + (name -> null)) -> c }
              record(v0)
              name
            }
          val v = t.dropColumn(victim)
          schema = schema.filterNot(_._1 == victim)
          // dropping a column can COLLAPSE rows that differed only in
          // it — merge the multiset counts, don't last-write-wins them
          model = model.toSeq.groupBy { case (r, _) => r - victim }
            .map { case (r, g) => r -> g.map(_._2).sum }
          record(v)
        case "compact_files" =>
          record(t.commitCompactFiles()) // materializes the mapping
        case "expire" =>
          t.expire(keepLast = 1 + rnd.nextInt(3), olderThanMs = 0L)
          checkRetained(step, op)
        case "vacuum" =>
          t.vacuum(olderThanMs = 0L)
          checkRetained(step, op)
        case "rollback" =>
          val live = t.history.map(_._1).toSet
          versions = versions.filter { case (v, _) => live(v) }
          val target = versions.keys.toSeq.sorted
            .apply(rnd.nextInt(versions.size))
          // RESTORE semantics: the target's whole state returns —
          // schema era included
          val (sch, st) = versions(target)
          schema = sch; model = st
          record(t.rollbackTo(target))
          checkRetained(step, op)
        case "purge" =>
          val (c, p) = randCond(rnd)
          try {
            t.purge(c)
            model = removeWhere(model, p)
            versions = versions.map { case (v, (sch, st)) =>
              v -> ((sch, removeWhere(st, p))) }
          } catch {
            // both documented refusals precede every state-changing
            // side effect: retained MOR key deletes, or a live
            // column-mapping history
            case e: IllegalArgumentException
              if e.getMessage.contains("merge-on-read") ||
                 e.getMessage.contains("column rename/drop") => ()
          }
          checkRetained(step, op)
      }
      if (executed) drawn += op
      checkCurrent(step, op)
    }

    t.vacuum(olderThanMs = 0L)
    assert(t.fsck().isEmpty, s"seed=$seed fsck: ${t.fsck()}")
    checkRetained(steps + 1, "final_vacuum")
    checkCurrent(steps + 1, "final_vacuum")
    drawn.toSet
  }

  private val allOps = Set("append", "merge", "merge_mor", "delete",
    "rename", "add_col", "drop_col", "compact_files",
    "expire", "vacuum", "rollback", "purge")

  test("schema evolution composed with mutation ops matches the model (seed 11)") {
    val drawn = runFuzz(seed = 11L, steps = 26)
    assert(allOps.subsetOf(drawn), s"op kinds never executed: ${allOps -- drawn}")
  }

  test("schema evolution composed with mutation ops matches the model (seed 12)") {
    val drawn = runFuzz(seed = 12L, steps = 26)
    assert(allOps.subsetOf(drawn), s"op kinds never executed: ${allOps -- drawn}")
  }
}
