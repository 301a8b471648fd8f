package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Functions

/** Property pins for the semantics the oracle depends on, evaluated in
  * bulk (ScalaCheck generators with fixed seeds, one Spark job per
  * property round — not per case). */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("round on doubles is BigDecimal-shortest-repr HALF_UP (oracle contract)") {
    for (seed <- 1L to 3L) {
      val xs = sample(Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)), seed)
      val got = xs.toDF("x").select(round($"x", 2)).as[Double].collect()
      val want = xs.map(x =>
        new java.math.BigDecimal(java.lang.Double.toString(x))
          .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue)
      assert(got.toSeq == want, s"seed=$seed")
    }
  }

  test("stableSum is partition-order independent (bitwise)") {
    for (seed <- 1L to 3L) {
      val xs = sample(Gen.listOfN(300, Gen.chooseNum(-1e5, 1e5)), seed)
      def total(parts: Int, data: Seq[Double]): Double =
        spark.createDataset(data).repartition(parts).toDF("x")
          .agg(Functions.stableSum($"x").cast("double")).as[Double].head()
      val a = total(1, xs)
      val b = total(7, new scala.util.Random(seed).shuffle(xs))
      assert(a == b, s"seed=$seed")
    }
  }

  test("IVM delta merge equals the recompute for random multiset transitions") {
    // random A → B multisets over a small key domain, changelog derived
    // the way SnapshotTable.changelog does (multiset exceptAll both
    // directions) — base agg + Ivm delta must equal B's agg bit-for-bit,
    // including emptied and newly-created groups
    import graft.write.Ivm
    val dec = "decimal(38,10)"
    for (seed <- 1L to 3L) {
      val rowGen = for {
        k <- Gen.chooseNum(1, 6)
        v <- Gen.chooseNum(-1e4, 1e4)
      } yield (k, v)
      val a = sample(Gen.listOfN(120, rowGen), seed)
      val b = sample(Gen.listOfN(110, rowGen), seed + 100)
      val (dfA, dfB) = (a.toDF("k", "x"), b.toDF("k", "x"))
      val log = dfB.exceptAll(dfA).withColumn("op", lit("insert"))
        .unionByName(dfA.exceptAll(dfB).withColumn("op", lit("delete")))
      def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"x".cast(dec)).as("s"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select($"k", $"n", $"s".cast("string"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      val merged = Ivm.applyCountSumDelta(agg(dfA), log, Seq("k"),
        "n", "s", $"x".cast(dec))
      assert(canon(merged) == canon(agg(dfB)), s"seed=$seed")
    }
  }

  test("containment dominates Jaccard on every shared LSH candidate pair") {
    // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always; both verifies run the
    // same banded candidates, so every Jaccard-passing pair must appear
    // in the containment output (at threshold 0) with a >= score
    import graft.operators.Dedup
    for (seed <- 1L to 2L) {
      val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
        "eta", "theta", "iota", "kappa")
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 40L).map { i =>
        val n = 6 + rnd.nextInt(8)
        (i, "en", Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
      }.toDF("doc_id", "lang", "text")
      val jac = Dedup.minhashLsh(docs, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val con = Dedup.containmentPairs(docs, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(jac.keySet == con.keySet, s"seed=$seed candidate sets differ")
      for ((k, j) <- jac)
        assert(con(k) >= j - 1e-9, s"seed=$seed pair=$k c=${con(k)} < j=$j")
    }
  }

  test("file skipping is value-transparent for random layouts and range filters") {
    import graft.sources.DataSkipping
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(300, for {
        k <- Gen.chooseNum(-500L, 500L); v <- Gen.chooseNum(-1e3, 1e3)
      } yield (k, v)), seed)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_skipprop$seed").toString
      val (dataP, statsP) = (s"$dir/d", s"$dir/s")
      // unsorted multi-file layout: ranges OVERLAP, so pruning decisions
      // are non-trivial and any off-by-one in the bound logic loses rows
      rows.toDF("k", "v").repartition(5).write.parquet(dataP)
      DataSkipping.buildStats(spark, dataP, "k", statsP)
      val plain = spark.read.parquet(dataP)
      val skip = DataSkipping.read(spark, dataP, "k", statsP)
      val cuts = sample(Gen.listOfN(4, Gen.chooseNum(-600L, 600L)), seed + 7)
      for (c <- cuts) {
        def canon(df: org.apache.spark.sql.DataFrame,
                  f: org.apache.spark.sql.Column) =
          df.filter(f).collect().map(r => (r.getLong(0), r.getDouble(1)))
            .sorted.toSeq
        assert(canon(skip, $"k" >= c) == canon(plain, $"k" >= c), s"seed=$seed >=$c")
        assert(canon(skip, $"k" < c) == canon(plain, $"k" < c), s"seed=$seed <$c")
        assert(canon(skip, $"k" === c) == canon(plain, $"k" === c), s"seed=$seed =$c")
        assert(canon(skip, $"k" > c && $"k" <= c + 100) ==
          canon(plain, $"k" > c && $"k" <= c + 100), s"seed=$seed range@$c")
      }
    }
  }

  test("native Sessionize equals the lag+cumsum formulation on random event streams") {
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(250, for {
        u <- Gen.chooseNum(1L, 8L); m <- Gen.chooseNum(0L, 5000L)
      } yield (u, m)), seed)
      val ev = rows.zipWithIndex
        .map { case ((u, m), i) => (u, new Timestamp(m * 60000L), i.toLong) }
        .toDF("user_id", "ts", "event_id")
        .withColumn("ts", $"ts".cast("timestamp_ntz"))
      val native = graft.plans.Sessionize(ev, Seq("user_id"), "ts", gapMinutes = 30)
        .groupBy($"user_id", $"session_idx").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val composed = ev
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("is_new", when($"prev".isNull ||
          unix_micros($"ts".cast("timestamp")) -
            unix_micros($"prev".cast("timestamp")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
        .withColumn("session_idx", sum($"is_new").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_idx").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(native == composed, s"seed=$seed")
    }
  }

  test("isoDayOfWeek matches java.time for arbitrary dates") {
    for (seed <- 1L to 3L) {
      val ds = sample(Gen.listOfN(100, Gen.chooseNum(0L, 20000L)), seed)
      val dates = ds.map(d => java.time.LocalDate.ofEpochDay(d))
      val df = dates.map(d => Timestamp.valueOf(d.atStartOfDay)).toDF("t")
      val got = df.select(Functions.isoDayOfWeek($"t")).as[Int].collect()
      val want = dates.map(_.getDayOfWeek.getValue)
      assert(got.toSeq == want, s"seed=$seed")
    }
  }

  test("surrogateKey equals driver-side md5 of the joined rendering") {
    for (seed <- 1L to 3L) {
      val tok = Gen.alphaNumStr.map(_.take(12))
      val ps = sample(Gen.listOfN(50, Gen.zip(tok, tok)), seed)
      val got = ps.toDF("a", "b")
        .select(Functions.surrogateKey($"a", $"b")).as[String].collect()
      val want = ps.map { case (a, b) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$a-$b".getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      assert(got.toSeq == want, s"seed=$seed")
    }
  }

  test("asof join equals the naive inequality-join argmax on random inputs") {
    for (seed <- 1L to 3L) {
      // right (key, ts) pairs unique by construction (distinct on both)
      val keyGen = Gen.chooseNum(0, 5)
      val tsGen = Gen.chooseNum(0L, 2000L)
      val lrows = sample(Gen.listOfN(150, Gen.zip(keyGen, tsGen)), seed)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, new Timestamp(t)) }
      val rrows = sample(Gen.listOfN(60, Gen.zip(keyGen, tsGen, Gen.chooseNum(0, 999))), seed + 100)
        .map { case (k, t, v) => (k, new Timestamp(t), v) }
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val left = lrows.toDF("lid", "k", "ts")
      val right = rrows.toDF("k", "ts", "v")
      val got = operators.AsOfJoin.asof(left, right, "k", "ts")
        .select("lid", "asof_ts", "v").orderBy("lid").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getInt(2))).toSeq
      // naive: all at-or-before matches, keep the max right ts per left row
      val byKey = rrows.groupBy(_._1)
      val want = lrows.flatMap { case (lid, k, ts) =>
        byKey.getOrElse(k, Nil).filter(_._2.getTime <= ts.getTime)
          .sortBy(_._2.getTime).lastOption.map(r => (lid, r._2.getTime, r._3))
      }.sortBy(_._1)
      assert(got == want, s"seed=$seed")
    }
  }

  test("bucketed range join equals naive on random signed intervals") {
    for ((seed, width) <- Seq((1L, 7L), (2L, 64L), (3L, 1000L))) {
      val pts = sample(Gen.listOfN(120, Gen.chooseNum(-500L, 500L)), seed)
        .zipWithIndex.map { case (x, i) => (i.toLong, x) }
      val ivs = sample(Gen.listOfN(40, Gen.zip(Gen.chooseNum(-500L, 500L),
        Gen.chooseNum(0L, 200L))), seed + 50)
        .zipWithIndex.map { case ((a, span), i) => (i.toLong, a, a + span) }
      val points = pts.toDF("pid", "x")
      val intervals = ivs.toDF("iid", "lo", "hi")
      val got = operators.RangeJoin
        .pointInInterval(points, "x", intervals, "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, x) <- pts
        (iid, lo, hi) <- ivs
        if x >= lo && x <= hi
      } yield (pid, iid)).toSet
      assert(got == want, s"seed=$seed width=$width")
      // and exactly-once emission (no per-bucket duplicates)
      assert(operators.RangeJoin
        .pointInInterval(points, "x", intervals, "lo", "hi", width).count() == want.size)
    }
  }

  test("timeOfDay buckets partition all 24 hours") {
    val df = (0 to 23).map(h => Timestamp.valueOf(f"2024-05-01 $h%02d:00:00")).toDF("t")
    val got = df.select(Functions.timeOfDay($"t")).as[String].collect()
    val want = (0 to 23).map {
      case h if h >= 6 && h <= 11 => "Morning"
      case h if h >= 12 && h <= 17 => "Afternoon"
      case h if h >= 18 && h <= 22 => "Evening"
      case _ => "Night"
    }
    assert(got.toSeq == want)
  }
}
