package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Unit coverage for the LLM-data-pipeline operators: hand-checked small
  * inputs with known answers (the sf-corpus correctness is covered by the
  * DuckDB oracle harness; these pin the semantics on crafted edges). */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("tokenCount / bpeish / shingles on a known sentence") {
    val df = docs((1L, "en", "the quick brown fox jumps"))
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.bpeishTokenCount(lit("ab2 cd, x!")),
      TextAnalysis.shingles($"text")).head()
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 6) // ab, 2, cd, ",", x, "!"
    assert(r.getSeq[String](2) == Seq("the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("shingles guard: docs shorter than n tokens yield empty set") {
    val df = docs((1L, "en", "two words"))
    assert(df.select(TextAnalysis.shingles($"text")).head().getSeq[String](0).isEmpty)
  }

  test("langId picks the marker-densest language, und when none") {
    val df = docs(
      (1L, "en", "the cat of the hat"),
      (2L, "de", "der hund und die katze"),
      (3L, "zz", "xyzzy plugh"))
    val got = df.orderBy("doc_id").select(TextAnalysis.langId($"text")).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is whitespace/case-canonical") {
    val df = docs((1L, "en", "Hello   World"), (2L, "en", "hello world"))
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("exact dedup keeps the minimum id per identical text") {
    val df = docs((5L, "en", "same text"), (3L, "en", "same text"), (9L, "en", "other"))
    val r = Dedup.exact(df).orderBy("keeper_id").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq == Seq((3L, 2L), (9L, 1L)))
  }

  test("ngram and minhash near-dup agree on a planted pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val df = docs((1L, "en", base), (2L, "en", near), (3L, "en", far))
    val ng = Dedup.ngramJaccardPairs(df, threshold = 0.5).collect()
    assert(ng.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val mh = Dedup.minhashLsh(df, threshold = 0.5).collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // identical jaccard from both paths
    assert(ng.head.getDouble(2) == mh.head.getDouble(2))
  }

  test("containmentPairs flags a document fully contained in a longer one") {
    // doc 2's shingle set is a subset of doc 1's: containment = 1.0
    // while its Jaccard (5/12 ≈ 0.42) sits BELOW the 0.5 dedup cut —
    // the subsumption case the Jaccard verify misses
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    val sub = "alpha beta gamma delta epsilon zeta eta"
    val far = "one two three four five six seven eight nine ten"
    val df = docs((1L, "en", big), (2L, "en", sub), (3L, "en", far))
    val cp = Dedup.containmentPairs(df, threshold = 0.8).collect()
    assert(cp.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 1.0)))
    assert(Dedup.minhashLsh(df, threshold = 0.5)
      .filter($"doc_i" === 1L && $"doc_j" === 2L).isEmpty,
      "planted pair must be a containment-only (sub-Jaccard) case")
  }

  test("ngram df-cut drops hot boilerplate shingles from the index") {
    // 20 docs sharing an 8-token boilerplate prefix + 2 unique tokens:
    // per doc 8 shingles, 6 fully inside the boilerplate (df=20), so any
    // pair overlaps on exactly those 6 → jaccard 6/(8+8-6) = 0.6.
    val boiler = "all rights reserved by the operator of this"
    val df = docs((1L to 20L).map(i => (i, "en", s"$boiler u$i v$i")): _*)
    // uncapped: all C(20,2) boilerplate-only pairs flood out
    assert(Dedup.ngramJaccardPairs(df, 0.5, maxDocFreq = 1000).count() == 190)
    // capped: the df=20 shingles leave the index, no pair survives —
    // exactly the skew bomb the cut defuses at corpus scale
    assert(Dedup.ngramJaccardPairs(df, 0.5, maxDocFreq = 5).count() == 0)
    // a genuine near-dup pair with UNIQUE overlap still comes through
    // while the boilerplate cluster (shingle df = 6 > cap 3) is cut
    val mixed = docs((1L to 6L).map(i => (i, "en", s"$boiler u$i v$i")) ++ Seq(
      (30L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (31L, "en", "alpha beta gamma delta epsilon zeta eta theta iota lambda")): _*)
    val got = Dedup.ngramJaccardPairs(mixed, 0.5, maxDocFreq = 3).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((30L, 31L)))
  }

  test("lsh band-bucket cap drops a planted hot band, keeps small buckets") {
    // 10 byte-identical docs: identical shingle sets ⇒ identical
    // signatures ⇒ EVERY band key holds exactly the 10 docs — the
    // k²-candidate bucket the cap defuses. Plus one genuine near-dup
    // pair whose buckets hold only 2 docs.
    val boiler = "terms of service apply to every user of this site"
    val hot = (1L to 10L).map(i => (i, "en", boiler))
    val pair = Seq(
      (30L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (31L, "en", "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val df = docs(hot ++ pair: _*)
    // uncapped: the hot cluster floods out C(10,2) = 45 pairs + the pair
    assert(Dedup.minhashLsh(df, threshold = 0.5, maxBandSize = 100).count() == 46)
    // capped at 5: every hot-cluster band bucket (size ~10) is dropped;
    // the 2-doc buckets of the planted pair survive untouched
    val capped = Dedup.minhashLsh(df, threshold = 0.5, maxBandSize = 5).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((30L, 31L)))
  }

  test("incremental LSH over batches reproduces the one-shot recompute and splits pairs by batch") {
    val aBase = "alpha beta gamma delta epsilon zeta eta theta iota"
    val bBase = "one two three four five six seven eight nine"
    val cBase = "red green blue cyan magenta yellow black white gray"
    // three near-dup families: (2,4) intra-even, (1,3) intra-odd, (6,7) cross-batch
    val df = docs(
      (2L, "en", s"$aBase kappa"), (4L, "en", s"$aBase lambda"),
      (1L, "en", s"$bBase ten"), (3L, "en", s"$bBase eleven"),
      (6L, "en", s"$cBase silver"), (7L, "en", s"$cBase gold"),
      (5L, "en", "totally unrelated words sharing nothing with any family"))
    def pairs(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq.sorted
    val full = pairs(Dedup.minhashLsh(df).collect())
    val idx = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString + "/idx"
    def run(half: Long, id: String) =
      pairs(Dedup.minhashLshIncremental(df.filter($"doc_id" % 2 === half), idx,
        batchId = Some(id)).collect())
    val r1 = run(0L, "b1")
    val r2 = run(1L, "b2")
    assert((r1 ++ r2).sorted == full && full.size == 3)
    // batch 1 sees only intra-batch pairs; the cross pair lands with the
    // batch holding its later member
    assert(r1.forall { case (i, j, _) => i % 2 == 0 && j % 2 == 0 })
    assert(r2.map(p => (p._1, p._2)).contains((6L, 7L)))
    // the index persisted both tables, one row set per batch
    assert(spark.read.parquet(s"$idx/shingles").count() == 7)
    assert(spark.read.parquet(s"$idx/bands").select("doc_id").distinct().count() == 7)
    // retry contract: re-running a batch under the same batchId replaces
    // its own index files (no duplicate rows) and reproduces its pairs
    assert(run(1L, "b2") == r2)
    assert(spark.read.parquet(s"$idx/shingles").count() == 7)
    assert(spark.read.parquet(s"$idx/bands").count() ==
      spark.read.parquet(s"$idx/bands").dropDuplicates("doc_id", "band_idx", "band_key").count())
  }

  test("contamination flags probe-overlapping docs, leaves clean docs at zero") {
    val evalText = "the capital of france is paris and the capital of spain is madrid"
    val df = docs(
      (1L, "en", evalText),                                        // the probe itself
      (2L, "en", s"trivia dump says $evalText among other things"), // contains the probe verbatim
      (3L, "en", "the capital of germany is berlin not lyon at all"), // one shared shingle
      (4L, "en", "completely unrelated text about spark dataframes here"))
    val r = Dedup.contamination(df, df.filter($"doc_id" === 1L), minOverlap = 3)
      .orderBy("doc_id").collect()
    assert(r(0).getBoolean(2) && r(1).getBoolean(2))      // probe + verbatim superset
    assert(r(1).getLong(1) >= r(0).getLong(1))            // superset shares all probe shingles
    assert(r(2).getLong(1) > 0 && !r(2).getBoolean(2))    // partial overlap below threshold
    assert(r(3).getLong(1) == 0 && !r(3).getBoolean(2))   // clean doc
  }

  test("minhash map-side signatures equal the exploded-agg formulation") {
    val df = docs(
      (1L, "en", "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "de", "der schnelle braune fuchs springt heute nacht"))
    val sh = df.select($"doc_id", TextAnalysis.shingles($"text").as("sh"))
    val mapSide = sh.select($"doc_id" +:
      Dedup.minhashSigCols($"sh", 6).zipWithIndex.map { case (c, i) => c.as(s"m$i") }: _*)
    val slots = Dedup.minhashSlots($"s", 6)
    val agged = sh.select($"doc_id", explode($"sh").as("s"))
      .groupBy($"doc_id")
      .agg(min(slots.head).as("m0"),
        slots.zipWithIndex.tail.map { case (h, i) => min(h).as(s"m$i") }: _*)
    assert(mapSide.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      agged.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("percentile_approx sketch tracks exact percentiles within accuracy bound") {
    // the 100 TB escape hatch for exact `percentile` (which buffers each
    // group's values): a bounded KLL-style sketch, single pass, mergeable
    // partials — self-checked against the exact answer like dailyApprox
    val df = (1 to 20000).map(i => ((i * 7919) % 20000 + 1).toDouble).toDF("x")
    val acc = 1000 // rank error ~ 1/acc of n
    val got = df.agg(
      expr(s"percentile_approx(x, array(0.5, 0.9, 0.99), $acc)").as("approx"),
      expr("percentile(x, array(0.5, 0.9, 0.99))").as("exact")).head()
    val approx = got.getSeq[Double](0)
    val exact = got.getSeq[Double](1)
    for ((a, e) <- approx.zip(exact))
      assert(math.abs(a - e) <= 20000.0 * 2 / acc + 1, s"approx $a vs exact $e")
  }

  test("dailyApprox HLL estimates stay within the configured rsd of exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val fct = (1 to 2000).map { i =>
      (ts(f"2024-03-0${i % 2 + 1}%d 10:00:00"), "yellow", 2024, 3,
        (i % 211).toLong, (i % 97).toLong, 10.0 + i % 5)
    }.toDF("pickup_datetime", "taxi_type", "year", "month",
      "pickup_location_id", "dropoff_location_id", "total_amount")
    val approx = model.Marts.dailyApprox(fct, rsd = 0.05)
      .select($"trip_date", $"unique_pickup_locations", $"unique_dropoff_locations")
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val exact = fct.groupBy(to_date($"pickup_datetime").as("d"))
      .agg(countDistinct($"pickup_location_id").as("p"),
        countDistinct($"dropoff_location_id").as("q"))
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    // rsd 0.05 ⇒ ±3σ = 15% relative bound (generous, deterministic seed)
    for ((d, (p, q)) <- exact) {
      val (ap, aq) = approx(d)
      assert(math.abs(ap - p) <= math.max(2, 0.15 * p), s"$d pickup: $ap vs $p")
      assert(math.abs(aq - q) <= math.max(2, 0.15 * q), s"$d dropoff: $aq vs $q")
    }
  }

  test("nearDupClusters labels connected components with their min doc_id") {
    // chain 1-2-3 (one component), isolated 4, pair 5-6
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (5L, 6L, 0.7))
      .toDF("doc_i", "doc_j", "jaccard")
    val ids = (1L to 6L).toDF("doc_id")
    val got = Dedup.nearDupClusters(pairs, ids)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L)))
    // keeper selection: one keeper per cluster, minimum id
    val keepers = Dedup.nearDupClusters(pairs, ids)
      .filter($"doc_id" === $"cluster_id").select("doc_id").as[Long].collect().toSet
    assert(keepers == Set(1L, 4L, 5L))
    // a 30-link chain (diameter 29) converges well inside the default
    // budget thanks to pointer jumping — one-hop-only would need 29 rounds.
    // driverMaxEdges = 0 forces the DISTRIBUTED propagation path (the
    // small graph would otherwise take the union-find fast path)
    val chain = (1L until 30L).map(i => (i, i + 1, 0.9)).toDF("doc_i", "doc_j", "jaccard")
    val chainGot = Dedup.nearDupClusters(chain, (1L to 30L).toDF("doc_id"),
      maxIter = 8, driverMaxEdges = 0L)
    assert(chainGot.select("cluster_id").distinct().as[Long].collect().toSeq == Seq(1L))
    // both paths produce the identical labeling on the same graph
    val viaDistributed = Dedup.nearDupClusters(pairs, ids, driverMaxEdges = 0L)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(viaDistributed == got)
  }

  test("scrubPii redacts emails, IPs, and phones; clean text untouched") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.co.uk now"),
      (2L, "server at 192.168.10.254 port 8080"),
      (3L, "call +1 555 0199 22 today"),
      (4L, "no pii here, just 42 words and 3.14"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.scrubPii($"text").as("t"))
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "server at <IP> port 8080")
    assert(got(2) == "call <PHONE> today")
    assert(got(3) == "no pii here, just 42 words and 3.14") // 3.14 is not an IP
  }

  test("splitAssign is deterministic, exhaustive, and roughly proportional") {
    import graft.operators.Sampling
    val ids = (0L until 1000L).toDF("doc_id")
    val counts = ids.select(Sampling.splitAssign($"doc_id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000L)
    // hash buckets are uniform-ish; generous bounds, deterministic seed
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
    // stability: identical assignment on re-evaluation
    val again = ids.select(Sampling.splitAssign($"doc_id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("dupShingleFraction scores repetition; chunking tiles with overlap") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b c a b c a b c"),  // 7 3-grams, 3 distinct → 4/7 duplicated
      (2L, "all distinct words here now"), // 3 3-grams, all distinct → 0
      (3L, "too short")) // no 3-grams
      .toDF("doc_id", "text")
    val rep = df.select($"doc_id",
      TextAnalysis.shingleTotal($"text").as("n"),
      TextAnalysis.dupShingleFraction($"text").as("f"))
      .orderBy("doc_id").as[(Long, Int, Double)].collect()
    assert(rep(0) == ((1L, 7, math.rint((1.0 - 3.0 / 7) * 10000) / 10000)))
    assert(rep(1) == ((2L, 3, 0.0)))
    assert(rep(2) == ((3L, 0, 0.0)))
    // chunking: 320 chars, stride 150, size 200 → starts 1/151/301,
    // lengths 200/170/20 — consecutive chunks overlap by 50
    val text = "x" * 320
    val one = Seq((9L, text)).toDF("doc_id", "text")
    val n = one.select(TextAnalysis.chunkCount($"text", 150)).as[Long].head()
    assert(n == 3L)
    val lens = one.select($"doc_id", explode(sequence(lit(0L), lit(n - 1))).as("i"))
      .select(length(TextAnalysis.chunkAt(lit(text), $"i", 200, 150)))
      .as[Int].collect().toSeq
    assert(lens == Seq(200, 170, 20))
    // empty doc still yields exactly one (empty) chunk
    assert(Seq((1L, "")).toDF("doc_id", "text")
      .select(TextAnalysis.chunkCount($"text", 150)).as[Long].head() == 1L)
  }

  test("quantizeInt8 and l2Normalize handle known and zero vectors") {
    import graft.operators.Embeddings
    val df = Seq(
      (1L, Array(1f, -0.5f, 0f)),
      (2L, Array(3f, 4f)),
      (3L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val q = df.select($"vec_id", Embeddings.quantizeInt8($"embedding").as("q"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(q(0)._2 == Seq(127, -63, 0)) // floor(-63.5 + 0.5) = -63
    assert(q(1)._2 == Seq(95, 127))     // floor(3.0/4.0*127 + 0.5) = 95
    assert(q(2)._2 == Seq(0, 0))        // zero vector: guarded divide
    val n = df.select($"vec_id", Embeddings.l2Normalize($"embedding").as("n"))
      .orderBy("vec_id").as[(Long, Option[Seq[Double]])].collect()
    assert(n(1)._2.get.map(v => math.round(v * 100) / 100.0) == Seq(0.6, 0.8))
    assert(n(2)._2.isEmpty) // zero-norm → NULL, not a divide error
  }

  test("corpus shuffle order is deterministic, seed-sensitive, and split-independent") {
    import graft.operators.Sampling
    val df = (1L to 50L).toDF("doc_id")
    def order(seed: Int) = df
      .select($"doc_id", Sampling.shuffleKey($"doc_id", seed).as("h"))
      .orderBy($"h", $"doc_id").select($"doc_id").as[Long].collect().toSeq
    val o1 = order(Sampling.DefaultShuffleSeed)
    assert(o1 == order(Sampling.DefaultShuffleSeed))       // reproducible
    assert(o1 != order(Sampling.DefaultShuffleSeed + 1))   // seed changes the permutation
    assert(o1.sorted == (1L to 50L))                       // it IS a permutation
    assert(o1 != (1L to 50L))                              // and not the identity
    // shard assignment uses an independent hash: within any shard, the
    // shuffle keys are not a function of membership
    val shards = df.select(Sampling.shuffleShard($"doc_id", 4).as("s"))
      .distinct().as[Long].collect().toSet
    assert(shards.subsetOf((0L until 4L).toSet) && shards.size > 1)
  }

  test("mixtureKeep keeps by per-source percentage, drops unknown sources") {
    import graft.operators.Sampling
    val df = (0L until 300L).map(i =>
      (i, Seq("keep_all", "half", "other")((i % 3).toInt))).toDF("doc_id", "src")
    val kept = df.filter(Sampling.mixtureKeep($"doc_id", $"src",
        Map("keep_all" -> 100, "half" -> 50)))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("keep_all") == 100L)          // weight 100 ⇒ every row
    assert(!kept.contains("other"))           // absent source ⇒ weight 0
    assert(kept("half") > 25 && kept("half") < 75) // hash-proportional
  }

  test("packAssign applies the fixed-boundary rule per shard deterministically") {
    import graft.operators.Packing
    // one shard so the boundary arithmetic is directly checkable:
    // tokens 5,5,5 with maxTokens=8 → cum_before 0,5,10 → packs 0,0,1
    val df = Seq((1L, "a b c d e"), (2L, "f g h i j"), (3L, "k l m n o"))
      .toDF("doc_id", "text")
    val got = Packing.packAssign(df, $"doc_id",
      graft.operators.TextAnalysis.tokenCount($"text"), maxTokens = 8, nShards = 1)
      .orderBy("doc_id").select("doc_id", "pack_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
    // multi-shard: every doc appears exactly once, pack token totals are
    // bounded-ish (a pack exceeds maxTokens only via its last straddling
    // doc), and re-evaluation is stable
    val many = (0L until 200L).map(i => (i, ("w " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "text")
    val packed = Packing.packAssign(many, $"doc_id",
      graft.operators.TextAnalysis.tokenCount($"text"), maxTokens = 16, nShards = 4)
    assert(packed.count() == 200)
    assert(packed.select("shard").distinct().count() == 4)
    val perPack = packed.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("t")).as[(Long, Long, Long)].collect()
    // fixed-boundary: tokens before a pack's last doc stay < maxTokens + max doc len
    assert(perPack.forall(_._3 < 16 + 7))
    val again = Packing.packAssign(many, $"doc_id",
      graft.operators.TextAnalysis.tokenCount($"text"), maxTokens = 16, nShards = 4)
      .select("doc_id", "shard", "pack_id").collect().toSet
    assert(again == packed.select("doc_id", "shard", "pack_id").collect().toSet)
  }

  test("simhash: identical token multisets share a fingerprint") {
    val df = docs((1L, "en", "a b c d"), (2L, "en", "d c b a"), (3L, "en", "w x y z"))
    val sig = Dedup.simhashFingerprint(df).orderBy("doc_id").as[(Long, Long)].collect()
    assert(sig(0)._2 == sig(1)._2)
    assert(sig(0)._2 != sig(2)._2)
  }

  test("native cosine kernel is bit-identical to the composable form") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6) / 3.0f))
    }.toDF("vec_id", "embedding")
    val a = vecs.select($"vec_id", $"embedding".as("va"))
    val b = vecs.select($"vec_id".as("id2"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"vec_id" < $"id2")
    // exclude the fusion rule so "composed" stays genuinely composed —
    // otherwise this comparison is kernel-vs-kernel and proves nothing
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.expr.RewriteComposedCosine")
    try {
      val composed = pairs.select(Similarity.cosineComposed($"va", $"vb").as("c"))
      assert(!composed.queryExecution.optimizedPlan.toString.contains("cosine_similarity"),
        "rule exclusion did not take — comparison would be vacuous")
      val diff = pairs.select(
        Similarity.cosine($"va", $"vb").as("native"),
        Similarity.cosineComposed($"va", $"vb").as("composed"))
        .filter($"native" =!= $"composed" ||
          ($"native".isNull =!= $"composed".isNull))
      assert(diff.count() == 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    // mismatched lengths → NULL, matching zip_with padding semantics
    val m = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("x", "y")
      .select(Similarity.cosine($"x", $"y")).head()
    assert(m.isNullAt(0))
  }

  test("optimizer fuses the composable cosine into the native kernel") {
    // defs, not vals: analysis captures the ANSI mode, so each conf
    // change below needs freshly-built frames
    def withZero = {
      val vecs = Seq((1L, Array(1f, 2f)), (2L, Array(0f, 0f)), (3L, Array(3f, 4f)))
        .toDF("id", "v")
      vecs.select($"v".as("va")).crossJoin(vecs.select($"v".as("vb")))
    }
    def nonZero = {
      val vecs = Seq((1L, Array(1f, 2f)), (3L, Array(3f, 4f))).toDF("id", "v")
      vecs.select($"v".as("va")).crossJoin(vecs.select($"v".as("vb")))
    }
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    val q = withZero.select(Similarity.cosineComposed($"va", $"vb").as("c"))
    assert(q.queryExecution.optimizedPlan.toString.contains("cosine_similarity"),
      s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    // ANSI (the 4.x session default): a zero-norm vector throws Spark's
    // DIVIDE_BY_ZERO error class through BOTH forms — full Divide parity,
    // not just "some exception"
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    def assertDivideByZero(t: Throwable): Unit = {
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toList
      assert(chain.exists {
        case st: org.apache.spark.SparkThrowable => st.getCondition == "DIVIDE_BY_ZERO"
        case _ => false
      }, s"expected DIVIDE_BY_ZERO in cause chain, got: $chain")
    }
    assertDivideByZero(intercept[Exception](q.collect()))
    assertDivideByZero(intercept[Exception](
      withZero.select(Similarity.cosine($"va", $"vb")).collect()))
    // away from the zero-norm edge, rewritten and explicit agree bitwise
    assert(vals(nonZero.select(Similarity.cosineComposed($"va", $"vb").as("c"))) ==
      vals(nonZero.select(Similarity.cosine($"va", $"vb").as("c"))))
    // legacy mode: zero-norm yields NULL through both forms
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ql = withZero.select(Similarity.cosineComposed($"va", $"vb").as("c"))
      assert(ql.filter($"c".isNull).count() == 5)
      assert(withZero.select(Similarity.cosine($"va", $"vb").as("c"))
        .filter($"c".isNull).count() == 5)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("cosine fusion covers double arrays (no-op casts eliminated)") {
    // k-means assignment frames carry array<double>; their composed
    // cosine must fuse too — after SimplifyCasts the dot lambda is a
    // bare product of the variables, the shape the rule's second
    // matcher exists for. Values must stay bitwise equal to the
    // composed double arithmetic (the oracle's formulation).
    val vecs = Seq((1L, Array(1.0, 2.0, 0.5)), (2L, Array(3.0, 4.0, 0.25)),
      (3L, Array(0.1, 0.9, 7.0))).toDF("id", "v")
    val pairs = vecs.select($"v".as("va")).crossJoin(vecs.select($"v".as("vb")))
    val q = pairs.select(Similarity.cosineComposed($"va", $"vb").as("c"))
    assert(q.queryExecution.optimizedPlan.toString.contains("cosine_similarity"),
      s"double-array rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    val fused = q.collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.expr.RewriteComposedCosine")
    try {
      val composed = pairs.select(Similarity.cosineComposed($"va", $"vb").as("c"))
      assert(!composed.queryExecution.optimizedPlan.toString.contains("cosine_similarity"))
      assert(composed.collect().map(_.getDouble(0)).toSeq == fused,
        "fused double kernel diverged from the composed form")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    // the registered function accepts double arrays directly
    assert(pairs.select(Similarity.cosine($"va", $"vb").as("c"))
      .collect().map(_.getDouble(0)).toSeq == fused)
  }

  test("cosine kernel on known vectors") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)), (Array(1f, 2f, 2f), Array(1f, 2f, 2f)))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    assert(got(0) == 0.0 && math.abs(got(1) - 1.0) < 1e-12)
  }

  test("knnBrute ranks by cosine with id tiebreak and excludes self") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)), (3L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.knnBrute(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .orderBy("rn").collect()
    // rank 1: vec 3 (cos 1.0, ties with nothing); rank 2: vec 1
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 1L))
  }

  test("knnBrute drops null-cosine candidates instead of failing") {
    // vec 9 has a mismatched dimension → cosine NULL against 2-d queries;
    // the bounded aggregator's input is a primitive Double, so an
    // unfiltered null would throw at runtime. It must simply be excluded
    // (ranking-window parity: nulls sorted last could never place).
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (9L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.knnBrute(vecs, vecs.filter($"vec_id" === 0), k = 5)
      .orderBy("rn").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(1L))
  }

  test("ivf search returns bucket-local exact results") {
    // centroids at ids 0 (x-axis) and 2 (y-axis); others cluster around them
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.95f, 0.05f)), (4L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val centroids = vecs.filter($"vec_id" === 0 || $"vec_id" === 2)
    val assigned = Similarity.ivfAssign(vecs, centroids)
    val got = Similarity.ivfSearch(assigned, centroids, vecs.filter($"vec_id" === 1), k = 2, nProbe = 2)
      .orderBy("rn").collect()
    // cos((0.95,0.05),(1,0)) ≈ 0.99862 > cos((0.95,0.05),(0.9,0.1)) ≈ 0.99841
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 4L))
  }

  test("cdcChunkPairs: identical docs share every chunk, disjoint docs none") {
    val d = docs(
      (1L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "en", "one two three four five six seven eight nine ten"),
      (4L, "en", "solo"))
    val pairs = Dedup.cdcChunkPairs(d, window = 4, modulus = 8, seed = 41,
        maxChunkDf = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L))) // only the exact twins share chunks
    assert(pairs((1L, 2L)) >= 1)          // every chunk shared; at least one chunk
    // the df cap drops a chunk present in too many docs
    val capped = Dedup.cdcChunkPairs(d, window = 4, modulus = 8, seed = 41,
      maxChunkDf = 1).collect()
    assert(capped.isEmpty)
  }

  test("featureHashStats: counts, argmax tiebreak, empty docs dropped") {
    val bucketOf = Seq("a", "b").toDF("tok")
      .select($"tok", pmod(Dedup.portableHash($"tok", 31), lit(64)).as("bucket"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = Seq((1L, "a a b"), (2L, "   "), (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.featureHashStats(d, dims = 64, seed = 31).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(2L)) // all-whitespace doc yields no buckets
    val r1 = got(1L)          // "a"×2 dominates regardless of bucket ids
    assert(r1.getLong(r1.fieldIndex("nnz")) == (if (bucketOf("a") == bucketOf("b")) 1 else 2))
    assert(r1.getLong(r1.fieldIndex("top_bucket")) == bucketOf("a"))
    // equal weights → smallest bucket wins the argmax tie
    val r3 = got(3L)
    assert(r3.getLong(r3.fieldIndex("top_bucket")) == math.min(bucketOf("a"), bucketOf("b")))
    assert(r3.getLong(r3.fieldIndex("top_w")) == (if (bucketOf("a") == bucketOf("b")) 2 else 1))
  }

  test("ndcgAtK: perfect order scores 1, inverted order scores below 1") {
    // exact top-3 for query 0: neighbors 10, 11, 12 (rel 5, 4, 3 with bruteK=5)
    val brute = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
      .toDF("query_id", "rn", "neighbor_id")
    val perfect = brute
    val inverted = Seq((0L, 1, 12L), (0L, 2, 11L), (0L, 3, 10L))
      .toDF("query_id", "rn", "neighbor_id")
    val p = Similarity.ndcgAtK(brute, perfect, k = 3, bruteK = 5).collect().head
    assert(p.getDouble(p.fieldIndex("ndcg")) == 1.0)
    val i = Similarity.ndcgAtK(brute, inverted, k = 3, bruteK = 5).collect().head
    // inverted DCG = 3 + 4/log2(3) + 5/2 = 8.023719...; IDCG = 5 + 4/log2(3) + 3/2
    val ndcg = i.getDouble(i.fieldIndex("ndcg"))
    assert(ndcg > 0.8 && ndcg < 1.0)
    // a miss (neighbor outside the exact list) contributes zero gain
    val miss = Seq((0L, 1, 99L), (0L, 2, 10L), (0L, 3, 11L))
      .toDF("query_id", "rn", "neighbor_id")
    val m = Similarity.ndcgAtK(brute, miss, k = 3, bruteK = 5).collect().head
    assert(m.getDouble(m.fieldIndex("ndcg")) < ndcg)
  }

  test("labelNoise flags majority-mismatch neighborhoods, strict majority") {
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L))
      .toDF("vec_i", "vec_j")
    val labeled = Seq((0L, 1), (1L, 2), (2L, 2), (3L, 7), (4L, 7))
      .toDF("vec_id", "label")
    val got = Similarity.labelNoise(pairs, labeled).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(got(0L) == ((2L, 2L, true)))   // both neighbors differ → noisy
    assert(got(1L) == ((2L, 1L, false)))  // exactly half differ → NOT strict majority
    assert(got(3L) == ((1L, 0L, false)))  // same-label pair → clean
    assert(got(4L) == ((1L, 0L, false)))
    assert(!got.contains(5L))             // isolated vectors don't appear
  }

  test("asof join picks the latest right row at-or-before, inner semantics") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:10")),
      (3L, "A", ts("2024-01-01 09:00:00")), // before any quote → dropped
      (4L, "B", ts("2024-01-01 10:00:07")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(1.0), 10L),
      ("A", ts("2024-01-01 10:00:10"), None, 20L), // exact tie with trade 2 → taken
      ("B", ts("2024-01-01 10:00:00"), Some(9.0), 30L))
      .toDF("sym", "ts", "px", "sz")
    val got = operators.AsOfJoin.asof(trades, quotes, "sym", "ts")
      .orderBy("trade_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // trade 2 must take the WHOLE 10:00:10 row — px NULL included; a
    // per-column fill would stitch px=1.0 from the older row (chimera)
    assert(got.map(r => if (r.isNullAt(r.fieldIndex("px"))) None
      else Some(r.getDouble(r.fieldIndex("px")))).toSeq == Seq(Some(1.0), None, Some(9.0)))
    assert(got.map(_.getLong(got.head.fieldIndex("sz"))).toSeq == Seq(10L, 20L, 30L))
    assert(got(1).getTimestamp(got(1).fieldIndex("asof_ts")) == ts("2024-01-01 10:00:10"))
    // colliding value-column names are refused, not silently merged
    val boom = intercept[IllegalArgumentException] {
      operators.AsOfJoin.asof(trades.withColumn("px", lit(0.0)), quotes, "sym", "ts")
    }
    assert(boom.getMessage.contains("px"))
  }

  test("bucketed range join equals the naive inequality join") {
    val points = (0L to 300L by 7L).map(p => (p, s"p$p")).toDF("x", "tag")
    val intervals = Seq((0L, 9L, "i0"), (5L, 120L, "i1"), (100L, 100L, "i2"),
      (250L, 260L, "i3"), (400L, 500L, "i4"))
      .toDF("lo", "hi", "name")
    val bucketed = operators.RangeJoin
      .pointInInterval(points, "x", intervals, "lo", "hi", bucketWidth = 16)
      .select("x", "name").orderBy("x", "name").collect().toSeq
    val naive = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("x", "name").orderBy("x", "name").collect().toSeq
    assert(bucketed == naive && naive.nonEmpty)
    // overlap really happens: some point is in two intervals
    assert(bucketed.groupBy(_.getLong(0)).exists(_._2.size > 1))
  }

  test("sessionize splits on gap and aggregates per session") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "a", 2.0),
      (3L, ts("2024-01-01 11:30:00"), 7L, "a", 4.0), // 80 min gap → new session
      (4L, ts("2024-01-01 10:00:00"), 8L, "b", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val s = operators.Events.sessionize(ev, gapMinutes = 30)
      .orderBy("user_id", "session_idx").collect()
    assert(s.length == 3)
    assert(s(0).getLong(s(0).fieldIndex("n_events")) == 2)
    assert(s(0).getDouble(s(0).fieldIndex("total_value")) == 3.0)
    assert(s(1).getLong(s(1).fieldIndex("n_events")) == 1)
  }

  test("sessionizeWindowed (built-in session_window) agrees with lag+cumsum") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      (2L, ts("2024-01-01 10:20:00"), 7L, "a", 2.0),
      (3L, ts("2024-01-01 11:30:00"), 7L, "a", 4.0),
      (4L, ts("2024-01-01 09:00:00"), 8L, "b", 8.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_start", "session_end", "n_events", "total_value")
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq.map {
          case t: java.sql.Timestamp => t.getTime
          case t: java.time.LocalDateTime =>
            t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          case v => v
        }).toSeq
    assert(canon(operators.Events.sessionizeWindowed(ev, 30)) ==
      canon(operators.Events.sessionize(ev, 30).drop("session_idx")))
  }

  test("aggregator top-k equals the ranking-window top-k") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = (1 to 200).map { i =>
      (i.toLong, ts("2024-01-01 10:00:00"), (i % 7).toLong, s"t${i % 3}", (i * 37 % 101).toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "rn").collect().map(_.toSeq).toSeq
    assert(canon(Events.topKPerUserAgg(ev, 4)) == canon(Events.topKPerUser(ev, 4)))
  }

  test("real multimodal decode: PNG and WAV via JDK codecs; video/corrupt skip") {
    // 20×10 gradient PNG, written by the JDK encoder itself
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 20; y <- 0 until 10) img.setRGB(x, y, (x * 12) << 16 | (y * 25))
    val pbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pbos)
    val png = pbos.toByteArray
    // 0.1 s mono 8 kHz 16-bit PCM WAV
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.tabulate[Byte](1600)(i => (i % 251).toByte)),
      fmt, 800)
    val wbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ain,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wbos)
    val media = Seq(
      MediaRecord(1L, "image", png),
      MediaRecord(2L, "audio", wbos.toByteArray),
      // real multi-frame container in the video branch: animated GIF,
      // frames counted exactly via ImageReader.getNumImages(true)
      MediaRecord(3L, "video", graft.operators.MediaPayloads.gif(8, 5, 4)),
      MediaRecord(4L, "image", Array[Byte](9, 9)),
      // valid PNG magic, truncated body: the reader THROWS (vs returning
      // null) — must still take the skip row, not kill the task
      MediaRecord(5L, "image", png.take(30)),
      // genuinely undecodable video bytes (no JDK codec claims them)
      MediaRecord(6L, "video", Array[Byte](1, 2, 3))).toDS()
    val got = Multimodal.extractReal(media).collect().sortBy(_.doc_id)
    assert(got(0).decoded && got(0).width == 20 && got(0).height == 10 &&
      got(0).channels == 3 && got(0).embedding.length == 64)
    assert(got(0).embedding.forall(v => v >= 0f && v <= 1f))
    assert(got(1).decoded && got(1).channels == 1 &&
      got(1).sample_rate == 8000 && got(1).n_frames == 800L)
    assert(got(2).decoded && got(2).width == 8 && got(2).height == 5 &&
      got(2).n_frames == 4L && got(2).embedding.length == 64)
    assert(!got(3).decoded && !got(4).decoded && !got(5).decoded) // skip-don't-crash
    assert(got(3).content_hash.length == 32)   // corrupt items stay traceable
    // resize re-encodes; re-decoding sees the new dimensions
    val resized = graft.operators.Multimodal.resizeImage(png, 8, 4).get
    assert(Multimodal.decodeImage(resized).get._1 == 8)
    assert(Multimodal.decodeImage(resized).get._2 == 4)
  }

  test("decoded thumbnail embeddings drive cosine near-dup detection end-to-end") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 32) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      MediaRecord(0L, "image", png((x, y) => (x * 8 & 0xFF) << 16 | (y * 8 & 0xFF))),
      MediaRecord(1L, "image", png((x, y) => ((x * 8 + 3) & 0xFF) << 16 | (y * 8 & 0xFF))),
      MediaRecord(2L, "image", png((x, y) => if ((x / 4 + y / 4) % 2 == 0) 0xFFFFFF else 0)))
      .toDS()
    val emb = Multimodal.extractReal(media).toDF()
      .select(col("doc_id").as("vec_id"), lit("img").as("label"), col("embedding"))
    // the real-decode path feeds the same similarity operators as any
    // other embedding column — only the shifted-gradient pair is near-dup
    val pairs = Similarity.cosineDupPairs(emb, threshold = 0.99).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("corpus media fan-out: real containers per kind, geometry from doc_id, corrupt cycle skips") {
    import graft.operators.Multimodal._
    // ids 0/1/2 hit the three kinds; 5 is on the corrupt cycle (5 % 31 == 5)
    val df = docs((0L, "en", "a"), (1L, "en", "b"), (2L, "en", "c"), (5L, "en", "d"))
    val r = Multimodal.features(df).orderBy("doc_id")
      .select("doc_id", "media_type", "decoded", "width", "height",
        "channels", "sample_rate", "n_frames").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("image", "audio", "video", "video"))
    // image 0: PNG of (ImgWBase, ImgHBase), 3 channels, 1 frame
    assert(r(0).getBoolean(2) && r(0).getInt(3) == ImgWBase &&
      r(0).getInt(4) == ImgHBase && r(0).getInt(5) == 3 && r(0).getLong(7) == 1L)
    // audio 1: mono WAV at WavRate with WavFramesBase + 1 frames
    assert(r(1).getBoolean(2) && r(1).getInt(5) == 1 &&
      r(1).getInt(6) == WavRate && r(1).getLong(7) == (WavFramesBase + 1).toLong)
    // video 2: GIF of (GifWBase+2, GifHBase+2) with GifFramesBase+2 frames
    assert(r(2).getBoolean(2) && r(2).getInt(3) == GifWBase + 2 &&
      r(2).getInt(4) == GifHBase + 2 && r(2).getLong(7) == (GifFramesBase + 2).toLong)
    // corrupt 5: undecodable bytes take the zeroed skip row
    assert(!r(3).getBoolean(2) && r(3).getInt(3) == 0 && r(3).getLong(7) == 0L)
    // determinism: the same id yields byte-identical payloads
    assert(java.util.Arrays.equals(mediaFor(7L).content, mediaFor(7L).content) &&
      mediaFor(7L).media_type == "audio")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2 collapses runs, versions re-instated values, null-safe changes") {
    val ch = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some("A"), 1L),
      (1L, ts("2024-01-02 00:00:00"), Some("A"), 2L), // same run
      (1L, ts("2024-01-03 00:00:00"), Some("B"), 3L), // change
      (1L, ts("2024-01-04 00:00:00"), Some("A"), 4L), // re-instated ⇒ NEW version
      (2L, ts("2024-01-01 00:00:00"), None, 5L),      // first row, null attr
      (2L, ts("2024-01-02 00:00:00"), None, 6L),      // null → null is NOT a change
      (2L, ts("2024-01-03 00:00:00"), Some("X"), 7L)
    ).toDF("user_id", "ts", "status", "event_id")
    val got = Scd.scd2(ch, "user_id", "ts", "status", "event_id")
      .orderBy("user_id", "version").collect()
    assert(got.length == 5)
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(u1.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
    // valid_to chains to the next run's valid_from; only the last is open
    assert(u1(0).getTimestamp(3) == ts("2024-01-03 00:00:00"))
    assert(u1(1).getTimestamp(3) == ts("2024-01-04 00:00:00"))
    assert(u1(2).isNullAt(3) && u1(2).getBoolean(5) && !u1(0).getBoolean(5))
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length == 2 && u2(0).isNullAt(1) && u2(1).getString(1) == "X")
    assert(u2(0).getTimestamp(2) == ts("2024-01-01 00:00:00") &&
      u2(0).getTimestamp(3) == ts("2024-01-03 00:00:00"))
  }

  test("rollingFeatures: trailing frame stats and previous-event deltas") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 00:00:10"), 2.0),
      (1L, 12L, ts("2024-01-01 00:01:00"), 4.0),
      (2L, 13L, ts("2024-01-01 00:00:00"), 7.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Events.rollingFeatures(ev, nPrev = 3)
      .orderBy("user_id", "event_id").collect()
    // first event per user: frame is itself; no previous row
    assert(got(0).getDouble(4) == 1.0 && got(0).getDouble(5) == 1.0 &&
      got(0).isNullAt(6) && got(0).isNullAt(7))
    assert(got(1).getDouble(4) == 1.5 && got(1).getDouble(5) == 3.0 &&
      got(1).getDouble(6) == 1.0 && got(1).getLong(7) == 10L)
    // avg(1,2,4) = 7/3 rounded to 6; gap 00:00:10 → 00:01:00 is 50 s
    assert(got(2).getDouble(4) == 2.333333 && got(2).getDouble(5) == 7.0 &&
      got(2).getDouble(6) == 2.0 && got(2).getLong(7) == 50L)
    assert(got(3).getDouble(4) == 7.0 && got(3).isNullAt(6))
  }

  test("sliding windows place each event in width/slide overlapping windows") {
    val ev = Seq((20L, ts("2024-01-01 00:40:00"), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.sliding(ev, "1 hour", "30 minutes")
      .orderBy("window_start").collect()
    // 00:40 falls in the 1 h windows starting 00:00 and 00:30 — exactly two
    assert(got.length == 2)
    assert(got.map(_.getAs[java.time.LocalDateTime]("window_start").toString).toSeq ==
      Seq("2024-01-01T00:00", "2024-01-01T00:30"))
    assert(got.forall(r => r.getLong(2) == 1L && r.getDouble(3) == 1.0))
  }

  test("stratifiedTake draws exact-size, deterministic, seed-sensitive strata") {
    val df = (1L to 40L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val a = Sampling.stratifiedTake(df, $"lang", $"doc_id", n = 3)
    val b = Sampling.stratifiedTake(df, $"lang", $"doc_id", n = 3)
    val got = a.orderBy("lang", "rank_in_stratum").collect()
    assert(got.length == 6) // exactly n per stratum, not in expectation
    assert(got.map(_.getInt(2)).toSeq == Seq(1, 2, 3, 1, 2, 3))
    assert(a.collect().toSet == b.collect().toSet) // stable across runs
    val other = Sampling.stratifiedTake(df, $"lang", $"doc_id", n = 3, seed = 99)
    assert(other.select("doc_id").as[Long].collect().toSet !=
      a.select("doc_id").as[Long].collect().toSet) // seed moves the draw
    // n >= stratum size degrades to the full stratum
    assert(Sampling.stratifiedTake(df, $"lang", $"doc_id", n = 100).count() == 40)
  }

  test("weightedTake favors heavy rows and stays deterministic") {
    // one extreme weight per stratum: u^(1/w) → 1 as w grows, so the
    // heavy doc must be drawn; tiny weights are effectively never drawn
    val df = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", if (i == 2L || i == 3L) 1000000L else 1L))
      .toDF("doc_id", "lang", "w")
    val got = Sampling.weightedTake(df, $"lang", $"doc_id", $"w", n = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    val again = Sampling.weightedTake(df, $"lang", $"doc_id", $"w", n = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
    // exact-size draw per stratum
    assert(Sampling.weightedTake(df, $"lang", $"doc_id", $"w", n = 3).count() == 6)
    // non-positive weights raise instead of silently never sampling
    val bad = Seq((1L, "en", 0L), (2L, "en", 5L)).toDF("doc_id", "lang", "w")
    val e = intercept[Throwable] {
      Sampling.weightedTake(bad, $"lang", $"doc_id", $"w", n = 1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("positive weights")))
  }

  test("debounce keeps each burst's first event with the burst size") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0), // burst 1 head
      (2L, ts("2024-01-01 10:01:00"), 7L, "click", 1.0), // suppressed
      (3L, ts("2024-01-01 10:03:00"), 7L, "click", 1.0), // suppressed (chained)
      (4L, ts("2024-01-01 10:30:00"), 7L, "click", 1.0), // burst 2 head
      (5L, ts("2024-01-01 10:00:30"), 7L, "view", 1.0),  // other type: own burst
      (6L, ts("2024-01-01 10:00:30"), 8L, "click", 1.0)) // other user: own burst
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.debounce(ev, withinSeconds = 300)
      .select("event_id", "burst_size").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("winsorize clamps into the rounded percentile envelope") {
    val df = (1 to 100).map(i => (i.toLong, "a", i.toDouble)).toDF("id", "g", "v")
    val got = Sketches.winsorize(df, $"g", $"v")
    val cuts = got.select("lo_cut", "hi_cut").head()
    assert(cuts.getDouble(0) == 5.95 && cuts.getDouble(1) == 95.05)
    val clipped = got.filter($"is_clipped").select("v").as[Double].collect().toSet
    assert(clipped == ((1 to 5) ++ (96 to 100)).map(_.toDouble).toSet)
    // clamped values sit exactly on the cuts
    assert(got.filter($"v" === 1.0).head().getAs[Double]("clipped") == 5.95)
    assert(got.filter($"v" === 100.0).head().getAs[Double]("clipped") == 95.05)
    assert(got.filter($"v" === 50.0).head().getAs[Double]("clipped") == 50.0)
    // reserved output columns refused
    val e = intercept[IllegalArgumentException] {
      Sketches.winsorize(df.withColumn("clipped", lit(1)), $"g", $"v")
    }
    assert(e.getMessage.contains("clipped"))
  }

  test("fuzzyMatch pairs words with their closest probe within the cut") {
    val words = Seq("table", "query", "zzz", "query").toDF("word")
    val probes = Seq("tabel", "qury").toDF("probe")
    val got = TextAnalysis.fuzzyMatch(words, probes, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("table", "tabel", 2), ("query", "qury", 1)))
  }

  test("resizeAll round-trips images at the target geometry, skips the rest") {
    val recs = Seq(
      MediaRecord(1L, "image", MediaPayloads.png(16, 9)),
      MediaRecord(2L, "audio", MediaPayloads.wav(8000, 100)),
      MediaRecord(3L, "image", "not an image".getBytes("UTF-8")))
    val got = Multimodal.resizeAll(spark.createDataset(recs), 4, 3)
      .collect().map(r => r.doc_id -> r).toMap
    assert(got(1L) == ResizedMedia(1L, resized = true, 4, 3, 3))
    assert(!got(2L).resized && !got(3L).resized)
  }

  test("trigramSearch through the stored index equals the plain substring scan") {
    val df = docs(
      (1L, "en", "the quick brown fox"),
      (2L, "en", "quick silver"),
      (3L, "en", "a brown cow"),
      (4L, "en", "qu")) // shorter than a trigram: indexes nothing
    val dir = java.nio.file.Files.createTempDirectory("graft_trigram").toString + "/idx"
    TextAnalysis.trigramIndexWrite(df, dir)
    val probes = Seq("quick", "brown", "own c")
    val got = TextAnalysis.trigramSearch(spark, dir, df, probes)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = df.collect().flatMap { r =>
      probes.collect { case p if r.getString(2).contains(p) => (r.getLong(0), p) }
    }.toSet
    assert(got == want && want.nonEmpty)
    // a probe whose trigrams all exist but never contiguously: coverage
    // generates the candidate, the verify pass must kill it
    assert(TextAnalysis.trigramSearch(spark, dir, df, Seq("quick brown")).count() == 1)
    assert(TextAnalysis.trigramSearch(spark, dir, df, Seq("brown quick")).count() == 0)
  }

  test("pageRank: uniform on regular graphs, mass-conserving, favors in-degree") {
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    // 3-cycle: regular → stationary uniform from any start
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val uni = Graph.pageRank(nodes, cycle, iters = 5)
      .collect().map(_.getDouble(1)).toSeq
    assert(uni.forall(r => math.abs(r - 1.0 / 3) < 1e-6))
    // node 0 receives two in-edges, node 2 none: rank0 > rank1 > rank2,
    // total mass stays 1 (dangling-free)
    val star = Seq((1L, 0L), (2L, 0L), (0L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(nodes, star, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) > got(1L) && got(1L) > got(2L), s"unexpected ranking: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("PCA leading component aligns with the dominant variance direction") {
    import graft.operators.Pca
    // variance overwhelmingly along an equal mix of dims 0 and 1,
    // noise elsewhere: the leading loadings must put ~all weight
    // there, split evenly, and stay unit-norm
    val rows = (0 until 40).map { r =>
      val v = (r % 7 - 3) * 10.0
      (r.toLong, Array.tabulate(4)(d =>
        (if (d == 0 || d == 1) v else (r * 31 % 5 - 2) * 0.01).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val got = Pca.leadingComponent(emb, dims = 4, iters = 12)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1, 2, 3, 4))
    val norm2 = got.values.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"not unit norm: $norm2")
    assert(math.abs(math.abs(got(1)) - math.sqrt(0.5)) < 1e-3, s"dim0: ${got(1)}")
    assert(math.abs(got(1) - got(2)) < 1e-6, "dims 0/1 must load equally")
    assert(math.abs(got(3)) < 0.01 && math.abs(got(4)) < 0.01)
  }

  test("audioSamples round-trips the generator's PCM and audioWindows frames it") {
    import graft.operators.{MediaPayloads, MediaRecord, Multimodal}
    val bytes = MediaPayloads.wav(8000, 600)
    val smp = Multimodal.audioSamples(bytes).get
    assert(smp.length == 600)
    assert(smp.take(4).toSeq == Seq(-16384, -16256, -16128, -16000))
    assert(Multimodal.audioSamples("nope".getBytes("UTF-8")).isEmpty)
    val media = Seq(
      MediaRecord(1L, "audio", bytes),
      MediaRecord(2L, "audio", "corrupt".getBytes("UTF-8")),
      MediaRecord(3L, "image", MediaPayloads.png(4, 4))).toDS()
    val got = Multimodal.audioWindows(media, window = 250).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // 600 samples → windows of 250/250/100; corrupt and image rows skipped
    assert(got.keySet == Set((1L, 0), (1L, 1), (1L, 2)))
    assert(got((1L, 2))._1 == 100L)
    val expRms0 = math.sqrt(
      (0 until 250).map(i => math.pow((((i % 256) - 128) * 128).toDouble, 2)).sum / 250)
    assert(math.abs(got((1L, 0))._2 - expRms0) < 1e-5)
  }

  test("BPE learns the classic merge order and application is greedy-equivalent") {
    import graft.operators.Bpe
    // "low" ×5, "lower" ×2, "newest" ×6, "widest" ×3 — the Sennrich
    // worked example family: "es" (9) then "est" (9) dominate, then
    // "lo" (7)
    val docs = Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val vocab = Bpe.wordVocab(docs)
    assert(vocab.count() == 4)
    val (learned, finalVocab) = Bpe.learnMerges(vocab, merges = 3)
    assert(learned.map(m => (m._2, m._3, m._4)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)),
      s"unexpected merges: $learned")
    val syms = finalVocab.select(col("word"), col("s")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(syms("newest") == "n e w est" && syms("low") == "lo w")
    // same-symbol runs converge under the fixed replace passes:
    // "aaaa" under merge (a,a) → "aa aa"
    val run = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val (m2, v2) = Bpe.learnMerges(Bpe.wordVocab(run), merges = 1)
    assert(m2.head._2 == "a" && m2.head._3 == "a")
    assert(v2.select(col("s")).head().getString(0) == "aa aa")
  }

  test("prefixJaccardPairs equals the full-index join on generated docs") {
    import graft.operators.Dedup
    // overlapping word streams so real near-dup pairs exist at 0.5
    val docs = (0 until 30).map { i =>
      val words = (0 until 12).map(w => s"w${(i / 2 * 5 + w) % 40}")
      (i.toLong, s"l${i % 2}", words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val full = canon(Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxDocFreq = 100))
    val pref = canon(Dedup.prefixJaccardPairs(docs, threshold = 0.5, maxDocFreq = 100))
    assert(full.nonEmpty, "fixture must produce pairs")
    assert(pref == full)
    // and with a biting df-cut the variants must still agree
    val fullCut = canon(Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxDocFreq = 3))
    val prefCut = canon(Dedup.prefixJaccardPairs(docs, threshold = 0.5, maxDocFreq = 3))
    assert(prefCut == fullCut)
  }

  test("repeatedSpans finds maximal cross-document runs, not within-doc repeats") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "a b c d e x y"),   // "a b c d e" shared with doc 2 → run of 3 windows
      (2L, "q a b c d e r"),
      (3L, "u v w x y z"),     // nothing shared at 3-word granularity
      (4L, "s t")              // shorter than the window → zero windows
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 5 windows, 3 repeated ("a b c","b c d","c d e") → max span 5 words
    assert(got(1L) == (5L, 3L, 5L), s"doc1: ${got(1L)}")
    assert(got(2L) == (5L, 3L, 5L), s"doc2: ${got(2L)}")
    assert(got(3L) == (4L, 0L, 0L), s"doc3: ${got(3L)}")
    assert(got(4L) == (0L, 0L, 0L), s"doc4: ${got(4L)}")
  }

  test("bfsDistances: exact hops within the budget, -1 beyond it") {
    val nodes = (0L to 6L).toDF("id")
    // path 0→1→2→3→4→5 plus isolated 6
    val edges = (0L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val src = Seq(0L).toDF("id")
    val got = Graph.bfsDistances(nodes, edges, src, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> -1, 5L -> -1, 6L -> -1))
    // two sources: every node adopts the NEAREST one
    val two = Graph.bfsDistances(nodes, edges, Seq(0L, 4L).toDF("id"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(two(4L) == 0 && two(5L) == 1 && two(3L) == 3)
  }

  test("collocations ranks high-PMI pairs first and applies the min-count cut") {
    import graft.operators.TextAnalysis
    // "aa bb" always co-occur (max PMI); "cc" pairs promiscuously with
    // dd/ee so its pairs score lower; "ff gg" appears only 4 times
    // (under the cut of 5)
    val docs = (
      Seq.fill(6)("aa bb xx") ++
      Seq.fill(5)("cc dd xx") ++ Seq.fill(5)("cc ee xx") ++
      Seq.fill(4)("ff gg xx")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, minCount = 5, k = 10).collect()
    assert(got.head.getString(0) == "aa" && got.head.getString(1) == "bb")
    val pairs = got.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("ff", "gg")), "min-count cut failed")
    // PMI must strictly decrease from the exclusive pair to the shared ones
    val pmiOf = got.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(pmiOf(("aa", "bb")) > pmiOf(("cc", "dd")))
  }

  test("nbLangConfusion separates disjoint-vocabulary classes perfectly") {
    import graft.operators.TextAnalysis
    val docs = (
      Seq.fill(8)(("en", "the quick brown fox jumps")) ++
      Seq.fill(8)(("de", "der schnelle braune fuchs springt"))
    ).zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.nbLangConfusion(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("en", "en") -> 8L, ("de", "de") -> 8L),
      s"confusion matrix not diagonal: $got")
  }

  test("ewma entry semantics: constant series is a fixed point") {
    // mirror of the ev_ewma entry's lag formulation on a constant
    // series: whatever subset of lags is available, num/den == c
    val alpha = 0.25
    val wts = (0 until 8).map(i => alpha * math.pow(1 - alpha, i))
    val events = (1 to 20).map(i => (1L, i.toLong, 5.5)).toDF("user_id", "event_id", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    val lags = (0 until 8).map(i =>
      if (i == 0) col("value") else lag(col("value"), i).over(w))
    val num = lags.zip(wts).map { case (l, wt) =>
      when(l.isNotNull, l * lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    val den = lags.zip(wts).map { case (l, wt) =>
      when(l.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    val got = events.select(round(num / den, 6).as("ewma"))
      .collect().map(_.getDouble(0))
    assert(got.forall(_ == 5.5), s"constant series must be an EWMA fixed point: ${got.toSeq}")
  }

  test("triangleCounts: exact per-node counts, dup/reversed/self edges collapse") {
    val nodes = (0L to 5L).toDF("id")
    // K4 on {0,1,2,3} (4 triangles, 3 per node) + pendant 4 + isolated 5;
    // noise: self-loop, a reversed duplicate, and a parallel duplicate
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val edges = (k4 ++ Seq((3L, 4L), (2L, 2L), (1L, 0L), (0L, 2L)))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 0L, 5L -> 0L))
    // global invariant: member counts sum to 3× the triangle count (K4 has 4)
    assert(got.values.sum == 12L)
  }

  test("ssspRounds relaxes min-cost within the edge budget") {
    val nodes = (0L to 3L).toDF("id")
    // direct 0->2 costs 10; the 2-edge path 0->1->2 costs 6
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 10L)).toDF("src", "dst", "w")
    val src = Seq(0L).toDF("id")
    val one = Graph.ssspRounds(nodes, edges, src, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(0L -> 0L, 1L -> 5L, 2L -> 10L, 3L -> -1L), s"$one")
    val two = Graph.ssspRounds(nodes, edges, src, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(2L) == 6L, s"2-edge relaxation must beat the direct edge: $two")
  }

  test("kCoreRounds peels simultaneously and reports surviving-subgraph degrees") {
    // triangle {0,1,2} + pendant 3 on node 0: round 1 peels 3 (deg 1),
    // the triangle is then a stable 2-core
    val nodes = (0L to 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = Graph.kCoreRounds(nodes, edges, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2)))).toMap
    assert(got == Map(0L -> ((true, 2)), 1L -> ((true, 2)),
      2L -> ((true, 2)), 3L -> ((false, 0))), s"$got")
    // path 0-1-2-3 under k=2 erodes from both ends to nothing in 2 rounds
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val gone = Graph.kCoreRounds(nodes, path, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gone.values.forall(_ == false), s"path must fully peel: $gone")
  }

  test("cmsJoinSize never undercounts and is exact on a collision-free sketch") {
    import graft.operators.Sketches
    // R: key i appears i times (i=1..10); S: key i appears 11-i times
    val r = (1 to 10).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k0")
    val s = (1 to 10).flatMap(i => Seq.fill(11 - i)(i.toLong)).toDF("k0")
    val truth = (1 to 10).map(i => i * (11 - i)).sum // Σ r_k·s_k = 220
    val wide = Sketches.cmsJoinSize(
      Sketches.cmsBuild(r, col("k0"), 4, 4096, 7),
      Sketches.cmsBuild(s, col("k0"), 4, 4096, 7)).collect()(0).getLong(0)
    assert(wide == truth, s"collision-free sketch must be exact: $wide vs $truth")
    val narrow = Sketches.cmsJoinSize(
      Sketches.cmsBuild(r, col("k0"), 4, 2, 7),
      Sketches.cmsBuild(s, col("k0"), 4, 2, 7)).collect()(0).getLong(0)
    assert(narrow >= truth, s"CMS inner product must never undercount: $narrow")
  }

  test("winnowProfile guarantees a shared fingerprint for long shared runs") {
    import graft.operators.Dedup
    // docs 1 and 2 share an 8-word run (>= gram+window-1 = 6 words ⇒
    // guaranteed common pick); doc 3 is disjoint; doc 4 too short for
    // a complete window (grams < window)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet pink brown black"),
      (4L, "tiny doc here")
    ).toDF("doc_id", "text")
    val prof = Dedup.winnowProfile(docs, gramWords = 3, window = 4, seed = 53)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof(4L) == ((0L, 0L)), "short doc must profile to zero picks")
    assert(prof(1L)._1 > 0 && prof(2L)._1 > 0 && prof(3L)._1 > 0)
    // the guarantee is on the SELECTED HASHES: re-derive the pick sets
    // and assert docs 1/2 intersect while 3 stays disjoint
    val t = split(col("text"), "\\s+")
    val grams = docs.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", slice(t, i + 1, lit(3))))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("gram"))
    val comb = pmod(Dedup.portableHash(col("gram"), 53), lit(1L << 40)) *
      lit(1L << 20) + (lit((1L << 20) - 1) - col("p"))
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    val picks = grams.withColumn("comb", comb)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("m", min(col("comb")).over(byPos.rowsBetween(0, 3)))
      .filter(col("p") <= col("n") - 3)
      .select(col("doc_id"), shiftright(col("m"), 20).as("h")).distinct()
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((picks(1L) & picks(2L)).nonEmpty, "shared 8-word run must share a fingerprint")
    assert((picks(1L) & picks(3L)).isEmpty, "disjoint docs must not collide")
  }

  test("count-min estimates never undercount and are exact on a sparse sketch") {
    import graft.operators.Sketches
    val df = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(i.toLong)).toDF("k0")
    val cells = Sketches.cmsBuild(df, col("k0"), depth = 4, width = 512, seed = 7)
    // depth×width cells only, however many keys stream through
    assert(cells.count() <= 4 * 512)
    val probes = df.select(col("k0")).distinct()
    val est = Sketches.cmsEstimate(cells, probes, col("k0"),
      depth = 4, width = 512, seed = 7)
    val truth = df.groupBy(col("k0")).agg(count(lit(1)).as("n"))
      .withColumn("k", col("k0").cast("string"))
    val rows = truth.join(est, Seq("k"))
      .select(col("n"), col("est_n")).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) >= r.getLong(0)))
    // 50 keys into 4×512 buckets: collisions are possible but the MIN
    // over 4 independent rows resolving every key exactly is the
    // overwhelmingly expected outcome — and deterministic given the
    // fixed seed, so this is a regression pin, not a flake
    assert(rows.forall(r => r.getLong(1) == r.getLong(0)))
  }

  test("waterFill saturates small-ratio sources, floats the rest at λ·w") {
    val stats = Seq(("A", 1.0, 10.0), ("B", 1.0, 100.0)).toDF("source", "w", "cap")
    // budget = 0.5 · 110 = 55: A (ratio 10) saturates, B floats at
    // λ = (55 − 10) / 1 = 45
    val got = Sampling.waterFill(stats, 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(got == Map("A" -> (10.0, true), "B" -> (45.0, false)))
    // budget beyond the total: everyone capped
    val full = Sampling.waterFill(stats, 2.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(full == Map("A" -> (10.0, true), "B" -> (100.0, true)))
  }

  test("tableDiff emits only disagreeing keys with their status") {
    val left = Seq((1L, Some("a")), (2L, Some("b")), (4L, Some("d")), (5L, None))
      .toDF("k", "v")
    val right = Seq((1L, Some("a")), (2L, Some("B")), (6L, Some("f")), (5L, None))
      .toDF("k", "v")
    val got = Merge.tableDiff(left, right, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 1 agrees, key 5 agrees null-safely — neither emitted
    assert(got == Map(2L -> "changed", 4L -> "only_left", 6L -> "only_right"))
    val e = intercept[IllegalArgumentException] {
      Merge.tableDiff(left, right.withColumnRenamed("v", "x"), "k")
    }
    assert(e.getMessage.contains("absent"))
  }

  test("heavyHitters finds every guaranteed hitter exactly, across partitionings") {
    // 2000 'hot' + 1000 'warm' + 1000 singletons: with capacity 16 the
    // error bound is n/16 = 250, so both hot and warm are guaranteed
    val items = (Seq.fill(2000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 1000).map(i => s"cold$i"))
    for (parts <- Seq(1, 7, 32)) {
      val df = items.toDF("word").repartition(parts)
      val got = Sketches.heavyHitters(df, "word", capacity = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("hot") == 2000L && got("warm") == 1000L,
        s"guaranteed hitters missing/miscounted at $parts partitions: $got")
      // counts are EXACT for every emitted candidate (pass 2 is exact)
      assert(got.forall { case (w, n) =>
        n == items.count(_ == w)
      }, s"candidate counts not exact: $got")
    }
    // threshold n/4 = 1000: only 'hot' survives a caller-side cut
    val df = items.toDF("word")
    val cut = Sketches.heavyHitters(df, "word", capacity = 16)
      .filter($"n_occurrences" > items.length / 4)
      .collect().map(_.getString(0)).toSeq
    assert(cut == Seq("hot"))
  }

  test("dedupSegments keeps the corpus-wide first occurrence and reassembles in order") {
    val df = docs((1L, "en", "a b c d"), (2L, "en", "c d e f"), (3L, "en", "a b"))
    val got = Dedup.dedupSegments(df, segWords = 2).orderBy("doc_id").collect()
    // doc 1 owns the first occurrence of both its segments
    assert(got(0).getInt(1) == 2 && got(0).getInt(2) == 2 &&
      got(0).getString(3) == "a b c d")
    // doc 2 loses 'c d' (first seen in doc 1), keeps 'e f'
    assert(got(1).getInt(1) == 2 && got(1).getInt(2) == 1 &&
      got(1).getString(3) == "e f")
    // doc 3's only segment was seen earlier → null remainder
    assert(got(2).getInt(1) == 1 && got(2).getInt(2) == 0 && got(2).isNullAt(3))
    // a repeat within the SAME document drops too (first by seg_idx wins)
    val r = Dedup.dedupSegments(docs((1L, "en", "x y x y z")), segWords = 2).head()
    assert(r.getInt(1) == 3 && r.getInt(2) == 2 && r.getString(3) == "x y z")
  }

  test("hardNegatives ranks only different-label neighbors") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(1f, 0.01f), 0), // same label: nearest overall, must be excluded
      (3L, Array(0.9f, 0.1f), 1), // different label: the hard negative
      (4L, Array(0f, 1f), 1),
      (5L, Array(-1f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 1), k = 2)
      .orderBy("rn").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 4L))
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("negativePairs draws k in-range non-self partners; non-dense ids refused") {
    val df = (0L until 10L).toDF("doc_id")
    val rows = Sampling.negativePairs(df, k = 3).collect()
    assert(rows.length == 30)
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 10 &&
      r.getLong(2) != r.getLong(0)))
    // deterministic across runs, moved by the seed
    assert(Sampling.negativePairs(df, k = 3).collect().toSet == rows.toSet)
    assert(Sampling.negativePairs(df, k = 3, seed = 99).collect().toSet != rows.toSet)
    val e = intercept[IllegalArgumentException] {
      Sampling.negativePairs((1L to 5L).toDF("doc_id"), k = 1)
    }
    assert(e.getMessage.contains("dense"))
  }

  test("bloomSemiJoin equals the exact semi-join; empty build side yields empty") {
    val probe = (1L to 500L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = Seq(3L, 7L, 450L, 999L).toDF("k") // 999 has no probe match
    val got = BloomJoin.bloomSemiJoin(probe, build, "k",
      expectedItems = 10L, fpp = 0.01)
    val want = probe.join(build, Seq("k"), "left_semi")
    assert(got.collect().toSet == want.collect().toSet)
    assert(got.count() == 3)
    // duplicate build keys must not duplicate probe rows (semi semantics)
    val dup = Seq(3L, 3L, 7L).toDF("k")
    assert(BloomJoin.bloomSemiJoin(probe, dup, "k", 10L).count() == 2)
    assert(BloomJoin.bloomSemiJoin(probe, probe.filter(lit(false)).select("k"),
      "k", 10L).count() == 0)
    // xxhash64 is type-sensitive: an int build key against a long probe
    // key would bloom-reject every true match — refused up front
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(probe, build.select($"k".cast("int").as("k")), "k", 10L)
    }
    assert(e.getMessage.contains("types differ"))
  }

  test("bloomAntiJoin equals the exact anti-join; nulls and empty store are new") {
    val probe = ((1L to 500L).map(i => (Option(i), s"p$i")) :+
      ((Option.empty[Long], "pnull"))).toDF("k", "payload")
    val build = Seq(3L, 7L, 450L, 999L).toDF("k")
    val got = BloomJoin.bloomAntiJoin(probe, build, "k",
      expectedItems = 10L, fpp = 0.5) // high fpp: exercise the verify path
    val want = probe.join(build, Seq("k"), "left_anti")
    assert(got.collect().toSet == want.collect().toSet)
    assert(got.count() == 498) // 501 − the 3 stored matches; null row survives
    // a null-keyed probe row never equi-matches: always new
    assert(got.filter($"k".isNull).count() == 1)
    // empty store: the whole batch is new, no shuffle needed
    assert(BloomJoin.bloomAntiJoin(probe, build.filter(lit(false)), "k", 10L)
      .count() == 501)
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomAntiJoin(probe, build.select($"k".cast("int").as("k")), "k", 10L)
    }
    assert(e.getMessage.contains("types differ"))
  }

  test("entry maps refuse duplicate keys, within and across objects") {
    val e = intercept[IllegalArgumentException] {
      graft.entries.EntryMap("a" -> 1, "b" -> 2, "a" -> 3)
    }
    assert(e.getMessage.contains("a"))
    // cross-object collisions would silently drop entries in the ++ too
    val parts = Seq(graft.entries.TaxiEntries.queries,
      graft.entries.TpchEntries.queries,
      graft.entries.DataPipelineEntries.queries)
    assert(SparkEntry.queries.size == parts.map(_.size).sum,
      "an entry name is re-used across entry objects")
    // every graded query has oracle SQL (no silent rows-only downgrades)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("funnelSteps counts ordered first-touch progression per user") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: clicked BEFORE first view — stops at depth 1
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view", 1.0, "{}"),
      (6L, ts("2024-01-01 09:40:00"), 2L, "purchase", 1.0, "{}"),
      // user 3: view+click in order, never purchased
      (7L, ts("2024-01-01 08:00:00"), 3L, "view", 1.0, "{}"),
      (8L, ts("2024-01-01 08:30:00"), 3L, "click", 1.0, "{}"),
      // user 4: purchase only — depth 0, still counted in no step
      (9L, ts("2024-01-01 07:00:00"), 4L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.funnelSteps(ev, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("1_view", 3L), ("2_click", 2L), ("3_purchase", 1L)))
  }

  test("randomProject matches the literal-matrix dot product; dim mismatch nulls") {
    val v = (0 until 64).map(i => (i % 5) * 0.5).toArray
    val df = Seq((1L, v), (2L, v.take(10))).toDF("vec_id", "emb")
    val got = df.select($"vec_id",
      Embeddings.randomProject($"emb", inDim = 64, outDim = 8).as("p"))
      .orderBy("vec_id").collect()
    val want = Embeddings.projectionSigns(64, 8, 41).map { sj =>
      val dot = sj.zip(v).map { case (s, x) => s * x }.sum // same L-to-R order
      BigDecimal.valueOf(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq
    assert(got(0).getSeq[Double](1) == want)
    assert(got(1).isNullAt(1)) // 10-dim vector against a 64-dim matrix
  }

  test("merge upsert: update, insert, delete, and untouched rows") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "st", "price")
    val source = Seq(
      (2L, "B", 99.0, false), // update
      (3L, "x", 0.0, true),   // delete existing
      (4L, "d", 40.0, false), // insert
      (5L, "e", 50.0, true)   // insert+delete = no-op
    ).toDF("k", "st", "price", "del")
    val got = Merge.upsert(target, source, "k", deleteCol = Some("del"))
      .orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 10.0), (2L, "B", 99.0), (4L, "d", 40.0)))
    // missing data columns in the source are refused, not nulled
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(target, source.drop("price"), "k", Some("del"))
    }
    assert(e.getMessage.contains("price"))
    // duplicate source keys would fan out the matched target row —
    // refused like SQL MERGE's multiple-match error
    val e2 = intercept[IllegalArgumentException] {
      Merge.upsert(target, source.unionAll(source), "k", Some("del"))
    }
    assert(e2.getMessage.contains("multiple"))
  }

  test("bigramScore ranks fluent repetition above noise; short docs null") {
    val df = docs(
      (1L, "en", "the cat sat and the cat sat and the cat sat"),
      (2L, "en", "cat the sat zq sat wv the qz cat xy"),
      (3L, "en", "solo"))
    val got = TextAnalysis.bigramScore(df).orderBy("doc_id").collect()
    assert(got.length == 3)
    // doc 1's bigrams all repeat corpus-wide → higher avg logp than noise
    assert(got(0).getDouble(2) > got(1).getDouble(2))
    assert(got(0).getLong(1) == 10L) // 11 tokens → 10 bigrams
    assert(got(2).isNullAt(1) && got(2).isNullAt(2)) // <2 tokens: null score
  }

  test("tfIdfTop ranks rare terms above common ones with smoothed idf") {
    val df = docs(
      (1L, "en", "apple apple banana shared"),
      (2L, "en", "banana cherry shared"),
      (3L, "en", "shared cherry"))
    val got = TextAnalysis.tfIdfTop(df, k = 2)
      .orderBy("doc_id", "rn").collect()
    assert(got.length == 6)
    // doc 1: apple df=1 tf=2 beats banana df=2 tf=1
    assert(got(0).getString(2) == "apple" && got(0).getLong(3) == 2L && got(0).getLong(4) == 1L)
    assert(got(1).getString(2) == "banana")
    // 'shared' appears in every doc: smoothed idf keeps it positive but last
    val d1 = TextAnalysis.tfIdfTop(df, k = 10).filter($"doc_id" === 1L)
      .orderBy($"rn".desc).head()
    assert(d1.getString(2) == "shared" && d1.getDouble(5) > 0)
    // tfidf value check: tf=2, df=1, N=3 → 2·(ln(4/2)+1)
    val want = BigDecimal(2 * (math.log(2.0) + 1)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getDouble(5) == want)
  }

  test("bm25Search ranks multi-term coverage above single-term tf") {
    val df = docs(
      (1L, "en", "apple apple banana"),
      (2L, "en", "banana cherry"),
      (3L, "en", "cherry durian apple"))
    val got = TextAnalysis.bm25Search(df, Seq(1 -> "apple cherry"), topK = 3)
      .orderBy("rnk").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // d3 matches both query terms once; d1 has tf=2 on one term but
    // BM25's tf saturation keeps two-term coverage ahead
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 1L, 2L))
    assert(got.map(_.getLong(3)).toSeq == Seq(2L, 1L, 1L))
    // exact-value anchor for d1 (apple tf=2, dl=3, N=3, avgdl=8/3,
    // df=2): same operand order as the operator, decimal-accumulated
    val idf = math.log(1.0 + (3L - 2L + 0.5) / (2L + 0.5))
    val w = idf * (2L * (1.2 + 1)) /
      (2L + 1.2 * (1.0 - 0.75 + 0.75 * 3L / (8.0 / 3)))
    val want = BigDecimal(
      BigDecimal.valueOf(w).setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1).getDouble(4) == want)
    // a query term absent from the corpus contributes nothing; a query
    // with NO matching term returns no rows for that query
    val got2 = TextAnalysis.bm25Search(df,
      Seq(1 -> "apple zzz", 2 -> "zzz"), topK = 3).collect()
    assert(got2.forall(_.getInt(0) == 1))
    assert(got2.map(_.getLong(3)).forall(_ == 1L))
  }

  test("stored BM25 index equals the from-scratch pass; appends stay exact") {
    val df = docs(
      (1L, "en", "apple apple banana"),
      (2L, "en", "banana cherry"),
      (3L, "en", "cherry durian apple"),
      (4L, "en", "durian apple apple cherry"))
    val qs = Seq(1 -> "apple cherry", 2 -> "banana")
    val want = TextAnalysis.bm25Search(df, qs, topK = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    TextAnalysis.bm25IndexWrite(df, s"$dir/full")
    val stored = TextAnalysis.bm25Stored(spark, s"$dir/full", qs, topK = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(stored == want, "stored index must be score-identical")
    // incremental: build on docs 1-2, append 3-4 — df/N/avgdl derive
    // from the stored tables at query time, so the appended index must
    // equal the from-scratch build over the union
    TextAnalysis.bm25IndexWrite(df.filter($"doc_id" <= 2), s"$dir/incr")
    TextAnalysis.bm25IndexAppend(df.filter($"doc_id" > 2), s"$dir/incr")
    val incr = TextAnalysis.bm25Stored(spark, s"$dir/incr", qs, topK = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(incr == want, "appended index must equal the from-scratch build")
    // re-appending an already-indexed doc_id refuses LOUDLY — a retried
    // ingest job appending the same batch twice would otherwise double
    // tf/doclen rows and silently corrupt every later score
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25IndexAppend(df.filter($"doc_id" === 3L), s"$dir/incr") }
    assert(e.getMessage.contains("already present") &&
      e.getMessage.contains("3"), e.getMessage)
    // the refused append wrote nothing: the index still serves exactly
    // the union build
    val after = TextAnalysis.bm25Stored(spark, s"$dir/incr", qs, topK = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(after == want, "refused re-append must leave the index untouched")
  }

  test("textRank centers the hub word and drops stopwords") {
    val df = docs(
      (1L, "en", "the p hub q hub r hub p hub q hub r hub"),
      (2L, "en", "s t s t s t"))
    val got = TextAnalysis.textRank(df, iters = 6, k = 10, minCount = 2)
      .collect()
    // stopword-filtered adjacency: (hub,p)×3 (the leading 'the' is
    // removed BEFORE pairing, so 'p hub' still forms), (hub,q)×4,
    // (hub,r)×4, (s,t)×5 — 'the' never reaches the graph
    assert(!got.map(_.getString(0)).contains("the"))
    assert(got.head.getString(0) == "hub")
    assert(got.head.getLong(1) == 11L) // wdeg(hub) = 3 + 4 + 4
    // every vertex of the two components is scored
    assert(got.map(_.getString(0)).toSet ==
      Set("hub", "p", "q", "r", "s", "t"))
    // centrality, not frequency: hub outranks the s–t pair despite the
    // (s,t) edge being the heaviest single edge
    val byWord = got.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byWord("hub") > byWord("s") && byWord("hub") > byWord("t"))
  }

  test("quantileGate anchors exact percentiles and bounds the sketch") {
    val df = (1 to 1000).map(i => ("a", ((i * 7919) % 1000 + 1).toDouble))
      .toDF("g", "v")
    val r = Sketches.quantileGate(df, $"g", $"v").head()
    assert(r.getLong(1) == 1000L)
    // exact interpolated percentiles of a 1..1000 permutation
    assert(r.getDouble(2) == 500.5 && r.getBoolean(3))   // p50
    assert(r.getDouble(4) == 900.1 && r.getBoolean(5))   // p90
    assert(r.getDouble(6) == 990.01 && r.getBoolean(7))  // p99
  }

  test("temperatureKeep: sqrt-flattened rates, max source keeps all, reserved names refused") {
    val df = (1 to 400).map(i => (i.toLong, if (i <= 4) "tiny" else "big"))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureKeep(df, "lang", $"doc_id")
    val byLang = out.groupBy($"lang")
      .agg(min($"rate").as("rlo"), max($"rate").as("rhi"),
        sum(when($"keep", 1L).otherwise(0L)).as("kept"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (bLo, bHi, bKept, bN) = byLang("big")
    assert(bLo == 1.0 && bHi == 1.0, "largest source must rate 1.0")
    assert(bKept == bN, "rate-1.0 source must keep every row (u in (0,1])")
    val (tLo, tHi, tKept, tN) = byLang("tiny")
    assert(tLo == tHi && math.abs(tLo - math.sqrt(4.0) / math.sqrt(396.0)) < 1e-12)
    assert(tKept <= tN)
    val err = intercept[IllegalArgumentException] {
      Sampling.temperatureKeep(df.withColumn("rate", lit(1)), "lang", $"doc_id")
    }
    assert(err.getMessage.contains("rate"))
  }

  test("ivfIndexAppend: batch retry overwrites itself; write modes cannot mix") {
    import java.nio.file.Files
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 13 + j) % 7 - 3) / 2.0f))).toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" % 10 === 0)
    val dir = Files.createTempDirectory("graft_ivf_incr").toString + "/idx"
    Similarity.ivfIndexWrite(vecs.filter($"vec_id" < 20), cents, dir, batchId = Some("a"))
    Similarity.ivfIndexAppend(spark, vecs.filter($"vec_id" >= 20), dir, batchId = Some("b"))
    // RETRY batch b: overwrite, not duplicate
    Similarity.ivfIndexAppend(spark, vecs.filter($"vec_id" >= 20), dir, batchId = Some("b"))
    val assigned = spark.read.parquet(s"$dir/assigned")
    assert(assigned.count() == 40, "retried batch must replace its own rows")
    assert(assigned.select("vec_id").distinct().count() == 40)
    // appended index assigns identically to a one-shot pass
    val oneShot = Similarity.ivfAssign(vecs, cents)
      .select("vec_id", "centroid_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incr = assigned.select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == oneShot)
    // root-append into a batch-dir index refused (parquet rejects a mix)
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, vecs.filter($"vec_id" < 5), dir, batchId = None)
    }
    assert(err.getMessage.contains("mixes write modes"))
    intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, vecs, dir, batchId = Some("2024-01-01"))
    }
  }

  test("quantileBins: equal-population bins, boundary values stay below the cut") {
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "g", "value")
    val out = Sketches.quantileBins(df, $"g", $"value")
    val byBin = out.groupBy($"bin").agg(count(lit(1)).as("n"),
      min($"value").as("lo"), max($"value").as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byBin.keySet == Set(0, 1, 2, 3))
    // quartiles of 1..100: cuts 25.75 / 50.5 / 75.25 -> 25/25/25/25
    assert(byBin.values.map(_._1).toSeq.sorted == Seq(25L, 25L, 25L, 25L))
    assert(byBin(0)._3 == 25.0 && byBin(3)._2 == 76.0)
    // values AT a cut stay in the lower bin (strict > comparison)
    intercept[IllegalArgumentException] {
      Sketches.quantileBins(df.withColumn("bin", lit(1)), $"g", $"value")
    }
    intercept[IllegalArgumentException] {
      Sketches.quantileBins(df, $"g", $"value", probs = Seq(0.5, 0.25))
    }
  }

  test("kMeansAssign: converges on separated groups; ties and empty clusters are deterministic") {
    // duplicated init centroid (ids 0 and 2 coincide): both survive as
    // (0,0) centroids — the d2=0 tie must break to the smaller cid every
    // round and the emptied cluster 2 must KEEP its centroid, not NaN
    val tied = Seq(0L -> Array(0f, 0f), 1L -> Array(0.1f, 0f), 2L -> Array(0f, 0f))
      .toDF("vec_id", "embedding")
    val t = Clustering.kMeansAssign(tied, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(t(0L) == (0, 0.0) && t(2L) == (0, 0.0),
      "tie at d2=0 must pick the smaller cid")
    assert(t(1L) == (1, 0.0))
    // k=2 over two separated groups: init splits inside the near group,
    // two Lloyd rounds must pull every far point into one cluster and
    // reunite the near group (incl. vec 1, the far-polluted init seed)
    val grouped = Seq(
      0L -> Array(0f, 0f), 1L -> Array(0.1f, 0f), 2L -> Array(0f, 0f),
      3L -> Array(10f, 10f), 4L -> Array(10.1f, 10f), 5L -> Array(9.9f, 10f)
    ).toDF("vec_id", "embedding")
    val g = Clustering.kMeansAssign(grouped, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(Seq(0L, 1L, 2L).map(g).distinct == Seq(0))
    assert(Seq(3L, 4L, 5L).map(g).distinct == Seq(1))
  }

  test("kMeansCentroidsGrouped: each group's codebook equals the single-group trainer's") {
    // two groups with DIFFERENT geometries trained in one loop must
    // reproduce the per-group single trainer bit-for-bit (incl. the
    // empty-cluster-keeps-centroid path in group 1)
    val g0 = Seq(0L -> Array(0f, 0f), 1L -> Array(0.1f, 0f), 2L -> Array(10f, 10f),
      3L -> Array(10.1f, 10f))
    val g1 = Seq(0L -> Array(5f, 5f), 1L -> Array(5f, 5f), 2L -> Array(5f, 5.1f),
      3L -> Array(-5f, 0f))
    val slices = (g0.map { case (id, v) => (0, id, v) } ++
      g1.map { case (id, v) => (1, id, v) }).toDF("sub", "vec_id", "embedding")
    val grouped = Clustering.kMeansCentroidsGrouped(slices, k = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    for ((sub, data) <- Seq(0 -> g0, 1 -> g1)) {
      val single = Clustering.kMeansCentroids(
          data.toDF("vec_id", "embedding"), k = 2, iters = 2)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      for (cid <- Seq(0, 1))
        assert(grouped((sub, cid)) == single(cid),
          s"codebook mismatch at sub=$sub cid=$cid")
    }
  }

  test("semDedup: same-cluster near-identical vectors drop keep-first; singletons survive") {
    // ids 0/1/2 seed three spread clusters; 3 joins 0's cluster, 4 joins
    // 2's — each pair's LARGER id is the duplicate at cos >= 0.95
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(0f, 1f, 0f), 2L -> Array(-1f, 0f, 0f),
      3L -> Array(1f, 0.01f, 0f), 4L -> Array(-1f, -0.01f, 0f)
    ).toDF("vec_id", "embedding")
    val out = Clustering.semDedup(vecs, k = 3, iters = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out(3L)._1 == out(0L)._1 && out(3L)._2 && !out(0L)._2,
      "larger id of a near-identical pair is the dup")
    assert(out(4L)._1 == out(2L)._1 && out(4L)._2 && !out(2L)._2)
    assert(!out(1L)._2)
    assert(out(0L)._1 != out(2L)._1, "opposite-direction vectors sit in different clusters")
  }
}
