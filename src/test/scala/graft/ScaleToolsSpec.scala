package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Catalog
import graft.operators.SkewJoin

/** Scale-mechanics utilities: salted skew joins must be semantically
  * transparent; bucketed tables must join without a shuffle. */
class ScaleToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 10k rows of one hot key + a tail
    val large = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (999L, "unmatched"))
      .toDF("k", "name")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(canon(SkewJoin.saltedJoin(large, small, "k", salts = 8)) ==
      canon(large.join(small, Seq("k"), "inner")))
    assert(SkewJoin.saltedJoin(large, small, "k", salts = 8, how = "left").count() ==
      large.join(small, Seq("k"), "left").count())
  }

  test("saltedTopK equals the plain window top-k on a hot group") {
    // one hot group with 5k rows, two small groups; unique tie key
    val df = ((1 to 5000).map(i => (1L, i.toLong, i.toDouble % 97)) ++
      (1 to 10).map(i => (2L, 10000L + i, i.toDouble)) ++
      Seq((3L, 20000L, 5.0)))
      .toDF("g", "id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    val plain = df.withColumn("rn", row_number().over(w).cast("int"))
      .filter($"rn" <= 4)
      .select("g", "rn", "id", "score").orderBy("g", "rn").collect().toSeq
    val salted = SkewJoin.saltedTopK(df, Seq("g"), "score", "id", k = 4, salts = 8)
      .select("g", "rn", "id", "score").orderBy("g", "rn").collect().toSeq
    assert(salted == plain)
    // groups smaller than k return all their rows, exactly ranked
    assert(salted.count(_.getLong(0) == 3L) == 1)
  }

  test("partition pruning and predicate pushdown reach the scan") {
    import java.nio.file.Files
    val path = Files.createTempDirectory("graft_prune").toString + "/t"
    (1 to 100).map(i => (i.toLong, i * 1.5, 2020 + i % 4, i % 12 + 1))
      .toDF("k", "v", "year", "month")
      .write.partitionBy("year", "month").parquet(path)
    val q = spark.read.parquet(path)
      .filter($"year" === 2021 && $"v" > 10.0)
      .select("k", "v")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2021"),
      s"partition filter not pushed:\n$scan")
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(v,10.0)"),
      s"data filter not pushed:\n$scan")
    // pruned column set: only k and v are read (plus partition cols)
    assert(scan.contains("ReadSchema: struct<k:bigint,v:double>"),
      s"columns not pruned:\n$scan")
  }

  test("typed Dataset[Trip] facade binds the unified schema") {
    val (y, g, f, h) = (TaxiFixturesData.rawYellow(spark), TaxiFixturesData.rawGreen(spark),
      TaxiFixturesData.rawFhv(spark), TaxiFixturesData.rawFhvhv(spark))
    val models = Pipeline.buildModels(y, g, f, h)
    val ds = graft.model.Typed.trips(models.unified)
    val revenue = ds.filter(_.taxi_type == "yellow")
      .flatMap(_.total_amount).reduce(_ + _)
    assert(revenue > 0)
    assert(ds.head().trip_id.length == 32)
  }

  test("compaction collapses small files without changing content") {
    import java.nio.file.Files
    import graft.write.{IncrementalWriter, Maintenance}
    val path = Files.createTempDirectory("graft_compact").toString + "/t"
    // three appends → ≥3 files per touched partition
    (1 to 3).foreach { b =>
      IncrementalWriter.appendPartitioned(
        (1 to 50).map(i => (s"k$b-$i", i * 1.0, 2024, i % 2 + 1))
          .toDF("k", "v", "year", "month"), path)
    }
    val before = spark.read.parquet(path).orderBy("k").collect().toSeq
    val (nBefore, nAfter) = Maintenance.compact(spark, path)
    assert(nAfter < nBefore, s"expected fewer files, got $nBefore -> $nAfter")
    assert(nAfter == 2) // one file per (year, month) partition
    assert(spark.read.parquet(path).orderBy("k").collect().toSeq == before)
  }

  test("ivfAssign is fully map-side: no shuffle exchange, no window") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 13 + j) % 7 - 3) / 2.0f)))
      .toDF("vec_id", "embedding")
    val assigned = graft.operators.Similarity
      .ivfAssign(vecs, vecs.filter($"vec_id" % 40 === 0))
    val plan = assigned.queryExecution.executedPlan.toString
    // the argmax is array_max over a broadcast centroid array — a ranking
    // window here would shuffle corpus×K rows
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("sequence packing's aggregate reuses the shard partitioning (one exchange total)") {
    val docs = (1L to 100L).map(i => (i, s"w$i x y z")).toDF("doc_id", "text")
    val packed = graft.operators.Packing.packAssign(docs, $"doc_id",
        graft.operators.TextAnalysis.tokenCount($"text"))
      .groupBy($"shard", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("pack_tokens"))
    val plan = packed.queryExecution.executedPlan.toString
    // the window partitions by shard; (shard, pack_id) grouping is
    // sub-partitioned by shard, so Catalyst must NOT add a second
    // exchange for the aggregate — the property that keeps packing one
    // shuffle end-to-end at corpus scale
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles in:\n$plan")
  }

  test("similarity top-k is bounded partial aggregation, not a ranking window") {
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 13 + j) % 7 - 3) / 2.0f)))
      .toDF("vec_id", "embedding")
    val knn = graft.operators.Similarity.knnBrute(vecs, vecs.filter($"vec_id" < 3), k = 5)
    val plan = knn.queryExecution.executedPlan.toString
    // the per-query cut must be the TopKAggregator's map-side partials
    // (≤k per query before the shuffle) — a ranking window would shuffle
    // every scored candidate row
    assert(!plan.contains("Window"), s"ranking window crept back in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"bounded aggregator missing in:\n$plan")
  }

  test("minhashLsh reuses the persisted shingle pipeline; ngram df-cut is a broadcast anti join") {
    val docs = (1L to 30L).map(i =>
      (i, "en", s"alpha$i beta$i gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "lang", "text")
    val mh = graft.operators.Dedup.minhashLsh(docs)
    mh.count() // materialize so the cache is populated and used
    val mhPlan = mh.queryExecution.executedPlan.toString
    // signature build + both verify sides read the ONE persisted shingle
    // set instead of re-deriving tokenize+shingle+md5 three times
    assert(mhPlan.contains("InMemoryTableScan"), s"shingles not cached in:\n$mhPlan")
    val ng = graft.operators.Dedup.ngramJaccardPairs(docs)
    val ngPlan = ng.queryExecution.executedPlan.toString
    assert(ngPlan.contains("BroadcastHashJoin") && ngPlan.contains("LeftAnti"),
      s"df-cut not a broadcast anti join in:\n$ngPlan")
  }

  test("hash split assignment is a zero-shuffle map pass") {
    val docs = (1L to 100L).map(i => (i, s"w$i x y z")).toDF("doc_id", "text")
    val split = docs.withColumn("split",
      graft.operators.Sampling.splitAssign($"doc_id"))
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment must not shuffle:\n$plan")
  }

  test("corpus funnel is one aggregate pass: single exchange, no Expand") {
    val docs = (1L to 100L).map(i => (i, "the a is and of to in w" + i))
      .toDF("doc_id", "text")
    // same shape as the corpus_funnel entry: expensive predicates
    // projected once, cumulative stages as conditional sums over booleans
    val staged = docs.select(
      (graft.operators.TextAnalysis.langId($"text") === "en").as("en"),
      (graft.operators.TextAnalysis.qualityScore($"text") >= 50).as("q50"),
      (graft.operators.TextAnalysis.tokenCount($"text") >= 20).as("t20"))
    val funnel = staged.agg(
      count(lit(1)).as("n_total"),
      sum(when($"en", 1L).otherwise(0L)).as("n_lang_en"),
      sum(when($"en" && $"q50", 1L).otherwise(0L)).as("n_quality"),
      sum(when($"en" && $"q50" && $"t20", 1L).otherwise(0L)).as("n_length"))
    val plan = funnel.queryExecution.executedPlan.toString
    // a count(distinct)-style rewrite would inject Expand (input × N);
    // more than one exchange means the partial agg stopped being map-side
    assert(!plan.contains("Expand"), s"Expand crept into the funnel:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange (partial→final agg), got $exchanges in:\n$plan")
  }

  test("document chunking is a zero-shuffle map pass") {
    // pins the plan of the SAME chunk table the graded entries consume
    val docs = (1L to 50L).map(i => (i, "x " * 250)).toDF("doc_id", "text")
    val chunks = graft.entries.DataPipelineEntries.chunkTable(docs)
      .select($"doc_id", $"chunk_idx", length($"chunk").as("chunk_len"),
        md5($"chunk").as("chunk_hash"))
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"chunking must not window:\n$plan")
  }

  test("debounce runs on ONE exchange: the finer burst group-by reuses the window partitioning") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val ev = (1L to 200L).map(i => (i, new java.sql.Timestamp(ts.getTime + i * 1000), i % 7, s"t${i % 3}", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val plan = graft.operators.Events.debounce(ev, withinSeconds = 60)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected 1 exchange (HashPartitioning(user,type) already clusters (user,type,burst)), got $exchanges in:\n$plan")
  }

  test("winsorize applies cuts via broadcast: the value side is never shuffled") {
    val df = (1 to 500).map(i => (i.toLong, s"g${i % 3}", i.toDouble)).toDF("id", "g", "v")
    val plan = graft.operators.Sketches.winsorize(df, $"g", $"v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cuts not broadcast in:\n$plan")
    // the only exchange is the cut aggregation's own (inside the
    // broadcast build side); the probe side streams map-side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"probe side shuffled, got $exchanges exchanges in:\n$plan")
  }

  test("trigramSearch pushes the probed trigram set into the stored index scan") {
    val docs = (1L to 50L).map(i => (i, "en", s"alpha beta w$i")).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_tri_pin").toString + "/idx"
    graft.operators.TextAnalysis.trigramIndexWrite(docs, dir)
    val q = graft.operators.TextAnalysis.trigramSearch(spark, dir, docs, Seq("alpha"))
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val idxScan = scans.find(s => s.contains(dir) || s.contains("trigram"))
    assert(idxScan.exists(s => s.contains("PushedFilters") && s.contains("In(trigram")),
      s"trigram In-filter not pushed into the index scan:\n${scans.mkString("\n")}")
  }

  test("bm25 prunes to query terms before any aggregation; no cartesian") {
    val docs = (1L to 50L).map(i => (i, "en", s"alpha beta w$i"))
      .toDF("doc_id", "lang", "text")
    val q = graft.operators.TextAnalysis.bm25Search(
      docs, Seq(1 -> "alpha w7"), topK = 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must never go quadratic:\n$plan")
    // The query-term In-filter must sit BELOW the tf aggregation and
    // directly above the explode, so the only (doc, term) state
    // surviving the corpus pass is candidate-sized. The plan prints
    // top-down: right shape = HashAggregate … Filter(IN) … Generate,
    // with NO aggregate between the filter and the explode (an
    // aggregate there would mean the full corpus vocabulary was
    // aggregated first and filtered after).
    // anchor on the Filter NODE carrying the term set — a bare
    // indexOf("alpha") would match the literal's first occurrence
    // anywhere (a pushed-filter or local-relation line above) and
    // silently pin the wrong plan region
    val lines = plan.linesIterator.toVector
    val fIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("alpha"))
    assert(fIdx >= 0, s"query-term In-filter node missing:\n$plan")
    val gIdx = lines.indexWhere(_.contains("Generate"), fIdx)
    assert(gIdx > fIdx, s"filter must sit above the explode:\n$plan")
    assert(!lines.slice(fIdx + 1, gIdx).exists(_.contains("HashAggregate")),
      s"term filter landed above an aggregate (post-aggregation prune):\n$plan")
  }

  test("stored BM25 pushes the query-term set into the postings scan") {
    val docs = (1L to 50L).map(i => (i, "en", s"alpha beta w$i"))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_pin").toString
    graft.operators.TextAnalysis.bm25IndexWrite(docs, dir)
    val q = graft.operators.TextAnalysis.bm25Stored(spark, dir,
      Seq(1 -> "alpha w7"), topK = 5)
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val idxScan = scans.find(_.contains("postings"))
    assert(idxScan.exists(s => s.contains("PushedFilters") && s.contains("In(term")),
      s"term In-filter not pushed into the postings scan:\n${scans.mkString("\n")}")
  }

  test("textRank rounds ride the persisted edge list; no cartesian") {
    val docs = (1L to 40L).map(i => (i, "en", s"alpha w${i % 4} beta w${i % 4}"))
      .toDF("doc_id", "lang", "text")
    val q = graft.operators.TextAnalysis.textRank(docs, iters = 2, k = 5,
      minCount = 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"textRank must never go quadratic:\n$plan")
    // the symmetric edge list feeds the degrees, the vertex domain, and
    // every round — it must be consumed from the persisted form, not
    // re-aggregated from the corpus per round
    assert(plan.contains("InMemoryTableScan"),
      s"edge list must be persisted and reused across rounds:\n$plan")
  }

  test("negativePairs is a zero-shuffle map pass over the id domain") {
    val docs = (0L until 50L).toDF("doc_id")
    val plan = graft.operators.Sampling.negativePairs(docs, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"negative draw must not shuffle:\n$plan")
  }

  test("dedupSegments runs on exactly two exchanges (rank by segment, regroup by doc)") {
    val docs = (1L to 50L).map(i => (i, "en", s"w$i x y z a b c d"))
      .toDF("doc_id", "lang", "text")
    val plan = graft.operators.Dedup.dedupSegments(docs, segWords = 2)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges in:\n$plan")
  }

  test("corpus shuffle's per-shard aggregate reuses the shard partitioning (one exchange total)") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Sampling
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val keyed = docs.select($"doc_id",
      Sampling.shuffleKey($"doc_id").as("h"),
      Sampling.shuffleShard($"doc_id", 8).as("shard"))
    val agg = keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy($"shard").orderBy($"h", $"doc_id")))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"pos".cast("long") * ($"h" % 1000000L)).as("ck"))
    val plan = agg.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles in:\n$plan")
  }

  test("asof join shuffles exactly once, on the key") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val left = (1 to 500).map(i => (i.toLong, i % 9, ts(i * 1000L))).toDF("lid", "k", "ts")
    val right = (1 to 90).map(i => (i % 9, ts(i * 4000L), i * 1.0)).toDF("k", "ts", "px")
    val joined = graft.operators.AsOfJoin.asof(left, right, "k", "ts")
    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles in:\n$plan")
    assert(!plan.contains("NestedLoop"), s"inequality nested loop crept in:\n$plan")
  }

  test("scd2 runs on ONE shuffle and ONE sort (second window reuses both)") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val ch = (1 to 300).map(i => (i % 7L, ts(i * 60000L), s"s${i % 3}", i.toLong))
      .toDF("user_id", "ts", "status", "event_id")
    val plan = graft.operators.Scd.scd2(ch, "user_id", "ts", "status", "event_id")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles in:\n$plan")
    assert(sorts == 1, s"expected the run-start filter to preserve the sort, got $sorts in:\n$plan")
  }

  test("rollingFeatures is a single window pass: one shuffle, one sort") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val ev = (1 to 300).map(i => (i % 7L, i.toLong, ts(i * 1000L), i * 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val plan = graft.operators.Events.rollingFeatures(ev, 3)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert("\\bSort \\[".r.findAllIn(plan).size == 1, plan)
  }

  test("bloomSemiJoin prunes the probe with a might_contain filter below the join") {
    // parquet-backed probe: over a LocalRelation the optimizer would
    // constant-fold the bloom filter away and the pin would be vacuous
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (1L to 2000L).map(i => (i, i * 2)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val probe = spark.read.parquet(dir)
    val build = Seq(5L, 10L).toDF("k")
    val joined = graft.operators.BloomJoin.bloomSemiJoin(probe, build, "k", 10L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom filter missing from plan:\n$plan")
    assert(plan.contains("LeftSemi"), s"exact residual semi-join missing:\n$plan")
    // the bloom predicate must sit on the probe SIDE, not above the join:
    // everything after the join node must be free of might_contain
    val afterJoin = plan.substring(plan.indexOf("LeftSemi"))
    val joinCond = afterJoin.takeWhile(_ != '\n')
    assert(!joinCond.contains("might_contain"),
      s"bloom test must prune below the join, not in its condition:\n$plan")
  }

  test("clustered layout yields disjoint per-file ranges and prunes point scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString + "/t"
    val df = (1 to 4000).map(i => ((i * 2654435761L) % 10000, i)).toDF("v", "payload")
    graft.write.IncrementalWriter.overwriteClustered(df, dir, "v", nFiles = 4)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 clustered files, got ${files.length}")
    // per-file [min, max] ranges must be pairwise disjoint — the
    // precondition for footer-level min/max pruning
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("v")), max(col("v"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $hi >= $lo")
      case _ =>
    }
    // content round-trips and a point read touches ONE file's rows
    assert(spark.read.parquet(dir).count() == 4000)
    val probe = df.head().getLong(0)
    val hit = spark.read.parquet(dir).filter(col("v") === probe)
    assert(hit.count() >= 1)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("id", "rv")
    Catalog.materializeBucketed(left, "graft_test_db", "bkt_left", "id", 4)
    Catalog.materializeBucketed(right, "graft_test_db", "bkt_right", "id", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Catalog.readTable(spark, "graft_test_db", "bkt_left")
        .join(Catalog.readTable(spark, "graft_test_db", "bkt_right"), "id")
      assert(joined.count() == 1000)
      // ShuffleExchangeExec renders as "Exchange hashpartitioning(...)";
      // a bare "ShuffleExchange" substring would never match and make
      // this assertion vacuous.
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("staged projections stay staged: minhash digests and CDC cuts are not re-inlined") {
    // both optimizations bind an expensive computed array to a column
    // so the consuming lambda references an ATTRIBUTE (interpreted
    // higher-order lambdas re-evaluate outer non-attribute expressions
    // per element); CollapseProject re-inlining them would silently
    // restore the O(n²)-by-interpretation cost. Pin by counting the
    // expensive expression in the optimized plan.
    // file-backed input: over a LocalRelation the optimizer would
    // evaluate the whole projection eagerly and the plan shows nothing
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    // minhash bands at 12 hashes: 6 seed-digest arrays + 6 band keys =
    // 12 md5 nodes; re-inlining the digests into the 12 per-slot
    // extracts would show 12 + 6 = 18
    val bandsPlan = graft.operators.Dedup.bandRows(docs, 12, 2)
      .queryExecution.optimizedPlan.toString
    val md5s = "md5\\(".r.findAllIn(bandsPlan).size
    assert(md5s == 12, s"expected 12 md5 nodes (6 staged digests + 6 band keys), got $md5s")
    // CDC chunking: the cuts array (an O(words·window) md5 scan) is
    // constructed ONCE per posting subtree — twice in the plan because
    // the shared-chunk pairing self-joins the postings (physical reuse
    // dedupes that). Re-inlining would replicate the construction into
    // each of the chunk lambda's three references per side (6+).
    val cdcPlan = graft.operators.Dedup.cdcChunkPairs(docs, 4, 4, 7, 100)
      .queryExecution.optimizedPlan.toString
    val cuts = "array_distinct\\(concat\\(".r.findAllIn(cdcPlan).size
    assert(cuts == 2, s"cuts array re-inlined: $cuts constructions in plan " +
      "(expected 2: one per self-join side)")
  }

  test("merge's duplicate-key guard rides the locate join: batch shuffled exactly once") {
    // round 14 ran a SEPARATE groupBy/limit(1)/collect over the batch
    // before every MERGE — a second full batch shuffle. The guard now
    // lives inside the keyed pre-aggregation whose output partitioning
    // the locate join reuses, so the whole locate plan holds exactly
    // one exchange per side: one for the batch's key aggregation, one
    // for the target — a third exchange means the reuse broke.
    val root = java.nio.file.Files.createTempDirectory("graft_mguard").toString
    val t = new graft.write.SnapshotTable(spark, s"$root/tbl")
    val target = (1 to 500).map(i => (i, 2024, i % 12 + 1, i * 1.0))
      .toDF("id", "year", "month", "fare")
    val batch = (400 to 600).map(i => (i, 2024, i % 12 + 1, i * 2.0))
      .toDF("id", "year", "month", "fare")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = t.uniqueKeyed(batch, Seq("id"), "test")
      val locate = target.join(guarded, Seq("id"), "left_outer")
      assert(shuffles(locate) == 2,
        s"expected 2 exchanges (target + batch agg, guard free), got " +
          s"${shuffles(locate)} in:\n${locate.queryExecution.executedPlan}")
      // and the guard actually guards: a duplicate key raises from the
      // join itself, with the caller-facing refusal text. (A semi join
      // here, as in the merge's own locate pass: a bare count() over
      // the outer join would let the optimizer ELIMINATE the
      // unique-keyed right side entirely — legal, and exactly why the
      // real merge paths always reference the source side.)
      val dup = batch.unionAll(batch.limit(1))
      val e = intercept[Exception] {
        target.join(t.uniqueKeyed(dup, Seq("id"), "test"), Seq("id"), "leftsemi")
          .count()
      }
      def chain(x: Throwable): Seq[String] =
        Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
          .map(c => Option(c.getMessage).getOrElse("")).toSeq
      assert(chain(e).exists(_.contains("multiple rows for key")), e.getMessage)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("pageRank is 3 exchanges per iteration; the edge-list exchange is planned once") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).flatMap(i => (1 to 3).map(j => (i, (i + j) % 60)))
      .toDF("src", "dst")
    import graft.operators.Graph
    val i2 = shuffles(Graph.pageRank(nodes, edges, iters = 2))
    val i3 = shuffles(Graph.pageRank(nodes, edges, iters = 3))
    // per iteration: the nodes-sized rank vector re-shuffles into the
    // edge join on src, the edge-sized contributions shuffle into the
    // inflow aggregate on dst, and the nodes left-join re-partitions the
    // new ranks — 3 exchanges, all driven by nodes-sized or
    // one-pass-over-edges data. The edge list and degree profile
    // exchanges are identical subtrees across iterations, so Spark
    // plans them once (ReusedExchange); a 4th per-iteration exchange
    // would mean that reuse broke.
    assert(i3 - i2 == 3, s"per-iteration exchange count drifted: i2=$i2 i3=$i3")
    assert(i2 == 5, s"iteration-loop base plan drifted: i2=$i2")
  }

  test("bfsDistances runs 4 nodes/edges-sized exchanges per round") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).flatMap(i => (1 to 3).map(j => (i, (i + j) % 60)))
      .toDF("src", "dst")
    val src = Seq(0L, 30L).toDF("id")
    import graft.operators.Graph
    val i2 = shuffles(Graph.bfsDistances(nodes, edges, src, iters = 2))
    val i3 = shuffles(Graph.bfsDistances(nodes, edges, src, iters = 3))
    // per round: the frontier re-shuffles on src into the edge join,
    // the hop stream + the unioned carry-forward shuffle into the
    // min-aggregate on id, and the nodes left-join re-partitions both
    // sides — one more than pageRank's 3 because the carry-forward
    // union branch shuffles alongside the hops (a least()-combine
    // against the previous vector instead measures 6: the distance
    // vector lands on two join sides). All exchanges are nodes- or
    // one-pass-over-edges-sized; the pin catches any drift back.
    assert(i3 - i2 == 4, s"per-iteration exchange count drifted: i2=$i2 i3=$i3")
  }

  test("triangleCounts: 5 unique exchanges; the edge-set distinct populates once") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).flatMap(i => (1 to 3).map(j => (i, (i + j) % 60)))
      .toDF("src", "dst")
    import graft.operators.Graph
    val plan = Graph.triangleCounts(nodes, edges).queryExecution.executedPlan.toString
    // The cached edge-set populate plan reprints inside every
    // InMemoryTableScan, so a raw text count of exchanges overstates
    // the work (13 appearances here); plan_ids dedupe the reprints.
    // The 5 real exchanges: the undirected distinct (populated ONCE —
    // entry-scoped persist; it reprints under 7 cache scans), the two
    // degree aggregations (canonically identical — AQE's exchange
    // reuse collapses them at runtime), the triangle-member count, and
    // the vertex-domain side of the final left join. The wedge
    // self-join and closing-edge semi-join ride those partitionings;
    // the degree orientation caps the wedge fan-out at O(sqrt(m)) per
    // apex. Upward drift = a join stopped sharing its partitioning;
    // a BroadcastNestedLoop = the semi-join lost its equi-keys.
    val uniq = raw"Exchange hashpartitioning\([^)]*\), [A-Z_]+, \[plan_id=(\d+)\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSet.size
    assert(uniq == 5, s"triangle plan unique exchange count drifted: $uniq\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"),
      "closing-edge probe lost its equi-join keys")
    graft.TransientCache.drain() // free the operator's entry-scoped caches
  }

  test("kCoreRounds: fixed exchanges per peel round; winnowProfile: one window sort") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).flatMap(i => (1 to 3).map(j => (i, (i + j) % 60)))
      .toDF("src", "dst")
    import graft.operators.{Dedup, Graph}
    def uniq(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
      raw"Exchange hashpartitioning\([^)]*\), [A-Z_]+, \[plan_id=(\d+)\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSet.size
    }
    val i2 = uniq(Graph.kCoreRounds(nodes, edges, k = 3, iters = 2))
    val i3 = uniq(Graph.kCoreRounds(nodes, edges, k = 3, iters = 3))
    // ONE new exchange per round — the degree aggregation; the
    // alive-set semi-joins ride the cached sym/alive frames (both
    // entry-scoped persisted: un-cached, each round inlines the prior
    // round's plan TWICE — measured 12 unique exchanges per round —
    // because alive sits on both semi-join endpoints). plan_id-deduped
    // like the triangle pin.
    assert(i3 - i2 == 1, s"per-round exchange count drifted: i2=$i2 i3=$i3")
    assert(i2 == 5, s"peel base plan drifted: i2=$i2")
    val wp = Dedup.winnowProfile(
      Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text"),
      gramWords = 3, window = 4, seed = 53)
    val plan = wp.queryExecution.executedPlan.toString
    // ONE sort — the ordered window-min pass; n_grams rides from
    // before the explode, so no second (unordered-window) sort exists
    val sorts = "Sort ".r.findAllIn(plan).size
    assert(sorts == 1, s"winnow sort count drifted: $sorts\n$plan")
    graft.TransientCache.drain()
  }

  test("round-8 operator plans: spans, CMS, BPE pairs, audio windows") {
    import graft.operators.{Bpe, Dedup, Multimodal, Sketches}
    val docs = (1 to 40).map(i =>
      (i.toLong, (1 to 20).map(w => s"w${(i * 7 + w) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    // repeatedSpans: window-table aggregate (repeat set), the leftsemi
    // mark join, the islands window, the runs aggregates, and the
    // per-doc join-backs — bounded at 8 exchanges, none corpus²
    val spans = shuffles(Dedup.repeatedSpans(docs, k = 3))
    assert(spans <= 8, s"repeatedSpans plan grew: $spans exchanges")
    // CMS build: ONE exchange however many keys stream through, and
    // the cells frame is sketch-sized
    val cells = Sketches.cmsBuild(docs, col("doc_id"), depth = 4, width = 8, seed = 1)
    assert(shuffles(cells) == 1, "cmsBuild must be a single aggregation exchange")
    assert(cells.count() <= 32)
    // BPE pair counting: one vocabulary-sized aggregation exchange on
    // top of the (already aggregated) vocab input
    val vocab = Bpe.wordVocab(docs).withColumn("s", Bpe.spacedChars(col("word")))
    assert(shuffles(Bpe.pairCounts(vocab)) == 2,
      "pairCounts must add exactly one exchange over the vocab aggregate")
    // audio windowing: decode map + ONE (doc, window) aggregation
    import spark.implicits._
    val media = Seq(graft.operators.MediaRecord(1L, "audio",
      graft.operators.MediaPayloads.wav(8000, 600))).toDS()
    assert(shuffles(Multimodal.audioWindows(media, 250)) == 1,
      "audioWindows must be a single aggregation exchange")
  }

  test("prefix filtering indexes strictly fewer postings than the full index") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = (0 until 40).map { i =>
      val words = (0 until 14).map(w => s"w${(i / 2 * 5 + w) % 50}")
      (i.toLong, "en", words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    // full index size = all df-cut shingle postings; the prefix index
    // must be a strict subset at t = 0.5 (roughly half per doc)
    val full = docs.select(explode(TextAnalysis.shingles(col("text"))).as("s")).count()
    // reach into the operator via its observable: candidate generation
    // still finds every threshold pair (OperatorsSpec pins equality),
    // while the indexed-posting bound here pins the PRUNING is real
    val ex = docs.select(col("doc_id"),
        TextAnalysis.shingles(col("text")).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val perDoc = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
    val prefixBound = perDoc
      .agg(sum(ceil(col("m") * 0.5) + 1).cast("long")).head().getLong(0)
    assert(prefixBound < full,
      s"prefix bound $prefixBound must undercut the full index $full")
  }

  test("hyperplane LSH pair space is banded: no corpus-squared join anywhere") {
    import graft.operators.Similarity
    val emb = (0L until 80L).map(i =>
      (i, Array.tabulate(16)(j => (((i * 13 + j * 7) % 11) - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.hyperplaneLshPairs(emb, dims = 16, bits = 16,
      bands = 4, threshold = 0.9, seed = 3, maxBucket = 50)
    val plan = pairs.queryExecution.executedPlan.toString
    // the only joins are bucket-keyed equi-joins and the two id-keyed
    // verify joins — a cartesian/BNL join would mean the banding broke
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"unbanded join in:\n$plan")
  }

  test("top session paths and cohort retention each run on two exchanges") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val ev = (1 to 300).map { i =>
      (i.toLong, s"u${i % 10}", ts(i * 60000L), Seq("view", "click", "purchase")(i % 3), i * 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    // paths: the sessionize window shuffles on user_id; the per-session
    // path aggregate groups on (user_id, session_idx) — a sub-partition
    // of user_id, no new exchange — and the corpus-wide path count is
    // the second exchange; the top-20 is TakeOrdered, not a sort.
    val paths = graft.operators.Events.withSessionIndex(ev)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(20)
    assert(shuffles(paths) == 2, "ev_top_paths plan drifted")
    // retention: the first-seen anchor window shuffles on user_id; the
    // (cohort, offset) distinct-user aggregate is the second — no Expand
    // (single countDistinct plans as two-phase agg, not grouping sets).
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    val cohort = ev
      .withColumn("first_ts", min(col("ts")).over(byUser))
      .select(date_trunc("week", col("first_ts")).cast("timestamp_ntz").as("cohort_week"),
        floor((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("first_ts").cast("timestamp")))
          / lit(7L * 24 * 3600 * 1000000L)).as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val cohortPlan = cohort.queryExecution.executedPlan.toString
    assert(shuffles(cohort) == 2, "ev_cohort_retention plan drifted")
    assert(!cohortPlan.contains("Expand"), s"unexpected Expand in:\n$cohortPlan")
  }

  test("label centroids run on two vocabulary-sized exchanges, no Expand") {
    import graft.expr.Functions.{stableAvg, stableSum}
    val emb = (0L until 100L).map(i =>
      (i, s"l${i % 5}", Array.tabulate(8)(j => ((i * 13 + j) % 7 - 3) / 2.0f)))
      .toDF("vec_id", "label", "embedding")
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(stableAvg(col("v").cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("dim"),
        round(sqrt(stableSum(col("m") * col("m")).cast("double")), 6).as("centroid_norm"),
        round(max(when(col("pos") === 0, col("m"))), 6).as("c0"))
    val plan = cent.queryExecution.executedPlan.toString
    // exchange 1 carries the exploded stream into the (label, pos)
    // partial-agg; exchange 2 regroups label×dim rows — label-sized, not
    // corpus-sized. posexplode is a Generate node, never an Expand.
    assert(shuffles(cent) == 2, s"emb_centroids plan drifted:\n$plan")
    assert(!plan.contains("Expand"), s"unexpected Expand in:\n$plan")
  }

  test("z-order keeps BOTH cluster columns' per-file ranges narrow; 1-D clustering does not") {
    import java.nio.file.Files
    import graft.write.IncrementalWriter
    // two independent uniform dimensions — the case where 1-D clustering
    // is blind on the second column
    val rows = (0 until 4096).map { i =>
      (i.toLong, (i * 2654435761L % 4096).toDouble, ((i * 40503L + 7) % 4096).toDouble)
    }.toDF("id", "x", "y")
    def spans(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(avg($"sx"), avg($"sy")).head()
      (perFile.getDouble(0) / 4096.0, perFile.getDouble(1) / 4096.0)
    }
    val zdir = Files.createTempDirectory("graft_z").toString + "/t"
    IncrementalWriter.overwriteZOrdered(rows, zdir, Seq("x", "y"), nFiles = 16)
    val (zx, zy) = spans(zdir)
    // 16 files on a 2-D Morton curve ≈ a 4×4 tiling: each file covers
    // ~1/4 of EACH dimension (plus curve-boundary slack)
    assert(zx < 0.6 && zy < 0.6, s"z-order spans too wide: x=$zx y=$zy")
    val cdir = Files.createTempDirectory("graft_z1").toString + "/t"
    IncrementalWriter.overwriteClustered(rows, cdir, "x", nFiles = 16)
    val (cx, cy) = spans(cdir)
    // the contrast that justifies the operator: 1-D clustering is
    // perfect on x but each file spans (almost) the whole y domain
    assert(cx < 0.1, s"1-D clustering should be tight on its own column: $cx")
    assert(cy > 0.9, s"expected ~full y span under 1-D clustering, got $cy")
  }

  test("incremental LSH prunes the stored band scan with an un-shuffled semi join") {
    import java.nio.file.Files
    val bandsPath = Files.createTempDirectory("graft_lshpin").toString + "/bands"
    (1L to 500L).map(i => (i, (i % 12).toInt, s"k${i % 40}"))
      .toDF("doc_id", "band_idx", "band_key")
      .write.parquet(bandsPath)
    val newKeys = Seq((0, "k1"), (1, "k2"), (2, "k3"))
      .toDF("band_idx", "band_key").distinct()
    val pruned = graft.operators.Dedup.storedBandsPruned(spark, bandsPath, newKeys, None)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"touched-bucket semi join missing:\n$plan")
    // the only hash exchange allowed is the tiny new-key distinct (build
    // side); the stored scan itself must reach the semi join unshuffled
    // — that is the property that bounds per-batch cost by touched
    // buckets rather than index history.
    assert(shuffles(pruned) <= 1, s"stored band scan is being shuffled:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"new-key set not broadcast:\n$plan")
  }

  test("trigramSearch broadcasts the candidate side, never the corpus text") {
    import java.nio.file.Files
    val docs = (1L to 80L).map(i => (i, s"alpha bravo charlie doc$i needles"))
      .toDF("doc_id", "text")
    val idx = Files.createTempDirectory("graft_tripin").toString + "/idx"
    graft.operators.TextAnalysis.trigramIndexWrite(docs, idx)
    val res = graft.operators.TextAnalysis.trigramSearch(spark, idx, docs, Seq("needles"))
    val plan = res.queryExecution.sparkPlan
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"no broadcast in verify join:\n$plan")
    // the broadcast (build) subtrees carry probe trigrams / candidate ids
    // only; if the text column appears there, the corpus side is being
    // broadcast — the plan that cannot exist at 100 TB
    val buildSides = bhj.map(j =>
      (if (j.buildSide.toString.contains("Right")) j.right else j.left).toString)
    assert(!buildSides.exists(_.contains("text#")),
      s"corpus text side is broadcast in:\n$plan")
    assert(res.collect().map(_.getLong(0)).sorted.sameElements(1L to 80L))
  }

  test("graph_link_predict: hub-cap semi join sits below the wedge self-join") {
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    val df = graft.SparkEntry.queries("graph_link_predict")(
      spark, "/root/testdata/sf0.001")
    try {
      val plan = df.queryExecution.sparkPlan
      def caps(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
        case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j }
      assert(caps(plan).nonEmpty, s"middle-degree cap semi join missing:\n$plan")
      // the wedge join (the only quadratic step) must consume CAPPED
      // inputs: some inner join has the LeftSemi cap in BOTH subtrees
      val wedges = plan.collect {
        case j: BaseJoinExec if j.joinType == Inner &&
          caps(j.left).nonEmpty && caps(j.right).nonEmpty => j }
      assert(wedges.nonEmpty,
        s"wedge self-join does not sit above the hub cap:\n$plan")
      assert(!plan.toString.contains("CartesianProduct") &&
        !plan.toString.contains("BroadcastNestedLoopJoin"),
        s"unbounded join in link prediction:\n$plan")
    } finally TransientCache.drain()
  }

  test("graph triangle/assortativity entries keep bounded exchange counts") {
    // exchange counts pinned (<=) so a rewrite that silently adds a
    // shuffle per edge-pass — the graph-scale killer — fails here
    val tri = graft.SparkEntry.queries("graph_triangles")(
      spark, "/root/testdata/sf0.001")
    val triN = shuffles(tri)
    TransientCache.drain()
    val ast = graft.SparkEntry.queries("graph_assortativity")(
      spark, "/root/testdata/sf0.001")
    val astN = shuffles(ast)
    TransientCache.drain()
    assert(triN <= 13, s"graph_triangles exchange count grew to $triN")
    assert(astN <= 8, s"graph_assortativity exchange count grew to $astN")
  }

  test("commitMerge's key-locate plan shape reads only key + partition columns") {
    // replicate the locate pass (wide current state, semi join on the
    // batch keys, partition-column projection) and pin that Catalyst
    // prunes the scan to key + partition columns — the scaladoc's
    // "column-pruned key-locate pass" claim, which is what keeps the
    // pass cheap on a wide 100 TB table
    val dir = java.nio.file.Files.createTempDirectory("graft_mergeplan").toString + "/t"
    (1 to 100).map(i => (i.toLong, 2024, i % 4 + 1, i * 1.5, s"pay-$i", s"x$i"))
      .toDF("id", "year", "month", "fare", "payload", "extra")
      .write.partitionBy("year", "month").parquet(dir)
    val cur = spark.read.parquet(dir)
    val keys = Seq(3L, 7L).toDF("id")
    val locate = cur.join(keys, Seq("id"), "leftsemi")
      .select(col("year").cast("string"), col("month").cast("string"))
    locate.collect()
    // descend through AQE wrappers and materialized query stages — the
    // semi join's exchanges put the scans inside them
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val wideScan = scans(locate.queryExecution.executedPlan)
      .find(_.requiredSchema.fieldNames.contains("id"))
      .getOrElse(fail("no scan over the wide table found"))
    assert(wideScan.requiredSchema.fieldNames.toSet == Set("id"),
      s"locate pass reads extra data columns: ${wideScan.requiredSchema.fieldNames.toSeq}")
  }

  test("equiDepthBucket balances a heavy-tailed column and composes with z-order skipping") {
    import graft.write.IncrementalWriter
    // cubic tail: linear Z-normalization would crowd ~87% of rows into
    // the bottom cell of the v dimension — the bucketed rank is what
    // makes v-pruning possible at all
    val df = (1 to 4096).map(i => (i, i.toDouble * i * i)).toDF("id", "v")
    val bucketed = IncrementalWriter.equiDepthBucket(df, "v", 16)
    val sizes = bucketed.groupBy("v_bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(sizes.keySet == (0 until 16).toSet, s"missing buckets: $sizes")
    // near-equal depth (256/bucket ± sketch slack)
    assert(sizes.values.forall(n => n >= 200 && n <= 312),
      s"unbalanced buckets: $sizes")
    // deterministic: a second pass lands every row in the same bucket
    assert(IncrementalWriter.equiDepthBucket(df, "v", 16)
      .groupBy("v_bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap == sizes)
    // composition: Z-order on (id, v_bucket) + stats index on the
    // bucket column prunes files for a v-range translated to buckets
    val dir = java.nio.file.Files.createTempDirectory("graft_eqd").toString + "/t"
    IncrementalWriter.overwriteZOrdered(bucketed, dir, Seq("id", "v_bucket"), 16)
    val statsP = dir + "_stats"
    graft.sources.DataSkipping.buildStats(spark, dir, "v_bucket", statsP)
    val pruned = graft.sources.DataSkipping.read(spark, dir, "v_bucket", statsP)
      .filter(col("v_bucket") <= 3)
    val got = pruned.collect()
    assert(got.length == (0 to 3).map(sizes(_)).sum.toInt)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value }.sum
    assert(scanned < 16, s"no pruning on the bucketed dimension: $scanned")
  }

  test("min/max file skipping prunes files at planning time, values unchanged") {
    import java.nio.file.Files
    import graft.sources.DataSkipping
    val dir = Files.createTempDirectory("graft_skip").toString
    val (dataP, statsP) = (s"$dir/data", s"$dir/stats")
    // 8 disjoint-range files on k (repartitionByRange + sortWithinPartitions
    // = the clustered layout file skipping presumes)
    (1L to 800L).map(i => (i, i * 2.5)).toDF("k", "v")
      .repartitionByRange(8, $"k").sortWithinPartitions($"k")
      .write.parquet(dataP)
    DataSkipping.buildStats(spark, dataP, "k", statsP)
    val skipped = DataSkipping.read(spark, dataP, "k", statsP)
      .filter($"k" >= 341 && $"k" <= 360).select("k", "v")
    val expect = spark.read.parquet(dataP)
      .filter($"k" >= 341 && $"k" <= 360).select("k", "v")
    assert(skipped.collect().sortBy(_.getLong(0)).toSeq ==
      expect.collect().sortBy(_.getLong(0)).toSeq)
    // planning-time pruning pin: the executed scan read FEWER files
    // than the directory holds (the 20-key range spans at most 2 of 8)
    val scan = skipped.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles > 0 && numFiles <= 2,
      s"expected <=2 of 8 files scanned, got $numFiles")
    // a filter on an un-indexed column must not prune (conservative)
    val other = DataSkipping.read(spark, dataP, "k", statsP)
      .filter($"v" > 100.0)
    assert(other.count() == spark.read.parquet(dataP).filter($"v" > 100.0).count())
  }

  test("bloom file skipping prunes point lookups on unclustered data, values unchanged") {
    import java.nio.file.Files
    import graft.sources.DataSkipping
    val dir = Files.createTempDirectory("graft_bloomskip").toString
    val (dataP, statsP) = (s"$dir/data", s"$dir/stats")
    // RANDOM layout: every file spans the whole key range, so min/max
    // skipping can never prune — the bloom index's home turf
    (1L to 800L).map(i => (i, i * 1.5)).toDF("k", "v")
      .repartition(8).write.parquet(dataP)
    DataSkipping.buildBloomStats(spark, dataP, "k", statsP,
      expectedPerFile = 200, fpp = 0.01)
    val probe = DataSkipping.readBloom(spark, dataP, "k", statsP)
      .filter($"k" === 437L).select("k", "v")
    assert(probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((437L, 655.5)))
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan"))
    val n = scan.metrics("numFiles").value
    assert(n >= 1 && n <= 2, s"expected ~1 of 8 files for a point lookup, got $n")
    // IN-list probes prune to the union of their files; values equal plain
    val in = DataSkipping.readBloom(spark, dataP, "k", statsP)
      .filter($"k".isin(3L, 555L, 799L))
    assert(in.count() == 3)
    // a probe key absent from the table prunes EVERY file
    val absent = DataSkipping.readBloom(spark, dataP, "k", statsP)
      .filter($"k" === 100000L)
    assert(absent.count() == 0)
    // non-equality predicates must not prune (conservative)
    assert(DataSkipping.readBloom(spark, dataP, "k", statsP)
      .filter($"v" > 600.0).count() ==
      spark.read.parquet(dataP).filter($"v" > 600.0).count())
  }

  test("file skipping on timestamp/date columns compares in literal units") {
    // Regression: stored bounds MUST use the Catalyst-internal unit a
    // pushed-down Literal carries (µs for timestamps, days for dates).
    // A seconds-based cast made every timestamp range filter prune
    // every file — silently-empty results, the worst failure mode.
    import java.nio.file.Files
    import graft.sources.DataSkipping
    val dir = Files.createTempDirectory("graft_skip_ts").toString
    val rows = (0 until 400).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i / 14 + 1}%02d 06:00:${i % 14}%02d"),
        java.sql.Date.valueOf(f"2024-02-${i / 14 + 1}%02d"), i.toLong)
    }.toDF("ts", "d", "v")
    for ((c, pred) <- Seq(
        ("ts", col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-12 00:00:00").cast("timestamp")),
        ("d", col("d") >= lit("2024-02-10").cast("date") &&
          col("d") < lit("2024-02-12").cast("date")))) {
      val (dataP, statsP) = (s"$dir/${c}_data", s"$dir/${c}_stats")
      rows.repartitionByRange(8, col(c)).sortWithinPartitions(col(c))
        .write.parquet(dataP)
      DataSkipping.buildStats(spark, dataP, c, statsP)
      val skipped = DataSkipping.read(spark, dataP, c, statsP).filter(pred)
      val expectN = spark.read.parquet(dataP).filter(pred).count()
      assert(expectN > 0, s"degenerate fixture for $c")
      // collect through THIS handle so the plan-metric pin below reads
      // the executed scan, not a separate count() execution
      assert(skipped.collect().length == expectN,
        s"unit mismatch on $c: skipping changed the result")
      val scan = skipped.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .getOrElse(fail("no file scan"))
      val n = scan.metrics("numFiles").value
      assert(n > 0 && n <= 2, s"$c: expected <=2 of 8 files scanned, got $n")
    }
    // unsupported index types are rejected at BUILD time, loudly
    Seq(("a", 1L), ("b", 2L)).toDF("s", "v").write.parquet(s"$dir/str_data")
    intercept[IllegalArgumentException] {
      DataSkipping.buildStats(spark, s"$dir/str_data", "s", s"$dir/bad_stats")
    }
  }

  test("an all-null indexed column in a file keeps the file, never crashes") {
    import java.nio.file.Files
    import graft.sources.DataSkipping
    val dir = Files.createTempDirectory("graft_skip_null").toString
    val (dataP, statsP) = (s"$dir/data", s"$dir/stats")
    // file 0: real values; file 1: all-null k (null bounds in the index)
    (1L to 50L).map(i => (Some(i), i * 1.0)).toDF("k", "v")
      .coalesce(1).write.parquet(dataP)
    (1 to 20).map(_ => (Option.empty[Long], -1.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dataP)
    DataSkipping.buildStats(spark, dataP, "k", statsP)
    // index load must skip the null-bounds row; the null file is KEPT
    // (conservative) so non-k predicates still see its rows
    val r = DataSkipping.read(spark, dataP, "k", statsP)
    assert(r.filter($"k" >= 10 && $"k" <= 12).count() == 3)
    assert(r.filter($"v" < 0).count() == 20)
  }

  test("bloom index is lazy: no stats read without a probe, driver holds paths only") {
    import java.nio.file.Files
    import graft.sources.DataSkipping
    val dir = Files.createTempDirectory("graft_bloom_lazy").toString
    val (dataP, statsP) = (s"$dir/data", s"$dir/stats")
    (1L to 800L).map(i => (i, i * 1.5)).toDF("k", "v")
      .repartition(8).write.parquet(dataP)
    // 1) construction + non-equality scans never touch the stats path:
    //    a MISSING index only fails when an equality probe needs it
    val unprobed = DataSkipping.readBloom(spark, dataP, "k", statsP)
    assert(unprobed.filter($"v" > 600.0).count() ==
      spark.read.parquet(dataP).filter($"v" > 600.0).count())
    // 2) the probe is a distributed pass returning pruned NAMES: driver
    //    bytes scale with pruned paths, never files × filter bytes
    DataSkipping.buildBloomStats(spark, dataP, "k", statsP,
      expectedPerFile = 200, fpp = 0.01)
    val hash = DataSkipping.probeHash(
      org.apache.spark.sql.catalyst.expressions.Literal(437L))
    val pruned = DataSkipping.probeProvenAbsent(spark, statsPath = statsP,
      conjuncts = Seq(Seq(hash)))
    assert(pruned.size >= 6 && pruned.size <= 7,
      s"a point key lives in ~1 of 8 files; pruned ${pruned.size}")
    val statsBytes = Files.walk(java.nio.file.Paths.get(statsP)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].toFile)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val pathBytes = pruned.map(_.length.toLong).sum
    assert(pathBytes * 10 < statsBytes,
      s"driver-resident probe result ($pathBytes B) should be far below " +
        s"the index's filter bytes ($statsBytes B)")
  }

  test("corpus_clean_split builds the LSH signature pipeline once") {
    val df = graft.SparkEntry.queries("corpus_clean_split")(
      spark, "/root/testdata/sf0.001")
    try {
      df.count() // materialize so the entry-scoped caches populate
      val plan = df.queryExecution.executedPlan.toString
      // every consumer of the banded frame / split-assigned docs must
      // read the entry-scoped cache, not re-derive shingle+md5 per branch
      assert(plan.contains("InMemoryTableScan") ||
        plan.contains("TableCacheQueryStage"),
        s"banded signature pipeline not cached in:\n$plan")
    } finally TransientCache.drain()
  }
}
