package graft

import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.{IncrementalWriter, SnapshotTable, WriteDistribution}

/** The fat-partition write fan-out (`graft.write.splitsPerPartition`):
  * default stays one-file-per-partition; the knob multiplies writers
  * per partition deterministically; results are layout-independent. */
class WriteDistributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i, 2024, 1 + (i % 2), i * 1.5))
      .toDF("id", "year", "month", "fare")
  }

  private def parquetFiles(dir: JPath): Seq[JPath] = {
    if (!Files.exists(dir)) return Seq.empty
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
    } finally s.close()
  }

  private def withSplits[A](n: String)(body: => A): A = {
    spark.conf.set(WriteDistribution.SplitsConf, n)
    try body finally spark.conf.unset(WriteDistribution.SplitsConf)
  }

  test("default: one file per partition directory") {
    val root = Files.createTempDirectory("graft_wd_one").toString + "/t"
    IncrementalWriter.appendPartitioned(frame(200), root)
    for (m <- Seq(1, 2)) {
      val files = parquetFiles(Paths.get(root, "year=2024", s"month=$m"))
      assert(files.size == 1, s"month=$m expected 1 file, got ${files.size}")
    }
  }

  test("splitsPerPartition=4: parallel writers per partition, result-identical") {
    val root = Files.createTempDirectory("graft_wd_four").toString + "/t"
    withSplits("4") { IncrementalWriter.appendPartitioned(frame(200), root) }
    for (m <- Seq(1, 2)) {
      val files = parquetFiles(Paths.get(root, "year=2024", s"month=$m"))
      // fan-out happened (collisions may merge some splits, never all)
      assert(files.size >= 2 && files.size <= 4,
        s"month=$m expected 2..4 files, got ${files.size}")
    }
    val back = spark.read.parquet(root)
      .select("id", "fare").collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(back == (1 to 200).map(i => (i, i * 1.5)).toSet)
  }

  test("snapshot commits honor the knob; reads and history are unaffected") {
    val root = Files.createTempDirectory("graft_wd_snap").toString + "/t"
    val t = new SnapshotTable(spark, root)
    withSplits("3") { t.commitOverwrite(frame(150)) }
    val dir = Paths.get(root, "_data")
    val files = parquetFiles(dir)
    // 2 partitions × up to 3 splits, and provably fanned out past 1/dir
    assert(files.size >= 4 && files.size <= 6,
      s"expected 4..6 files, got ${files.size}")
    assert(t.read().count() == 150)
    // compaction with the knob back at default folds to 1 file/partition
    t.commitCompactFiles()
    val v = t.currentVersion.get
    val compacted = t.dataDirs(v)
    assert(compacted.size == 1)
    assert(parquetFiles(Paths.get(root, "_data", compacted.head)).size == 2)
    assert(t.read().count() == 150)
  }

  test("the salt is deterministic: identical input lands identical splits") {
    import spark.implicits._
    val df = frame(100)
    val salted = WriteDistribution.byPartition(
      { spark.conf.set(WriteDistribution.SplitsConf, "4"); df }, Seq("year", "month"))
    try {
      val a = salted.withColumn("p", spark_partition_id())
        .select("id", "p").as[(Int, Int)].collect().toMap
      val b = WriteDistribution.byPartition(df, Seq("year", "month"))
        .withColumn("p", spark_partition_id())
        .select("id", "p").as[(Int, Int)].collect().toMap
      assert(a == b) // same rows, same splits — replay-safe
    } finally spark.conf.unset(WriteDistribution.SplitsConf)
  }

  test("map-typed columns are excluded from the salt (xxhash64 refuses MapType)") {
    import spark.implicits._
    val df = Seq((1, 2024, 1, Map("k" -> 1)), (2, 2024, 1, Map("k" -> 2)),
      (3, 2024, 2, Map("k" -> 3)))
      .toDF("id", "year", "month", "attrs")
    withSplits("4") {
      // round-13 salted the WHOLE row: a map column failed every write
      // with an unrelated-looking "cannot hash MapType" analysis error
      val out = WriteDistribution.byPartition(df, Seq("year", "month"))
      assert(out.count() == 3)
      // still deterministic over the remaining columns
      val a = out.withColumn("p", spark_partition_id())
        .select("id", "p").as[(Int, Int)].collect().toMap
      val b = WriteDistribution.byPartition(df, Seq("year", "month"))
        .withColumn("p", spark_partition_id())
        .select("id", "p").as[(Int, Int)].collect().toMap
      assert(a == b)
    }
    // an all-map frame refuses with the knob's name
    val allMaps = Seq((Map("k" -> 1), Map("v" -> 2))).toDF("m1", "m2")
    withSplits("2") {
      val e = intercept[Exception] {
        WriteDistribution.byPartition(allMaps, Seq("m1")) }
      assert(e.getMessage.contains("splitsPerPartition"))
    }
  }

  test("invalid knob values refuse loudly") {
    withSplits("0") {
      intercept[IllegalArgumentException] {
        IncrementalWriter.appendPartitioned(frame(10),
          Files.createTempDirectory("graft_wd_bad").toString + "/t")
      }
    }
    withSplits("many") {
      val e = intercept[Exception] {
        IncrementalWriter.appendPartitioned(frame(10),
          Files.createTempDirectory("graft_wd_bad2").toString + "/t")
      }
      assert(e.getMessage.contains("splitsPerPartition"))
    }
  }
}
