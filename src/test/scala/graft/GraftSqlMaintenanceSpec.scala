package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.SnapshotTable

/** The SQL maintenance verbs (graft.sql.GraftSqlParser, injected via
  * GraftExtensions): VACUUM / OPTIMIZE / RESTORE / DESCRIBE HISTORY /
  * branch-tag DDL, each result-identical to its Scala-API twin,
  * loudly refusing non-graft targets, and leaving every other SQL
  * statement with Spark's stock parse. */
class GraftSqlMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(rows: (Int, Int, Int, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "year", "month", "fare")
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sqlmx_$tag").toString + "/tbl"

  private def state(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Int, Double)] =
    df.select(col("id"), col("year"), col("month"), col("fare"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet

  /** Register `name` over a fresh 2-version table; run body; drop. */
  private def withTable(tag: String)(body: (String, SnapshotTable) => Unit): Unit = {
    val name = s"graft_sqlmx_$tag"
    val root = freshRoot(tag)
    val t = new SnapshotTable(spark, root)
    t.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
    t.commitAppend(frame((3, 2024, 2, 30.0)))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
      body(name, t)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("OPTIMIZE: bin-packing compaction folds dirs, result-identical") {
    withTable("opt") { (name, t) =>
      t.commitAppend(frame((4, 2024, 3, 40.0)))
      val before = state(t.read())
      assert(t.dataDirs(t.currentVersion.get).size == 3)
      val v = spark.sql(s"OPTIMIZE $name").head().getInt(0)
      assert(v == t.currentVersion.get)
      assert(t.dataDirs(v).size == 1)
      assert(t.history.last._2 == "compact")
      // state unchanged, through both the API and the catalog name
      assert(state(t.read()) == before)
      assert(state(spark.table(name)) == before)
    }
  }

  test("OPTIMIZE WHERE: partition-scoped rewrite masks only the touched partitions") {
    withTable("optw") { (name, t) =>
      t.commitAppend(frame((4, 2024, 2, 40.0)))
      val before = state(t.read())
      // month=2 now spans three dirs; month=1 lives in dir 1 only
      val v = spark.sql(s"OPTIMIZE $name WHERE month = 2").head().getInt(0)
      assert(t.history.last._2 == "compact")
      // old entries all carried forward (masked), plus the rewrite dir
      assert(t.dataDirs(v).size == 4)
      assert(state(spark.table(name)) == before)
      // no-match predicate: no-op, no empty commit
      assert(spark.sql(s"OPTIMIZE $name WHERE month = 11").head().getInt(0) == v)
      assert(t.currentVersion.contains(v))
      // row-level predicates refuse loudly — scoped compaction takes a
      // partition predicate
      val e = intercept[Exception] {
        spark.sql(s"OPTIMIZE $name WHERE fare > 5").collect() }
      assert(e.getMessage.contains("PARTITION predicate"))
      // WHERE and ZORDER BY do not compose
      val e2 = intercept[Exception] {
        spark.sql(s"OPTIMIZE $name WHERE month = 2 ZORDER BY (fare)") }
      assert(e2.getMessage.contains("not both"))
    }
  }

  test("OPTIMIZE ZORDER BY: single- and multi-column clustering commits") {
    withTable("optz") { (name, t) =>
      val before = state(t.read())
      spark.sql(s"OPTIMIZE $name ZORDER BY (fare)")
      assert(t.history.last._2 == "compact")
      assert(state(spark.table(name)) == before)
      spark.sql(s"OPTIMIZE $name ZORDER BY (id, fare) INTO 4 FILES")
      assert(t.history.last._2 == "compact_z")
      assert(state(spark.table(name)) == before)
    }
  }

  test("VACUUM: DRY RUN lists orphans without deleting; RETAIN 0 sweeps") {
    withTable("vac") { (name, t) =>
      // plant an orphan: a data dir no manifest references
      val fs = new Path(t.location).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val orphan = new Path(t.location, "_data/d99999_deadbeef")
      fs.mkdirs(orphan)
      // backdate: the sweep takes dirs STRICTLY older than the cutoff,
      // and a just-created dir's mtime can equal `now` at millisecond
      // granularity — a clock-tick flake, not a sweep property
      fs.setTimes(orphan, System.currentTimeMillis() - 10000L, -1L)
      val dry = spark.sql(s"VACUUM $name RETAIN 0 HOURS DRY RUN")
        .collect().map(_.getString(0)).toSet
      assert(dry == Set("d99999_deadbeef"))
      assert(fs.exists(orphan)) // dry run touched nothing
      val swept = spark.sql(s"VACUUM $name RETAIN 0 HOURS")
        .collect().map(_.getString(0)).toSet
      assert(swept == Set("d99999_deadbeef"))
      assert(!fs.exists(orphan))
      // default window (no RETAIN): fresh orphans survive the age guard
      fs.mkdirs(orphan)
      assert(spark.sql(s"VACUUM $name").collect().isEmpty)
      assert(fs.exists(orphan))
    }
  }

  test("DESCRIBE HISTORY: the commit lineage as rows") {
    withTable("hist") { (name, t) =>
      val rows = spark.sql(s"DESCRIBE HISTORY $name")
        .select("version", "op", "parent").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      assert(rows == Seq((1, "overwrite", 0), (2, "append", 1)))
      // plain DESCRIBE still parses as Spark's (delegation intact)
      assert(spark.sql(s"DESCRIBE $name").collect().nonEmpty)
    }
  }

  test("RESTORE TO VERSION AS OF: a new commit with the target's state") {
    withTable("rest") { (name, t) =>
      val v1 = state(t.readVersion(1))
      val out = spark.sql(s"RESTORE TABLE $name TO VERSION AS OF 1").head()
      assert((out.getInt(0), out.getInt(1)) == (1, 3))
      assert(state(spark.table(name)) == v1)
      assert(state(t.readVersion(2)) != v1) // history preserved
    }
  }

  test("RESTORE TO TIMESTAMP AS OF: resolves via commit wall-clock") {
    withTable("restts") { (name, t) =>
      val v2 = state(t.read())
      // capture a wall-clock instant strictly after v2's commit, then
      // move the table past it — the restore must land back on v2
      Thread.sleep(5)
      val cut = java.time.Instant.now().toString
      Thread.sleep(5)
      t.commitOverwrite(frame((9, 2025, 1, 90.0)))
      val out = spark.sql(s"RESTORE $name TO TIMESTAMP AS OF '$cut'").head()
      assert(out.getInt(0) == 2)
      assert(state(spark.table(name)) == v2)
    }
  }

  test("RESTORE refuses a pre-history timestamp loudly") {
    withTable("restts2") { (name, _) =>
      val e = intercept[Exception] {
        spark.sql(s"RESTORE $name TO TIMESTAMP AS OF '2020-01-01T00:00:00Z'")
          .collect()
      }
      assert(e.getMessage.contains("no snapshot at or before"))
    }
  }

  test("branch/tag DDL: CREATE, DROP, FAST FORWARD") {
    withTable("refs") { (name, t) =>
      spark.sql(s"ALTER TABLE $name CREATE TAG stable AS OF VERSION 1")
      assert(t.resolveTag("stable").contains(1))
      spark.sql(s"ALTER TABLE $name DROP TAG stable")
      assert(t.resolveTag("stable").isEmpty)
      // dropped name is re-creatable (two loud operations, never a
      // silent re-point)
      spark.sql(s"ALTER TABLE $name CREATE TAG stable") // defaults to head
      assert(t.resolveTag("stable").contains(2))

      spark.sql(s"ALTER TABLE $name CREATE BRANCH wip")
      t.commitAppendToBranch("wip", frame((7, 2024, 7, 70.0)))
      val v = spark.sql(s"ALTER TABLE $name FAST FORWARD BRANCH wip")
        .head().getInt(0)
      assert(t.currentVersion.contains(v))
      assert(state(spark.table(name)).exists(_._1 == 7))
      spark.sql(s"ALTER TABLE $name DROP BRANCH wip")
      assert(t.branchHead("wip").isEmpty)
    }
  }

  test("branch/tag DDL on a CAS-mode table arbitrates through the store") {
    import graft.write.{GraftStores, InMemoryConditionalStore, SnapshotTable}
    val root = java.nio.file.Files.createTempDirectory("graft_sqlrefs_cas")
      .toString + "/t"
    val store = InMemoryConditionalStore(s"cas_$root")
    GraftStores.register("sqlm_cas_refs", store)
    spark.sql("DROP TABLE IF EXISTS graft_sqlm_cas_refs")
    try {
      val t = new SnapshotTable(spark, root, Seq("year", "month"), Some(store))
      t.commitOverwrite(frame((1, 2024, 1, 10.0)))
      t.commitAppend(frame((2, 2024, 2, 20.0)))
      spark.sql(s"CREATE TABLE graft_sqlm_cas_refs USING graft " +
        s"OPTIONS (path '$root', pointer 'sqlm_cas_refs')")
      // the full ref verb surface over the store-arbitrated table: no
      // TAG_/bv_ create-exclusive files may appear (that primitive
      // doesn't exist on the storage CAS mode serves)
      spark.sql("ALTER TABLE graft_sqlm_cas_refs CREATE TAG stable AS OF VERSION 1")
      assert(t.resolveTag("stable").contains(1))
      spark.sql("ALTER TABLE graft_sqlm_cas_refs CREATE BRANCH wip")
      t.commitAppendToBranch("wip", frame((7, 2024, 7, 70.0)))
      val v = spark.sql("ALTER TABLE graft_sqlm_cas_refs FAST FORWARD BRANCH wip")
        .head().getInt(0)
      assert(t.currentVersion.contains(v))
      assert(state(spark.table("graft_sqlm_cas_refs")).exists(_._1 == 7))
      val mdir = new org.apache.hadoop.fs.Path(root, "_manifests")
      val fsys = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val refFiles = fsys.listStatus(mdir).map(_.getPath.getName)
        .filter(n => n.startsWith("TAG_") ||
          // Fs-mode create-exclusive shape (bv_<name>_NNNNN.txt) ONLY:
          // CAS mode's chained manifests carry a _<8-hex-uuid> suffix
          // and are legitimate here — and the uuid is all-digits ~2.3%
          // of the time, so it must be excluded explicitly or this
          // assertion flakes
          (n.matches("bv_.*_\\d{5,}\\.txt") &&
            !n.matches("bv_.*_\\d{5,}_[0-9a-f]{8}\\.txt")))
      assert(refFiles.isEmpty, s"ref files on a CAS table: ${refFiles.toSeq}")
      spark.sql("ALTER TABLE graft_sqlm_cas_refs DROP BRANCH wip")
      assert(t.branchHead("wip").isEmpty)
      spark.sql("ALTER TABLE graft_sqlm_cas_refs DROP TAG stable")
      assert(t.resolveTag("stable").isEmpty)
      assert(t.fsck().isEmpty, s"fsck: ${t.fsck()}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sqlm_cas_refs")
      GraftStores.unregister("sqlm_cas_refs")
    }
  }

  test("strict FAST FORWARD refuses when main moved; FORCE proceeds") {
    withTable("ffs") { (name, t) =>
      spark.sql(s"ALTER TABLE $name CREATE BRANCH wip")
      t.commitAppendToBranch("wip", frame((7, 2024, 7, 70.0)))
      t.commitAppend(frame((8, 2024, 8, 80.0))) // main moves past the fork
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $name FAST FORWARD BRANCH wip") }
      val v = spark.sql(s"ALTER TABLE $name FAST FORWARD BRANCH wip FORCE")
        .head().getInt(0)
      assert(t.currentVersion.contains(v))
    }
  }

  test("ADD CONSTRAINT: validates existing data, then gates every new commit") {
    withTable("con") { (name, t) =>
      // an ADD whose CHECK existing rows violate refuses up front
      val e0 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $name ADD CONSTRAINT big CHECK (fare >= 15)")
          .collect() }
      assert(e0.getMessage.contains("existing rows violate"))
      assert(t.constraints.isEmpty)

      val v = spark.sql(
        s"ALTER TABLE $name ADD CONSTRAINT pos CHECK (fare > 0)").head().getInt(0)
      assert(t.currentVersion.contains(v))
      assert(t.constraints.map(_._1) == Seq("pos"))
      assert(t.history.last._2 == "add_constraint_pos")

      // violating INSERT refuses, names the constraint, leaves the
      // table untouched
      frame((9, 2024, 3, -5.0)).createOrReplaceTempView("graft_sqlmx_con_bad")
      val e1 = intercept[Exception] {
        spark.sql(s"INSERT INTO $name BY NAME SELECT * FROM graft_sqlmx_con_bad") }
      assert(e1.getMessage.contains("constraint 'pos'"))
      assert(t.currentVersion.contains(v))
      assert(t.fsck().isEmpty) // the refused dir left no debris

      // valid insert lands; NULL passes (SQL CHECK semantics)
      spark.sql(s"SELECT 10 AS id, 2024 AS year, 3 AS month, 50.0 AS fare")
        .createOrReplaceTempView("graft_sqlmx_con_ok")
      spark.sql(s"INSERT INTO $name BY NAME SELECT * FROM graft_sqlmx_con_ok")
      spark.sql(s"SELECT 11 AS id, 2024 AS year, 3 AS month, " +
        "CAST(NULL AS DOUBLE) AS fare").createOrReplaceTempView("graft_sqlmx_con_null")
      spark.sql(s"INSERT INTO $name BY NAME SELECT * FROM graft_sqlmx_con_null")
      assert(spark.table(name).count() == 5)

      // the set carries through unrelated commits
      assert(t.constraints.map(_._1) == Seq("pos"))

      // DROP releases the gate; older versions keep their era's set
      spark.sql(s"ALTER TABLE $name DROP CONSTRAINT pos")
      assert(t.constraints.isEmpty)
      spark.sql(s"SELECT 12 AS id, 2024 AS year, 3 AS month, -1.0 AS fare")
        .createOrReplaceTempView("graft_sqlmx_con_neg")
      spark.sql(s"INSERT INTO $name BY NAME SELECT * FROM graft_sqlmx_con_neg")
      assert(spark.table(name).count() == 6)
    }
  }

  test("constraints gate the Scala commit API too (UPDATE rewrite)") {
    withTable("conu") { (name, t) =>
      t.addConstraint("pos", "fare > 0")
      val before = state(t.read())
      val e = intercept[Exception] {
        t.commitUpdate(col("id") === 1, Seq("fare" -> lit(-9.0))) }
      assert(e.getMessage.contains("constraint 'pos'"))
      assert(state(t.read()) == before) // refused rewrite changed nothing
      assert(t.fsck().isEmpty)
    }
  }

  test("DESCRIBE DETAIL: one metadata-only row; borrowed dirs mark a shallow clone") {
    withTable("det") { (name, t) =>
      t.addConstraint("pos", "fare > 0")
      val r = spark.sql(s"DESCRIBE DETAIL $name").head()
      assert(r.getString(r.fieldIndex("format")) == "graft")
      // the catalog hands the root back scheme-qualified (file:/...)
      assert(r.getString(r.fieldIndex("location")).endsWith(t.location))
      assert(r.getInt(r.fieldIndex("version")) == t.currentVersion.get)
      assert(r.getInt(r.fieldIndex("num_entries")) == 2)
      assert(r.getInt(r.fieldIndex("num_borrowed_dirs")) == 0)
      assert(r.getLong(r.fieldIndex("num_files")) > 0)
      assert(r.getLong(r.fieldIndex("size_bytes")) > 0)
      assert(r.getString(r.fieldIndex("partition_columns")) == "year,month")
      assert(r.getString(r.fieldIndex("constraints")).startsWith("pos CHECK"))
      // a shallow clone's detail shows every entry borrowed and ZERO
      // owned bytes are implied by the files living at the source
      val loc = freshRoot("det_clone")
      val cName = "graft_sqlmx_det_clone"
      spark.sql(s"DROP TABLE IF EXISTS $cName")
      try {
        spark.sql(s"CREATE TABLE $cName SHALLOW CLONE $name LOCATION '$loc'")
        val c = spark.sql(s"DESCRIBE DETAIL $cName").head()
        assert(c.getInt(c.fieldIndex("num_entries")) == 2)
        assert(c.getInt(c.fieldIndex("num_borrowed_dirs")) == 2)
        assert(c.getInt(c.fieldIndex("num_borrowed_by")) == 0)
        assert(c.getLong(c.fieldIndex("num_files")) ==
          r.getLong(r.fieldIndex("num_files")))
        assert(c.getString(c.fieldIndex("constraints")).startsWith("pos CHECK"))
        // the SOURCE's detail shows the live borrower — the "may I
        // purge / reclaim?" signal an operator checks before retention
        val r2 = spark.sql(s"DESCRIBE DETAIL $name").head()
        assert(r2.getInt(r2.fieldIndex("num_borrowed_by")) == 1)
      } finally spark.sql(s"DROP TABLE IF EXISTS $cName")
    }
  }

  test("CLONE registration survives a backslash in the location") {
    withTable("clonebs") { (name, t) =>
      // the graft regex parser takes the location verbatim; the
      // GENERATED registration SQL goes through Spark's real lexer,
      // which unescapes backslashes — without doubling them the table
      // registers under '/tmp/...a<TAB>b' while the clone lives at
      // '/tmp/...a\tb', and the first read fails
      val loc = freshRoot("clone_bs") + "_a\\tb"
      val cName = "graft_sqlmx_clonebs_out"
      spark.sql(s"DROP TABLE IF EXISTS $cName")
      try {
        spark.sql(s"CREATE TABLE $cName SHALLOW CLONE $name LOCATION '$loc'")
        assert(state(spark.table(cName)) == state(t.read()),
          "registered table must read the path the clone was created at")
      } finally spark.sql(s"DROP TABLE IF EXISTS $cName")
    }
  }

  test("CREATE TABLE ... SHALLOW CLONE: zero-copy, registered, independent") {
    withTable("clone") { (name, t) =>
      val loc = freshRoot("clone_dst")
      val cName = "graft_sqlmx_clone_out"
      spark.sql(s"DROP TABLE IF EXISTS $cName")
      try {
        val v = spark.sql(
          s"CREATE TABLE $cName SHALLOW CLONE $name LOCATION '$loc'").head().getInt(0)
        assert(v == 1)
        val before = state(t.read())
        assert(state(spark.table(cName)) == before)
        // zero parquet under the clone's own _data: state is borrowed
        val cfs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dataP = new Path(loc, "_data")
        assert(!cfs.exists(dataP) ||
          !cfs.listFiles(dataP, true).hasNext)
        // a write through the clone's catalog name leaves the source
        // alone (column order: the format lists partition cols last)
        spark.sql(s"SELECT 9 AS id, 2024 AS year, 9 AS month, 90.0 AS fare")
          .createOrReplaceTempView("graft_sqlmx_clone_ins")
        spark.sql(s"INSERT INTO $cName BY NAME SELECT * FROM graft_sqlmx_clone_ins")
        assert(state(spark.table(cName)) == before + ((9, 2024, 9, 90.0)))
        assert(state(t.read()) == before)
        // a plain DEEP clone (the default form) owns its bytes
        val dLoc = freshRoot("clone_deep")
        val dName = "graft_sqlmx_clone_deep"
        spark.sql(s"DROP TABLE IF EXISTS $dName")
        try {
          spark.sql(s"CREATE TABLE $dName CLONE $name LOCATION '$dLoc'")
          assert(state(spark.table(dName)) == before)
          val dfs = new Path(dLoc).getFileSystem(spark.sparkContext.hadoopConfiguration)
          assert(dfs.listFiles(new Path(dLoc, "_data"), true).hasNext)
        } finally spark.sql(s"DROP TABLE IF EXISTS $dName")
      } finally spark.sql(s"DROP TABLE IF EXISTS $cName")
    }
  }

  test("ALTER TABLE ... LOCALIZE: the clone owns its bytes, the source's lease clears") {
    withTable("loc") { (name, t) =>
      val loc = freshRoot("loc_dst")
      val cName = "graft_sqlmx_loc_out"
      spark.sql(s"DROP TABLE IF EXISTS $cName")
      try {
        spark.sql(s"CREATE TABLE $cName SHALLOW CLONE $name LOCATION '$loc'")
        assert(t.borrowLeases().size == 1)
        val before = state(spark.table(cName))
        val v = spark.sql(s"ALTER TABLE $cName LOCALIZE").head().getInt(0)
        assert(v >= 2, "localize commits a compact version")
        assert(t.borrowLeases().isEmpty, "localize must release the lease")
        assert(state(spark.table(cName)) == before)
        val cfs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(cfs.listFiles(new Path(loc, "_data"), true).hasNext,
          "localized clone owns no bytes")
        // idempotent: a second LOCALIZE is a no-op
        assert(spark.sql(s"ALTER TABLE $cName LOCALIZE").head().getInt(0) == v)
      } finally spark.sql(s"DROP TABLE IF EXISTS $cName")
    }
  }

  test("CREATE TABLE ... SHALLOW CLONE ... POINTER: CAS-mode clone through a durable file store") {
    withTable("clone_cas") { (name, t) =>
      val loc = freshRoot("clone_cas_dst")
      val cell = freshRoot("clone_cas_cell")
      val cName = "graft_sqlmx_clone_cas_out"
      spark.sql(s"DROP TABLE IF EXISTS $cName")
      try {
        // path-shaped POINTER auto-opens a durable FileConditionalStore:
        // the zero-copy clone's commit arbitration lives in generation
        // files, no CURRENT file exists, nothing registered at startup
        val v = spark.sql(s"CREATE TABLE $cName SHALLOW CLONE $name " +
          s"LOCATION '$loc' POINTER '$cell'").head().getInt(0)
        assert(v == 1)
        val before = state(t.read())
        assert(state(spark.table(cName)) == before)
        val cfs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(!cfs.exists(new Path(loc, "_manifests/CURRENT")),
          "CAS-mode clone must keep its pointer in the store, not a file")
        // DML through the catalog name commits via the store's CAS and
        // never touches the source
        spark.sql(s"SELECT 9 AS id, 2024 AS year, 9 AS month, 90.0 AS fare")
          .createOrReplaceTempView("graft_sqlmx_clone_cas_out_ins")
        spark.sql(s"INSERT INTO $cName BY NAME " +
          "SELECT * FROM graft_sqlmx_clone_cas_out_ins")
        assert(state(spark.table(cName)) == before + ((9, 2024, 9, 90.0)))
        assert(state(t.read()) == before)
        // "restart": drop the cached store; the catalog-recorded pointer
        // option re-opens the durable cell on the next read
        graft.write.GraftStores.unregister(cell)
        assert(state(spark.table(cName)) == before + ((9, 2024, 9, 90.0)))
      } finally spark.sql(s"DROP TABLE IF EXISTS $cName")
    }
  }

  test("SQL CTAS: CREATE TABLE ... USING graft AS SELECT lands as a commit") {
    val loc = freshRoot("ctas")
    val name = "graft_sqlmx_ctas"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0))
        .createOrReplaceTempView("graft_sqlmx_ctas_src")
      spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$loc') " +
        "AS SELECT * FROM graft_sqlmx_ctas_src")
      assert(state(spark.table(name)) ==
        Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
      // the CTAS is a real v1 commit: history, maintenance, and time
      // travel all work on the result
      val t = new SnapshotTable(spark, loc)
      assert(t.currentVersion.contains(1))
      assert(t.history.map(_._2) == Seq("overwrite"))
      spark.sql(s"DESCRIBE HISTORY $name").collect()
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("maintenance on a non-graft table refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlmx_pq").toString
    frame((1, 2024, 1, 1.0)).write.mode("overwrite").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS graft_sqlmx_parquet")
    try {
      spark.sql(
        s"CREATE TABLE graft_sqlmx_parquet USING parquet OPTIONS (path '$dir')")
      for (stmt <- Seq("VACUUM graft_sqlmx_parquet",
          "OPTIMIZE graft_sqlmx_parquet",
          "DESCRIBE HISTORY graft_sqlmx_parquet",
          "RESTORE graft_sqlmx_parquet TO VERSION AS OF 1")) {
        val e = intercept[Exception] { spark.sql(stmt).collect() }
        assert(e.getMessage.contains("not a graft table"), stmt)
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_sqlmx_parquet")
  }

  test("malformed maintenance statements fail with THIS grammar's error") {
    val e = intercept[Exception] { spark.sql("VACUUM") }
    assert(e.getMessage.contains("graft maintenance grammar"))
    val e2 = intercept[Exception] {
      spark.sql("RESTORE t TO VERSION 3") } // missing AS OF
    assert(e2.getMessage.contains("graft maintenance grammar"))
  }

  test("non-maintenance SQL parses exactly as stock Spark") {
    // the delegating parser must not perturb ordinary statements
    assert(spark.sql("SELECT 1 AS x").head().getInt(0) == 1)
    assert(spark.sql("SHOW TABLES").columns.nonEmpty)
  }

  test("stock ALTER verbs keep stock behavior on NON-graft tables under the extensions") {
    // the round-13 parser intercepted SET/UNSET TBLPROPERTIES and
    // ADD COLUMN for ALL tables and refused them at execution on
    // non-graft targets — a behavior regression this pins closed: a
    // plain parquet v1 table must take these statements exactly as
    // stock Spark does (catalog-side property store, catalog schema
    // add), with the extensions installed.
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlmx_stock").toString
    frame((1, 2024, 1, 1.0)).write.mode("overwrite").parquet(dir)
    val name = "graft_sqlmx_stockpq"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      spark.sql(s"CREATE TABLE $name USING parquet OPTIONS (path '$dir')")
      spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES('team'='data-eng')")
      val props = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .properties
      assert(props.get("team").contains("data-eng"), s"stock SET broken: $props")
      spark.sql(s"ALTER TABLE $name UNSET TBLPROPERTIES('team')")
      assert(!spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .properties.contains("team"))
      // singular ADD COLUMN: stock v1 parquet supports it
      spark.sql(s"ALTER TABLE $name ADD COLUMN extra_note STRING")
      assert(spark.table(name).columns.contains("extra_note"))
      // IF EXISTS on a missing key is stock-silent
      spark.sql(s"ALTER TABLE $name UNSET TBLPROPERTIES IF EXISTS ('nope')")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("plural ADD COLUMNS on a graft table: one commit, N ColAdds, catalog follows") {
    withTable("addcols") { (name, t) =>
      val before = t.currentVersion.get
      val v = spark.sql(
        s"ALTER TABLE $name ADD COLUMNS (surcharge DOUBLE, note STRING)")
        .head().getInt(0)
      assert(v == before + 1, "plural add must be ONE commit")
      assert(t.columnOps.size == 2) // two ColAdds, one era step
      val cols = spark.table(name).columns.toSet
      assert(Set("surcharge", "note").subsetOf(cols))
      // fixture-era rows read the new columns as typed NULLs
      assert(spark.table(name)
        .filter(col("surcharge").isNull && col("note").isNull).count() == 3)
      // UNSET IF EXISTS on a graft table: unknown keys skipped, no
      // empty commit when all miss
      spark.sql(s"ALTER TABLE $name UNSET TBLPROPERTIES IF EXISTS ('nope')")
      assert(t.currentVersion.contains(v), "all-missing UNSET must not commit")
      // NOT NULL adds refuse with the backfill+constraint recipe named
      val e = intercept[Exception] { spark.sql(
        s"ALTER TABLE $name ADD COLUMNS (strict_col INT NOT NULL)") }
      assert(e.getMessage.contains("NOT NULL"), e.getMessage)
    }
  }

  test("an identifier named 'clone' no longer hijacks stock CREATE TABLE") {
    // the round-13 DeepClone regex fully matched
    //   CREATE TABLE x (a INT, clone STRING) USING parquet LOCATION 'p'
    // and errored it out of the delegate's reach
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlmx_clonecol").toString
    val name = "graft_sqlmx_clonecol"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      spark.sql(
        s"CREATE TABLE $name (a INT, clone STRING) USING parquet LOCATION '$dir/t'")
      assert(spark.table(name).columns.toSeq == Seq("a", "clone"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
