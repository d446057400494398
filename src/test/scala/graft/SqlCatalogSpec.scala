package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.sources.{AtomicWarehouse, ColEq, ColIn}
import graft.sql.{GraftCatalog, GraftFileIndex}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `spark.sql` over warehouse tables through [[GraftCatalog]]. Contract
  * under test: resolution and results match the Scala API read for every
  * table state (column mapping, deletion vectors, time travel); SQL data
  * filters reach the MANIFEST's file pruning (stats bands, Bloom
  * sidecars) before any file opens; writes route through the
  * transactional append/replace so engine invariants bind SQL writers;
  * dimension-sized tables auto-broadcast from manifest file sizes.
  */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val kv = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private val seq = new AtomicInteger(0)

  /** Fresh warehouse registered as a uniquely-named session catalog. */
  private def fixture(): (AtomicWarehouse, String, String) = {
    val root = Files.createTempDirectory("graft-sqlcat-").toString
    val cat = s"gcat${seq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (new AtomicWarehouse(spark, root), cat, root)
  }

  /** Four single-file id-bands of 100 each — the skipping fixture. */
  private def banded(wh: AtomicWarehouse): Unit =
    (0 until 4).foreach(b => wh.append("facts/t",
      (b * 100L until (b + 1) * 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)))

  test("SELECT resolves namespaced tables; result and schema match the API read") {
    val (wh, cat, _) = fixture()
    banded(wh)
    val got = spark.sql(
      s"SELECT id, v FROM $cat.facts.t WHERE id % 2 = 0 ORDER BY id")
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      (0L until 400L by 2).map(i => (i, s"v$i")))
    // aggregation over the catalog table
    assert(spark.sql(s"SELECT count(*) AS n, sum(id) AS s FROM $cat.facts.t")
      .head().toSeq == Seq(400L, (0L until 400L).sum))
  }

  test("SQL range/equality/IN filters prune files through the manifest") {
    val (wh, cat, root) = fixture()
    banded(wh)
    // range predicate covering exactly band 1 → 1 file opened, 3 skipped
    val r = spark.sql(
      s"SELECT count(*) AS n FROM $cat.facts.t WHERE id >= 100 AND id < 200")
    assert(r.head().getLong(0) == 100L)
    assert(GraftFileIndex.lastPlanFor(root, "facts/t").contains((1, 3)),
      s"wanted 1 kept / 3 skipped, got ${GraftFileIndex.lastPlanFor(root, "facts/t")}")
    // equality → still one band
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 250")
      .head().getString(0) == "v250")
    assert(GraftFileIndex.lastPlanFor(root, "facts/t").contains((1, 3)))
    // IN across two bands → two files
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat.facts.t WHERE id IN (10, 310)")
      .head().getLong(0) == 2L)
    assert(GraftFileIndex.lastPlanFor(root, "facts/t").contains((2, 2)))
    // OR of two range disjuncts → the two covering bands
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t " +
      "WHERE (id >= 0 AND id < 50) OR (id >= 350 AND id < 400)")
      .head().getLong(0) == 100L)
    assert(GraftFileIndex.lastPlanFor(root, "facts/t").contains((2, 2)))
    // the plan stays the native scan: filters pushed into the parquet
    // reader, projection pruned to the referenced column, codegen intact
    val q = spark.sql(s"SELECT id FROM $cat.facts.t WHERE id >= 100 AND id < 200")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(id,100), LessThan(id,200)]"),
      s"SQL filters must reach the parquet scan; plan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"projection must prune to the selected column; plan:\n$plan")
    assert(plan.contains("*(1)"), // the WholeStageCodegen marker
      s"codegen must survive; plan:\n$plan")
  }

  test("Bloom sidecars prune SQL point lookups on unclustered keys") {
    val (wh, cat, root) = fixture()
    wh.setBloomIndex("facts/b", Seq("id"))
    // interleaved ids: min/max bands overlap totally, only Bloom can prune
    (0 until 4).foreach(b => wh.append("facts/b",
      (0L until 100L).map(i => (i * 4 + b, s"v${i * 4 + b}")).toDF("id", "v").coalesce(1)))
    assert(spark.sql(s"SELECT v FROM $cat.facts.b WHERE id = 42")
      .head().getString(0) == "v42")
    val Some((kept, skipped)) = GraftFileIndex.lastPlanFor(root, "facts/b")
    assert(kept + skipped == 4 && kept < 4,
      s"Bloom should prune overlapping bands: kept=$kept skipped=$skipped")
  }

  test("deletion vectors and column renames apply to SQL reads") {
    val (wh, cat, _) = fixture()
    banded(wh)
    wh.deleteWhereDv("facts/t", kv, Seq(ColIn("id", Seq(5L, 105L, 205L, 305L))))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0) == 396L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id IN (5, 6, 105)")
      .head().getLong(0) == 1L)
    // rename: SQL resolves the NEW logical name over unchanged bytes
    wh.renameColumn("facts/t", "v", "label")
    val r = spark.sql(s"SELECT label FROM $cat.facts.t WHERE id = 7")
    assert(r.head().getString(0) == "v7")
  }

  test("INSERT INTO/OVERWRITE route through the warehouse; constraints bind SQL writers") {
    val (wh, cat, _) = fixture()
    wh.append("dim/d", Seq((1L, "a")).toDF("id", "v"))
    wh.addConstraint("dim/d", "id_pos", "id > 0", kv)
    spark.sql(s"INSERT INTO $cat.dim.d VALUES (2, 'b')")
    assert(wh.read("dim/d", kv).count() == 2)
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.dim.d VALUES (-1, 'bad')"))
    assert(e.getMessage.contains("id_pos"), s"constraint must refuse: ${e.getMessage}")
    assert(wh.read("dim/d", kv).count() == 2, "refused INSERT leaked rows")
    spark.sql(s"INSERT OVERWRITE $cat.dim.d VALUES (9, 'z')")
    assert(wh.read("dim/d", kv).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("VERSION AS OF reads the era state; CREATE/DROP/listTables work") {
    val (wh, cat, _) = fixture()
    wh.append("dim/d", Seq((1L, "a")).toDF("id", "v"))
    val v1 = wh.versions().last
    wh.append("dim/d", Seq((2L, "b")).toDF("id", "v"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dim.d VERSION AS OF $v1")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dim.d").head().getLong(0) == 2L)
    // DDL round trip
    spark.sql(s"CREATE TABLE $cat.dim.fresh (k BIGINT, s STRING)")
    assert(wh.exists("dim/fresh"))
    spark.sql(s"INSERT INTO $cat.dim.fresh VALUES (1, 'x')")
    assert(spark.sql(s"SELECT k FROM $cat.dim.fresh").head().getLong(0) == 1L)
    assert(spark.sql(s"SHOW TABLES IN $cat.dim").collect()
      .map(_.getString(1)).toSet == Set("d", "fresh"))
    spark.sql(s"DROP TABLE $cat.dim.fresh")
    assert(!wh.exists("dim/fresh"))
  }

  test("SQL scan planning is LISTING-FREE on log-recorded tables: statuses " +
      "come from manifest bytes, zero filesystem metadata calls") {
    val (wh, cat, _) = fixture()
    banded(wh) // 4 files, stats (incl. bytes) recorded at commit
    val before = wh.streamPlanFsCalls.get()
    val n = spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0)
    assert(n == 400L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id < 100")
      .head().getLong(0) == 100L)
    assert(wh.streamPlanFsCalls.get() == before,
      s"scan planning made ${wh.streamPlanFsCalls.get() - before} filesystem " +
        "metadata calls on a fully log-recorded table")
  }

  test("GraftFileIndex serves a file committed AFTER its statuses snapshot " +
      "(race fallback, never a silent under-read)") {
    // regression pin for the r14 ADVICE fix: a commit landing between index
    // construction and physical planning must be fetched fresh, not dropped
    val (wh, _, _) = fixture()
    wh.append("facts/race", Seq((1L, "a")).toDF("id", "v").coalesce(1))
    val idx = new GraftFileIndex(wh, "facts/race", Map.empty)
    assert(idx.sizeInBytes > 0L) // force the lazy statuses snapshot
    wh.append("facts/race", Seq((2L, "b")).toDF("id", "v").coalesce(1))
    val listed = idx.listFiles(Nil, Nil).flatMap(_.files)
    assert(listed.size == 2,
      s"racing commit's file dropped: ${listed.size} files listed")
  }

  test("DELETE FROM routes through the engine's copy-on-write delete") {
    val (wh, cat, root) = fixture()
    banded(wh)
    // band-ranged delete: pruning confines the rewrite to one file
    spark.sql(s"DELETE FROM $cat.facts.t WHERE id >= 100 AND id < 200")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0) == 300L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id < 100")
      .head().getLong(0) == 100L)
    // IN and OR conditions translate into the algebra (id 5, 205, 390-399)
    spark.sql(s"DELETE FROM $cat.facts.t WHERE id IN (5, 205) OR id >= 390")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0) == 288L)
    // FK RESTRICT binds SQL deletes exactly as API deletes
    wh.append("dim/p", Seq((1L, "a")).toDF("id", "v"))
    wh.addForeignKey("facts/c", "p_ref", "dim/p", "id", "fk_p")
    wh.append("facts/c", Seq((10L, 1L)).toDF("c_id", "p_ref"))
    val e = intercept[Exception](spark.sql(s"DELETE FROM $cat.dim.p WHERE id = 1"))
    assert(e.getMessage.contains("RESTRICT"), e.getMessage)
    assert(wh.read("dim/p", kv).count() == 1, "refused SQL DELETE leaked")
    // whole-table DELETE truncates through the warehouse (metadata kept)
    spark.sql(s"DELETE FROM $cat.facts.t")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0) == 0L)
    assert(wh.exists("facts/t"))
  }

  test("TIMESTAMP AS OF resolves via manifest mtimes; namespaces enumerate") {
    val (wh, cat, _) = fixture()
    wh.append("dim/d", Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(1200) // manifest mtime granularity
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val between = fmt.format(new java.util.Date())
    Thread.sleep(1200)
    wh.append("dim/d", Seq((2L, "b")).toDF("id", "v"))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat.dim.d TIMESTAMP AS OF '$between'")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dim.d").head().getLong(0) == 2L)
    // a pre-history timestamp refuses instead of reading as empty
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.dim.d TIMESTAMP AS OF '1999-01-01 00:00:00'").collect())
    assert(e.getMessage.contains("no retained commit"), e.getMessage)
    // namespaces are the table-name path prefixes
    wh.append("facts/f", Seq((1L, "x")).toDF("id", "v"))
    val ns = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0)).toSet
    assert(ns == Set("dim", "facts"), s"got $ns")
  }

  test("UPDATE and MERGE INTO route through the engine's DML") {
    val (wh, cat, _) = fixture()
    banded(wh)
    // UPDATE: pruned WHERE, SET over the row, unassigned columns keep
    spark.sql(s"UPDATE $cat.facts.t SET v = concat('U-', v) WHERE id >= 100 AND id < 105")
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 102")
      .head().getString(0) == "U-v102")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE v LIKE 'U-%'")
      .head().getLong(0) == 5L)
    // MERGE: conditional delete + update + INSERT *, source read through
    // the catalog (its scan rewrites + prunes like any SELECT)
    wh.append("dim/src", Seq((5L, "DEL"), (6L, "upd6"), (1000L, "new"))
      .toDF("id", "v"))
    spark.sql(
      s"""MERGE INTO $cat.facts.t t USING $cat.dim.src s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'DEL' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0) == 400L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id = 5")
      .head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 6").head().getString(0) == "upd6")
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 1000").head().getString(0) == "new")
    // untouched rows kept their values (no accidental source overwrite)
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 7").head().getString(0) == "v7")
    // a merge with ONLY a delete clause leaves other matched rows alone
    wh.append("dim/src2", Seq((8L, "DEL"), (9L, "keep")).toDF("id", "v"))
    spark.sql(
      s"""MERGE INTO $cat.facts.t t USING $cat.dim.src2 s ON t.id = s.id
         |WHEN MATCHED AND s.v = 'DEL' THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id IN (8, 9)")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 9").head().getString(0) == "v9")
  }

  test("MERGE: NOT MATCHED BY SOURCE clauses and computed INSERT assignments") {
    val (wh, cat, _) = fixture()
    banded(wh) // ids 0..399, 4 bands of 100
    val band1File = wh.fileStats("facts/t").keySet
      .find(f => wh.fileStats("facts/t")(f).cols("id").max.contains(199L)).get
    wh.append("dim/src", Seq((5L, "five"), (1000L, "kilo")).toDF("id", "v"))
    spark.sql(
      s"""MERGE INTO $cat.facts.t t USING $cat.dim.src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, upper(s.v))
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 395 THEN DELETE""".stripMargin)
    // 5 updated, 1000 inserted via the computed assignment, 395-399 deleted
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t").head().getLong(0) == 396L)
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 5").head().getString(0) == "five")
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 1000").head().getString(0) == "KILO")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id BETWEEN 395 AND 399")
      .head().getLong(0) == 0L)
    // the NMBS condition's conjuncts joined the candidate pruning: the
    // merge touched the id=5 band and the id>=395 band; band 1 kept its file
    assert(wh.fileStats("facts/t").contains(band1File),
      "NMBS pruning must keep bands neither the source keys nor t.id >= 395 can reach")
    // NOT MATCHED BY SOURCE UPDATE (empty-ish source: no matching ids)
    wh.append("dim/src3", Seq((90000L, "zz")).toDF("id", "v"))
    spark.sql(
      s"""MERGE INTO $cat.facts.t t USING $cat.dim.src3 s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND t.id < 3 THEN UPDATE SET v = concat('old-', t.v)
         |""".stripMargin)
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 2").head().getString(0) == "old-v2")
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 3").head().getString(0) == "v3")
    // the unmatched source row did NOT insert (no NOT MATCHED clause)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.facts.t WHERE id = 90000")
      .head().getLong(0) == 0L)
  }

  test("MERGE WITH SCHEMA EVOLUTION adopts extra source columns") {
    val (wh, cat, _) = fixture()
    wh.append("facts/t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    wh.append("dim/src", Seq((2L, "B", 20L), (3L, "C", 30L)).toDF("id", "v", "extra"))
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.facts.t t
         |USING $cat.dim.src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT id, v, extra FROM $cat.facts.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // row 1 never matched: evolution null-fills; 2 updated; 3 inserted
    assert(got == Seq((1L, "a", -1L), (2L, "B", 20L), (3L, "C", 30L)), s"got $got")
    // a re-run is idempotent on the schema (the column is already adopted)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.facts.t t
         |USING $cat.dim.src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table(s"$cat.facts.t").schema.fieldNames.count(_ == "extra") == 1)
    // WITHOUT the clause, the same extra-column source merges fine but the
    // column is NOT adopted — extra source columns stay clause-visible
    // metadata (the CDC op/sequence shape), never silent schema changes
    wh.append("facts/plain", Seq((2L, "x")).toDF("id", "v"))
    spark.sql(
      s"""MERGE INTO $cat.facts.plain t USING $cat.dim.src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(spark.table(s"$cat.facts.plain").schema.fieldNames.toSeq == Seq("id", "v"))
    assert(spark.sql(s"SELECT v FROM $cat.facts.plain WHERE id = 2")
      .head().getString(0) == "B")
    // ATOMICITY: a merge that fails AFTER evolution would have adopted the
    // column (duplicate source keys refuse mid-statement) must leave the
    // schema untouched — the adoption rides the merge's own commit, never
    // a separate one
    wh.append("dim/dupsrc",
      Seq((2L, "B", 20L), (2L, "B2", 21L)).toDF("id", "v", "extra2"))
    val dup = intercept[Exception](spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.facts.plain t
         |USING $cat.dim.dupsrc s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    assert(spark.table(s"$cat.facts.plain").schema.fieldNames.toSeq == Seq("id", "v"),
      "failed merge leaked its schema evolution as a committed change")
    // the one no-commit path (empty source, no NMBS): adoption is the
    // statement's only effect and still happens
    wh.append("dim/empty", Seq((0L, "z", 0L)).toDF("id", "v", "extra3").limit(0))
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.facts.plain t
         |USING $cat.dim.empty s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table(s"$cat.facts.plain").schema.fieldNames.toSeq ==
      Seq("id", "v", "extra3"))
  }

  test("graft_changes: the change feed as a SQL table function") {
    val (wh, cat, root) = fixture()
    wh.setChangeFeed("facts/t", on = true)
    banded(wh)
    wh.deleteWhere("facts/t", kv, Seq(graft.sources.ColEq("id", 7L)))
    val head = wh.versions().last
    val got = spark.sql(
      s"""SELECT _change_type, count(*) AS n
         |FROM graft_changes('$root', 'facts/t', 0, $head)
         |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("delete", 1L), ("insert", 400L)), s"got $got")
    // version labels survive; a sub-window sees only its slice
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_changes('$root', 'facts/t', " +
      s"${head - 1}, $head)").head().getLong(0) == 1L)
    // the retention floor refuses through SQL exactly as through the API
    wh.purgeChanges("facts/t", head)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$root', 'facts/t', 0, $head)").collect())
    assert(e.getMessage.contains("purged below version"), e.getMessage)
  }

  test("dimension-sized catalog tables auto-broadcast from manifest stats") {
    val (wh, cat, _) = fixture()
    banded(wh)
    wh.append("dim/names", (0L until 4L).map(i => (i, s"band$i")).toDF("id", "name"))
    val joined = spark.sql(
      s"""SELECT n.name, count(*) AS cnt
         |FROM $cat.facts.t f JOIN $cat.dim.names n ON f.id % 4 = n.id
         |GROUP BY n.name""".stripMargin)
    assert(joined.collect().map(_.getLong(1)).sum == 400L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"4-row dim should broadcast from manifest sizeInBytes; plan:\n$plan")
  }

  test("ALTER TABLE maps onto the metadata-only evolution moves") {
    val (wh, cat, _) = fixture()
    wh.append("dim/d", Seq((1, "a"), (2, "b")).toDF("n", "v"))
    val filesBefore = wh.visibleDataFiles("dim/d").toSet
    // rename: zero files touched, both names' eras read correctly
    spark.sql(s"ALTER TABLE $cat.dim.d RENAME COLUMN v TO label")
    assert(spark.sql(s"SELECT label FROM $cat.dim.d WHERE n = 1")
      .head().getString(0) == "a")
    // widen int → long
    spark.sql(s"ALTER TABLE $cat.dim.d ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql(s"SELECT n FROM $cat.dim.d WHERE label = 'b'")
      .head().getLong(0) == 2L)
    // add a nullable column: pre-add rows null-fill
    spark.sql(s"ALTER TABLE $cat.dim.d ADD COLUMN extra STRING")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.dim.d WHERE extra IS NULL")
      .head().getLong(0) == 2L)
    spark.sql(s"INSERT INTO $cat.dim.d VALUES (3, 'c', 'x')")
    assert(spark.sql(s"SELECT extra FROM $cat.dim.d WHERE n = 3")
      .head().getString(0) == "x")
    // drop it again — bytes linger, reads stop selecting
    spark.sql(s"ALTER TABLE $cat.dim.d DROP COLUMN extra")
    assert(spark.sql(s"SELECT * FROM $cat.dim.d").columns.toSeq == Seq("n", "label"))
    // every move so far left the ORIGINAL files untouched
    assert(filesBefore.subsetOf(wh.visibleDataFiles("dim/d").toSet),
      "ALTER TABLE must be metadata-only")
    // CHECK constraint through SQL binds every writer
    spark.sql(s"ALTER TABLE $cat.dim.d ADD CONSTRAINT pos CHECK (n > 0)")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.dim.d VALUES (-1, 'bad')"))
    assert(e.getMessage.contains("pos"), e.getMessage)
    spark.sql(s"ALTER TABLE $cat.dim.d DROP CONSTRAINT pos")
    spark.sql(s"INSERT INTO $cat.dim.d VALUES (-1, 'ok-now')")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.dim.d").head().getLong(0) == 4L)
    // CLUSTER BY declares the layout for later rewrites
    spark.sql(s"ALTER TABLE $cat.dim.d CLUSTER BY (n)")
    assert(wh.clusterBy("dim/d").contains(Seq("n")))
    // UNIQUE and FOREIGN KEY DDL bind the engine's enforcement
    spark.sql(s"ALTER TABLE $cat.dim.d ADD CONSTRAINT uq UNIQUE (n)")
    val dup = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.dim.d VALUES (3, 'dup-key')"))
    assert(dup.getMessage.contains("UNIQUE"), dup.getMessage)
    wh.append("facts/child", Seq((100L, 3L)).toDF("c_id", "d_ref"))
    spark.sql(s"ALTER TABLE $cat.facts.child ADD CONSTRAINT fkd " +
      s"FOREIGN KEY (d_ref) REFERENCES $cat.dim.d (n)")
    val orphan = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.facts.child VALUES (101, 999)"))
    assert(orphan.getMessage.contains("FOREIGN KEY"), orphan.getMessage)
    // COMPOSITE foreign keys through DDL: the tuple is the key (the
    // reference's Provider_Product (ProductId, ProviderId) pair)
    wh.append("dim/pp", Seq((1L, 10L), (2L, 20L)).toDF("prod", "prov"))
    wh.append("facts/link", Seq((1L, 1L, 10L)).toDF("id", "prod_ref", "prov_ref"))
    spark.sql(s"ALTER TABLE $cat.facts.link ADD CONSTRAINT fkpp " +
      s"FOREIGN KEY (prod_ref, prov_ref) REFERENCES $cat.dim.pp (prod, prov)")
    // (1, 20): both values live per-column, the pair does not — refuses
    val pair = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.facts.link VALUES (2, 1, 20)"))
    assert(pair.getMessage.contains("fkpp"), pair.getMessage)
    spark.sql(s"INSERT INTO $cat.facts.link VALUES (3, 2, 20)")
    spark.sql(s"ALTER TABLE $cat.facts.link DROP CONSTRAINT fkpp")
    spark.sql(s"INSERT INTO $cat.facts.link VALUES (4, 1, 20)") // free again
    // CTAS + DROP (the pre-rename escape hatch) still works
    spark.sql(s"CREATE TABLE $cat.dim.d2 AS SELECT * FROM $cat.dim.d")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.dim.d2").head().getLong(0) == 4L)
    spark.sql(s"DROP TABLE $cat.dim.d2")
  }

  test("RENAME TABLE: one metadata commit, history/constraints/time-travel preserved") {
    val (wh, cat, _) = fixture()
    banded(wh) // facts/t: 4 commits of 100 rows each
    val histBefore = spark.sql(s"CALL $cat.system.history('facts.t')").collect()
    val headV = histBefore.map(_.getAs[Int]("version")).max
    spark.sql(s"ALTER TABLE $cat.facts.t ADD CONSTRAINT uq UNIQUE (id)")
    // rename across namespaces: the directory (and every manifest era in
    // it) stays put; only the _sys/names map commits
    spark.sql(s"ALTER TABLE $cat.facts.t RENAME TO $cat.archive.t2")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.archive.t2").head().getLong(0) == 400L)
    // the vacated name no longer resolves — not in listings, not readable
    assert(!spark.catalog.tableExists(s"$cat.facts.t"))
    val gone = intercept[Exception](spark.sql(s"SELECT * FROM $cat.facts.t"))
    assert(gone.getMessage.toLowerCase.contains("table"), gone.getMessage)
    assert(spark.sql(s"SHOW TABLES IN $cat.archive").collect()
      .map(_.getString(1)).contains("t2"))
    // TIME TRAVEL through the new name reaches PRE-rename eras: the rename
    // was metadata-only, so every manifest version survives
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.archive.t2 VERSION AS OF $headV")
      .head().getLong(0) == 400L)
    val v1 = histBefore.map(_.getAs[Int]("version")).min
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.archive.t2 VERSION AS OF $v1")
      .head().getLong(0) == 100L)
    // constraints ride the physical table: UNIQUE still enforced post-rename
    val dup = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.archive.t2 VALUES (5, 'dup')"))
    assert(dup.getMessage.contains("UNIQUE"), dup.getMessage)
    // DML + procedures through the new name
    spark.sql(s"INSERT INTO $cat.archive.t2 VALUES (9999, 'new')")
    spark.sql(s"DELETE FROM $cat.archive.t2 WHERE id = 0")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.archive.t2").head().getLong(0) == 400L)
    assert(spark.sql(s"CALL $cat.system.detail('archive.t2')").head()
      .getAs[Long]("rows") == 400L)
    // re-CREATE of the vacated name is refused with the route named (the
    // directory still holds the renamed table's history)
    val occupied = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.facts.t (id BIGINT, v STRING)"))
    assert(occupied.getMessage.contains("renamed away"), occupied.getMessage)
    // rename BACK to the physical name drops the indirection entirely
    spark.sql(s"ALTER TABLE $cat.archive.t2 RENAME TO $cat.facts.t")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t").head().getLong(0) == 400L)
    assert(!spark.catalog.tableExists(s"$cat.archive.t2"))
    // a second rename chain re-points, never chains: t -> x -> y stays one hop
    spark.sql(s"ALTER TABLE $cat.facts.t RENAME TO $cat.facts.x")
    spark.sql(s"ALTER TABLE $cat.facts.x RENAME TO $cat.facts.y")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.y").head().getLong(0) == 400L)
    assert(!spark.catalog.tableExists(s"$cat.facts.x"))
    // DROP through the logical name removes the table AND frees the name
    spark.sql(s"DROP TABLE $cat.facts.y")
    assert(!spark.catalog.tableExists(s"$cat.facts.y"))
    spark.sql(s"CREATE TABLE $cat.facts.t (id BIGINT, v STRING)") // dir free again
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t").head().getLong(0) == 0L)
  }

  test("CALL procedures: optimize / history / restore / vacuum from SQL") {
    val (wh, cat, _) = fixture()
    banded(wh) // four tiny files
    val opt = spark.sql(s"CALL $cat.system.optimize('facts.t')").collect()
    assert(opt.head.getAs[Int]("files_rewritten") == 4, opt.mkString(","))
    assert(wh.visibleDataFiles("facts/t").size == 1)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t").head().getLong(0) == 400L)
    // history: one row per commit touching the table (4 appends + compact)
    val hist = spark.sql(s"CALL $cat.system.history('facts.t')").collect()
    assert(hist.length == 5, hist.mkString(","))
    assert(hist.map(_.getAs[Int]("version")).toSeq == hist.map(_.getAs[Int]("version")).toSeq.sorted)
    assert(hist.forall(_.getAs[Long]("commit_ms") > 0))
    // DESCRIBE DETAIL from SQL: metadata-only table facts
    val det = spark.sql(s"CALL $cat.system.detail('facts.t')").head()
    assert(det.getAs[Int]("files") == 1 && det.getAs[Long]("rows") == 400L, det.toString)
    // restore rewinds; vacuum reclaims the compacted-away files
    val v1 = hist.head.getAs[Int]("version")
    spark.sql(s"CALL $cat.system.restore('facts.t', $v1)")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t").head().getLong(0) == 100L)
    assert(spark.sql(s"CALL $cat.system.vacuum(0)").head().getBoolean(0))
  }

  test("CALL sketch procedures: refresh/define, SELECT estimates, overlap, top_tokens") {
    val (wh, cat, _) = fixture()
    wh.setChangeFeed("facts/events", on = true)
    def rows(g: String, lo: Long, hi: Long) =
      (lo until hi).map(i => (g, i, s"tok$i common common")).toDF("grp", "uid", "txt")
    wh.append("facts/events", rows("a", 0, 3000).unionByName(rows("b", 0, 500)))
    // first call defines + refreshes; param defaults to lgK=12
    val r1 = spark.sql(s"""CALL $cat.system.sketch_refresh('cust', 'distinct',
      'facts.events', 'grp', 'uid')""").head()
    assert(r1.getString(1) == "distinct" && r1.getString(2) == "mv.cust.SketchState")
    // estimates via plain SELECT over the state table + built-in function
    def ests = spark.sql(s"""SELECT grp,
        hll_sketch_estimate(sk) AS est FROM $cat.mv.cust.SketchState""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def within(e: Long, n: Long) = math.abs(e - n.toDouble) / n < 0.05
    assert(within(ests("a"), 3000) && within(ests("b"), 500), s"got $ests")
    // later refreshes are name-only: the persisted definition carries
    wh.append("facts/events", rows("c", 0, 100))
    val r2 = spark.sql(s"CALL $cat.system.sketch_refresh('cust')").head()
    assert(r2.getInt(3) > r1.getInt(3))
    assert(within(ests("c"), 100) && within(ests("a"), 3000), s"got $ests")
    // a drifted redefinition under the same name is refused, not blended
    val e = intercept[Exception](spark.sql(
      s"""CALL $cat.system.sketch_refresh('cust', 'distinct',
        'facts.events', 'grp', 'txt')"""))
    assert(e.getMessage.contains("already defined"), e.getMessage)
    // the same shape at a DIFFERENT param is also drift (stored lgK is the
    // default 12) — the stored param must not silently win
    val ep = intercept[Exception](spark.sql(
      s"""CALL $cat.system.sketch_refresh('cust', 'distinct',
        'facts.events', 'grp', 'uid', 13)"""))
    assert(ep.getMessage.contains("param=12"), ep.getMessage)
    // restating the SAME param is not drift
    spark.sql(s"""CALL $cat.system.sketch_refresh('cust', 'distinct',
      'facts.events', 'grp', 'uid', 12)""")
    // quantile twin through the same procedure
    spark.sql(s"""CALL $cat.system.sketch_refresh('price', 'quantile',
      'facts.events', 'grp', 'uid')""")
    val p50 = spark.sql(s"""SELECT grp,
        kll_sketch_get_quantile_double(sk, 0.5) AS p50
        FROM $cat.mv.price.SketchState WHERE grp = 'a'""").head().getDouble(1)
    assert(math.abs(p50 - 1500) < 3000 * 0.05, s"got $p50")
    // theta overlap: one-row set algebra without materializing either side
    wh.append("dim/other", rows("x", 2000, 4000).select(col("uid")))
    val ov = spark.sql(s"""CALL $cat.system.sketch_overlap(
      'facts.events', 'uid', 'dim.other', 'uid')""").head()
    assert(within(ov.getLong(0), 3000) && within(ov.getLong(1), 2000) &&
      within(ov.getLong(2), 1000) && within(ov.getLong(3), 4000), ov.toString)
    // bounded-state heavy hitters as a CALL (k rows, certified-exact counts)
    val top = spark.sql(
      s"CALL $cat.system.top_tokens('facts.events', 'txt', 1)").collect()
    assert(top.length == 1 && top.head.getString(0) == "common" &&
      top.head.getLong(1) == 2L * 3600, top.mkString(","))
  }

  test("CALL clone / replica_seed / replica_refresh: snapshot copy and CDC replication from SQL") {
    val (wh, cat, _) = fixture()
    banded(wh) // facts/t: 4 commits × 100 rows
    val histV = spark.sql(s"CALL $cat.system.history('facts.t')").collect()
      .map(_.getAs[Int]("version"))
    // as-of clone: history truncated, data exact, never overwrites
    val c = spark.sql(
      s"CALL $cat.system.clone('facts.t', 'sandbox.t', ${histV.min})").head()
    assert(c.getLong(3) == 100L, c.toString)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.sandbox.t").head().getLong(0) == 100L)
    val dup = intercept[Exception](
      spark.sql(s"CALL $cat.system.clone('facts.t', 'sandbox.t')"))
    assert(dup.getMessage.contains("never overwrites"), dup.getMessage)
    assert(spark.sql(s"CALL $cat.system.clone('facts.t', 'sandbox.t2')").head()
      .getLong(3) == 400L) // default = head
    // replication: another warehouse follows facts/t through its feed
    val srcRoot = Files.createTempDirectory("graft-replsrc-").toString
    val srcWh = new AtomicWarehouse(spark, srcRoot)
    srcWh.setChangeFeed("facts/r", on = true)
    srcWh.append("facts/r", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val seeded = spark.sql(s"""CALL $cat.system.replica_seed(
      '$srcRoot', 'facts.r', 'facts.r', 'id')""").head()
    assert(seeded.getInt(1) > 0)
    srcWh.append("facts/r", Seq((3L, "c")).toDF("id", "v"))
    srcWh.deleteWhere("facts/r",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))),
      Seq(graft.sources.ColEq("id", 1L)))
    spark.sql(s"""CALL $cat.system.replica_refresh(
      '$srcRoot', 'facts.r', 'facts.r', 'id')""")
    val repl = new graft.streaming.Replicator(srcWh, "facts/r",
      Seq((0L, "")).toDF("id", "v").schema, Seq("id"), wh, "facts/r")
    val live = repl.state().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(live == Set((2L, "b"), (3L, "c")), s"got $live")
  }

  test("RENAME TABLE vs physical-addressed consumers: replica cursor and change-feed windows ride through") {
    // replication and graft_changes address tables by PHYSICAL name (the
    // replicator's cursor and the feed both live in the directory the
    // rename never moves), so a mid-cursor source rename disturbs neither:
    // the same refresh CALL keeps pulling, and a feed window CROSSING the
    // rename reads every change. Only catalog-name resolution changes.
    val (wh, cat, _) = fixture()
    val srcRoot = Files.createTempDirectory("graft-renrepl-").toString
    val srcWh = new AtomicWarehouse(spark, srcRoot)
    val scat = s"gcat${seq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$scat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$scat.root", srcRoot)
    srcWh.setChangeFeed("facts/r", on = true)
    srcWh.append("facts/r", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    spark.sql(s"""CALL $cat.system.replica_seed(
      '$srcRoot', 'facts.r', 'facts.r', 'id')""")
    // rename the SOURCE mid-cursor; new changes arrive via the new name
    spark.sql(s"ALTER TABLE $scat.facts.r RENAME TO $scat.facts.renamed")
    spark.sql(s"INSERT INTO $scat.facts.renamed VALUES (3, 'c')")
    spark.sql(s"DELETE FROM $scat.facts.renamed WHERE id = 1")
    // the refresh still addresses the physical name — cursor intact
    spark.sql(s"""CALL $cat.system.replica_refresh(
      '$srcRoot', 'facts.r', 'facts.r', 'id')""")
    val repl = new graft.streaming.Replicator(srcWh, "facts/r",
      Seq((0L, "")).toDF("id", "v").schema, Seq("id"), wh, "facts/r")
    val live = repl.state().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(live == Set((2L, "b"), (3L, "c")), s"got $live")
    // a graft_changes window crossing the rename: all four changes visible
    // under the physical name (insert 1, insert 2, insert 3, delete 1)
    val head = srcWh.headVersion()
    val ops = spark.sql(
      s"SELECT _change_type FROM graft_changes('$srcRoot', 'facts/r', 0, $head)")
      .collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(ops.getOrElse("insert", 0) == 3 && ops.getOrElse("delete", 0) == 1,
      s"got $ops")
  }

  test("CALL write targets respect the rename map (no shadowed clones/replicas)") {
    val (wh, cat, _) = fixture()
    banded(wh)
    spark.sql(s"ALTER TABLE $cat.facts.t RENAME TO $cat.facts.t2")
    // the vacated name's directory still holds t2's manifest history
    val e1 = intercept[Exception](
      spark.sql(s"CALL $cat.system.clone('facts.t2', 'facts.t')"))
    assert(e1.getMessage.contains("renamed-away"), e1.getMessage)
    // the live logical name maps to a different directory: writing its raw
    // path would be permanently shadowed by the rename map
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.clone('facts.t2', 'facts.t2')"))
    assert(e2.getMessage.contains("shadowed"), e2.getMessage)
    // replica_seed carries the same target guards
    val srcRoot = Files.createTempDirectory("graft-replguard-").toString
    val srcWh = new AtomicWarehouse(spark, srcRoot)
    srcWh.setChangeFeed("facts/r", on = true)
    srcWh.append("facts/r", Seq((1L, "a")).toDF("id", "v"))
    val e3 = intercept[Exception](spark.sql(
      s"CALL $cat.system.replica_seed('$srcRoot', 'facts.r', 'facts.t2', 'id')"))
    assert(e3.getMessage.contains("shadowed"), e3.getMessage)
    // an unshadowed target still clones, and reads back through the catalog
    assert(spark.sql(s"CALL $cat.system.clone('facts.t2', 'sandbox.c')").head()
      .getLong(3) == 400L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.sandbox.c")
      .head().getLong(0) == 400L)
  }

  test("DELETE/UPDATE outside the FilePred algebra fall back to exact rewrites") {
    val (wh, cat, root) = fixture()
    banded(wh)
    // LIKE is outside the algebra: exact copy-on-write fallback
    spark.sql(s"DELETE FROM $cat.facts.t WHERE v LIKE 'v39%'") // 390..399 + 39
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t").head().getLong(0) == 389L)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t WHERE v LIKE 'v39%'")
      .head().getLong(0) == 0L)
    // a translatable conjunct still prunes the candidate set: only the
    // id>=300 band is read for this rewrite
    spark.sql(s"DELETE FROM $cat.facts.t WHERE id >= 300 AND length(v) = 4")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t WHERE id >= 300")
      .head().getLong(0) == 0L, "length(v)=4 matches every remaining 300-band row")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t").head().getLong(0) == 299L)
    // UPDATE with a function WHERE and expression SET
    spark.sql(s"UPDATE $cat.facts.t SET v = upper(v) WHERE v LIKE 'v2%' AND id < 220")
    assert(spark.sql(s"SELECT v FROM $cat.facts.t WHERE id = 210")
      .head().getString(0) == "V210")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t WHERE v LIKE 'V%'")
      .head().getLong(0) == 31L) // ids 2, 20..29, 200..219
    // UPDATE without WHERE touches every row
    spark.sql(s"UPDATE $cat.facts.t SET v = concat(v, '!')")
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.facts.t WHERE v NOT LIKE '%!'")
      .head().getLong(0) == 0L)
    // subqueries still refuse (Spark's own error), never a wrong rewrite
    val e = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.facts.t WHERE id IN (SELECT id FROM $cat.facts.t WHERE id < 5)"))
    assert(e != null)
    // change feed records the fallback DML exactly like the algebra path
    wh.setChangeFeed("dim/cf", on = true)
    wh.append("dim/cf", Seq((1L, "aa"), (2L, "bb")).toDF("id", "v"))
    spark.sql(s"DELETE FROM $cat.dim.cf WHERE v LIKE 'a%'")
    val head = wh.versions().last
    val changes = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM graft_changes('$root', 'dim/cf', 0, $head) " +
        "GROUP BY _change_type ORDER BY _change_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(changes == Seq(("delete", 1L), ("insert", 2L)), s"got $changes")
  }

  test("TIMESTAMP AS OF survives a warehouse copy (recorded commit clock)") {
    val (wh, cat, root) = fixture()
    wh.append("dim/d", Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(50)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val between = fmt.format(new java.util.Date())
    Thread.sleep(50)
    wh.append("dim/d", Seq((2L, "b")).toDF("id", "v"))
    // copy the warehouse WITHOUT preserving mtimes (rsync-without--t)
    val copy = Files.createTempDirectory("graft-sqlcat-copy-").toString
    val src = java.nio.file.Paths.get(root)
    java.nio.file.Files.walk(src).forEach { p =>
      val dest = java.nio.file.Paths.get(copy).resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dest)
      else java.nio.file.Files.copy(p, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val cat2 = s"gcatcopy${seq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat2", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.root", copy)
    // the copied warehouse answers the same TIMESTAMP AS OF question even
    // though every file's mtime is "now" — the clock rides the manifest
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat2.dim.d TIMESTAMP AS OF '$between'")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat2.dim.d").head().getLong(0) == 2L)
  }
}
