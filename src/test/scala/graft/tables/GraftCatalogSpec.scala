package graft.tables

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** The SQL face of the table layer ([[GraftCatalog]]): DDL + DML + time
  * travel through Spark's catalog plugin API, each statement delegating to
  * the spec-pinned [[GraftTable]] ops underneath.
  */
class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.gt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gt.root", dir)
    dir
  }

  private def sqlRows(q: String): Set[Seq[Any]] =
    spark.sql(q).collect().toSet.map((r: Row) => r.toSeq)

  test("CREATE TABLE + INSERT INTO + SELECT round-trip") {
    warehouse
    spark.sql("CREATE NAMESPACE gt.ns1")
    spark.sql("CREATE TABLE gt.ns1.orders (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.ns1.orders VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gt.ns1.orders SELECT 3L, 'c'")
    assert(sqlRows("SELECT k, v FROM gt.ns1.orders ORDER BY k") ==
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // the SQL writes are real log commits on the same table
    val t = GraftTable.at(spark, s"$warehouse/ns1/orders")
    assert(t.version == 3L) // create + 2 inserts
    assert(t.keyCol.contains("k"))
  }

  test("INSERT OVERWRITE replaces the whole table in one commit") {
    warehouse
    spark.sql("CREATE TABLE gt.ow (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gt.ow VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE gt.ow VALUES (9, 'z')")
    assert(sqlRows("SELECT k, v FROM gt.ow") == Set(Seq(9L, "z")))
    val t = GraftTable.at(spark, s"$warehouse/ow")
    assert(t.history.last.op == "overwrite")
  }

  test("CTAS creates and loads in one statement") {
    warehouse
    spark.sql("CREATE TABLE gt.ctas AS SELECT id AS k, CAST(id % 3 AS STRING) AS v FROM range(10)")
    assert(spark.sql("SELECT count(*) AS n FROM gt.ctas").head().getLong(0) == 10L)
  }

  test("DELETE FROM rewrites only touched rows; TRUNCATE empties") {
    warehouse
    spark.sql("CREATE TABLE gt.del (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gt.del SELECT id, CAST(id AS STRING) FROM range(10)")
    // the SupportsDelete contract is filter-expressible predicates (the
    // same bound Spark itself enforces); arbitrary Columns go through the
    // native GraftTable.deleteWhere
    spark.sql("DELETE FROM gt.del WHERE k >= 6 OR k IN (0, 2)")
    assert(sqlRows("SELECT k FROM gt.del") == Set(Seq(1L), Seq(3L), Seq(4L), Seq(5L)))
    spark.sql("TRUNCATE TABLE gt.del")
    assert(spark.sql("SELECT count(*) FROM gt.del").head().getLong(0) == 0L)
  }

  test("SQL UPDATE routes to the native touched-file rewrite") {
    warehouse
    spark.sql("CREATE TABLE gt.upd (k BIGINT, v STRING, n BIGINT)")
    spark.sql("INSERT INTO gt.upd SELECT id, CAST(id AS STRING), id * 10 FROM range(6)")
    val vBefore = GraftTable.at(spark, s"$warehouse/upd").version
    // assignments may reference existing columns; WHERE is any predicate
    spark.sql("UPDATE gt.upd SET v = concat(v, '!'), n = n + k WHERE k % 2 = 0")
    assert(sqlRows("SELECT k, v, n FROM gt.upd ORDER BY k") == Set(
      Seq(0L, "0!", 0L), Seq(1L, "1", 10L), Seq(2L, "2!", 22L),
      Seq(3L, "3", 30L), Seq(4L, "4!", 44L), Seq(5L, "5", 50L)))
    val t = GraftTable.at(spark, s"$warehouse/upd")
    assert(t.version == vBefore + 1 && t.history.last.op == "update")
    // UPDATE without WHERE hits every row
    spark.sql("UPDATE gt.upd SET n = 0")
    assert(spark.sql("SELECT sum(n) FROM gt.upd").head().getLong(0) == 0L)
  }

  test("SQL MERGE INTO upsert routes to the native key-pruned merge") {
    warehouse
    spark.sql("CREATE TABLE gt.mrg (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.mrg VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("""MERGE INTO gt.mrg t
      USING (SELECT * FROM VALUES (2, 'B'), (9, 'Z') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(sqlRows("SELECT k, v FROM gt.mrg") ==
      Set(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c"), Seq(9L, "Z")))
    assert(GraftTable.at(spark, s"$warehouse/mrg").history.last.op == "merge")
    // source columns may arrive in any order — merge aligns by name
    spark.sql("""MERGE INTO gt.mrg t
      USING (SELECT * FROM VALUES ('q', 17) AS s(v, k)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(sqlRows("SELECT v FROM gt.mrg WHERE k = 17") == Set(Seq("q")))
  }

  test("general MERGE: conditional update, delete, conditional insert") {
    warehouse
    spark.sql("CREATE TABLE gt.gm (k BIGINT, v STRING, n BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.gm VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (4, 'd', 40)")
    // k=1: matched, n < 15 -> first clause updates from source + target mix
    // k=2: matched, n >= 15 but v='b' -> second clause DELETEs
    // k=3: matched, no clause condition holds -> kept unchanged
    // k=9: unmatched, inserted only when s.n > 0 (k=8 filtered out)
    spark.sql("""MERGE INTO gt.gm t
      USING (SELECT * FROM VALUES (1L, 'A', 5L), (2L, 'B', 7L), (3L, 'C', -1L),
                                  (9L, 'Z', 9L), (8L, 'Y', -2L) AS s(k, v, n)) s
      ON t.k = s.k
      WHEN MATCHED AND t.n < 15 THEN UPDATE SET v = concat(s.v, t.v), n = t.n + s.n
      WHEN MATCHED AND t.v = 'b' THEN DELETE
      WHEN NOT MATCHED AND s.n > 0 THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n * 100)""")
    assert(sqlRows("SELECT k, v, n FROM gt.gm ORDER BY k") == Set(
      Seq(1L, "Aa", 15L), Seq(3L, "c", 30L), Seq(4L, "d", 40L),
      Seq(9L, "Z", 900L)))
    assert(GraftTable.at(spark, s"$warehouse/gm").history.last.op == "merge")
    // untouched-key files are NOT rewritten: merge again against a
    // disjoint key range, nothing matched, insert condition false -> the
    // commit (if any) removes nothing
    spark.sql("""MERGE INTO gt.gm t
      USING (SELECT 100L AS k, 'q' AS v, -5L AS n) s ON t.k = s.k
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED AND s.n > 0 THEN INSERT *""")
    assert(sqlRows("SELECT count(*) FROM gt.gm") == Set(Seq(4L)))
    // matched-only merge (no insert clause) leaves unmatched source alone
    spark.sql("""MERGE INTO gt.gm t
      USING (SELECT 4L AS k) s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(sqlRows("SELECT k FROM gt.gm") == Set(Seq(1L), Seq(3L), Seq(9L)))
    // NOT MATCHED BY SOURCE: target rows without a source match get
    // conditionally updated or deleted (the SQL:2023 full-sync shape)
    spark.sql("""MERGE INTO gt.gm t
      USING (SELECT 1L AS k, 'keep' AS v) s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED BY SOURCE AND t.n >= 100 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    assert(sqlRows("SELECT k, v FROM gt.gm ORDER BY k") ==
      Set(Seq(1L, "keep"), Seq(3L, "stale"))) // k=9 (n=900) deleted
  }

  test("compound ON MERGE: residue splits matched/NMBS/insert routing") {
    warehouse
    spark.sql("CREATE TABLE gt.con (k BIGINT, part STRING, n BIGINT) " +
      "TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.con VALUES (1, 'x', 10), (2, 'y', 20), (3, 'x', 30)")
    // k=1 (part=x): fully matched -> updated. k=2 (part=y): key matches
    // but the residue fails -> source row INSERTS, target row falls to
    // NOT MATCHED BY SOURCE. k=3: no source -> NMBS. k=4: no target ->
    // insert. Standard compound-ON MERGE routing, end to end through SQL.
    spark.sql("""MERGE INTO gt.con t
      USING (SELECT * FROM VALUES (1L, 100L), (2L, 200L), (4L, 400L)
             AS v(k, sn)) s
      ON t.k = s.k AND t.part = 'x'
      WHEN MATCHED THEN UPDATE SET n = s.sn
      WHEN NOT MATCHED THEN INSERT (k, part, n) VALUES (s.k, 'new', s.sn)
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = t.n + 1""")
    assert(sqlRows("SELECT k, part, n FROM gt.con") == Set(
      Seq(1L, "x", 100L), Seq(2L, "new", 200L), Seq(2L, "y", 21L),
      Seq(3L, "x", 31L), Seq(4L, "new", 400L)))
  }

  test("ALTER TABLE cannot mix RENAME COLUMN with other changes; none apply") {
    warehouse
    spark.sql("CREATE TABLE gt.mix (k BIGINT, v STRING)")
    // SQL cannot express the mix in one statement; the guard lives at the
    // TableChange API level (GraftCatalog.alterTable) — drive it directly
    val cat = spark.sessionState.catalogManager.catalog("gt")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "mix")
    import org.apache.spark.sql.connector.catalog.TableChange
    val e = intercept[IllegalArgumentException](cat.alterTable(ident,
      TableChange.renameColumn(Array("v"), "w"),
      TableChange.addColumn(Array("z"), org.apache.spark.sql.types.LongType)))
    assert(e.getMessage.contains("cannot mix RENAME COLUMN"), e.getMessage)
    // validate-before-apply: NEITHER change landed
    assert(spark.table("gt.mix").columns.toSeq == Seq("k", "v"))
  }

  test("unsupported MERGE shapes and time-travel DML fail loud, named") {
    warehouse
    spark.sql("CREATE TABLE gt.mrg2 (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.mrg2 VALUES (1, 'a')")
    // ON without any key-equality conjunct
    val e2 = intercept[Exception](spark.sql("""MERGE INTO gt.mrg2 t
      USING (SELECT 1L AS k, 'x' AS v) s ON t.v = s.v
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(e2.getMessage.contains("key-equality conjunct"), e2.getMessage)
    // subquery in UPDATE is named, not silently wrong
    val e3 = intercept[Exception](spark.sql(
      "UPDATE gt.mrg2 SET v = 'x' WHERE k IN (SELECT 1L)"))
    assert(e3.getMessage.contains("subquer"), e3.getMessage)
    // DML against a time-travel read must not fork history
    val e4 = intercept[Exception](spark.sql(
      "UPDATE gt.mrg2 VERSION AS OF 1 SET v = 'x'"))
    assert(e4.getMessage != null)
  }

  test("VERSION AS OF time-travels; writing to the past fails loud") {
    warehouse
    spark.sql("CREATE TABLE gt.tt (k BIGINT)")
    spark.sql("INSERT INTO gt.tt VALUES (1)")          // v2
    spark.sql("INSERT OVERWRITE gt.tt VALUES (2), (3)") // v3
    assert(sqlRows("SELECT k FROM gt.tt VERSION AS OF 2") == Set(Seq(1L)))
    assert(sqlRows("SELECT k FROM gt.tt") == Set(Seq(2L), Seq(3L)))
    val e = intercept[Exception](
      spark.sql("INSERT INTO gt.tt VERSION AS OF 2 VALUES (4)"))
    assert(e.getMessage != null)
  }

  test("TIMESTAMP AS OF resolves to the newest commit at-or-before") {
    warehouse
    spark.sql("CREATE TABLE gt.tts (k BIGINT)")
    spark.sql("INSERT INTO gt.tts VALUES (1)") // v2
    val t = GraftTable.at(spark, s"$warehouse/tts")
    val tsV2 = t.history.find(_.version == 2L).get.ts
    Thread.sleep(5) // v3 strictly later than v2's millisecond
    spark.sql("INSERT OVERWRITE gt.tts VALUES (9)") // v3
    assert(t.versionAt(tsV2) == 2L)
    // SQL face: timestamp between v2 and v3 reads v2's rows
    val asOf = new java.sql.Timestamp(tsV2).toInstant.toString
    assert(sqlRows(s"SELECT k FROM gt.tts TIMESTAMP AS OF '$asOf'") == Set(Seq(1L)))
    assert(sqlRows("SELECT k FROM gt.tts") == Set(Seq(9L)))
    // before the create commit: loud
    val e = intercept[Exception](
      spark.sql("SELECT k FROM gt.tts TIMESTAMP AS OF '1999-01-01 00:00:00'")
        .collect())
    assert(e.getMessage != null)
  }

  test("filter and column pushdown reach the inner scan; residuals stay exact") {
    warehouse
    spark.sql("CREATE TABLE gt.push (k BIGINT, v STRING, w DOUBLE)")
    spark.sql("INSERT INTO gt.push SELECT id, CAST(id AS STRING), id * 0.5 FROM range(100)")
    val df = spark.sql(
      "SELECT k FROM gt.push WHERE k >= 90 AND v LIKE '9%' AND sin(w) > -2")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(90L, 91L, 92L, 93L, 94L, 95L, 96L, 97L, 98L, 99L))
    // the translated conjuncts are pushed into the v1 relation scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("graft-table"))
  }

  test("partitioned CREATE routes partition tuples into the log") {
    warehouse
    spark.sql(
      "CREATE TABLE gt.pt (k BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO gt.pt VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    assert(sqlRows("SELECT k FROM gt.pt WHERE part = 'a'") == Set(Seq(1L), Seq(3L)))
    val t = GraftTable.at(spark, s"$warehouse/pt")
    assert(t.partitionBy == Seq("part"))
    // log-level pruning still works on the SQL-written files
    assert(t.snapshotWhere($"part" === "a").count() == 2L)
  }

  test("SHOW TABLES / DROP TABLE / RENAME reflect the filesystem truth") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.adm")
    spark.sql("CREATE TABLE gt.adm.t1 (k BIGINT)")
    assert(sqlRows("SHOW TABLES IN gt.adm").exists(_.contains("t1")))
    // v2 RENAME destination is catalog-relative: namespace.table
    spark.sql("ALTER TABLE gt.adm.t1 RENAME TO adm.t2")
    assert(!sqlRows("SHOW TABLES IN gt.adm").exists(_.contains("t1")))
    spark.sql("INSERT INTO gt.adm.t2 VALUES (5)")
    assert(sqlRows("SELECT k FROM gt.adm.t2") == Set(Seq(5L)))
    spark.sql("DROP TABLE gt.adm.t2")
    assert(sqlRows("SHOW TABLES IN gt.adm").isEmpty)
  }

  test("full type width flows through the V1 bridge (decimal, ts, arrays)") {
    warehouse
    spark.sql("""CREATE TABLE gt.wide (
      k BIGINT, d DECIMAL(20,4), ts TIMESTAMP, xs ARRAY<DOUBLE>, m MAP<STRING, BIGINT>)""")
    spark.sql("""INSERT INTO gt.wide SELECT 1L, CAST(1.2345 AS DECIMAL(20,4)),
      TIMESTAMP '2026-01-02 03:04:05', array(1.0, 2.0), map('a', 1L)""")
    val r = spark.sql("SELECT d, xs[1] AS x1, m['a'] AS ma FROM gt.wide").head()
    assert(r.getDecimal(0).toPlainString == "1.2345")
    assert(r.getDouble(1) == 2.0)
    assert(r.getLong(2) == 1L)
  }

  test("ALTER TABLE RENAME COLUMN: metadata-only, old files keep resolving") {
    warehouse
    spark.sql("CREATE TABLE gt.rn (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.rn VALUES (1, 'a'), (2, 'b')") // pre-rename file
    val t = GraftTable.at(spark, s"$warehouse/rn")
    val vPre = t.version
    val filesPre = t.currentFiles.map(_.path).toSet
    spark.sql("ALTER TABLE gt.rn RENAME COLUMN v TO label")
    // metadata-only: same files, one more version
    val t2 = GraftTable.at(spark, s"$warehouse/rn")
    assert(t2.version == vPre + 1 && t2.currentFiles.map(_.path).toSet == filesPre,
      "rename rewrote data files")
    assert(t2.history.last.op == "renameColumn")
    // pre-rename files read under the NEW logical name with their values
    assert(sqlRows("SELECT k, label FROM gt.rn ORDER BY k") ==
      Set(Seq(1L, "a"), Seq(2L, "b")))
    // writes after the rename land under the stable physical name and
    // union with the old files transparently
    spark.sql("INSERT INTO gt.rn VALUES (3, 'c')")
    spark.sql("UPDATE gt.rn SET label = concat(label, '!') WHERE k = 1")
    assert(sqlRows("SELECT k, label FROM gt.rn ORDER BY k") ==
      Set(Seq(1L, "a!"), Seq(2L, "b"), Seq(3L, "c")))
    // time travel reads the pre-rename version under ITS OWN name
    assert(sqlRows(s"SELECT k, v FROM gt.rn VERSION AS OF $vPre") ==
      Set(Seq(1L, "a"), Seq(2L, "b")))
    val eOld = intercept[Exception](
      spark.sql("SELECT label FROM gt.rn VERSION AS OF 2").collect())
    assert(eOld.getMessage != null) // old version has no 'label'
    // data skipping prunes on the RENAMED column (stats live physically)
    val t3 = GraftTable.at(spark, s"$warehouse/rn")
    assert(t3.scan(org.apache.spark.sql.functions.col("label") === "c")
      .inputFiles.length == 1)
    // a second rename chains the mapping
    spark.sql("ALTER TABLE gt.rn RENAME COLUMN label TO tag")
    assert(sqlRows("SELECT k, tag FROM gt.rn WHERE k = 3") == Set(Seq(3L, "c")))
    // re-adding the ORIGINAL name binds a FRESH physical name through the
    // mapping: the old files' physical 'v' values must NOT resurface
    spark.sql("ALTER TABLE gt.rn ADD COLUMNS (v STRING)")
    assert(sqlRows("SELECT k, tag, v FROM gt.rn") ==
      Set(Seq(1L, "a!", null), Seq(2L, "b", null), Seq(3L, "c", null)))
    // key / partition columns cannot be renamed
    val eKey = intercept[Exception](
      spark.sql("ALTER TABLE gt.rn RENAME COLUMN k TO id"))
    assert(eKey.getMessage.contains("key"), eKey.getMessage)
  }

  test("ALTER TABLE ADD COLUMNS evolves metadata-only; old rows null-fill") {
    warehouse
    spark.sql("CREATE TABLE gt.evo (k BIGINT)")
    spark.sql("INSERT INTO gt.evo VALUES (1)")
    spark.sql("ALTER TABLE gt.evo ADD COLUMNS (v STRING, w DOUBLE)")
    spark.sql("INSERT INTO gt.evo VALUES (2, 'b', 0.5)")
    assert(sqlRows("SELECT k, v, w FROM gt.evo ORDER BY k") ==
      Set(Seq(1L, null, null), Seq(2L, "b", 0.5)))
    val t = GraftTable.at(spark, s"$warehouse/evo")
    // metadata-only: the alter commit added and removed NO files
    val alter = t.history.find(_.op == "addColumns").get
    assert(alter.added == 0 && alter.removed == 0)
    // time travel to the pre-alter version keeps the narrow schema
    assert(spark.sql("SELECT * FROM gt.evo VERSION AS OF 2").columns.toSeq == Seq("k"))
    // rename is metadata-only via the log-carried column mapping now;
    // type changes stay loud
    spark.sql("ALTER TABLE gt.evo RENAME COLUMN w TO weight")
    assert(sqlRows("SELECT k, weight FROM gt.evo WHERE k = 2") == Set(Seq(2L, 0.5)))
    intercept[Exception](
      spark.sql("ALTER TABLE gt.evo ALTER COLUMN v TYPE INT"))
  }

  test("ALTER TABLE DROP COLUMN: metadata-only; re-added name stays fresh") {
    warehouse
    spark.sql("CREATE TABLE gt.dc (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.dc VALUES (1, 'a', 10), (2, 'b', 20)")
    val t = GraftTable.at(spark, s"$warehouse/dc")
    val vPre = t.version
    val filesPre = t.currentFiles.map(_.path).toSet
    spark.sql("ALTER TABLE gt.dc DROP COLUMN v")
    // metadata-only: same files, one more version, field gone
    val t2 = GraftTable.at(spark, s"$warehouse/dc")
    assert(t2.version == vPre + 1 && t2.currentFiles.map(_.path).toSet == filesPre,
      "drop rewrote data files")
    assert(t2.history.last.op == "dropColumn")
    assert(spark.table("gt.dc").columns.toSeq == Seq("k", "n"))
    // time travel keeps the column in pre-drop versions — WITH its values
    assert(sqlRows(s"SELECT k, v FROM gt.dc VERSION AS OF $vPre") ==
      Set(Seq(1L, "a"), Seq(2L, "b")))
    // post-drop era writes without the column; re-ADDING the same name
    // binds a FRESH physical name — the dropped values never resurface
    spark.sql("INSERT INTO gt.dc VALUES (3, 30)")
    spark.sql("ALTER TABLE gt.dc ADD COLUMNS (v STRING)")
    assert(sqlRows("SELECT k, n, v FROM gt.dc") ==
      Set(Seq(1L, 10L, null), Seq(2L, 20L, null), Seq(3L, 30L, null)))
    spark.sql("UPDATE gt.dc SET v = 'fresh' WHERE k = 3")
    assert(sqlRows("SELECT k, v FROM gt.dc") ==
      Set(Seq(1L, null), Seq(2L, null), Seq(3L, "fresh")))
    // the change feed across the drop/re-add boundary keeps dead values
    // dead: the only non-null 'v' ever inserted is the fresh one
    val t3 = GraftTable.at(spark, s"$warehouse/dc")
    import org.apache.spark.sql.functions.col
    assert(t3.changes(0L, t3.version)
      .where(col("_change") === "insert").where(col("v").isNotNull)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set((3L, "fresh")))
    // guard rail: the merge key column cannot be dropped
    val eKey = intercept[Exception](spark.sql("ALTER TABLE gt.dc DROP COLUMN k"))
    assert(eKey.getMessage.contains("key"), eKey.getMessage)
    // DROP COLUMN IF EXISTS on a missing column is a tolerated no-op
    spark.sql("ALTER TABLE gt.dc DROP COLUMN IF EXISTS nope")
    assert(spark.table("gt.dc").columns.toSeq == Seq("k", "n", "v"))
  }

  test("SQL DELETE goes merge-on-read; pushdown stays sound under vectors") {
    warehouse
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    spark.sql("CREATE TABLE gt.dvt (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    // range(..., numPartitions = 1): exactly one file per insert, so the
    // delete's routing and the pushdown's per-file reasoning are pinned
    spark.sql("INSERT INTO gt.dvt SELECT id, CASE WHEN id = 400 THEN NULL " +
      "ELSE CAST(id AS STRING) END FROM range(0, 500, 1, 1)")
    spark.sql("INSERT INTO gt.dvt SELECT id, CAST(id AS STRING) FROM range(1000, 1100, 1, 1)")
    val pathsBefore = sqlRows("SELECT path FROM gt.dvt.files")
    spark.sql("DELETE FROM gt.dvt WHERE k >= 490 AND k < 500")
    // 10 of 500 rows: the file is KEPT, a 10-position vector rides the log
    assert(sqlRows("SELECT path FROM gt.dvt.files") == pathsBefore,
      "sparse SQL DELETE rewrote a file instead of growing a vector")
    assert(sqlRows("SELECT path, deleted_rows FROM gt.dvt.files")
      .exists(_.last == 10L))
    // COUNT(*) (rows − dv.n) and MAX (DV-free file's 1099 DOMINATES the
    // DV'd file's physical bound 499) stay metadata answers — no Aggregate
    val ok = spark.sql("SELECT COUNT(*) AS n, MAX(k) AS mx FROM gt.dvt")
    assert(!ok.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]),
      ok.queryExecution.optimizedPlan.toString)
    assert(ok.collect().toSeq.map(_.toSeq) == Seq(Seq(590L, 1099L)))
    // MIN's candidate (1000) does NOT dominate the DV'd file's physical
    // min (0 — the live minimum could be any surviving row): refuse, exact
    val mn = spark.sql("SELECT MIN(k) AS mn FROM gt.dvt")
    assert(mn.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]))
    assert(mn.head().getLong(0) == 0L)
    // COUNT(v): the DV'd file has 0 < nulls < rows (the null at k=400
    // might have been deleted as far as the log knows): refuse, exact
    val cv = spark.sql("SELECT COUNT(v) AS nv FROM gt.dvt")
    assert(cv.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]))
    assert(cv.head().getLong(0) == 589L)
    // the rows themselves are gone
    assert(sqlRows("SELECT COUNT(*) FROM gt.dvt WHERE k BETWEEN 490 AND 499")
      == Set(Seq(0L)))
  }

  test("log-derived sizeInBytes: small graft tables auto-broadcast in joins") {
    warehouse
    spark.sql("CREATE TABLE gt.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO gt.dim SELECT id, CAST(id AS STRING) FROM range(50)")
    // the fact side is big enough that the planner must not broadcast it
    // (range reports 8 bytes/row), so a BroadcastHashJoin in the plan can
    // only mean the graft side's statistics came through the V1 relation —
    // without the sizeInBytes override it reports defaultSizeInBytes
    // (effectively infinite) and the join degrades to sort-merge
    val fact = spark.range(3000000L).toDF("k")
    val joined = fact.join(spark.table("gt.dim"), "k") // NO broadcast hint
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft table did not auto-broadcast:\n$plan")
    assert(joined.count() == 50L)
    // a selective pushed filter shrinks the estimate too: still broadcast
    val filtered = fact.join(spark.table("gt.dim").where($"k" < 10), "k")
    assert(filtered.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(filtered.count() == 10L)
  }

  test("COUNT/MIN/MAX answered from log metadata; plan drops the Aggregate") {
    warehouse
    spark.sql("CREATE TABLE gt.agg (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.agg SELECT id, CAST(id AS STRING) FROM range(100)")
    spark.sql("INSERT INTO gt.agg SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN NULL ELSE CAST(id AS STRING) END FROM range(100, 150)")
    spark.sql("DELETE FROM gt.agg WHERE k >= 140")
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val df = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(v) AS nv, MIN(k) AS mn, MAX(k) AS mx FROM gt.agg")
    // COMPLETE pushdown: the Aggregate node is GONE from the plan — the
    // answer is one metadata-derived row, no scan job over the data
    assert(!df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]),
      df.queryExecution.optimizedPlan.toString)
    // 140 rows live; v null on even ids of [100, 140) -> 20 nulls
    assert(df.collect().toSeq.map(_.toSeq) == Seq(Seq(140L, 120L, 0L, 139L)))
    // historical metadata answers time-travel counts the same way
    assert(spark.sql("SELECT COUNT(*) AS n FROM gt.agg VERSION AS OF 2")
      .head().getLong(0) == 100L)
    // a WHERE clause blocks the push (metadata cannot answer) — fallback
    // keeps the Aggregate and stays exact
    val filtered = spark.sql("SELECT COUNT(*) AS n FROM gt.agg WHERE k < 10")
    assert(filtered.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]))
    assert(filtered.head().getLong(0) == 10L)
    // MIN on a STRING column is refused (footer stats may be truncated) —
    // fallback scans and stays exact
    val smin = spark.sql("SELECT MIN(v) AS m FROM gt.agg")
    assert(smin.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]))
    assert(smin.head().getString(0) == "0")
    // grouped aggregates are never pushed — exact through the normal path
    assert(spark.sql("SELECT COUNT(*) AS n FROM gt.agg GROUP BY k % 2 = 0")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(70L, 70L))
  }

  test("CHECK constraints: write-time enforcement commits nothing on violation") {
    warehouse
    spark.sql("CREATE TABLE gt.ck (k BIGINT, price BIGINT, qty BIGINT) " +
      "TBLPROPERTIES ('key'='k', 'constraint.pos_price'='price >= 0')")
    spark.sql("INSERT INTO gt.ck VALUES (1, 10, 2), (2, 20, NULL)") // NULL passes CHECK
    spark.sql("ALTER TABLE gt.ck ADD CONSTRAINT qty_band CHECK (qty BETWEEN 0 AND 100)")
    val t = GraftTable.at(spark, s"$warehouse/ck")
    assert(t.constraints.keySet == Set("pos_price", "qty_band"))
    val vBefore = t.version
    // violating INSERT: loud, and NOTHING committed — version and rows
    // unchanged (the write job's observed violation aborts pre-commit)
    intercept[Exception](spark.sql("INSERT INTO gt.ck VALUES (3, -5, 1)"))
    assert(GraftTable.at(spark, s"$warehouse/ck").version == vBefore)
    assert(sqlRows("SELECT k FROM gt.ck") == Set(Seq(1L), Seq(2L)))
    // violating UPDATE and MERGE: equally atomic refusals
    intercept[Exception](spark.sql("UPDATE gt.ck SET price = -1 WHERE k = 1"))
    assert(sqlRows("SELECT price FROM gt.ck WHERE k = 1") == Set(Seq(10L)))
    spark.sql("INSERT INTO gt.ck VALUES (3, 30, 100)")
    intercept[Exception](spark.sql("""MERGE INTO gt.ck t
      USING (SELECT 3L AS k, CAST(-7 AS BIGINT) AS p) s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET price = s.p"""))
    assert(sqlRows("SELECT price FROM gt.ck WHERE k = 3") == Set(Seq(30L)))
    // ADD CONSTRAINT validates EXISTING rows: a violated add is refused
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gt.ck ADD CONSTRAINT tiny CHECK (price < 25)"))
    assert(e2.getMessage != null)
    assert(!GraftTable.at(spark, s"$warehouse/ck").constraints.contains("tiny"))
    // a constrained column cannot be dropped while the constraint lives
    val e3 = intercept[Exception](spark.sql("ALTER TABLE gt.ck DROP COLUMN qty"))
    assert(e3.getMessage.toLowerCase.contains("constraint"), e3.getMessage)
    // DROP CONSTRAINT frees the write path
    spark.sql("ALTER TABLE gt.ck DROP CONSTRAINT pos_price")
    spark.sql("INSERT INTO gt.ck VALUES (4, -40, 1)")
    assert(sqlRows("SELECT k FROM gt.ck").size == 4)
    // (the native streaming sink enforces the same constraints per row —
    // pinned end-to-end in GraftTableStreamSpec)
  }

  test("partition-column MIN/MAX/COUNT answered from the logged tuples") {
    warehouse
    spark.sql("CREATE TABLE gt.pagg (k BIGINT, day DATE, region STRING) " +
      "PARTITIONED BY (day, region)")
    spark.sql("INSERT INTO gt.pagg VALUES (1, DATE'2024-01-01', 'eu'), " +
      "(2, DATE'2024-03-05', 'us'), (3, DATE'2024-02-11', NULL)")
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // partition tuples are exact per-file constants: dates, strings and
    // null-partition COUNT all answer from the log — no scan, no Aggregate
    val df = spark.sql("SELECT MAX(day) AS mx, MIN(day) AS mn, " +
      "MAX(region) AS mr, COUNT(region) AS nr, COUNT(*) AS n FROM gt.pagg")
    assert(!df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate]),
      df.queryExecution.optimizedPlan.toString)
    val r = df.head()
    assert(r.getDate(0).toString == "2024-03-05" &&
      r.getDate(1).toString == "2024-01-01", r.toString)
    assert(r.getString(2) == "us")
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L) // null partition counted out
  }

  test("column DEFAULT values resolve into inserts and time-travel with the schema") {
    warehouse
    spark.sql("CREATE TABLE gt.defs (k BIGINT, v STRING DEFAULT 'unset', " +
      "n BIGINT DEFAULT 7)")
    spark.sql("INSERT INTO gt.defs (k) VALUES (1)")
    spark.sql("INSERT INTO gt.defs VALUES (2, 'x', DEFAULT)")
    assert(sqlRows("SELECT k, v, n FROM gt.defs") ==
      Set(Seq(1L, "unset", 7L), Seq(2L, "x", 7L)))
    // ALTER ... SET DEFAULT is a schema-metadata change — loud for now
    // (our ALTER surface is ADD/RENAME/DROP/constraints); CREATE-time
    // defaults are versioned with the schema like everything else
    val t = GraftTable.at(spark, s"$warehouse/defs")
    assert(t.schema.fields.exists(f => f.name == "v" && f.metadata.contains(
      "CURRENT_DEFAULT")))
  }

  test("metadata tables: .history mirrors commits, .files the active set") {
    warehouse
    spark.sql("CREATE TABLE gt.meta (k BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO gt.meta VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE gt.meta VALUES (3, 'a')")
    val hist = spark.sql(
      "SELECT version, op FROM gt.meta.history ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist == Seq((1L, "create"), (2L, "append"), (3L, "overwrite")))
    val files = spark.sql(
      "SELECT path, rows, partition['part'] AS part FROM gt.meta.files").collect()
    val t = GraftTable.at(spark, s"$warehouse/meta")
    assert(files.length == t.snapshot().inputFiles.length)
    assert(files.map(_.getString(2)).toSet == Set("a"))
    assert(files.map(_.getLong(1)).sum == 1L) // one active row after overwrite
    // an unknown suffix on a real table is still loud
    intercept[Exception](spark.sql("SELECT * FROM gt.meta.nope"))
  }

  test(".detail metadata table: one-row operational summary from the log") {
    warehouse
    spark.sql("CREATE TABLE gt.dtl (k BIGINT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('key'='k', 'constraint.kp'='k > 0')")
    spark.sql("INSERT INTO gt.dtl VALUES (1, 'a'), (2, 'b')")
    val r = spark.sql("SELECT version, num_files, num_rows, key_column, " +
      "partition_columns, constraints FROM gt.dtl.detail").head()
    val t = GraftTable.at(spark, s"$warehouse/dtl")
    assert(r.getLong(0) == t.version)
    assert(r.getLong(1) == t.currentFiles.size.toLong && r.getLong(2) == 2L)
    assert(r.getString(3) == "k")
    assert(r.getSeq[String](4) == Seq("p"))
    assert(r.getMap[String, String](5).toMap == Map("kp" -> "k > 0"))
    // the table-config columns surface write policy and live branches
    spark.sql("ALTER TABLE gt.dtl SET TBLPROPERTIES ('graft.sort.by' = 'k')")
    t.createBranch("wip")
    val r2 = spark.sql(
      "SELECT sort_order, branches FROM gt.dtl.detail").head()
    assert(r2.getSeq[String](0) == Seq("k"))
    assert(r2.getSeq[String](1) == Seq("wip"))
    t.dropBranch("wip")
  }

  test("atomic CREATE OR REPLACE: one commit, history kept, failure safe") {
    warehouse
    // CTAS through the staging path: data + constraints land in ONE commit
    spark.sql("CREATE TABLE gt.rep TBLPROPERTIES ('key'='k', " +
      "'constraint.k_pos'='k >= 0') AS SELECT id AS k, CAST(id AS STRING) AS v " +
      "FROM range(0, 100, 1, 1)")
    val t0 = GraftTable.at(spark, s"$warehouse/rep")
    assert(t0.version == 1L, s"CTAS took ${t0.version} commits, expected 1")
    assert(t0.constraints.keySet == Set("k_pos"))
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.rep") == Set(Seq(100L)))
    // REPLACE swaps schema + key + partitioning + data in one commit;
    // the version counter keeps counting — history is preserved
    spark.sql("CREATE OR REPLACE TABLE gt.rep PARTITIONED BY (part) " +
      "TBLPROPERTIES ('key'='id') AS SELECT id, CAST(id % 3 AS STRING) AS part, " +
      "id * 2 AS dbl FROM range(0, 30, 1, 1)")
    assert(sqlRows("SELECT COUNT(*) AS n, SUM(dbl) AS s FROM gt.rep") ==
      Set(Seq(30L, 870L)))
    val t1 = GraftTable.at(spark, s"$warehouse/rep")
    assert(t1.version == 2L, "replace must be ONE commit")
    assert(t1.keyCol.contains("id") && t1.partitionBy == Seq("part"))
    // new identity is live: merge on the new key, pruning on the new part
    t1.merge(Seq((100L, "x", 7L)).toDF("id", "part", "dbl"))
    assert(t1.snapshotWhere($"part" === "1").count() == 10L)
    // time travel reads the PRE-replace schema and rows
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.rep VERSION AS OF 1") ==
      Set(Seq(100L)))
    assert(spark.sql("SELECT * FROM gt.rep VERSION AS OF 1").columns.toSeq ==
      Seq("k", "v"))
    // FAILED replace (CHECK violation in the new data) leaves the table
    // untouched — nothing commits
    val vBefore = GraftTable.at(spark, s"$warehouse/rep").version
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE gt.rep TBLPROPERTIES " +
        "('constraint.pos'='n > 0') AS SELECT -1L AS n")
    }
    assert(GraftTable.at(spark, s"$warehouse/rep").version == vBefore,
      "failed replace mutated the table")
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.rep") == Set(Seq(31L)))
    // plain REPLACE TABLE (no AS SELECT) stages an empty new definition
    spark.sql("REPLACE TABLE gt.rep (a BIGINT, b STRING)")
    assert(spark.table("gt.rep").columns.toSeq == Seq("a", "b"))
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.rep") == Set(Seq(0L)))
    // REPLACE of a missing table is loud
    intercept[Exception] { spark.sql("REPLACE TABLE gt.rep_nope (a BIGINT)") }
  }

  test("CALL graft.system.clone: shallow clone through the SQL face") {
    warehouse
    spark.sql("CREATE TABLE gt.csrc (k BIGINT, v STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO gt.csrc SELECT id, CAST(id AS STRING) FROM range(0, 200, 1, 1)")
    spark.sql("CALL gt.system.clone(source => 'csrc', target => 'cdst')")
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.cdst") == Set(Seq(200L)))
    // zero data files under the clone's directory — metadata-only commit
    val dataFiles = Option(new java.io.File(s"$warehouse/cdst").listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
    assert(dataFiles.isEmpty, s"CALL clone copied data: ${dataFiles.toSeq}")
    // divergence via SQL DML on the clone; source unchanged
    spark.sql("DELETE FROM gt.cdst WHERE k < 50")
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.cdst") == Set(Seq(150L)))
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.csrc") == Set(Seq(200L)))
    // cloning onto an existing table is loud
    val e = intercept[Exception] {
      spark.sql("CALL gt.system.clone(source => 'csrc', target => 'cdst')")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("CALL graft.system.expire_history bounds the log via SQL") {
    warehouse
    spark.sql("CREATE TABLE gt.exp (k BIGINT)")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO gt.exp VALUES ($i)"))
    val t = GraftTable.at(spark, s"$warehouse/exp")
    val horizon = t.version - 1
    // dry run: reports the would-be count, touches nothing (vacuum parity)
    val dry = spark.sql(s"CALL gt.system.expire_history(table => 'exp', " +
      s"before_version => $horizon, dry_run => true)").head()
    assert(dry.getInt(0) == (horizon - 1).toInt && dry.getBoolean(1))
    spark.sql("SELECT * FROM gt.exp VERSION AS OF 1").collect() // still there
    val out = spark.sql(
      s"CALL gt.system.expire_history(table => 'exp', before_version => $horizon)")
    assert(out.head().getInt(0) == (horizon - 1).toInt)
    assert(sqlRows("SELECT COUNT(*) AS n FROM gt.exp") == Set(Seq(5L)))
    intercept[Exception] {
      spark.sql("SELECT * FROM gt.exp VERSION AS OF 1").collect()
    }
  }

  test("TBLPROPERTIES graft.sort.by sets/clears the write-time sort order") {
    warehouse
    spark.sql("CREATE TABLE gt.srt (k BIGINT, v STRING)")
    spark.sql("ALTER TABLE gt.srt SET TBLPROPERTIES ('graft.sort.by' = 'k')")
    val t = GraftTable.at(spark, s"$warehouse/srt")
    assert(t.sortOrder == Seq("k"))
    assert(t.history.last.op == "setSortOrder")
    spark.sql("INSERT INTO gt.srt SELECT id, concat('v', id) FROM range(0, 100)")
    assert(sqlRows("SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gt.srt") ==
      Set(Seq(100L)))
    spark.sql("ALTER TABLE gt.srt UNSET TBLPROPERTIES ('graft.sort.by')")
    assert(GraftTable.at(spark, s"$warehouse/srt").sortOrder.isEmpty)
    // mixing sort and bloom property families stays loud (separate commits)
    val e = intercept[Exception](spark.sql("ALTER TABLE gt.srt SET " +
      "TBLPROPERTIES ('graft.sort.by' = 'k', 'graft.bloom.columns' = 'v')"))
    assert(e.getMessage.contains("separate"), e.getMessage)
  }

  test("DML with uncorrelated subqueries: IN-delete joins, EXISTS gates; correlated loud") {
    warehouse
    spark.sql("CREATE TABLE gt.subq (k BIGINT, grp STRING, v BIGINT) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql("INSERT INTO gt.subq VALUES (1,'a',10),(2,'b',20),(3,'a',30),(4,'c',40)")
    spark.sql("CREATE TABLE gt.erasure (uid BIGINT)")
    spark.sql("INSERT INTO gt.erasure VALUES (1), (3), (99)")
    // IN-subquery delete → keyed semi-join (the list is never collected)
    spark.sql("DELETE FROM gt.subq WHERE k IN (SELECT uid FROM gt.erasure)")
    assert(sqlRows("SELECT k FROM gt.subq") == Set(Seq(2L), Seq(4L)))
    // IN + plain residue conjunct: only the residue-passing member deletes
    spark.sql("INSERT INTO gt.subq VALUES (5,'a',50),(6,'b',60)")
    spark.sql("DELETE FROM gt.subq WHERE grp = 'a' AND " +
      "k IN (SELECT uid + 4 FROM gt.erasure)")
    assert(sqlRows("SELECT k FROM gt.subq") == Set(Seq(2L), Seq(4L), Seq(6L)))
    // uncorrelated EXISTS gate on UPDATE: true → residue update applies
    spark.sql("UPDATE gt.subq SET v = v + 1 WHERE grp = 'b' AND " +
      "EXISTS (SELECT 1 FROM gt.erasure WHERE uid = 99)")
    assert(sqlRows("SELECT k, v FROM gt.subq WHERE grp = 'b'") ==
      Set(Seq(2L, 21L), Seq(6L, 61L)))
    // false gate → statement is a no-op
    spark.sql("UPDATE gt.subq SET v = 0 WHERE " +
      "EXISTS (SELECT 1 FROM gt.erasure WHERE uid = 12345)")
    assert(sqlRows("SELECT CAST(SUM(v) AS BIGINT) AS s FROM gt.subq") ==
      Set(Seq(122L)))
    // NOT EXISTS (empty subquery) gates the residue delete ON
    spark.sql("DELETE FROM gt.subq WHERE grp = 'c' AND " +
      "NOT EXISTS (SELECT 1 FROM gt.erasure WHERE uid = 12345)")
    assert(sqlRows("SELECT k FROM gt.subq") == Set(Seq(2L), Seq(6L)))
    // correlated stays loud and names the MERGE route
    val e = intercept[Exception](spark.sql("DELETE FROM gt.subq t WHERE " +
      "EXISTS (SELECT 1 FROM gt.erasure e WHERE e.uid = t.k)"))
    assert(e.getMessage.contains("MERGE"), e.getMessage)
    // NOT IN stays loud (null-semantics footgun)
    val e2 = intercept[Exception](spark.sql(
      "DELETE FROM gt.subq WHERE k NOT IN (SELECT uid FROM gt.erasure)"))
    assert(e2.getMessage.contains("NOT IN"), e2.getMessage)
  }

  test("WAP branch via SQL: CALL create_branch / VERSION AS OF / fast_forward") {
    warehouse
    spark.sql("CREATE TABLE gt.wap (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql("INSERT INTO gt.wap VALUES (1, 'a'), (2, 'b')")
    val bp = spark.sql(
      "CALL gt.system.create_branch(table => 'wap', name => 'audit')")
      .head().getLong(0)
    assert(bp == GraftTable.at(spark, s"$warehouse/wap").version)
    // write to the branch through the API handle; main stays untouched
    val t = GraftTable.at(spark, s"$warehouse/wap")
    t.branch("audit").append(Seq((3L, "c")).toDF("k", "v"))
    assert(sqlRows("SELECT k FROM gt.wap") == Set(Seq(1L), Seq(2L)))
    // the WAP read face: VERSION AS OF '<branch>' serves the branch state
    assert(sqlRows("SELECT k FROM gt.wap VERSION AS OF 'audit'") ==
      Set(Seq(1L), Seq(2L), Seq(3L)))
    // a bogus ref names the live branches in the error
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gt.wap VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("audit"), e.getMessage)
    // publish: main serves the branch state; the branch is consumed
    spark.sql("CALL gt.system.fast_forward(table => 'wap', name => 'audit')")
    assert(sqlRows("SELECT k FROM gt.wap") == Set(Seq(1L), Seq(2L), Seq(3L)))
    assert(GraftTable.at(spark, s"$warehouse/wap").listBranches.isEmpty)
    // drop_branch abandons without publishing
    spark.sql("CALL gt.system.create_branch(table => 'wap', name => 'tmp')")
    GraftTable.at(spark, s"$warehouse/wap").branch("tmp")
      .append(Seq((9L, "z")).toDF("k", "v"))
    // the .branches metadata table lists live refs with both pointers
    val bi = spark.table("gt.wap.branches").collect()
    // head_version counts the BRANCH's own log (clone-create=1, +append=2);
    // branch_point is the MAIN version the branch was cut at
    assert(bi.length == 1 && bi.head.getString(0) == "tmp" &&
      bi.head.getLong(1) == GraftTable.at(spark, s"$warehouse/wap").version &&
      bi.head.getLong(2) == 2L, bi.mkString(","))
    spark.sql("CALL gt.system.drop_branch(table => 'wap', name => 'tmp')")
    assert(sqlRows("SELECT k FROM gt.wap") == Set(Seq(1L), Seq(2L), Seq(3L)))
    assert(spark.table("gt.wap.branches").isEmpty)
  }

  test("tags via SQL: CALL create_tag / VERSION AS OF '<tag>' / read-only / drop_tag") {
    warehouse
    spark.sql("CREATE TABLE gt.tgd (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gt.tgd VALUES (1, 'a'), (2, 'b')")
    val pinned = spark.sql(
      "CALL gt.system.create_tag(table => 'tgd', name => 'run1')")
      .head().getLong(0)
    assert(pinned == GraftTable.at(spark, s"$warehouse/tgd").version)
    // the tag keeps serving the pinned state as the table moves on
    spark.sql("INSERT INTO gt.tgd VALUES (3, 'c')")
    assert(sqlRows("SELECT k FROM gt.tgd VERSION AS OF 'run1'") ==
      Set(Seq(1L), Seq(2L)))
    assert(sqlRows("SELECT k FROM gt.tgd") == Set(Seq(1L), Seq(2L), Seq(3L)))
    // .tags metadata table
    val ti = spark.table("gt.tgd.tags").collect()
    assert(ti.length == 1 && ti.head.getString(0) == "run1" &&
      ti.head.getLong(1) == pinned, ti.mkString(","))
    // a tag read is a TIME-TRAVEL read: writes refuse loud
    val cat = spark.sessionState.catalogManager.catalog("gt")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "tgd")
    val loaded = cat.loadTable(ident, "run1")
    val ew = intercept[IllegalArgumentException](
      loaded.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
        .newWriteBuilder(null))
    assert(ew.getMessage.contains("time-travel"), ew.getMessage)
    // pinned version appears in the error-free name, and drop frees it
    spark.sql("CALL gt.system.drop_tag(table => 'tgd', name => 'run1')")
    assert(spark.table("gt.tgd.tags").isEmpty)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gt.tgd VERSION AS OF 'run1'").collect())
    assert(e.getMessage.contains("tag"), e.getMessage)
  }

  test("ANALYZE: NDV stats reach plan attributeStats and reorder a 3-way join") {
    warehouse
    spark.sql("CREATE TABLE gt.an_big (k BIGINT, g BIGINT)")
    spark.sql("INSERT INTO gt.an_big SELECT id, id % 5 FROM range(0, 20000)")
    spark.sql("CREATE TABLE gt.an_big2 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gt.an_big2 SELECT id, id * 2 FROM range(0, 20000)")
    spark.sql("CREATE TABLE gt.an_tiny (g BIGINT, name STRING)")
    // only 2 of the 5 groups exist: the big-tiny join is SELECTIVE
    // (8000 rows) while big-big2 is not (20000) — with stats the DP
    // reorder is strictly cheaper, without them nothing moves
    spark.sql("INSERT INTO gt.an_tiny SELECT id, concat('g', id) FROM range(0, 2)")
    // one-pass NDV into the log, surfaced in columnNdv and .detail
    val n = spark.sql("CALL gt.system.analyze(table => 'an_big')")
      .head().getLong(0)
    assert(n == 2L)
    spark.sql("CALL gt.system.analyze(table => 'an_big2')")
    spark.sql("CALL gt.system.analyze(table => 'an_tiny')")
    val t = GraftTable.at(spark, s"$warehouse/an_big")
    assert(t.history.last.op == "analyze")
    val ndv = t.columnNdv
    // approx_count_distinct: exact small values, ~2% error on large ones
    assert(ndv("g") == 5L, ndv.toString)
    assert(math.abs(ndv("k") - 20000L) < 1000L, ndv.toString)
    val detailNdv = spark.sql("SELECT column_ndv FROM gt.an_big.detail")
      .head().getMap[String, Long](0)
    assert(detailNdv.size == 2, detailNdv.toString)
    withSQLConf("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      // the relation's optimized stats carry rowCount + per-attribute NDV
      val st = spark.table("gt.an_big").queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(20000)), st.toString)
      assert(st.attributeStats.nonEmpty &&
        st.attributeStats.exists { case (a, cs) =>
          a.name == "g" && cs.distinctCount.contains(BigInt(5)) },
        st.attributeStats.toString)
      // written order joins the two 20k-row tables FIRST; with stats the
      // DP reorder joins big ⋈ tiny before touching big2
      def firstJoinTables(sql: String): Set[String] = {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        val joins = plan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
        val deepest = joins.last // innermost join = executed first
        deepest.collectLeaves().collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.relation.table.name()
        }.toSet
      }
      val q = """SELECT count(*) AS cnt FROM gt.an_big b
        JOIN gt.an_big2 c ON b.k = c.k
        JOIN gt.an_tiny t ON b.g = t.g"""
      val reordered = firstJoinTables(q)
      assert(reordered.exists(_.contains("an_tiny")),
        s"CBO did not pull the tiny table into the first join: $reordered")
      // and the reordered plan still answers correctly
      assert(spark.sql(q).head().getLong(0) == 8000L)
    }
    // without CBO the syntactic order stands — the rule is a strict no-op
    val plan = spark.sql("""SELECT count(*) FROM gt.an_big b
        JOIN gt.an_big2 c ON b.k = c.k
        JOIN gt.an_tiny t ON b.g = t.g""").queryExecution.optimizedPlan
    val innermost = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.last
    val leaves = innermost.collectLeaves().collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table.name() }.toSet
    assert(!leaves.exists(_.contains("an_tiny")), leaves.toString)
  }

  test("CALL graft.system.{compact,optimize,vacuum}: maintenance via SQL") {
    warehouse
    spark.sql("CREATE TABLE gt.mnt (k BIGINT, v STRING)")
    // three tiny commits -> three small files
    spark.sql("INSERT INTO gt.mnt VALUES (1, 'a')")
    spark.sql("INSERT INTO gt.mnt VALUES (2, 'b')")
    spark.sql("INSERT INTO gt.mnt VALUES (3, 'c')")
    val t = GraftTable.at(spark, s"$warehouse/mnt")
    val filesBefore = t.snapshot().inputFiles.length
    assert(filesBefore >= 3)
    // compact returns the new version as a result row
    val ver = spark.sql("CALL gt.system.compact(table => 'mnt')")
      .head().getLong(0)
    assert(ver == t.version && t.history.last.op == "compact")
    val t2 = GraftTable.at(spark, s"$warehouse/mnt")
    assert(t2.snapshot().inputFiles.length < filesBefore)
    // optimize clusters (string column -> rank path) in one commit
    spark.sql("CALL gt.system.optimize(table => 'mnt', cluster_by => 'v')")
    assert(GraftTable.at(spark, s"$warehouse/mnt").history.last.op == "optimize")
    // restore: back to the post-compaction version (pre-vacuum, so its
    // files still exist — metadata-only re-reference)
    spark.sql(s"CALL gt.system.restore(table => 'mnt', version => ${ver})")
    assert(GraftTable.at(spark, s"$warehouse/mnt").history.last.op == "restore")
    // DRY RUN reports what would be reclaimed and touches nothing
    val wouldDelete = spark.sql(
      "CALL gt.system.vacuum(table => 'mnt', retention_ms => 0, dry_run => true)")
      .head().getLong(0)
    assert(wouldDelete > 0L, "dry-run vacuum found nothing reclaimable")
    assert(GraftTable.at(spark, s"$warehouse/mnt")
      .snapshot(Some(ver)).count() == 3L,
      "dry-run vacuum deleted files (time travel died)")
    // vacuum with a zero retention window reclaims the unreferenced files
    val deleted = spark.sql("CALL gt.system.vacuum(table => 'mnt', retention_ms => 0)")
      .head().getLong(0)
    assert(deleted == wouldDelete,
      s"real vacuum deleted $deleted but dry run predicted $wouldDelete")
    // rows survive the whole maintenance pass
    assert(sqlRows("SELECT k, v FROM gt.mnt") ==
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // unknown procedure raises the DECLARED analysis error (Spark 4.1 has
    // no NoSuchProcedureException class; ROUTINE_NOT_FOUND / SQLSTATE 42883
    // is the typed equivalent CALL resolution translates) and names the
    // real procedures — same for a wrong namespace
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("CALL gt.system.frobnicate(table => 'mnt')"))
    assert(e.getCondition == "ROUTINE_NOT_FOUND", e.getCondition)
    assert(e.getMessage.contains("gt.system.compact"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("CALL gt.wrongns.compact(table => 'mnt')"))
    assert(e2.getCondition == "ROUTINE_NOT_FOUND", e2.getCondition)
    assert(e2.getMessage.contains("gt.system"), e2.getMessage)
  }

  test("DELETE with an untranslatable predicate is rejected, not silently wrong") {
    warehouse
    spark.sql("CREATE TABLE gt.hard (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gt.hard VALUES (1, 'a')")
    // rand() is untranslatable and non-deterministic: must fail loud
    intercept[Exception](spark.sql("DELETE FROM gt.hard WHERE rand() > 0.5"))
    assert(spark.sql("SELECT count(*) FROM gt.hard").head().getLong(0) == 1L)
  }

  test("bloom index via TBLPROPERTIES: SET configures, UNSET clears, SELECT prunes") {
    warehouse
    spark.sql("CREATE TABLE gt.bloomy (id STRING, n BIGINT)")
    spark.sql("ALTER TABLE gt.bloomy SET TBLPROPERTIES " +
      "('graft.bloom.columns'='id', 'graft.bloom.ndv'='5000')")
    val t = GraftTable.at(spark, s"$warehouse/bloomy")
    assert(t.bloomFilterColumns == Map("id" -> 5000L))
    // two single-file inserts with INTERLEAVED ids: zone maps cannot tell
    // the files apart, so the SQL point lookup can only prune via bloom
    spark.sql("INSERT INTO gt.bloomy SELECT concat('id', lpad(CAST(id * 2 AS STRING), 3, '0')), id " +
      "FROM range(0, 50, 1, 1)") // one slice → one data file
    spark.sql("INSERT INTO gt.bloomy SELECT concat('id', lpad(CAST(id * 2 + 1 AS STRING), 3, '0')), id " +
      "FROM range(0, 50, 1, 1)")
    assert(sqlRows("SELECT n FROM gt.bloomy WHERE id = 'id042'") == Set(Seq(21L)))
    assert(spark.sql("SELECT * FROM gt.bloomy WHERE id = 'zz'").count() == 0)
    // the SQL read path routes through scan(): the same candidates the
    // API-level pin checks (one file per lookup)
    import org.apache.spark.sql.functions.col
    assert(t.scanCandidates(col("id") === "id042", t.version).size == 1)
    // per-column NDV spec + UNSET
    spark.sql("ALTER TABLE gt.bloomy SET TBLPROPERTIES ('graft.bloom.columns'='id:777,n')")
    assert(GraftTable.at(spark, s"$warehouse/bloomy").bloomFilterColumns ==
      Map("id" -> 777L, "n" -> 100000L))
    spark.sql("ALTER TABLE gt.bloomy UNSET TBLPROPERTIES ('graft.bloom.columns')")
    assert(GraftTable.at(spark, s"$warehouse/bloomy").bloomFilterColumns.isEmpty)
    // unknown properties and mixing with other change kinds stay loud
    intercept[Exception](spark.sql(
      "ALTER TABLE gt.bloomy SET TBLPROPERTIES ('some.random.prop'='1')"))
    intercept[Exception](spark.sql(
      "ALTER TABLE gt.bloomy SET TBLPROPERTIES ('graft.bloom.ndv'='9')"))
  }

  test("PARTITIONED BY transforms: bucket/days through SQL DDL prune and read back") {
    warehouse
    spark.sql("CREATE TABLE gt.hidden (k BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (bucket(4, k), days(ts))")
    spark.sql("INSERT INTO gt.hidden SELECT id, " +
      "timestamp'2024-05-01 08:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0), " +
      "concat('v', id) FROM range(0, 60, 1, 1)")
    val t = GraftTable.at(spark, s"$warehouse/hidden")
    assert(t.partitionBy == Seq("bucket(4,k)", "days(ts)"))
    // 4 buckets x 3 days = up to 12 files from the single-slice insert
    assert(t.filesAt(t.version).count(_.rows > 0) == 12)
    // a SQL point lookup on the SOURCE columns prunes through scan():
    // bucket admits 1/4 of files, day admits 1/3 — one file survives
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val cands = t.scanCandidates(
      col("k") === 7L &&
        col("ts") === to_timestamp(lit("2024-05-02 08:00:00")), t.version)
    assert(cands.size == 1, s"expected 1 candidate, got ${cands.size}")
    assert(sqlRows("SELECT v FROM gt.hidden WHERE k = 7 AND " +
      "ts = timestamp'2024-05-02 08:00:00'") == Set(Seq("v7")))
    // unsupported transform stays loud
    intercept[Exception](spark.sql(
      "CREATE TABLE gt.hidden2 (ts TIMESTAMP) PARTITIONED BY (hours(ts))"))
  }

  test("INSERT OVERWRITE: static PARTITION replaces one cell, dynamic mode per-cell") {
    warehouse
    spark.sql("CREATE TABLE gt.po (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gt.po VALUES (1, 'A'), (2, 'B'), (3, 'B')")
    // static form: only partition A is replaced; B untouched (not re-listed)
    spark.sql("INSERT OVERWRITE gt.po PARTITION (p = 'A') VALUES (10)")
    assert(sqlRows("SELECT k, p FROM gt.po") ==
      Set(Seq(10L, "A"), Seq(2L, "B"), Seq(3L, "B")))
    val t = GraftTable.at(spark, s"$warehouse/po")
    assert(t.history.last.op == "overwritePartitions")
    // a row OUTSIDE the static partition cannot be smuggled in: the scope
    // check aborts inside the write job and commits NOTHING
    val v = t.version
    val e = intercept[IllegalArgumentException] {
      t.overwriteWhere(org.apache.spark.sql.functions.col("p") === "A",
        "`p` = 'A'", Seq((9L, "B")).toDF("k", "p"))
    }
    assert(e.getMessage.contains("overwrite_partition_scope"), e.getMessage)
    assert(GraftTable.at(spark, s"$warehouse/po").version == v,
      "violating partition overwrite committed")
    // dynamic mode: partitions present in the data are replaced, others kept
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE gt.po VALUES (20, 'B')")
      assert(sqlRows("SELECT k, p FROM gt.po") ==
        Set(Seq(10L, "A"), Seq(20L, "B")))
      assert(GraftTable.at(spark, s"$warehouse/po").history.last.op ==
        "replacePartitions")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("GENERATED ALWAYS AS columns derive through SQL DDL + INSERT + UPDATE") {
    warehouse
    spark.sql("CREATE TABLE gt.gen_t (k BIGINT, v STRING, " +
      "vu STRING GENERATED ALWAYS AS (upper(v))) USING graft")
    // insert without the generated column: null-filled by Spark's default
    // resolution, derived per row inside the write
    spark.sql("INSERT INTO gt.gen_t (k, v) VALUES (1, 'a'), (2, 'b')")
    assert(sqlRows("SELECT k, v, vu FROM gt.gen_t ORDER BY k") ==
      Set(Seq(1L, "a", "A"), Seq(2L, "b", "B")))
    // UPDATE of the source recomputes the derived value
    spark.sql("UPDATE gt.gen_t SET v = 'z' WHERE k = 2")
    assert(sqlRows("SELECT k, vu FROM gt.gen_t ORDER BY k") ==
      Set(Seq(1L, "A"), Seq(2L, "Z")))
    // the expression is declared schema metadata on the V2 table
    val t = GraftTable.at(spark, s"$warehouse/gen_t")
    assert(t.generatedColumns == Map("vu" -> "upper(v)"))
  }

  test("TBLPROPERTIES key.unique enforces uniqueness through SQL writes") {
    warehouse
    spark.sql("CREATE TABLE gt.uk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k', 'key.unique' = 'true')")
    val t = GraftTable.at(spark, s"$warehouse/uk")
    assert(t.uniqueKeyEnforced)
    spark.sql("INSERT INTO gt.uk VALUES (1, 'a'), (2, 'b')")
    // an insert re-using a live key is refused whole, nothing committed
    val v = GraftTable.at(spark, s"$warehouse/uk").version
    intercept[Exception](spark.sql("INSERT INTO gt.uk VALUES (3, 'c'), (2, 'dup')"))
    assert(GraftTable.at(spark, s"$warehouse/uk").version == v)
    assert(sqlRows("SELECT k, v FROM gt.uk") == Set(Seq(1L, "a"), Seq(2L, "b")))
    // declaring unique without a key is loud
    intercept[Exception](spark.sql("CREATE TABLE gt.uk2 (k BIGINT) " +
      "TBLPROPERTIES ('key.unique' = 'true')"))
  }

  test("CREATE OR REPLACE preserves generated-column metadata (staged DDL)") {
    warehouse
    spark.sql("CREATE TABLE gt.gor (k BIGINT, v STRING) USING graft")
    spark.sql("CREATE OR REPLACE TABLE gt.gor (k BIGINT, v STRING, " +
      "vu STRING GENERATED ALWAYS AS (upper(v))) USING graft")
    spark.sql("INSERT INTO gt.gor (k, v) VALUES (1, 'a')")
    assert(sqlRows("SELECT k, vu FROM gt.gor") == Set(Seq(1L, "A")))
    val t = GraftTable.at(spark, s"$warehouse/gor")
    assert(t.generatedColumns == Map("vu" -> "upper(v)"))
  }

  test("GENERATED ALWAYS AS IDENTITY assigns unique values through SQL") {
    warehouse
    spark.sql("CREATE TABLE gt.id_t (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gt.id_t (k, v) VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gt.id_t (k, v) VALUES (3, 'c')")
    val rows = spark.sql("SELECT id, k FROM gt.id_t").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).distinct.length == 3,
      s"identity collision: ${rows.map(_.getLong(0)).mkString(",")}")
    val t = GraftTable.at(spark, s"$warehouse/id_t")
    assert(t.identityColumns == Map("id" -> GraftTable.IdentitySpec(1L, 1L)))
  }

  test("ALTER TABLE ALTER COLUMN TYPE widens through SQL; narrowing loud") {
    warehouse
    spark.sql("CREATE TABLE gt.widen_t (k INT, v STRING) USING graft")
    spark.sql("INSERT INTO gt.widen_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gt.widen_t ALTER COLUMN k TYPE BIGINT")
    // the catalog serves the widened schema; old files read converted
    assert(spark.table("gt.widen_t").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    spark.sql("INSERT INTO gt.widen_t VALUES (5000000000, 'c')")
    assert(sqlRows("SELECT k, v FROM gt.widen_t") ==
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(5000000000L, "c")))
    val t = GraftTable.at(spark, s"$warehouse/widen_t")
    assert(t.history.map(_.op).contains("widenColumn"))
    // narrowing is refused by Spark's own analyzer (upcast-only contract)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gt.widen_t ALTER COLUMN k TYPE INT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e.getMessage)
    // int→string is an "up-cast" to the analyzer but NOT a storage-safe
    // widening (old files keep int32 pages) — the catalog refuses it loud
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gt.widen_t ALTER COLUMN v TYPE BINARY"))
    assert(e2.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e2.getMessage.contains("widening"), e2.getMessage)
  }

  test("SQL DDL: narrow identity and generated-over-identity refused loud") {
    warehouse
    // INT identity would wrap under the partition-encoded assigner
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gt.id_narrow (id INT GENERATED ALWAYS AS " +
        "IDENTITY, k BIGINT) USING graft")
    }
    assert(e.getMessage.contains("must be BIGINT"), e.getMessage)
    // a generation expression over an identity column would derive from a
    // null slot (identity assigns AFTER generated columns compute)
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gt.gen_id (id BIGINT GENERATED ALWAYS AS " +
        "IDENTITY, g BIGINT GENERATED ALWAYS AS (id + 1), k BIGINT) USING graft")
    }
    assert(e2.getMessage.contains("identity"), e2.getMessage)
  }
}
