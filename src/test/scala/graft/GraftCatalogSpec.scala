package graft

import java.nio.file.Files
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._

/** The SQL catalog surface: name-addressed graft tables through a
  * registered `TableCatalog` — DDL lifecycle, INSERT routing to the
  * versioned commit protocol, DELETE as merge-on-read position
  * deletes, INSERT OVERWRITE … PARTITION as whole-partition
  * replaceWhere, and VERSION/TIMESTAMP AS OF time travel.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    dir
  }

  test("namespace + declared table lifecycle: create, read empty, " +
    "insert (keyed upsert), show, drop") {
    wh
    spark.sql("CREATE NAMESPACE gcat.etl")
    spark.sql("CREATE TABLE gcat.etl.t (id BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    // declared schema, zero rows, before any commit
    val empty = spark.sql("SELECT * FROM gcat.etl.t")
    assert(empty.columns.toSeq === Seq("id", "v"))
    assert(empty.count() === 0)
    spark.sql("INSERT INTO gcat.etl.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcat.etl.t VALUES (2, 'B'), (3, 'c')")
    // keys='id' makes INSERT an upsert: 2 is updated, not duplicated
    val got = spark.sql("SELECT id, v FROM gcat.etl.t ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a"), (2L, "B"), (3L, "c")))
    val shown = spark.sql("SHOW TABLES IN gcat.etl")
      .select("tableName").as[String].collect().toSeq
    assert(shown === Seq("t"))
    spark.sql("DROP TABLE gcat.etl.t")
    assert(spark.sql("SHOW TABLES IN gcat.etl").count() === 0)
  }

  test("DELETE FROM is a merge-on-read position delete; time travel " +
    "still sees the pre-delete snapshot") {
    wh
    spark.sql("CREATE TABLE gcat.etl.d (id BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO gcat.etl.d " +
      "SELECT id, concat('v', id) FROM range(20)")
    spark.sql("DELETE FROM gcat.etl.d WHERE id >= 15 OR v = 'v3'")
    val live = spark.sql("SELECT id FROM gcat.etl.d")
      .as[Long].collect().sorted.toSeq
    assert(live === (0L to 14L).filterNot(_ == 3L))
    // the delete wrote NO data-file rewrite: v1 is still the full set
    val v1 = spark.sql("SELECT id FROM gcat.etl.d VERSION AS OF 1")
    assert(v1.count() === 20)
    val root = s"$wh/etl/d"
    val (liveEntries, staleEntries) =
      VersionedTable.posDeleteEntryCounts(spark, root)
    assert(liveEntries === 6, s"expected 6 live pos-delete entries, " +
      s"got $liveEntries live / $staleEntries stale")
  }

  test("partitioned catalog table: INSERT routes through the " +
    "partitioned upsert; INSERT OVERWRITE PARTITION replaces exactly " +
    "one partition") {
    wh
    spark.sql("CREATE TABLE gcat.etl.p " +
      "(id BIGINT, day STRING, cents BIGINT) USING graft " +
      "PARTITIONED BY (day) TBLPROPERTIES ('keys' = 'id')")
    val rows = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "2024-01-02" else "2024-01-01",
        i * 10))
    rows.toDF("id", "day", "cents")
      .createOrReplaceTempView("p_src")
    spark.sql("INSERT INTO gcat.etl.p SELECT id, day, cents FROM p_src")
    val root = s"$wh/etl/p"
    val m0 = VersionedTable.readPartitionedManifest(root).get
    assert(m0.partitionColumns === Seq("day"))
    assert(m0.partitions.keySet ===
      Set("day=2024-01-01", "day=2024-01-02"))
    // positional INSERT after the first commit: column order must
    // still be the DECLARED (id, day, cents), not data-then-partition
    assert(spark.table("gcat.etl.p").columns.toSeq ===
      Seq("id", "day", "cents"))
    spark.sql("INSERT OVERWRITE gcat.etl.p " +
      "PARTITION (day = '2024-01-02') " +
      "SELECT id, cents * 2 FROM p_src WHERE day = '2024-01-02' " +
      "AND id <= 10")
    val m1 = VersionedTable.readPartitionedManifest(root).get
    // untouched day keeps its original pointer; overwritten day moved
    assert(m1.partitions("day=2024-01-01") ===
      m0.partitions("day=2024-01-01"))
    assert(m1.partitions("day=2024-01-02") !==
      m0.partitions("day=2024-01-02"))
    val after = spark.sql(
      "SELECT day, count(*) AS n, sum(cents) AS s FROM gcat.etl.p " +
        "GROUP BY day ORDER BY day")
      .as[(String, Long, Long)].collect().toSeq
    val oddSum = rows.filter(_._2 == "2024-01-01").map(_._3).sum
    val evenSum = Seq(2L, 4L, 6L, 8L, 10L).map(_ * 10 * 2).sum
    assert(after === Seq(("2024-01-01", 20L, oddSum),
      ("2024-01-02", 5L, evenSum)))
  }

  test("overwrite-by-filter validates replacement rows against the " +
    "predicate (the replaceWhere contract)") {
    wh
    spark.sql("CREATE TABLE gcat.etl.ow (id BIGINT, day STRING) " +
      "USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO gcat.etl.ow VALUES (1, 'a'), (2, 'b')")
    val stray = Seq((7L, "zz")).toDF("id", "day")
    val e = intercept[Exception] {
      stray.writeTo("gcat.etl.ow").overwrite(col("day") === "a")
    }
    assert(e.getMessage.contains("outside the overwrite predicate"),
      e.getMessage)
    Seq((9L, "a")).toDF("id", "day").writeTo("gcat.etl.ow")
      .overwrite(col("day") === "a")
    val got = spark.sql("SELECT id, day FROM gcat.etl.ow ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((2L, "b"), (9L, "a")).sortBy(_._1))
  }

  test("TIMESTAMP AS OF resolves the newest commit published at or " +
    "before the instant; VERSION AS OF accepts a named ref") {
    wh
    spark.sql("CREATE TABLE gcat.etl.tt (id BIGINT) USING graft " +
      "TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO gcat.etl.tt SELECT id FROM range(5)")
    Thread.sleep(1100)
    val between = java.time.Instant.now()
    Thread.sleep(1100)
    spark.sql("INSERT INTO gcat.etl.tt SELECT id + 100 FROM range(5)")
    val tsLit = java.sql.Timestamp.from(between).toString
    val asOf = spark.sql(
      s"SELECT count(*) FROM gcat.etl.tt TIMESTAMP AS OF '$tsLit'")
      .head.getLong(0)
    assert(asOf === 5)
    assert(spark.table("gcat.etl.tt").count() === 10)
    // a timestamp before the first commit fails loudly
    val tooEarly = java.sql.Timestamp.from(
      between.minusSeconds(3600)).toString
    val err = intercept[Exception](spark.sql(
      s"SELECT * FROM gcat.etl.tt TIMESTAMP AS OF '$tooEarly'")
      .collect())
    assert(err.getMessage.contains("retained") ||
      err.getMessage.contains("TIMESTAMP AS OF"),
      err.getMessage)
    val root = s"$wh/etl/tt"
    VersionedTable.setRef(root, "stable", 1L)
    val viaRef = spark.sql(
      "SELECT count(*) FROM gcat.etl.tt VERSION AS OF 'stable'")
      .head.getLong(0)
    assert(viaRef === 5)
  }

  test("CTAS, ALTER TABLE properties, RENAME, and DROP NAMESPACE " +
    "CASCADE") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tmp")
    spark.sql("CREATE TABLE gcat.tmp.c USING graft AS " +
      "SELECT id, id * 2 AS dbl FROM range(10)")
    assert(spark.table("gcat.tmp.c").count() === 10)
    spark.sql(
      "ALTER TABLE gcat.tmp.c SET TBLPROPERTIES ('keys' = 'id')")
    // now INSERT is an upsert on id
    spark.sql("INSERT INTO gcat.tmp.c SELECT id, id * 3 FROM range(5)")
    assert(spark.table("gcat.tmp.c").count() === 10)
    assert(spark.sql(
      "SELECT dbl FROM gcat.tmp.c WHERE id = 2").head.getLong(0) === 6)
    // RENAME TO takes a catalog-RELATIVE target identifier
    spark.sql("ALTER TABLE gcat.tmp.c RENAME TO tmp.c2")
    assert(spark.table("gcat.tmp.c2").count() === 10)
    intercept[Exception](spark.table("gcat.tmp.c").collect())
    spark.sql("DROP NAMESPACE gcat.tmp CASCADE")
    intercept[Exception](spark.table("gcat.tmp.c2").collect())
  }

  test("a stray 'path' table property is rejected at CREATE (root " +
    "hijack impossible); __graft_* properties are rejected by ALTER") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.guard")
    val c = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.guard.h (id BIGINT) USING graft " +
        "TBLPROPERTIES ('path' = '/definitely/not/here', " +
        "'keys' = 'id')"))
    assert(c.getMessage.contains("per-read scan option") ||
      c.getMessage.contains("catalog-internal"), c.getMessage)
    spark.sql("CREATE TABLE gcat.guard.h (id BIGINT) USING graft " +
      "TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO gcat.guard.h SELECT id FROM range(7)")
    assert(VersionedTable.readLive(spark, s"$wh/guard/h").count() === 7)
    assert(spark.table("gcat.guard.h").count() === 7)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.guard.h SET TBLPROPERTIES " +
        "('__graft_empty_ok' = 'false')"))
    assert(e.getMessage.contains("catalog-internal"), e.getMessage)
  }

  test("LOCATION registers an existing path-based table as EXTERNAL: " +
    "reads/writes address the location, DROP keeps the data, PURGE " +
    "removes it") {
    wh
    val ext = java.nio.file.Files.createTempDirectory("gcat_ext")
      .resolve("t").toString
    VersionedTable.upsert(spark, ext,
      (1L to 9L).map(i => (i, i * 2)).toDF("id", "v"), Seq("id"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ext")
    spark.sql("CREATE TABLE gcat.ext.t (id BIGINT, v BIGINT) " +
      s"USING graft LOCATION '$ext' TBLPROPERTIES ('keys' = 'id')")
    assert(spark.table("gcat.ext.t").count() === 9)
    spark.sql("INSERT INTO gcat.ext.t VALUES (10, 20)")
    // the write landed at the LOCATION, not under the warehouse stub
    assert(VersionedTable.readLive(spark, ext).count() === 10)
    // metadata names resolve against the location too
    assert(spark.sql("SELECT sum(row_count) FROM gcat.ext.`t$files`")
      .head.getLong(0) === 10)
    spark.sql("DROP TABLE gcat.ext.t")
    intercept[Exception](spark.table("gcat.ext.t").collect())
    assert(VersionedTable.readLive(spark, ext).count() === 10,
      "DROP of an external table must keep the data")
    // re-register, then PURGE removes the data as well
    spark.sql("CREATE TABLE gcat.ext.t (id BIGINT, v BIGINT) " +
      s"USING graft LOCATION '$ext'")
    spark.sql("DROP TABLE gcat.ext.t PURGE")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ext)))
  }

  test("racing INSERTs into one catalog table settle by the " +
    "table's CAS — no lost updates") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.conc")
    spark.sql("CREATE TABLE gcat.conc.t (id BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (0 until 4).map { w =>
      Future {
        spark.sql("INSERT INTO gcat.conc.t " +
          s"SELECT id, id * 10 FROM range(${w * 100}, ${w * 100 + 100})")
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    val got = spark.table("gcat.conc.t")
      .agg(count(lit(1)), sum("v")).head
    assert(got.getLong(0) === 400)
    assert(got.getLong(1) === (0L until 400L).map(_ * 10).sum)
  }

  test("change-feed reads through the catalog pick up the table's " +
    "declared keys") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cdf")
    spark.sql("CREATE TABLE gcat.cdf.t (id BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO gcat.cdf.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcat.cdf.t VALUES (2, 'B'), (3, 'c')")
    // the t$changes table (Iceberg changelog shape): diff keys come
    // from TBLPROPERTIES, the range from read options
    val feed = spark.read.option("changesFrom", "1")
      .table("gcat.cdf.`t$changes`")
      .select("_change_type", "id").as[(String, Long)]
      .collect().toSet
    assert(feed === Set(("update_preimage", 2L),
      ("update_postimage", 2L), ("insert", 3L)),
      s"unexpected feed: $feed")
    // no options: the full retained history through plain SQL
    val full = spark.sql(
      "SELECT _change_type, count(*) AS n FROM gcat.cdf.`t$changes` " +
        "GROUP BY 1").as[(String, Long)].collect().toMap
    assert(full === Map("insert" -> 3L, "update_preimage" -> 1L,
      "update_postimage" -> 1L), s"unexpected full feed: $full")
  }

  test("review-pass guards: UNSET location rejected, reserved scan " +
    "options rejected as TBLPROPERTIES, schemaless CREATE validates " +
    "before persisting the stub") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.rv")
    // reserved option key as a property would pin every future read
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.rv.bad (id BIGINT) USING graft " +
        "TBLPROPERTIES ('versionAsOf' = '1')"))
    assert(e1.getMessage.contains("per-read scan option"),
      e1.getMessage)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$wh/rv/bad")),
      "a rejected CREATE must not leave a stub")
    // schemaless registration of a nonexistent location fails BEFORE
    // the stub lands, so the retry with a good location works
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.rv.ext USING graft " +
        "LOCATION '/definitely/not/a/table'"))
    assert(e2.getMessage.contains("existing committed"), e2.getMessage)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$wh/rv/ext")))
    // UNSET of catalog-internal keys is as guarded as SET (Spark
    // itself pre-blocks 'location' in SQL; '__schema' reaches our
    // guard — and the direct-API path is covered for both)
    val ext = java.nio.file.Files.createTempDirectory("rv_ext")
      .resolve("t").toString
    VersionedTable.upsert(spark, ext,
      Seq((1L, 2L)).toDF("id", "v"), Seq("id"))
    spark.sql("CREATE TABLE gcat.rv.ok (id BIGINT, v BIGINT) " +
      s"USING graft LOCATION '$ext'")
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.rv.ok UNSET TBLPROPERTIES ('__schema')"))
    assert(e3.getMessage.contains("catalog-internal"), e3.getMessage)
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val e4 = intercept[Exception](cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("rv"), "ok"),
      org.apache.spark.sql.connector.catalog.TableChange
        .removeProperty("location")))
    assert(e4.getMessage.contains("catalog-internal"), e4.getMessage)
    assert(spark.table("gcat.rv.ok").count() === 1)
  }

  test("first write to a declared table may be INSERT OVERWRITE " +
    "PARTITION; $changes and live reads of an empty table are empty " +
    "while time travel fails loudly") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.fw")
    spark.sql("CREATE TABLE gcat.fw.t (id BIGINT, day STRING) " +
      "USING graft PARTITIONED BY (day) TBLPROPERTIES ('keys' = 'id')")
    // empty-table contracts
    assert(spark.table("gcat.fw.t").count() === 0)
    assert(spark.sql("SELECT * FROM gcat.fw.`t$changes`").count() === 0)
    val tt = intercept[Exception](spark.sql(
      "SELECT * FROM gcat.fw.t VERSION AS OF 1").collect())
    assert(tt.getMessage.contains("no retained commits"),
      tt.getMessage)
    // the standard idempotent-backfill pattern from day one
    spark.sql("INSERT OVERWRITE gcat.fw.t PARTITION (day = 'd1') " +
      "SELECT id FROM range(5)")
    spark.sql("INSERT OVERWRITE gcat.fw.t PARTITION (day = 'd1') " +
      "SELECT id FROM range(3)")
    val got = spark.sql(
      "SELECT day, count(*) AS n FROM gcat.fw.t GROUP BY day")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("d1", 3L)), s"$got")
  }

  test("clause-less INSERT OVERWRITE under partitionOverwriteMode=" +
    "dynamic replaces exactly the partitions the batch mentions " +
    "(native BatchWrite; no V1 fallback exists for this plan)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dyn")
    spark.sql("CREATE TABLE gcat.dyn.t (id BIGINT, day STRING) " +
      "USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO gcat.dyn.t VALUES " +
      "(1, 'd1'), (2, 'd1'), (3, 'd2'), (4, 'd3')")
    val prev = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
      "dynamic")
    try {
      // no PARTITION clause: the touched set comes from the data —
      // d1 is replaced (2 rows -> 1), d2 replaced, d3 untouched
      spark.sql("INSERT OVERWRITE gcat.dyn.t VALUES " +
        "(10, 'd1'), (30, 'd2'), (31, 'd2')")
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset(
        "spark.sql.sources.partitionOverwriteMode")
    }
    val got = spark.sql(
      "SELECT day, sort_array(collect_list(id)) FROM gcat.dyn.t " +
        "GROUP BY day ORDER BY day")
      .as[(String, Seq[Long])].collect().toSeq
    assert(got === Seq(("d1", Seq(10L)), ("d2", Seq(30L, 31L)),
      ("d3", Seq(4L))), s"$got")
    // static mode keeps planning OverwriteByExpression(AlwaysTrue):
    // a clause-less overwrite vacates EVERYTHING
    spark.sql("INSERT OVERWRITE gcat.dyn.t VALUES (99, 'd9')")
    assert(spark.table("gcat.dyn.t").count() === 1)
  }

  test("ALTER TABLE ADD COLUMNS: reads null-fill the new column " +
    "until data carries it, the table flips to sync evolution, and " +
    "positional binding of the old columns never shifts") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ddl")
    spark.sql("CREATE TABLE gcat.ddl.t (id BIGINT, v STRING) " +
      "USING graft")
    spark.sql("INSERT INTO gcat.ddl.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gcat.ddl.t ADD COLUMNS (score BIGINT)")
    // declared-but-unwritten column null-fills on read
    val afterAlter = spark.sql(
      "SELECT id, v, score FROM gcat.ddl.t ORDER BY id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(afterAlter === Seq((1L, "a", None), (2L, "b", None)))
    // the next INSERT may write it (the ALTER flipped schemaMode=sync)
    spark.sql("INSERT INTO gcat.ddl.t VALUES (3, 'c', 30)")
    val got = spark.sql(
      "SELECT id, v, score FROM gcat.ddl.t ORDER BY id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got === Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L))), s"$got")
    // and row-level SQL sees/sets it
    spark.sql("UPDATE gcat.ddl.t SET score = id * 10 " +
      "WHERE score IS NULL")
    val scores = spark.sql(
      "SELECT sort_array(collect_list(score)) FROM gcat.ddl.t")
      .as[Seq[Long]].head()
    assert(scores === Seq(10L, 20L, 30L))
    // guards: duplicate / non-nullable-ish misuse fails loudly
    val dup = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.ddl.t ADD COLUMNS (score BIGINT)"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
  }

  test("TRUNCATE TABLE is a merge-on-read full mask (zero data-file " +
    "rewrite); time travel still sees the rows") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tr")
    spark.sql("CREATE TABLE gcat.tr.t (id BIGINT) USING graft")
    spark.sql("INSERT INTO gcat.tr.t SELECT id FROM range(12)")
    spark.sql("TRUNCATE TABLE gcat.tr.t")
    assert(spark.table("gcat.tr.t").count() === 0)
    assert(spark.sql("SELECT count(*) FROM gcat.tr.t VERSION AS OF 1")
      .head.getLong(0) === 12,
      "truncate must not rewrite the committed data")
    spark.sql("INSERT INTO gcat.tr.t VALUES (99)")
    assert(spark.table("gcat.tr.t").as[Long].collect().toSeq ===
      Seq(99L))
  }

  test("catalog reads engage the same sidecar pruning as path reads") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.pr")
    spark.sql("CREATE TABLE gcat.pr.z (id BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    val df = spark.range(0, 4000)
      .select(col("id"), (col("id") * 7).as("v"))
      .repartitionByRange(8, col("id"))
    df.write.format("graft").mode("append").option("keys", "id")
      .save(s"$wh/pr/z")
    val q = spark.sql(
      "SELECT sum(v) FROM gcat.pr.z WHERE id BETWEEN 100 AND 300")
    val want = (100L to 300L).map(_ * 7).sum
    assert(q.head.getLong(0) === want)
    val d = graft.sources.GraftScanAudit.last.get
    assert(d.filesScanned < d.filesTotal,
      s"catalog read pruned nothing: ${d.filesScanned}/${d.filesTotal}")
    assert(q.queryExecution.executedPlan.toString
      .contains("PushedFilters"))
  }

  test("atomic CTAS: CREATE TABLE AS SELECT publishes a complete " +
    "table; partitioned + keyed properties ride through; REPLACE " +
    "TABLE AS SELECT swaps contents; CREATE OR REPLACE creates") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    spark.range(6).selectExpr("id", "CAST(id % 2 AS STRING) AS day",
        "id * 10 AS v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE gcat.ctas.c USING graft " +
      "PARTITIONED BY (day) TBLPROPERTIES ('keys' = 'id') " +
      "AS SELECT id, day, v FROM ctas_src")
    assert(spark.sql("SELECT id, v FROM gcat.ctas.c ORDER BY id")
      .as[(Long, Long)].collect().toSeq ===
      (0L to 5L).map(i => (i, i * 10)))
    // the staged write ran the full native path: partitioned manifest
    // + declared keys honored by a later INSERT (upsert, not dup)
    val root = s"$wh/ctas/c"
    assert(VersionedTable.readPartitionedManifest(root).isDefined)
    spark.sql("INSERT INTO gcat.ctas.c VALUES (2, '0', 999)")
    assert(spark.sql("SELECT v FROM gcat.ctas.c WHERE id = 2")
      .as[Long].collect().toSeq === Seq(999L))
    // RTAS: full swap, schema change included
    spark.sql("REPLACE TABLE gcat.ctas.c USING graft " +
      "AS SELECT id, v * 2 AS w FROM ctas_src WHERE id < 3")
    assert(spark.table("gcat.ctas.c").columns.toSeq ===
      Seq("id", "w"))
    assert(spark.sql("SELECT id, w FROM gcat.ctas.c ORDER BY id")
      .as[(Long, Long)].collect().toSeq ===
      Seq((0L, 0L), (1L, 20L), (2L, 40L)))
    // CREATE OR REPLACE on a nonexistent table creates it
    spark.sql("CREATE OR REPLACE TABLE gcat.ctas.c2 USING graft " +
      "AS SELECT id FROM ctas_src WHERE id = 4")
    assert(spark.sql("SELECT id FROM gcat.ctas.c2")
      .as[Long].collect().toSeq === Seq(4L))
    // zero-row CTAS: the declared-schema empty table publishes (the
    // zero-row write no-ops, the stub still lands atomically)
    spark.sql("CREATE TABLE gcat.ctas.c0 USING graft " +
      "AS SELECT id, v FROM ctas_src WHERE id < 0")
    assert(spark.table("gcat.ctas.c0").columns.toSeq ===
      Seq("id", "v"))
    assert(spark.sql("SELECT count(*) FROM gcat.ctas.c0")
      .head.getLong(0) === 0L)
    spark.sql("INSERT INTO gcat.ctas.c0 VALUES (1, 11)")
    assert(spark.sql("SELECT count(*) FROM gcat.ctas.c0")
      .head.getLong(0) === 1L)
    // REPLACE of a nonexistent table still fails loudly
    val e = intercept[Exception](spark.sql(
      "REPLACE TABLE gcat.ctas.missing USING graft " +
        "AS SELECT 1 AS x"))
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("external-LOCATION CTAS/RTAS (r16): data publishes atomically " +
    "AT the location; a failing write leaves ZERO debris at or next " +
    "to the external path; occupied locations are rejected; RTAS " +
    "swaps with rollback; DROP keeps the external data") {
    wh
    def dotEntries(p: java.nio.file.Path): Seq[String] = {
      val s = java.nio.file.Files.list(p)
      try s.toArray.toSeq.map(_.toString.split('/').last)
        .filter(_.startsWith("."))
      finally s.close()
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ext")
    val extBase = java.nio.file.Files.createTempDirectory("gcat_ext")
    val loc = s"$extBase/t1"
    spark.range(5).selectExpr("id", "id * 7 AS v")
      .createOrReplaceTempView("ext_src")
    spark.sql(s"CREATE TABLE gcat.ext.e USING graft " +
      s"LOCATION '$loc' AS SELECT id, v FROM ext_src")
    assert(spark.sql("SELECT sum(v) FROM gcat.ext.e")
      .head.getLong(0) === 70L)
    // data lives AT the external location — a complete committed
    // graft table, path-readable; no staging debris next to it
    assert(VersionedTable.readManifest(loc).isDefined)
    assert(spark.read.format("graft").load(loc).count() === 5L)
    assert(dotEntries(extBase).isEmpty, dotEntries(extBase).toString)
    // failing CTAS into a second location: the external path was
    // never created, no hidden sibling remains, no catalog entry
    val loc2 = s"$extBase/t2"
    spark.udf.register("ext_boom", udf((i: Long) =>
      if (i >= 0) throw new RuntimeException("ext boom") else i))
    intercept[Exception](spark.sql(
      s"CREATE TABLE gcat.ext.e2 USING graft LOCATION '$loc2' " +
        "AS SELECT ext_boom(id) AS id FROM ext_src"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(loc2)))
    assert(dotEntries(extBase).isEmpty, dotEntries(extBase).toString)
    assert(spark.sql("SHOW TABLES IN gcat.ext").count() === 1)
    // CREATE into an already-occupied location is rejected loudly
    val occ = intercept[Exception](spark.sql(
      s"CREATE TABLE gcat.ext.e3 USING graft LOCATION '$loc' " +
        "AS SELECT 1 AS x"))
    assert(occ.getMessage.contains("already holds data"),
      occ.getMessage)
    // RTAS swaps the external data in place; a failing RTAS keeps
    // BOTH the old table and the old external data intact
    spark.sql(s"REPLACE TABLE gcat.ext.e USING graft " +
      s"LOCATION '$loc' " +
      "AS SELECT id, v * 2 AS w FROM ext_src WHERE id < 3")
    assert(spark.sql("SELECT sum(w) FROM gcat.ext.e")
      .head.getLong(0) === 42L)
    intercept[Exception](spark.sql(
      s"REPLACE TABLE gcat.ext.e USING graft LOCATION '$loc' " +
        "AS SELECT ext_boom(id) AS id FROM ext_src"))
    assert(spark.sql("SELECT sum(w) FROM gcat.ext.e")
      .head.getLong(0) === 42L)
    assert(dotEntries(extBase).isEmpty, dotEntries(extBase).toString)
    // DROP removes the catalog entry, keeps the external data
    spark.sql("DROP TABLE gcat.ext.e")
    assert(spark.sql("SHOW TABLES IN gcat.ext").count() === 0)
    assert(VersionedTable.readManifest(loc).isDefined)
    // PARTITIONED external CTAS: the staged write runs the full
    // partitioned native path, and the move publishes the
    // partitioned manifest at the location
    val locP = s"$extBase/t3"
    spark.sql(s"CREATE TABLE gcat.ext.ep USING graft " +
      s"PARTITIONED BY (day) LOCATION '$locP' AS " +
      "SELECT id, CAST(id % 2 AS STRING) AS day, v FROM ext_src")
    assert(VersionedTable.readPartitionedManifest(locP).isDefined)
    assert(spark.sql(
      "SELECT sum(v) FROM gcat.ext.ep WHERE day = '1'")
      .head.getLong(0) === 28L) // ids 1, 3 → 7 + 21
    assert(dotEntries(extBase).isEmpty, dotEntries(extBase).toString)
  }

  test("a failing CTAS leaves NO catalog entry, no visible table, " +
    "and a failing RTAS keeps the OLD table intact") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas2")
    val boom = udf((i: Long) =>
      if (i > 2) throw new RuntimeException("ctas boom") else i)
    spark.udf.register("ctas_boom", boom)
    spark.range(6).createOrReplaceTempView("ctas2_src")
    intercept[Exception](spark.sql(
      "CREATE TABLE gcat.ctas2.f USING graft " +
        "AS SELECT ctas_boom(id) AS id FROM ctas2_src"))
    // no entry, not listed, not loadable — and a retry succeeds
    // (no TableAlreadyExists on leftover debris)
    assert(spark.sql("SHOW TABLES IN gcat.ctas2").count() === 0)
    intercept[Exception](spark.table("gcat.ctas2.f").collect())
    spark.sql("CREATE TABLE gcat.ctas2.f USING graft " +
      "AS SELECT id FROM ctas2_src WHERE id <= 2")
    assert(spark.sql("SELECT count(*) FROM gcat.ctas2.f")
      .head.getLong(0) === 3L)
    // failing RTAS: old contents survive untouched
    intercept[Exception](spark.sql(
      "REPLACE TABLE gcat.ctas2.f USING graft " +
        "AS SELECT ctas_boom(id) AS id FROM ctas2_src"))
    assert(spark.sql("SELECT count(*) FROM gcat.ctas2.f")
      .head.getLong(0) === 3L)
  }
}
