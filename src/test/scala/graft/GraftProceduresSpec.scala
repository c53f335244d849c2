package graft

import java.nio.file.Files
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._

/** SQL CALL-able table maintenance (`ProcedureCatalog`): every
  * procedure is a spelling of an already-graded verb — these tests
  * pin the spelling (argument binding, named args, defaults, result
  * rows) and the catalog-side resolution (ns.t refs, external
  * locations, keys from the stub).
  */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_proc_wh").toString
    spark.conf.set("spark.sql.catalog.pcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcat.m")
    dir
  }

  test("CALL vacuum folds both delete families (MoR → COW flip) and " +
    "reports the rewrite decision") {
    wh
    spark.sql("CREATE TABLE pcat.m.v (id BIGINT, x BIGINT) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO pcat.m.v SELECT id, id FROM range(100)")
    spark.sql("DELETE FROM pcat.m.v WHERE id < 10") // pos deletes
    val root = s"$wh/m/v"
    VersionedTable.softDelete(spark, root,
      Seq(50L, 51L).toDF("id"), Seq("id")) // equality deletes
    assert(spark.table("pcat.m.v").count() === 88)
    val r = spark.sql("CALL pcat.system.vacuum(table => 'm.v')")
    val row = r.head
    assert(r.columns.toSeq ===
      Seq("version", "eq_folded", "pos_files_rewritten"))
    assert(row.getBoolean(1) === true)
    assert(row.getInt(2) > 0)
    // same rows, physically applied now
    assert(spark.table("pcat.m.v").count() === 88)
    val (liveEntries, _) =
      VersionedTable.posDeleteEntryCounts(spark, root)
    assert(liveEntries === 0L)
  }

  test("CALL compact merges small files per partition; positional " +
    "args + defaults work") {
    wh
    spark.sql("CREATE TABLE pcat.m.c (id BIGINT, day STRING) " +
      "USING graft PARTITIONED BY (day)")
    // 3 appends → 3 files per touched partition
    (1 to 3).foreach { i =>
      spark.sql(s"INSERT INTO pcat.m.c VALUES (${i}0, 'd1'), " +
        s"(${i}1, 'd2')")
    }
    val r = spark.sql("CALL pcat.system.compact('m.c')").head
    assert(r.getInt(1) === 2, s"both partitions had 3 files: $r")
    assert(spark.table("pcat.m.c").count() === 6)
  }

  test("CALL zorder reclusters a flat table; an interval read then " +
    "prunes") {
    wh
    spark.sql("CREATE TABLE pcat.m.z (x BIGINT, y BIGINT) USING graft")
    spark.range(0, 4096).select((col("id") % 64).as("x"),
        floor(col("id") / 64).cast("long").as("y"))
      .write.format("graft").mode("append").save(s"$wh/m/z")
    spark.sql(
      "CALL pcat.system.zorder(table => 'm.z', cols => 'x,y', " +
        "num_files => 16)")
    val q = spark.sql("SELECT count(*) FROM pcat.m.z " +
      "WHERE x BETWEEN 0 AND 7 AND y BETWEEN 0 AND 7")
    assert(q.head.getLong(0) === 64)
    val dec = graft.sources.GraftScanAudit.last.get
    assert(dec.filesScanned < dec.filesTotal,
      s"z-order rectangle read pruned nothing: $dec")
  }

  test("CALL set_ref (default = live version) pins a snapshot; " +
    "drop_ref removes it; remove_orphans reports zero on a clean " +
    "table") {
    wh
    spark.sql("CREATE TABLE pcat.m.r (id BIGINT) USING graft " +
      "TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO pcat.m.r SELECT id FROM range(5)")
    val r1 = spark.sql(
      "CALL pcat.system.set_ref(table => 'm.r', name => 'stable')")
      .head
    assert(r1.getString(0) === "stable" && r1.getLong(1) === 1L)
    spark.sql("INSERT INTO pcat.m.r SELECT id FROM range(5, 8)")
    assert(spark.sql(
      "SELECT count(*) FROM pcat.m.r VERSION AS OF 'stable'")
      .head.getLong(0) === 5L)
    val r2 = spark.sql(
      "CALL pcat.system.drop_ref(table => 'm.r', name => 'stable')")
      .head
    assert(r2.getLong(1) === 1L)
    assert(VersionedTable.refs(s"$wh/m/r").isEmpty)
    val ro = spark.sql(
      "CALL pcat.system.remove_orphans(table => 'm.r', " +
        "older_than_hours => 0)").head
    assert(ro.getInt(0) === 0 && ro.getInt(2) === 0, s"$ro")
  }

  test("unknown procedure and flat-table compact fail loudly") {
    wh
    val e1 = intercept[Exception](
      spark.sql("CALL pcat.system.nope(table => 'm.v')"))
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    spark.sql("CREATE TABLE pcat.m.f (id BIGINT) USING graft")
    spark.sql("INSERT INTO pcat.m.f SELECT id FROM range(3)")
    val e2 = intercept[Exception](
      spark.sql("CALL pcat.system.compact('m.f')"))
    assert(e2.getMessage.contains("flat"), e2.getMessage)
  }

  test("CALL expire_snapshots bounds the history: entries beyond " +
    "retain_last drop, their unshared dirs reclaim, refs and the " +
    "live version survive, expired versions fail time travel loudly") {
    wh
    spark.sql("CREATE TABLE pcat.m.ex (id BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    (1 to 2).foreach(i => spark.sql(
      s"INSERT INTO pcat.m.ex VALUES ($i, ${i * 10})"))
    // tag v2 BEFORE retention can prune its dir — the ref must pin
    // it through retention AND the expiry
    spark.sql("CALL pcat.system.set_ref(table => 'm.ex', " +
      "name => 'keepme', version => 2)")
    (3 to 6).foreach(i => spark.sql(
      s"INSERT INTO pcat.m.ex VALUES ($i, ${i * 10})"))
    val root = s"$wh/m/ex"
    assert(VersionedTable.versions(root).size >= 2)
    val r = spark.sql("CALL pcat.system.expire_snapshots(" +
      "table => 'm.ex', retain_last => 2)").head
    assert(r.getLong(0) === 6L)
    assert(r.getInt(1) === 3, s"$r") // v1,v3,v4 expire (v2 ref-pinned)
    val vs = graft.sinks.VersionedTable
      .mainlineVersions(root).toSet ++
      VersionedTable.versions(root).toSet
    assert(VersionedTable.versions(root).toSet === Set(2L, 5L, 6L),
      s"$vs")
    // live read + ref read intact; expired version fails loudly
    assert(spark.table("pcat.m.ex").count() === 6)
    assert(VersionedTable.readRef(spark, root, "keepme").count() === 2)
    val e = intercept[Exception](
      VersionedTable.readVersion(spark, root, 3L))
    assert(e.getMessage.contains("never committed") ||
      e.getMessage.contains("pruned"), e.getMessage)
  }

  test("unknown procedure raises the standard ROUTINE_NOT_FOUND " +
    "condition (not a bare IllegalArgumentException), for name and " +
    "namespace misses alike") {
    wh
    def condition(t: Throwable): Option[String] = {
      var cur = t
      while (cur != null) {
        cur match {
          case a: org.apache.spark.sql.AnalysisException
              if a.getCondition != null => return Some(a.getCondition)
          case _ => ()
        }
        cur = cur.getCause
      }
      None
    }
    val e1 = intercept[Exception](
      spark.sql("CALL pcat.system.frobnicate(table => 'm.v')"))
    assert(condition(e1).contains("ROUTINE_NOT_FOUND"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("CALL pcat.nosuchns.vacuum(table => 'm.v')"))
    assert(condition(e2).contains("ROUTINE_NOT_FOUND"), e2.getMessage)
  }

  test("a quoted table segment containing a dot resolves through the " +
    "SQL identifier parser (ns.`a.b`), not a raw split") {
    wh
    spark.sql("CREATE TABLE pcat.m.`a.b` (id BIGINT, x BIGINT) " +
      "USING graft TBLPROPERTIES ('keys' = 'id')")
    spark.sql("INSERT INTO pcat.m.`a.b` SELECT id, id FROM range(20)")
    spark.sql("DELETE FROM pcat.m.`a.b` WHERE id < 5")
    val r = spark.sql(
      "CALL pcat.system.vacuum(table => 'm.`a.b`')").head
    assert(r.getInt(2) > 0, "vacuum must fold the dotted table's " +
      "pos deletes — wrong-path resolution would NoSuchTable or no-op")
    assert(spark.table("pcat.m.`a.b`").count() === 15)
  }
}
