package graft

import java.nio.file.Files
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._

/** SQL row-level DML on graft tables — UPDATE, MERGE INTO, and
  * DELETE-with-subquery through the post-hoc rewrite
  * (graft.plans.GraftSqlRules), executing as copy-on-write commits
  * against the versioned store. Partitioned statements must rewrite
  * ONLY touched partitions (pointer-identity asserted).
  */
class GraftRowLevelSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_rl_wh").toString
    spark.conf.set("spark.sql.catalog.rcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rcat.rl")
    dir
  }

  test("UPDATE on a flat table: matching rows transformed, NULL " +
    "condition keeps, old snapshot time-travelable; no-match UPDATE " +
    "commits nothing") {
    wh
    spark.sql("CREATE TABLE rcat.rl.u (id BIGINT, v BIGINT, s STRING) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.u VALUES " +
      "(1, 10, 'a'), (2, 20, 'b'), (3, 30, NULL), (4, 40, 'a')")
    spark.sql("UPDATE rcat.rl.u SET v = v * 2, s = upper(s) " +
      "WHERE s = 'a'")
    val got = spark.sql("SELECT id, v, s FROM rcat.rl.u ORDER BY id")
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got === Seq((1L, 20L, Some("A")), (2L, 20L, Some("b")),
      (3L, 30L, None), (4L, 80L, Some("A"))), s"$got")
    // pre-update snapshot intact
    val v1 = spark.sql(
      "SELECT v FROM rcat.rl.u VERSION AS OF 1 WHERE id = 1")
    assert(v1.head.getLong(0) === 10L)
    val verBefore = VersionedTable.readManifest(s"$wh/rl/u").get.version
    spark.sql("UPDATE rcat.rl.u SET v = 0 WHERE id = 999")
    assert(VersionedTable.readManifest(s"$wh/rl/u").get.version ===
      verBefore, "a no-match UPDATE must not commit")
  }

  test("UPDATE with a subquery condition (the predicate the MoR " +
    "DELETE path can never translate)") {
    wh
    spark.sql("CREATE TABLE rcat.rl.usq (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.usq SELECT id, id FROM range(10)")
    Seq(2L, 5L, 7L).toDF("bad").createOrReplaceTempView("rl_bad")
    spark.sql("UPDATE rcat.rl.usq SET v = -1 " +
      "WHERE id IN (SELECT bad FROM rl_bad)")
    val neg = spark.sql(
      "SELECT sort_array(collect_list(id)) FROM rcat.rl.usq " +
        "WHERE v = -1").as[Seq[Long]].head()
    assert(neg === Seq(2L, 5L, 7L))
  }

  test("nondeterministic UPDATE/DELETE conditions and assignment " +
    "values are rejected loudly (they evaluate in more than one job " +
    "and would drop or duplicate rows); a zero-row INSERT into a " +
    "committed table commits nothing") {
    wh
    spark.sql("CREATE TABLE rcat.rl.nd (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.nd SELECT id, id FROM range(6)")
    val root = s"$wh/rl/nd"
    val e1 = intercept[Exception](spark.sql(
      "UPDATE rcat.rl.nd SET v = 0 WHERE rand() < 0.5 AND id >= 0 " +
        "AND id IN (SELECT id FROM range(3))"))
    assert(e1.getMessage.contains("deterministic"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "UPDATE rcat.rl.nd SET v = CAST(rand() * 10 AS BIGINT) " +
        "WHERE id = 1"))
    assert(e2.getMessage.contains("deterministic"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "DELETE FROM rcat.rl.nd WHERE rand() < 0.5 " +
        "AND id IN (SELECT id FROM range(3))"))
    assert(e3.getMessage.contains("deterministic"), e3.getMessage)
    // nothing above may have committed, and neither may an INSERT
    // that stages zero rows (no-op append: no version bump, no
    // retention churn)
    val ver = VersionedTable.readManifest(root).get.version
    spark.sql("INSERT INTO rcat.rl.nd SELECT id, id FROM range(6) " +
      "WHERE id < 0")
    assert(VersionedTable.readManifest(root).get.version === ver,
      "a zero-row INSERT into a committed table must not commit")
    assert(spark.table("rcat.rl.nd").count() === 6)
  }

  test("partitioned UPDATE rewrites ONLY the touched partitions " +
    "(untouched pointers keep their version dir), and an assignment " +
    "may move rows across partitions") {
    wh
    spark.sql("CREATE TABLE rcat.rl.p (id BIGINT, day STRING, " +
      "v BIGINT) USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO rcat.rl.p VALUES " +
      "(1, 'd1', 10), (2, 'd1', 20), (3, 'd2', 30), (4, 'd3', 40)")
    val root = s"$wh/rl/p"
    val before = VersionedTable.readPartitionedManifest(root).get
    spark.sql("UPDATE rcat.rl.p SET v = v + 1 WHERE day = 'd1'")
    val after = VersionedTable.readPartitionedManifest(root).get
    assert(after.partitions("day=d2") === before.partitions("day=d2"),
      "untouched d2 pointer must survive the UPDATE as-is")
    assert(after.partitions("day=d3") === before.partitions("day=d3"))
    assert(after.partitions("day=d1") !== before.partitions("day=d1"))
    val got = spark.sql("SELECT id, v FROM rcat.rl.p ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 11L), (2L, 21L), (3L, 30L), (4L, 40L)))
    // partition-moving assignment: row 3 migrates d2 -> d9
    spark.sql("UPDATE rcat.rl.p SET day = 'd9' WHERE id = 3")
    val moved = spark.sql(
      "SELECT day, count(*) FROM rcat.rl.p GROUP BY day ORDER BY day")
      .as[(String, Long)].collect().toSeq
    assert(moved === Seq(("d1", 2L), ("d3", 1L), ("d9", 1L)), s"$moved")
    val m2 = VersionedTable.readPartitionedManifest(root).get
    assert(!m2.partitions.contains("day=d2"),
      "fully-vacated d2 must lose its pointer")
  }

  test("DELETE with a subquery routes through the COW rewrite; " +
    "simple predicates keep the MoR position-delete fast path") {
    wh
    spark.sql("CREATE TABLE rcat.rl.d (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.d SELECT id, id * 10 FROM range(10)")
    val root = s"$wh/rl/d"
    // simple predicate: MoR — no data rewrite, version stays, entries
    spark.sql("DELETE FROM rcat.rl.d WHERE id >= 8")
    assert(VersionedTable.readManifest(root).get.version === 1L,
      "translatable DELETE must stay merge-on-read (no rewrite)")
    val (live1, _) = VersionedTable.posDeleteEntryCounts(spark, root)
    assert(live1 === 2L)
    // subquery predicate: COW — new version, rows physically gone,
    // and the rewrite folds the pending position deletes
    Seq(1L, 3L).toDF("bad").createOrReplaceTempView("rl_dbad")
    spark.sql("DELETE FROM rcat.rl.d " +
      "WHERE id IN (SELECT bad FROM rl_dbad)")
    assert(VersionedTable.readManifest(root).get.version === 2L)
    val left = spark.sql("SELECT sort_array(collect_list(id)) " +
      "FROM rcat.rl.d").as[Seq[Long]].head()
    assert(left === Seq(0L, 2L, 4L, 5L, 6L, 7L))
    val (live2, _) = VersionedTable.posDeleteEntryCounts(spark, root)
    assert(live2 === 0L, "COW rewrite must fold pending pos deletes")
  }

  test("MERGE INTO: conditional matched update + matched delete + " +
    "not-matched insert + not-matched-by-source delete, in one " +
    "statement; only touched partitions rewritten") {
    wh
    spark.sql("CREATE TABLE rcat.rl.m (id BIGINT, day STRING, " +
      "v BIGINT) USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO rcat.rl.m VALUES " +
      "(1, 'd1', 10), (2, 'd1', 20), (3, 'd2', 30), (4, 'd3', 40), " +
      "(5, 'd4', 50)")
    val root = s"$wh/rl/m"
    val before = VersionedTable.readPartitionedManifest(root).get
    Seq((1L, "d1", 100L), (2L, "d1", -1L), (9L, "d99", 90L))
      .toDF("id", "day", "v").createOrReplaceTempView("rl_src")
    spark.sql("""
      MERGE INTO rcat.rl.m t USING rl_src s ON t.id = s.id
      WHEN MATCHED AND s.v < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, day, v) VALUES (s.id, s.day, s.v)
      WHEN NOT MATCHED BY SOURCE AND t.day = 'd4' THEN DELETE
    """)
    val got = spark.sql("SELECT id, day, v FROM rcat.rl.m ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "d1", 100L), (3L, "d2", 30L),
      (4L, "d3", 40L), (9L, "d99", 90L)), s"$got")
    val after = VersionedTable.readPartitionedManifest(root).get
    assert(after.partitions("day=d2") === before.partitions("day=d2"),
      "d2 (no matches, no clauses apply) must keep its pointer")
    assert(after.partitions("day=d3") === before.partitions("day=d3"))
    assert(!after.partitions.contains("day=d4"),
      "by-source delete fully vacated d4")
    assert(after.partitions.contains("day=d99"), "insert created d99")
  }

  test("MERGE cardinality violation: two source rows acting on one " +
    "target row raises; a no-clause multi-match keeps exactly one " +
    "copy of the target row") {
    wh
    spark.sql("CREATE TABLE rcat.rl.mc (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.mc VALUES (1, 10), (2, 20)")
    Seq((1L, 5L), (1L, 6L)).toDF("id", "v")
      .createOrReplaceTempView("rl_dup")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO rcat.rl.mc t USING rl_dup s " +
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(e.getMessage.contains("cardinality"), e.getMessage)
    // conditional clause that matches NEITHER duplicate: target row
    // must survive exactly once
    spark.sql("MERGE INTO rcat.rl.mc t USING rl_dup s " +
      "ON t.id = s.id WHEN MATCHED AND s.v > 100 THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    val got = spark.sql("SELECT id, v FROM rcat.rl.mc ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L), (2L, 20L)), s"$got")
  }

  test("MERGE into a flat table via UPDATE SET * / INSERT * star " +
    "expansion, driving the keyed-upsert shape in pure SQL") {
    wh
    spark.sql("CREATE TABLE rcat.rl.ms (id BIGINT, v STRING) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.ms VALUES (1, 'a'), (2, 'b')")
    Seq((2L, "B"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("rl_star")
    spark.sql("MERGE INTO rcat.rl.ms t USING rl_star s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    val got = spark.sql("SELECT id, v FROM rcat.rl.ms ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a"), (2L, "B"), (3L, "c")), s"$got")
  }

  test("subquery DML under the stats-broadcast rule: the rule must " +
    "not plant a BROADCAST hint on an illegal build side (the left " +
    "side of an IN-subquery's ExistenceJoin) — regression for the " +
    "full-suite-order failure") {
    wh
    graft.plans.GraftBroadcastStats.install(spark)
    spark.sql("CREATE TABLE rcat.rl.bs (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.bs SELECT id, id FROM range(10)")
    Seq(4L, 6L).toDF("bad").createOrReplaceTempView("rl_bsbad")
    // pre-fix: SparkStrategies.JoinSelection rejected the planted
    // left-side hint on the existence join and the whole UPDATE died
    spark.sql("UPDATE rcat.rl.bs SET v = -1 " +
      "WHERE id IN (SELECT bad FROM rl_bsbad)")
    val neg = spark.sql("SELECT sort_array(collect_list(id)) " +
      "FROM rcat.rl.bs WHERE v = -1").as[Seq[Long]].head()
    assert(neg === Seq(4L, 6L))
    spark.sql("DELETE FROM rcat.rl.bs " +
      "WHERE id IN (SELECT bad + 1 FROM rl_bsbad)")
    assert(spark.table("rcat.rl.bs").count() === 8)
  }

  test("flat row-level rewrite CAS-checks the EQUALITY-delete " +
    "version: a concurrent softDelete between read and flip aborts " +
    "instead of out-sequencing (un-deleting) the fresh entries") {
    wh
    import org.apache.spark.sql.functions.lit
    val root = tmpDir("graft_rl_eqrace")
    VersionedTable.upsert(spark, root,
      spark.range(10).toDF("id").withColumn("v", lit(1L)), Seq("id"))
    val ver = VersionedTable.readManifest(root).get.version
    val pv = VersionedTable.posDeleteVersion(root)
    val ev = VersionedTable.eqDeleteVersion(root)
    // the "concurrent" equality delete lands after the pin
    VersionedTable.softDelete(spark, root, Seq(3L).toDF("id"),
      Seq("id"))
    val content = spark.range(10).toDF("id").withColumn("v", lit(2L))
    val e = intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.rewriteLive(spark, root, content, ver, pv, ev)
    }
    assert(e.getMessage.contains("equality deletes"), e.getMessage)
    // re-pinned attempt succeeds, and the delete still masks
    val ev2 = VersionedTable.eqDeleteVersion(root)
    VersionedTable.rewriteLive(spark, root,
      content.filter(col("id") =!= 3), ver, pv, ev2)
    assert(VersionedTable.readLiveWithDeletes(spark, root, Seq("id"))
      .count() === 9)
  }

  test("UPDATE/MERGE refresh cached plans over the target (a CACHE " +
    "TABLE'd graft table must not serve the pre-DML snapshot)") {
    wh
    spark.sql("CREATE TABLE rcat.rl.cc (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.cc SELECT id, id FROM range(6)")
    spark.sql("CACHE TABLE rcat.rl.cc")
    assert(spark.table("rcat.rl.cc").count() === 6) // materialize
    spark.sql("UPDATE rcat.rl.cc SET v = 99 WHERE id < 2")
    val got = spark.sql(
      "SELECT sum(v) FROM rcat.rl.cc").head.getLong(0)
    assert(got === (99L * 2 + 2 + 3 + 4 + 5),
      s"cached plan served stale rows: sum(v) = $got")
    spark.sql("UNCACHE TABLE rcat.rl.cc")
  }

  test("partitioned UPDATE's rewrite read engages partition pruning " +
    "(the touched-partition predicate pushes into the scan — work " +
    "per statement scales with touched partitions, not the table)") {
    wh
    spark.sql("CREATE TABLE rcat.rl.pr (id BIGINT, day STRING, " +
      "v BIGINT) USING graft PARTITIONED BY (day)")
    val rows = (0L until 40L)
      .map(i => (i, s"d${i % 8}", i))
    import spark.implicits._
    rows.toDF("id", "day", "v").createOrReplaceTempView("rl_pr_src")
    spark.sql("INSERT INTO rcat.rl.pr SELECT * FROM rl_pr_src")
    spark.sql("UPDATE rcat.rl.pr SET v = v + 100 WHERE day = 'd3'")
    // the LAST DSv2 scan in the statement is the replacement read,
    // filtered by the touched predicate over partition columns
    val dec = graft.sources.GraftScanAudit.last.get
    assert(dec.partitionsScanned < dec.partitionsTotal,
      s"UPDATE's rewrite read scanned every partition: $dec")
    val got = spark.sql(
      "SELECT sum(v) FROM rcat.rl.pr WHERE day = 'd3'")
      .head.getLong(0)
    assert(got === (3L + 11 + 19 + 27 + 35) + 500)
  }

  test("six racing SQL UPDATEs serialize through the write-conflict " +
    "protocol: every increment lands exactly once (no lost updates)") {
    wh
    spark.sql("CREATE TABLE rcat.rl.race (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.race SELECT id, 0 FROM range(20)")
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(6)
    try {
      val futs = (1 to 6).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            spark.sql("UPDATE rcat.rl.race SET v = v + 1")
            ()
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    val vs = spark.sql("SELECT DISTINCT v FROM rcat.rl.race")
      .as[Long].collect().toSeq
    assert(vs === Seq(6L),
      s"racing UPDATEs lost or doubled increments: distinct v = $vs")
    assert(spark.table("rcat.rl.race").count() === 20)
  }

  test("UPDATE folds pending MoR deletes instead of resurrecting " +
    "them (the un-delete class)") {
    wh
    spark.sql("CREATE TABLE rcat.rl.f (id BIGINT, v BIGINT) " +
      "USING graft")
    spark.sql("INSERT INTO rcat.rl.f SELECT id, id FROM range(6)")
    spark.sql("DELETE FROM rcat.rl.f WHERE id = 4") // MoR entry
    spark.sql("UPDATE rcat.rl.f SET v = 99 WHERE id <= 1")
    val got = spark.sql("SELECT id, v FROM rcat.rl.f ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 99L), (1L, 99L), (2L, 2L), (3L, 3L),
      (5L, 5L)), s"deleted id=4 must stay deleted: $got")
  }
}
