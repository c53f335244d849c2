package graft

import java.nio.file.Files
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._

/** Branch writes (write-audit-publish): a batch lands on a named
  * branch (real version + history entry + ref; main untouched), the
  * quality gate reads the branch, fast-forward publishes. Pins the
  * isolation (main blind to branch commits, CDF/TIMESTAMP AS OF skip
  * them), the CAS (main moved since fork → publish refuses), the
  * failed-gate path (nothing to undo), retention safety (branch head
  * pinned; live dir survives numerically-newer branch dirs), and the
  * SQL/DSv2 spelling (write option `branch`, CALL fast_forward).
  */
class BranchWapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_wap_wh").toString
    spark.conf.set("spark.sql.catalog.wcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wcat.m")
    dir
  }

  test("flat WAP: branch commits invisible to main; gate reads the " +
    "branch; fast-forward publishes as a fresh main-line version; " +
    "branch refs consumed") {
    wh
    val root = s"$wh/m/f"
    VersionedTable.append(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    VersionedTable.appendToBranch(spark, root,
      Seq((3L, 30L)).toDF("id", "v"), "wap")
    VersionedTable.appendToBranch(spark, root,
      Seq((4L, -40L)).toDF("id", "v"), "wap")
    // main is blind to the branch
    assert(VersionedTable.readLive(spark, root).count() === 2)
    assert(VersionedTable.readManifest(root).get.version === 1L)
    // the gate reads the BRANCH (both spellings)
    assert(VersionedTable.readRef(spark, root, "wap").count() === 4)
    assert(spark.read.format("graft").option("ref", "wap").load(root)
      .count() === 4)
    // publish: a fresh main version referencing the branch head's dir
    val pub = VersionedTable.fastForward(root, "wap")
    assert(VersionedTable.readLive(spark, root)
      .orderBy("id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, -40L)))
    assert(VersionedTable.readManifest(root).get.version === pub)
    assert(VersionedTable.refs(root).isEmpty, "refs consumed")
    // the published version time-travels; so do the branch commits
    // (explicit VERSION AS OF by number)
    assert(VersionedTable.readVersion(spark, root, pub).count() === 4)
    assert(VersionedTable.readVersion(spark, root, 1L).count() === 2)
  }

  test("failed gate = nothing to undo; fast-forward CAS refuses when " +
    "main moved since the fork; CDF and TIMESTAMP AS OF skip branch " +
    "commits but see the publish") {
    wh
    val root = s"$wh/m/g"
    VersionedTable.append(spark, root,
      Seq((1L, 5L)).toDF("id", "v"))
    VersionedTable.appendToBranch(spark, root,
      Seq((2L, -1L)).toDF("id", "v"), "bad")
    // gate fails (negative v) → just drop the branch; main untouched
    assert(VersionedTable.readRef(spark, root, "bad")
      .filter(col("v") < 0).count() === 1)
    VersionedTable.dropRef(root, "bad")
    VersionedTable.dropRef(root, "bad@base")
    assert(VersionedTable.readLive(spark, root).count() === 1)
    // race: branch forks, then MAIN commits → publish must refuse
    VersionedTable.appendToBranch(spark, root,
      Seq((3L, 7L)).toDF("id", "v"), "wap2")
    VersionedTable.append(spark, root,
      Seq((9L, 9L)).toDF("id", "v")) // main moves
    val e = intercept[VersionedTable.ConcurrentCommitException](
      VersionedTable.fastForward(root, "wap2"))
    assert(e.getMessage.contains("moved"), e.getMessage)
    VersionedTable.dropRef(root, "wap2")
    VersionedTable.dropRef(root, "wap2@base")
    // CDF across the whole retained range never saw branch commits
    val mainline = VersionedTable.mainlineVersions(root)
    val changes = VersionedTable.readChanges(spark, root,
      mainline.head, mainline.last, Seq("id"))
    val ids = changes.select("id").as[Long].collect().toSet
    assert(!ids.contains(2L) && !ids.contains(3L),
      s"branch rows leaked into CDF: $ids")
  }

  test("partitioned WAP through the SQL surface: write option " +
    "branch + CALL fast_forward; untouched partitions keep their " +
    "pointers through the publish") {
    wh
    spark.sql("CREATE TABLE wcat.m.p (id BIGINT, day STRING, " +
      "v BIGINT) USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO wcat.m.p VALUES " +
      "(1, 'd1', 10), (2, 'd2', 20)")
    val root = s"$wh/m/p"
    val before = VersionedTable.readPartitionedManifest(root).get
    // stage a batch onto the branch via the DSv2 write option
    Seq((3L, "d2", 30L), (4L, "d3", 40L)).toDF("id", "day", "v")
      .write.format("graft").option("branch", "wap")
      .option("partitionColumns", "day").mode("append").save(root)
    // main blind; branch readable via SQL time travel by ref name
    assert(spark.table("wcat.m.p").count() === 2)
    assert(spark.sql(
      "SELECT count(*) FROM wcat.m.p VERSION AS OF 'wap'")
      .head.getLong(0) === 4L)
    val r = spark.sql(
      "CALL wcat.system.fast_forward(table => 'm.p', " +
        "branch => 'wap')").head
    assert(r.getString(0) === "wap")
    assert(spark.sql("SELECT id, v FROM wcat.m.p ORDER BY id")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    val after = VersionedTable.readPartitionedManifest(root).get
    assert(after.partitions("day=d1") === before.partitions("day=d1"),
      "untouched d1 pointer must survive branch + publish")
    assert(after.partitions("day=d2") !== before.partitions("day=d2"))
    // a later main commit prunes safely (live dirs shared with the
    // published branch head survive retention)
    spark.sql("INSERT INTO wcat.m.p VALUES (5, 'd1', 50)")
    assert(spark.table("wcat.m.p").count() === 5)
  }

  test("retention never reaps the live dir when branch dirs are " +
    "numerically newer; the keepVersions promise counts MAIN-LINE " +
    "snapshots only; intermediate branch versions stay prunable") {
    wh
    val root = s"$wh/m/r"
    VersionedTable.append(spark, root, Seq((1L, 1L)).toDF("id", "v"))
    // several branch commits make the branch dirs the newest numbers
    (1 to 3).foreach(i => VersionedTable.appendToBranch(spark, root,
      Seq((10L + i, i.toLong)).toDF("id", "v"), "b"))
    // a main commit's retention pass must keep ITS live dir even
    // though branch dirs outrank it numerically
    VersionedTable.append(spark, root, Seq((2L, 2L)).toDF("id", "v"))
    assert(VersionedTable.readLive(spark, root).count() === 2)
    assert(VersionedTable.readRef(spark, root, "b").count() === 4)
    // keepVersions=2 promised TWO main-line snapshots: v1 must still
    // time-travel even though three branch dirs outrank it
    assert(VersionedTable.readVersion(spark, root, 1L).count() === 1)
  }

  test("publish refuses when MERGE-ON-READ mutations landed on main " +
    "after the fork (they bump only the sub-table, not the manifest)") {
    wh
    spark.sql("CREATE TABLE wcat.m.mor (id BIGINT, v BIGINT) " +
      "USING graft " +
      "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO wcat.m.mor SELECT id, id FROM range(4)")
    val root = s"$wh/m/mor"
    VersionedTable.appendToBranch(spark, root,
      Seq((9L, 9L)).toDF("id", "v"), "wap")
    // a MoR UPDATE on MAIN: no manifest bump, pos sub-table moves
    spark.sql("UPDATE wcat.m.mor SET v = v + 100 WHERE id = 1")
    assert(VersionedTable.readManifest(root).get.version === 1L)
    val e = intercept[VersionedTable.ConcurrentCommitException](
      VersionedTable.fastForward(root, "wap"))
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
    // the update survives; the branch can be dropped cleanly (drop
    // cleans its fork-base companions too)
    assert(spark.sql("SELECT v FROM wcat.m.mor WHERE id = 1")
      .head.getLong(0) === 101L)
    VersionedTable.dropRef(root, "wap")
    assert(VersionedTable.refs(root).isEmpty)
  }

  test("a ZERO-ROW branch write still forks the branch (a WAP " +
    "pipeline's empty epoch must leave a publishable branch)") {
    wh
    val root = s"$wh/m/z"
    VersionedTable.append(spark, root, Seq((1L, 1L)).toDF("id", "v"))
    spark.range(0).select(col("id"), col("id").as("v"))
      .write.format("graft").option("branch", "wap")
      .mode("append").save(root)
    assert(VersionedTable.refs(root).contains("wap"),
      s"${VersionedTable.refs(root)}")
    val pub = VersionedTable.fastForward(root, "wap")
    assert(pub > 1L)
    assert(VersionedTable.readLive(spark, root).count() === 1)
  }
}
