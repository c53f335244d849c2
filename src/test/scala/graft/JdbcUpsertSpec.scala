package graft

import java.sql.DriverManager
import graft.sinks.JdbcUpsert

/** Drives the JDBC upsert sink against embedded Derby (the JVM-local
  * database Spark already ships for its Hive metastore — zero new
  * dependencies, no network). Derby lacks `ON CONFLICT`, which is the
  * point: it exercises the portable UpdateThenInsert dialect end to
  * end, while the Postgres dialect's statement text is asserted
  * against the reference's SQL shape separately.
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftupsert;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def freshTable(name: String): Unit = withConn { c =>
    val st = c.createStatement()
    try st.execute(s"DROP TABLE $name") catch { case _: Throwable => () }
    st.execute(
      s"""CREATE TABLE $name (
         |  city VARCHAR(64) NOT NULL,
         |  ts_utc TIMESTAMP NOT NULL,
         |  temperature_c DOUBLE,
         |  batch_id VARCHAR(64),
         |  PRIMARY KEY (city, ts_utc))""".stripMargin)
    st.close()
  }

  private def readAll(name: String): Map[(String, String), (Option[Double], String)] =
    withConn { c =>
      val rs = c.createStatement().executeQuery(
        s"SELECT city, ts_utc, temperature_c, batch_id FROM $name")
      val out = scala.collection.mutable.Map[(String, String), (Option[Double], String)]()
      while (rs.next()) {
        val t = rs.getDouble(3)
        val tOpt = if (rs.wasNull()) None else Some(t)
        out((rs.getString(1), rs.getString(2).take(19))) = (tOpt, rs.getString(4))
      }
      out.toMap
    }

  private def df(rows: Seq[(String, String, Option[Double], String)]) =
    rows.map { case (c, ts, t, b) =>
      (c, java.sql.Timestamp.valueOf(ts), t, b)
    }.toDF("city", "ts_utc", "temperature_c", "batch_id")

  private val keys = Seq("city", "ts_utc")

  test("insert-then-idempotent-rerun: re-running the same batch " +
    "changes nothing (the reference's Airflow-retry guarantee)") {
    freshTable("w1")
    val batch = df(Seq(
      ("paris", "2024-01-01 00:00:00", Some(4.5), "b1"),
      ("paris", "2024-01-01 01:00:00", Some(4.1), "b1"),
      ("tokyo", "2024-01-01 00:00:00", Some(9.0), "b1")))
    JdbcUpsert.upsert(batch, url, "w1", keys,
      dialect = JdbcUpsert.UpdateThenInsert, batchSize = 2)
    val first = readAll("w1")
    assert(first.size == 3)
    assert(first(("paris", "2024-01-01 00:00:00"))._1 === Some(4.5))
    JdbcUpsert.upsert(batch, url, "w1", keys,
      dialect = JdbcUpsert.UpdateThenInsert, batchSize = 2)
    assert(readAll("w1") === first, "re-run was not idempotent")
  }

  test("conflict rows are UPDATED in place, new keys inserted — " +
    "ON CONFLICT DO UPDATE parity") {
    freshTable("w2")
    JdbcUpsert.upsert(df(Seq(
      ("paris", "2024-01-01 00:00:00", Some(4.5), "b1"),
      ("tokyo", "2024-01-01 00:00:00", Some(9.0), "b1"))),
      url, "w2", keys, dialect = JdbcUpsert.UpdateThenInsert)
    // batch 2: paris@00 re-measured (conflict -> update), osaka new
    JdbcUpsert.upsert(df(Seq(
      ("paris", "2024-01-01 00:00:00", Some(5.0), "b2"),
      ("osaka", "2024-01-01 00:00:00", Some(7.7), "b2"))),
      url, "w2", keys, dialect = JdbcUpsert.UpdateThenInsert)
    val got = readAll("w2")
    assert(got.size == 3, s"expected 3 rows, got $got")
    assert(got(("paris", "2024-01-01 00:00:00")) === (Some(5.0), "b2"),
      "conflict row not updated")
    assert(got(("tokyo", "2024-01-01 00:00:00")) === (Some(9.0), "b1"),
      "untouched row modified")
    assert(got(("osaka", "2024-01-01 00:00:00")) === (Some(7.7), "b2"))
  }

  test("multi-partition write (one connection per partition) and " +
    "null values survive the trip") {
    freshTable("w3")
    val rows = (0 until 50).map { i =>
      ("city" + (i % 7), f"2024-01-01 ${i % 24}%02d:00:00",
        if (i % 5 == 0) None else Some(i / 10.0), "b1")
    }.distinct
    JdbcUpsert.upsert(df(rows).repartition(3), url, "w3", keys,
      dialect = JdbcUpsert.UpdateThenInsert, batchSize = 7)
    val got = readAll("w3")
    val expect = rows.groupBy(r => (r._1, r._2))
      .map { case (k, vs) => k -> vs.last }
    assert(got.size == expect.size)
    expect.foreach { case ((c, ts), (_, _, t, b)) =>
      assert(got((c, ts)) === (t, b), s"mismatch at ($c, $ts)")
    }
  }

  test("batch smaller/larger than page size both flush completely") {
    freshTable("w4")
    val rows = (0 until 2003).map { i =>
      ("c" + i, "2024-01-01 00:00:00", Some(i.toDouble), "b1")
    }
    JdbcUpsert.upsert(df(rows).coalesce(1), url, "w4", keys,
      dialect = JdbcUpsert.UpdateThenInsert, batchSize = 1000)
    assert(readAll("w4").size == 2003,
      "partial final batch was not flushed")
  }

  test("Postgres dialect emits the reference's ON CONFLICT statement " +
    "shape (clean_data.py:222-243)") {
    val sql = JdbcUpsert.upsertSql("staging.weather_hourly",
      Seq("batch_id", "city", "ts_utc", "temperature_c"),
      Seq("city", "ts_utc"))
    assert(sql ===
      "INSERT INTO staging.weather_hourly " +
        "(batch_id, city, ts_utc, temperature_c) VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (city, ts_utc) DO UPDATE SET " +
        "batch_id = EXCLUDED.batch_id, " +
        "temperature_c = EXCLUDED.temperature_c")
  }

  test("duplicate keys inside one flush batch converge to the LAST " +
    "occurrence (ON CONFLICT sequential-batch parity)") {
    freshTable("w6")
    // seed one key so the duplicate pair exercises the UPDATE side too
    JdbcUpsert.upsert(df(Seq(("paris", "2024-01-01 00:00:00", Some(1.0), "b0"))),
      url, "w6", keys, dialect = JdbcUpsert.UpdateThenInsert)
    val batch = df(Seq(
      ("paris", "2024-01-01 00:00:00", Some(2.0), "b1"),
      ("paris", "2024-01-01 00:00:00", Some(3.0), "b1"), // same existing key twice
      ("osaka", "2024-01-01 00:00:00", Some(4.0), "b1"),
      ("osaka", "2024-01-01 00:00:00", Some(5.0), "b1"))) // same NEW key twice:
    // un-deduped, both UPDATEs report 0 and both rows get INSERTed —
    // a primary-key violation that aborts the whole partition
    JdbcUpsert.upsert(batch.coalesce(1), url, "w6", keys,
      dialect = JdbcUpsert.UpdateThenInsert, batchSize = 10)
    val got = readAll("w6")
    assert(got.size == 2, s"expected 2 rows, got $got")
    assert(got(("paris", "2024-01-01 00:00:00")) === (Some(3.0), "b1"))
    assert(got(("osaka", "2024-01-01 00:00:00")) === (Some(5.0), "b1"))
  }

  // --- SUCCESS_NO_INFO fallback -------------------------------------
  // The dialects UpdateThenInsert exists for (older MySQL, Oracle)
  // commonly return Statement.SUCCESS_NO_INFO (-2) from executeBatch
  // instead of real per-row counts. Derby reports real counts, so the
  // -2 path is driven through a delegating JDBC driver that forwards
  // everything to Derby but rewrites every batch count to -2.
  private val noInfoPrefix = "jdbc:graftnoinfo:"

  private def wrapStatement(real: java.sql.PreparedStatement): java.sql.PreparedStatement =
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
      (_, m, args) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        if (m.getName == "executeBatch") {
          val counts = real.executeBatch()
          Array.fill(counts.length)(java.sql.Statement.SUCCESS_NO_INFO)
        } else m.invoke(real, a: _*)
      }).asInstanceOf[java.sql.PreparedStatement]

  private object NoInfoDriver extends java.sql.Driver {
    override def acceptsURL(u: String): Boolean = u.startsWith(noInfoPrefix)
    override def connect(u: String, p: java.util.Properties): java.sql.Connection =
      if (!acceptsURL(u)) null
      else {
        val real = DriverManager.getConnection(
          "jdbc:derby:" + u.stripPrefix(noInfoPrefix), p)
        java.lang.reflect.Proxy.newProxyInstance(
          getClass.getClassLoader, Array(classOf[java.sql.Connection]),
          (_, m, args) => {
            val a = if (args == null) Array.empty[AnyRef] else args
            val r = m.invoke(real, a: _*)
            if (m.getName == "prepareStatement")
              wrapStatement(r.asInstanceOf[java.sql.PreparedStatement])
            else r
          }).asInstanceOf[java.sql.Connection]
      }
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def getPropertyInfo(u: String, p: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  test("a driver reporting SUCCESS_NO_INFO batch counts still gets " +
    "rows inserted (per-row fallback, no silent drops)") {
    DriverManager.registerDriver(NoInfoDriver)
    val derbyUrl = "jdbc:derby:memory:graftnoinfo;create=true"
    withConn { _ => () } // ensure the default db exists (shared helpers)
    val c = DriverManager.getConnection(derbyUrl)
    try {
      val st = c.createStatement()
      try st.execute("DROP TABLE w7") catch { case _: Throwable => () }
      st.execute(
        """CREATE TABLE w7 (
          |  city VARCHAR(64) NOT NULL,
          |  ts_utc TIMESTAMP NOT NULL,
          |  temperature_c DOUBLE,
          |  batch_id VARCHAR(64),
          |  PRIMARY KEY (city, ts_utc))""".stripMargin)
      st.close()
    } finally c.close()
    // seed via plain Derby so the no-info run has one conflict row
    JdbcUpsert.upsert(df(Seq(("paris", "2024-01-01 00:00:00", Some(1.0), "b0"))),
      derbyUrl, "w7", keys, dialect = JdbcUpsert.UpdateThenInsert)
    // upsert through the count-hiding driver: paris = update,
    // tokyo = insert (silently dropped before the fallback existed)
    JdbcUpsert.upsert(df(Seq(
      ("paris", "2024-01-01 00:00:00", Some(2.0), "b1"),
      ("tokyo", "2024-01-01 00:00:00", Some(9.0), "b1"))).coalesce(1),
      noInfoPrefix + "memory:graftnoinfo", "w7", keys,
      dialect = JdbcUpsert.UpdateThenInsert)
    val got = {
      val c2 = DriverManager.getConnection(derbyUrl)
      try {
        val rs = c2.createStatement().executeQuery(
          "SELECT city, temperature_c, batch_id FROM w7")
        val out = scala.collection.mutable.Map[String, (Double, String)]()
        while (rs.next()) out(rs.getString(1)) = (rs.getDouble(2), rs.getString(3))
        out.toMap
      } finally c2.close()
    }
    assert(got.size == 2, s"row needing INSERT was dropped: $got")
    assert(got("paris") === ((2.0, "b1")), "conflict row not updated")
    assert(got("tokyo") === ((9.0, "b1")), "new row not inserted")
  }

  test("key column missing from the DataFrame fails loudly") {
    val e = intercept[IllegalArgumentException] {
      JdbcUpsert.upsert(Seq(("a", 1.0)).toDF("city", "t"), url, "w1",
        Seq("city", "ts_utc"), dialect = JdbcUpsert.UpdateThenInsert)
    }
    assert(e.getMessage.contains("ts_utc"))
  }
}
