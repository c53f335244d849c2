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

  test("key column missing from the DataFrame fails loudly") {
    val e = intercept[IllegalArgumentException] {
      JdbcUpsert.upsert(Seq(("a", 1.0)).toDF("city", "t"), url, "w1",
        Seq("city", "ts_utc"), dialect = JdbcUpsert.UpdateThenInsert)
    }
    assert(e.getMessage.contains("ts_utc"))
  }
}
