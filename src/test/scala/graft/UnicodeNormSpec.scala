package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{GraftFunctions, UnicodeNorm}

/** The composed-vs-decomposed distinction IS the test: the combining
  * marks and precomposed letters are held in named vals, and the
  * assertions themselves pin the byte-level forms (a tool that
  * normalized this file would make them fail).
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private val acute = "́"  // combining acute
  private val ring = "̊"   // combining ring above
  private val eAcute = "é" // precomposed e-acute
  private val aRing = "å"  // precomposed a-ring

  test("nfc composes decomposed sequences and is idempotent") {
    assert(UnicodeNorm.nfc(u(s"cafe$acute")) === u(s"caf$eAcute"))
    assert(UnicodeNorm.nfc(u(s"a$ring")) === u(aRing))
    val once = UnicodeNorm.nfc(u(s"cafe$acute a$ring"))
    assert(UnicodeNorm.nfc(once) === once)
  }

  test("nfc on pure ASCII returns the same object (no copy)") {
    val s = u("plain ascii only")
    assert(UnicodeNorm.nfc(s) eq s)
    assert(UnicodeNorm.stripAccents(s) eq s)
  }

  test("strip_accents removes marks from composed AND decomposed input; " +
    "canonical-only invariants hold") {
    assert(UnicodeNorm.stripAccents(u(s"caf$eAcute")) === u("cafe"))
    assert(UnicodeNorm.stripAccents(u(s"cafe$acute")) === u("cafe"))
    assert(UnicodeNorm.stripAccents(
      u("Ångström")) === u("Angstrom"))
    // canonical-only: ss-sharp and the fi ligature are NOT
    // compatibility-folded
    assert(UnicodeNorm.stripAccents(u("straße")) === u("straße"))
    assert(UnicodeNorm.stripAccents(u("ﬁn")) === u("ﬁn"))
  }

  test("SQL registration: graft_nfc/graft_strip_accents run inside a " +
    "DataFrame plan and null-propagate") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      Some(s"u$ring caf$eAcute"), // decomposed u-ring + precomposed e-acute
      Some("ascii"),
      Option.empty[String]
    ).toDF("s").selectExpr(
      "graft_nfc(s) AS n", "graft_strip_accents(s) AS a")
    val rows = df.collect()
    assert(rows(0).getString(0) === s"ů caf$eAcute") // u-ring composed
    assert(rows(0).getString(1) === "u cafe")
    assert(rows(1).getString(0) === "ascii")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("non-string input is rejected at analysis time") {
    GraftFunctions.ensureRegistered(spark)
    val err = intercept[Exception] {
      Seq(1).toDF("x").selectExpr("graft_nfc(x)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
