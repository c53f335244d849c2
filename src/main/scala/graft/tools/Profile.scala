package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Ad-hoc stage profiler for the heavy dedup operators (dev tool). */
object Profile {
  def t[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("queries")) { profileQueries(args.tail); return }
    if (args.headOption.contains("allqueries")) { allQueries(); return }
    if (args.headOption.contains("explain")) { explainQueries(args.tail); return }
    if (args.headOption.contains("stress")) { stressDedup(); return }
    val spark = GraftSession.build("profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).cache()
    println(s"docs: ${docs.count()}")

    // ---- minhash stages
    val base = Dedup.shingleRows(docs, "text", "doc_id", 3)
    t("shingles materialize") { base.write.mode("overwrite").parquet("/tmp/prof_sh") }
    val baseP = spark.read.parquet("/tmp/prof_sh")
    val sigs = Dedup.minhashSignatures(baseP, 64)
    t("minhash sigs") { sigs.write.mode("overwrite").parquet("/tmp/prof_sig") }
    val sigsP = spark.read.parquet("/tmp/prof_sig")
    val banded = sigsP.select(col("id"),
      explode(Dedup.bandHashes(col("sig"), 16, 4)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val cands = banded.alias("l").join(banded.alias("r"), Seq("band", "h"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .filter(col("id_a") < col("id_b")).distinct()
    val nc = t("candidates") { cands.count() }
    println(s"minhash candidates: $nc")
    // ---- ngram jaccard stages (postings self-join + common counts)
    val pairs = baseP.alias("l").join(baseP.alias("r"),
      col("l.g") === col("r.g") && col("l.id") < col("r.id"))
    println("pair rows: " + t("postings join count") { pairs.count() })
    val common = pairs.groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    println("groups: " + t("groupBy common") { common.count() })
    spark.stop()
  }

  /** Dedup-at-scale stress: replicate the sf0.1 corpus 20× (each
    * replica a near-dup: one extra word) → 100k docs, ~1M true
    * near-dup pairs — validates the LSH candidate path + components
    * fixpoint well beyond the bench SF.
    */
  def stressDedup(): Unit = {
    val spark = GraftSession.build("profile-stress")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.documents(spark, d).select("doc_id", "text")
    // collision-proof replica offset: (max id + 1), not row count
    val n = base.agg(max("doc_id")).head().getLong(0) + 1
    val big = (0 until 20).map { r =>
      base.select((col("doc_id") + lit(r) * n).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"))
    }.reduce(_ unionByName _)
    big.write.mode("overwrite").parquet("/tmp/stress_docs")
    val docs = spark.read.parquet("/tmp/stress_docs")
    println(s"stress corpus: ${docs.count()} docs")

    val pairs = t("minhash 100k docs") {
      val p = Dedup.minhashNearDups(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .localCheckpoint(true)
      println(s"pairs: ${p.count()}")
      p
    }
    t("components 100k docs") {
      val c = graft.operators.Components.connectedComponents(pairs)
      println(s"clusters: ${c.select("component").distinct().count()}")
    }
    spark.stop()
  }

  /** Print formatted physical plans for the named queries (or all). */
  def explainQueries(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile-explain")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"========== $n ==========")
      try graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }

  /** Run the whole query set twice in one session: pass 1 = cold
    * (JIT + codegen compile), pass 2 = warm floor.
    */
  def allQueries(): Unit = {
    val spark = GraftSession.build("profile-all")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        t(s"p$pass $n") { fn(spark, d).count() }
      }
      println(f"[profile] PASS $pass TOTAL ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }

  /** Time individual SparkEntry queries repeatedly:
    * runMain graft.tools.Profile queries q24_simhash_neardup 3
    */
  def profileQueries(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile-q")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    (1 to reps).foreach { i =>
      t(s"$name run$i") { graft.SparkEntry.queries(name)(spark, d).count() }
    }
    spark.stop()
  }
}
