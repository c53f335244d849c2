package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.{TextFunctions, VectorFunctions}

class SimilarityTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val corpus = emb.select($"vec_id".as("id"), $"embedding".as("v"))
  private lazy val queries = emb.filter($"vec_id" < 5)
    .select($"vec_id".as("qid"), $"embedding".as("qv"))

  test("cosine/dot/l2 basics") {
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.cosine($"a", $"b").as("c"),
      VectorFunctions.l2Sq($"a", $"b").as("l")).head()
    assert(r.getDouble(0) === 4.0)
    assert(math.abs(r.getDouble(1) - 0.8) < 1e-9)
    assert(r.getDouble(2) === 2.0)
  }

  test("brute-force top-k: k rows per query, self excluded, ranked desc") {
    val out = Similarity.bruteForceTopK(corpus, queries, k = 3).collect()
    assert(out.length === 15)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === Seq(1, 2, 3))
      assert(!rows.exists(_.getLong(1) == qid))
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    }
  }

  test("IVF ANN achieves >= 40% recall@5 vs brute force on random data") {
    // random embeddings are ANN's worst case; the assertion pins the
    // plumbing (probe selection, list pruning), not SOTA recall
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(corpus, queries, k = 5,
      nLists = 8, nProbe = 4)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
  }

  test("IVF with multi-iteration kmeans still returns k ranked rows per query") {
    val out = Similarity.ivfTopK(corpus, queries, k = 3,
      nLists = 8, nProbe = 3, kmeansIters = 2).collect()
    assert(out.length === 15)
    assert(out.groupBy(_.getLong(0)).values
      .forall(_.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3)))
  }

  test("Lloyd refinement: 3 iterations do not degrade recall vs 1 " +
    "(the measured reason kmeansIters defaults to 3)") {
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(iters: Int): Double = {
      val got = Similarity.ivfTopK(corpus, queries, k = 5,
        nLists = 8, nProbe = 4, kmeansIters = iters)
        .select("qid", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r3 = recallAt(3)
    info(s"recall@5: 1 iter = $r1, 3 iters = $r3")
    assert(r3 >= r1 - 0.08, s"refinement degraded recall: $r1 -> $r3")
    assert(r3 >= 0.4, s"recall $r3")
  }

  test("SQ8 codes are genuine 1-byte arrays and reconstruct within " +
    "half a quantization step per dimension") {
    val (codes, centroids, stats) = Similarity.ivfSq8Index(corpus, nLists = 8)
    val codesField = codes.schema("codes").dataType
    assert(codesField ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true),
      s"codes column is $codesField, not array<tinyint>")
    val dim = corpus.select(size($"v")).head().getInt(0)
    assert(codes.select(size($"codes")).collect().forall(_.getInt(0) == dim))

    // reconstruction: |residual - dequant(code)| <= scale/2 (+eps)
    val cpos = centroids.select($"cid", posexplode($"cv").as(Seq("p", "cx")))
    val err = corpus.join(codes, "id")
      .select($"id", $"cid", posexplode(arrays_zip($"v", $"codes"))
        .as(Seq("p", "z")))
      .join(broadcast(cpos), Seq("cid", "p"))
      .join(broadcast(stats), Seq("p"))
      .select(
        (abs($"z.v".cast("double") - $"cx" -
          ($"lo" + ($"z.codes".cast("double") + 128.0) * $"scale")) -
          $"scale" / 2).as("excess"))
      .agg(max($"excess")).head().getDouble(0)
    assert(err < 1e-6, s"reconstruction off by more than scale/2: $err")
  }

  test("IVF-SQ8 + exact re-rank: k ranked rows per query, EXACT " +
    "cosines for returned ids, recall not below plain IVF by more " +
    "than the quantization shortlist can explain") {
    val out = Similarity.ivfPqTopK(corpus, queries, k = 5,
      nLists = 8, nProbe = 4, rerank = 16).collect()
    assert(out.length === 25)
    assert(out.groupBy(_.getLong(0)).values
      .forall(_.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
    // re-rank is exact: every returned cosine equals the brute-force
    // cosine for that (qid, neighbor) pair
    val nCorpus = corpus.count().toInt
    val brute = Similarity.bruteForceTopK(corpus, queries, k = nCorpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && brute(key) === r.getDouble(2),
        s"re-ranked cosine for $key is not the exact value")
    }
    // recall comparable to plain IVF at the same probes
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5,
      nLists = 8, nProbe = 4)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rSq8 = exact.intersect(sq8).size.toDouble / exact.size
    val rIvf = exact.intersect(ivf).size.toDouble / exact.size
    info(s"recall@5: ivf = $rIvf, ivf-sq8 = $rSq8")
    assert(rSq8 >= rIvf - 0.2, s"quantized path lost recall: $rIvf -> $rSq8")
  }

  test("graft_sq8_d2 native expression matches the explicit " +
    "per-dimension sum, under codegen with fallback disabled") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // NB Array[Byte] would encode as BINARY; Seq[Byte] gives the
    // array<tinyint> shape the codes column actually has
    val df = Seq(
      (Seq(0.5, -1.25, 3.0), Seq(0.1, 0.2, 0.0),
        Seq(10.toByte, (-3).toByte, 127.toByte)),
      (Seq(1.0, 0.0, -2.0), Seq(0.05, 0.0, 0.3),
        Seq(0.toByte, 5.toByte, (-128).toByte)))
      .toDF("a", "sc", "codes")
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = df.select(
        call_function("graft_sq8_d2", $"a", $"sc", $"codes").as("native"),
        aggregate(zip_with(zip_with($"a", $"sc", (x, s) => struct(
            x.as("x"), s.as("s"))), $"codes",
            (as, c) => pow(as.getField("x") -
              c.cast("double") * as.getField("s"), 2)),
          lit(0.0), (acc, v) => acc + v).as("hof")).collect()
      out.foreach(r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
          s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
    } finally prev.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
      spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("cached IVF / IVF-SQ8 searches equal the uncached forms and " +
    "reuse the session memo") {
    val key = "spec-embeddings-sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val ivfC = rows(Similarity.ivfTopKCached(corpus, key, queries, k = 5,
      nLists = 8, nProbe = 4))
    val ivfU = rows(Similarity.ivfTopK(corpus, queries, k = 5,
      nLists = 8, nProbe = 4))
    assert(ivfC === ivfU)
    val pqC = rows(Similarity.ivfPqTopKCached(corpus, key, queries, k = 5,
      nLists = 8, nProbe = 4, rerank = 16))
    val pqU = rows(Similarity.ivfPqTopK(corpus, queries, k = 5,
      nLists = 8, nProbe = 4, rerank = 16))
    assert(pqC === pqU)
    // second cached call is served from the memo: same result again
    assert(rows(Similarity.ivfPqTopKCached(corpus, key, queries, k = 5,
      nLists = 8, nProbe = 4, rerank = 16)) === pqU)
  }

  test("IVF scans less than brute force (probe pruning works)") {
    val assigned = Similarity.assignToCentroids(corpus,
      Similarity.kmeansLiteCentroids(corpus, 8))
    // every vector lands in exactly one list
    assert(assigned.count() === corpus.count())
    assert(assigned.select("cid").distinct().count() <= 8)
  }

  test("language ID picks the profile language on clear-cut text") {
    val df = Seq(
      ("the cat and the dog of the house is in that garden it"),
      ("le chat et la maison est une grande les jardins de un"),
      ("der hund und die katze ist ein nicht zu das haus"),
      ("xyzzy plugh qwerty asdf")).toDF("text")
    val out = df.select(TextFunctions.langId($"text").as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("en", "fr", "de", "und"))
  }

  test("quality signals and score") {
    val r = Seq("The quick brown fox jumps over the lazy dog today")
      .toDF("text")
      .select(TextFunctions.qualitySignals($"text").as("s"),
        TextFunctions.qualityScore($"text").as("q")).head()
    val s = r.getStruct(0)
    assert(s.getAs[Int]("n_tokens") === 10)
    assert(s.getAs[Double]("stopword_ratio") === 0.2) // 'the' x2
    assert(r.getDouble(1) === 1.0)
    // degenerate doc scores low
    val bad = Seq("!!! ??? ###").toDF("text")
      .select(TextFunctions.qualityScore($"text")).head().getDouble(0)
    assert(bad < 0.5)
  }

  test("tfidf: rare term outranks common term; values exact") {
    val docs = Seq(
      (1L, "spark spark shuffle"),
      (2L, "spark join"),
      (3L, "spark window")).toDF("doc_id", "text")
    val out = graft.functions.TextFunctions
      .tfidfTopTerms(docs, "text", "doc_id", topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5),
        r.getDouble(4))).toSeq
    // doc 1: 'shuffle' df=1 → tfidf ln(3); 'spark' df=3 → tf·ln(1)=0
    val d1 = out.filter(_._1 == 1L).sortBy(_._3)
    assert(d1.head._2 === "shuffle")
    assert(math.abs(d1.head._4 - math.log(3.0)) < 1e-6)
    assert(d1(1)._2 === "spark" && d1(1)._4 === 0.0)
  }

  test("sequence packing: contiguous fill per shard, straddle allowed, " +
    "shards independent") {
    val docs = Seq(
      ("A", 1L, 1000), ("A", 2L, 1500), ("A", 3L, 100),
      ("B", 10L, 2048), ("B", 11L, 1)
    ).toDF("source", "doc_id", "n_tok")
    val out = graft.operators.SequencePack
      .pack(docs, "source", "doc_id", "n_tok", budget = 2048)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("bin"), r.getAs[Long]("bin_offset"))).toMap
    assert(out(("A", 1L)) === (0L, 0L))
    assert(out(("A", 2L)) === (0L, 1000L)) // starts in bin 0, straddles into 1
    assert(out(("A", 3L)) === (1L, 452L))  // 2500 % 2048
    assert(out(("B", 10L)) === (0L, 0L))   // shard B packs independently
    assert(out(("B", 11L)) === (1L, 0L))   // exactly-full bin rolls over
  }

  test("sliding chunks: full coverage with overlap, short docs one " +
    "chunk, empty docs none") {
    val docs = Seq((1L, 10), (2L, 6), (3L, 8), (4L, 9), (5L, 0))
      .toDF("doc_id", "n_tok")
    val out = graft.operators.SequencePack
      .slidingChunks(docs, "doc_id", "n_tok", chunkSize = 8, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("tok_start"), r.getAs[Int]("tok_len")))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap
    assert(out(1L) === Set((0, 0, 8), (1, 6, 4))) // straddle: [0,8) [6,10)
    assert(out(2L) === Set((0, 0, 6)))            // shorter than a chunk
    assert(out(3L) === Set((0, 0, 8)))            // exactly one chunk
    assert(out(4L) === Set((0, 0, 8), (1, 6, 3))) // one extra token
    assert(!out.contains(5L))                     // empty doc dropped
    // every token covered: union of [start, start+len) = [0, n_tok)
    out.foreach { case (id, chunks) =>
      val covered = chunks.flatMap(c => c._2 until (c._2 + c._3))
      val n = Map(1L -> 10, 2L -> 6, 3L -> 8, 4L -> 9)(id)
      assert(covered === (0 until n).toSet, s"doc $id coverage")
    }
  }

  test("chunk text materialization: overlap repeats tokens, boundary " +
    "chunks shorten, multi-byte tokens slice on token indices") {
    // chunkSize 4, overlap 1 → step 3: doc 1 (6 toks) = [0,4) + [3,6)
    val docs = Seq(
      (1L, "Aé Bß Cœ Dñ Eü Fø"),      // multi-byte letters in every token
      (2L, "one two"),                  // shorter than one chunk
      (3L, "a b c d")                   // exactly one chunk
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val rows = graft.operators.SequencePack
      .slidingChunkText(docs, "doc_id", "toks", chunkSize = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk_text", "tok_len")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3))).toSet
    assert(rows === Set(
      (1L, 0, "aé bß cœ dñ", 4),
      (1L, 1, "dñ eü fø", 3),          // overlap token "dñ" repeats
      (2L, 0, "one two", 2),
      (3L, 0, "a b c d", 4)))
  }

  test("weighted sampling: deterministic, k per group, zero-weight " +
    "excluded, heavy weights dominate") {
    import graft.operators.WeightedSample
    val docs = ((1L to 200L).map(i => ("g1", i, 1.0)) :+ (("g1", 999L, 5000.0)))
      .toDF("grp", "id", "w")
    val pick = WeightedSample.topKPerGroup(docs, "grp", "id", "w", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pick.size === 3)
    // weight 5000 vs 200 unit weights: P(miss top-3) is ~(tiny); the
    // fixed salt makes this a deterministic regression check
    assert(pick.contains(999L), s"heavy row not sampled: $pick")
    // re-run identical; different salt redraws
    val again = WeightedSample.topKPerGroup(docs, "grp", "id", "w", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === pick)
    val other = WeightedSample.topKPerGroup(docs, "grp", "id", "w", k = 3,
      salt = "epoch1").select("id").collect().map(_.getLong(0)).toSet
    assert(other !== pick) // 1-in-C(200,2)-ish to collide; salt works

    // zero/negative weights never emitted, even with k > positive rows
    val zw = Seq(("g", 1L, 2.0), ("g", 2L, 0.0), ("g", 3L, -1.0))
      .toDF("grp", "id", "w")
    val zPick = WeightedSample.topKPerGroup(zw, "grp", "id", "w", k = 2)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(zPick === Seq(1L))
  }

  test("split assignment: stable under corpus growth, proportions " +
    "sane, salt re-deals") {
    import graft.operators.WeightedSample
    val small = (1L to 500L).toDF("doc_id")
    val grown = (1L to 1000L).toDF("doc_id")
    def assign(df: org.apache.spark.sql.DataFrame, salt: String = "epoch0") =
      WeightedSample.splitAssign(df, "doc_id", salt = salt)
        .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val a = assign(small)
    val b = assign(grown)
    // every original doc keeps its split when the corpus doubles
    assert(a.forall { case (id, s) => b(id) == s })
    // rough proportions (binomial bounds, deterministic given the hash)
    val counts = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 850 && counts("train") < 950, counts.toString)
    assert(counts("val") + counts("test") == 1000 - counts("train"))
    // salt re-deals at least some docs
    val redealt = assign(small, salt = "epoch1")
    assert(a.exists { case (id, s) => redealt(id) != s })
  }

  test("corpus mixing: zero-rate source vanishes, full-rate survives " +
    "whole, proportions track rates, per-doc stable") {
    import graft.operators.WeightedSample
    val docs = (0L until 900L).map(i =>
      (i, if (i < 300) "web" else if (i < 600) "curated" else "other"))
      .toDF("doc_id", "source")
    val mixed = WeightedSample.mixSources(docs, "doc_id", "source",
      rates = Map("web" -> 0.3, "curated" -> 1.0, "other" -> 0.0))
    val counts = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("curated") === 300L)
    assert(!counts.contains("other"))
    assert(counts("web") > 50 && counts("web") < 130, counts.toString)
    // per-doc stability: kept set is a subset relation under rate increase
    val wider = WeightedSample.mixSources(docs, "doc_id", "source",
      rates = Map("web" -> 0.6, "curated" -> 1.0, "other" -> 0.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val narrow = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(wider), "raising a rate must only ADD docs")
  }

  test("temperature mix: rarest group survives whole, proportions " +
    "flatten toward p^alpha, alpha=1 is identity, monotone in alpha") {
    import graft.operators.WeightedSample
    // 80/15/5 % skew
    val docs = (0L until 1000L).map(i =>
      (i, if (i < 800) "big" else if (i < 950) "mid" else "rare"))
      .toDF("doc_id", "grp")
    val mixed = WeightedSample.temperatureMix(docs, "doc_id", "grp", 0.5)
    val counts = mixed.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") === 50L) // rate 1 exactly
    // expected kept: n_g * (p_g/p_rare)^(alpha-1) = 800*(1/4)=200,
    // 150*sqrt(.05/.15)*... → mid: 150*(3)^-0.5 ≈ 86.6
    assert(counts("big") > 160 && counts("big") < 240, counts.toString)
    assert(counts("mid") > 65 && counts("mid") < 110, counts.toString)
    // alpha = 1: keep everything
    assert(WeightedSample.temperatureMix(docs, "doc_id", "grp", 1.0)
      .count() === 1000L)
    // monotone: alpha 0.5 keeps a subset of alpha 0.8
    val k05 = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    val k08 = WeightedSample.temperatureMix(docs, "doc_id", "grp", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k05.subsetOf(k08), "raising alpha must only ADD docs")
  }

  test("bigram perplexity: hand-computed Laplace-smoothed values; " +
    "short docs drop out") {
    val docs = Seq((1L, "a b a b"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextFunctions.bigramPerplexity(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl"))).toMap
    // V=5 (a,b,x,y,solo); P(b|a)=(2+1)/(2+5)=3/7, P(a|b)=(1+1)/(2+5)=2/7,
    // P(y|x)=(1+1)/(1+5)=1/3. doc1: (18/343)^(-1/3) ≈ 2.6710; doc2: 3.0
    assert(out(1L) === ((3L, 2.671)))
    assert(out(2L) === ((1L, 3.0)))
    assert(!out.contains(3L)) // no bigrams
  }

  test("repetition score: fully repeated doc near 1, unique doc 0, " +
    "short docs 0") {
    val docs = Seq(
      (1L, "a b c a b c a b c a b c"), // trigrams: 10 total, 3 distinct
      (2L, "one two three four five six"),
      (3L, "hi there")).toDF("doc_id", "text")
    val out = TextFunctions.repetitionScore(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct_grams"),
          r.getAs[Double]("repetition"))).toMap
    assert(out(1L) === ((10L, 3L, 0.7)))
    assert(out(2L) === ((4L, 4L, 0.0)))
    assert(out(3L) === ((1L, 1L, 0.0))) // whole-doc gram can't repeat
  }

  test("decontamination: corpus docs sharing a benchmark n-gram are " +
    "flagged, clean docs are not") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // benchmark
      (10L, "totally unrelated content about query engines"),
      (11L, "he said the quick brown fox appeared at dawn"), // contains 4-gram
      (12L, "quick brown dog fox")).toDF("doc_id", "text")
    val bench = graft.operators.Dedup.shingleRows(
      docs.filter($"doc_id" < 5), "text", "doc_id", n = 4)
      .select($"id".as("bench_id"), $"g")
    val corpus = graft.operators.Dedup.shingleRows(
      docs.filter($"doc_id" >= 5), "text", "doc_id", n = 4)
      .select($"id".as("doc_id"), $"g")
    val flagged = corpus.join(bench, "g")
      .groupBy("doc_id")
      .agg(countDistinct($"g").as("n_shared_grams"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged === Map(11L -> 1L)) // "the quick brown fox"
  }

  test("BPE merge learning matches the hand-computed classic example; " +
    "greedy application handles runs") {
    import graft.operators.BpeVocab
    // low×3, lower×1, lowest×1 — the Sennrich walkthrough
    val docs = Seq("low low lower", "low lowest").toDF("text")
    val merges = BpeVocab.learnMerges(docs, "text", numMerges = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    // r1: (l,o)=5 ties (o,w)=5 → lexicographic; r2: (lo,w)=5;
    // r3: (low,e)=2; r4: (lowe,r)=1 ties (lowe,s),(s,t) → lexicographic
    assert(merges.toSeq === Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L),
      (3, "low", "e", 2L), (4, "lowe", "r", 1L)))

    val toks = BpeVocab.applyMerges(
        Seq("lowest", "low", "slow").toDF("w"), "w",
        merges.map(m => (m._2, m._3)).toSeq)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(toks("lowest") === Seq("lowe", "s", "t"))
    assert(toks("low") === Seq("low"))
    assert(toks("slow") === Seq("s", "low")) // merges apply inside words

    // greedy run handling: merge (a,a) over "aaaa" → [aa, aa], and
    // "aaa" → [aa, a] (left-to-right, non-overlapping)
    val runs = BpeVocab.applyMerges(
        Seq("aaaa", "aaa").toDF("w"), "w", Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(runs("aaaa") === Seq("aa", "aa"))
    assert(runs("aaa") === Seq("aa", "a"))

    // exhaustion: more merges requested than pairs exist → stops early
    val tiny = BpeVocab.learnMerges(Seq("ab ab").toDF("text"), "text", 10)
    assert(tiny.count() === 1) // only (a,b) exists
  }

  test("fingerprint is order-sensitive; shingles correct") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val fps = Seq("a b c", "c b a").toDF("text")
      .select(TextFunctions.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) !== fps(1))
    val sh = Seq("a b c d").toDF("text")
      .select(TextFunctions.wordShingles($"text", 2).as("s"))
      .head().getSeq[String](0).toSet
    assert(sh === Set("a b", "b c", "c d"))
    val ch = Seq("abcd").toDF("text")
      .select(TextFunctions.charShingles($"text", 3).as("s"))
      .head().getSeq[String](0).toSet
    assert(ch === Set("abc", "bcd"))
  }
}
