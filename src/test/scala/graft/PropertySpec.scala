package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** Property tests for the packing/sampling/header operators: invariants
  * that must hold for ARBITRARY inputs, not just the enumerated
  * fixtures. Spark jobs per property are tiny (local fixture frames),
  * so generation counts stay small but adversarial (zeros, exact
  * multiples, single elements).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("sequence packing (property): offsets within budget, bins " +
    "monotone, exclusive cumsum consistent") {
    val gen = for {
      n <- Gen.choose(1, 12)
      toks <- Gen.listOfN(n, Gen.choose(0, 5000))
      budget <- Gen.oneOf(64, 1000, 2048)
    } yield (toks, budget)
    val prop = forAll(gen) { case (toks, budget) =>
      val df = toks.zipWithIndex
        .map { case (t, i) => ("s", i.toLong, t) }
        .toDF("source", "doc_id", "n_tok")
      val out = graft.operators.SequencePack
        .pack(df, "source", "doc_id", "n_tok", budget)
        .orderBy("doc_id")
        .select("n_tok", "cum_excl", "bin", "bin_offset")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val cums = out.scanLeft(0L)(_ + _._1).init
      out.zip(cums).forall { case ((_, cumExcl, bin, off), expectCum) =>
        cumExcl == expectCum && off >= 0 && off < budget &&
          bin == cumExcl / budget
      } && out.map(_._3).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(12))
    assert(res.passed, res.status.toString)
  }

  test("sliding chunks (property): exact token coverage, chunk sizes " +
    "bounded, overlap honored") {
    val gen = for {
      nTok <- Gen.choose(0, 300)
      chunk <- Gen.choose(2, 64)
      overlap <- Gen.choose(0, chunk - 1)
    } yield (nTok, chunk, overlap)
    val prop = forAll(gen) { case (nTok, chunk, overlap) =>
      val out = graft.operators.SequencePack
        .slidingChunks(Seq((1L, nTok)).toDF("doc_id", "n_tok"),
          "doc_id", "n_tok", chunk, overlap)
        .select("tok_start", "tok_len").collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      if (nTok == 0) out.isEmpty
      else {
        val covered = out.flatMap(c => c._1 until (c._1 + c._2)).toSet
        covered == (0 until nTok).toSet &&
          out.forall(c => c._2 >= 1 && c._2 <= chunk) &&
          out.sortBy(_._1).sliding(2).forall {
            case Array(a, b) => b._1 == a._1 + (chunk - overlap)
            case _ => true
          }
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(15))
    assert(res.passed, res.status.toString)
  }

  test("weighted sampling (property): emits min(k, positive rows) per " +
    "group, never a non-positive weight, ranks contiguous") {
    val gen = for {
      n <- Gen.choose(1, 15)
      weights <- Gen.listOfN(n, Gen.oneOf(0.0, 0.5, 1.0, 10.0, -2.0))
      k <- Gen.choose(1, 6)
    } yield (weights, k)
    val prop = forAll(gen) { case (weights, k) =>
      val df = weights.zipWithIndex
        .map { case (w, i) => ("g", i.toLong, w) }.toDF("grp", "id", "w")
      val out = graft.operators.WeightedSample
        .topKPerGroup(df, "grp", "id", "w", k)
        .select("id", "w", "sample_rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val positives = weights.count(_ > 0)
      out.length == math.min(k, positives) &&
        out.forall(_._2 > 0) &&
        out.map(_._3).sorted.toSeq == (1 to out.length)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(12))
    assert(res.passed, res.status.toString)
  }

  test("z-order key: hand-computed interleave; clusterBy sorts by the " +
    "key within partitions and preserves rows") {
    import graft.operators.ZOrder
    // x=3 (011), y=5 (101): bits land at 1+2+4+32 = 39
    val key = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.interleave($"x", $"y").as("z")).head().getLong(0)
    assert(key === 39L)

    val df = (1L to 100L).map(i => (i, (i * 37) % 100, (i * 53) % 100))
      .toDF("id", "x", "y")
    val clustered = ZOrder.clusterBy(df, $"x", $"y", partitions = 4)
    assert(clustered.count() === 100)
    // each output partition is sorted by the (recomputed) z key
    import org.apache.spark.sql.Row
    val perPart = clustered
      .withColumn("z", ZOrder.interleave($"x", $"y"))
      .withColumn("pid", spark_partition_id())
      .collect().groupBy(_.getAs[Int]("pid"))
    perPart.values.foreach { rows =>
      val zs = rows.map(_.getAs[Long]("z")).toSeq
      assert(zs === zs.sorted, "partition not z-sorted")
    }
    // range partitioning: partitions cover disjoint, ordered z ranges
    val ranges = perPart.toSeq.sortBy(_._1)
      .map(p => (p._2.map(_.getAs[Long]("z")).min,
        p._2.map(_.getAs[Long]("z")).max))
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1, s"overlapping ranges $a $b")
      case _ =>
    }
  }

  test("int8 quantization (property): reconstruction error bounded by " +
    "half a quantization step; constant dimensions exact") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 50L).map(i => (i,
      Array(rnd.nextFloat() * 100 - 50, rnd.nextFloat(), 7.5f)))
      .toDF("vec_id", "embedding")
    val out = graft.functions.VectorFunctions
      .quantizeInt8Error(vecs, "embedding", "vec_id")
      .collect().map(r => (r.getAs[Double]("max_abs_err"),
        r.getAs[Double]("mse")))
    // per-dim bound: err <= scale/2 = (hi-lo)/510; dim0 spans <=100,
    // dim1 <=1, the constant dim contributes 0
    val bound = 100.0 / 510 + 1e-6
    out.foreach { case (maxErr, mse) =>
      assert(maxErr >= 0 && maxErr <= bound, s"err $maxErr > $bound")
      assert(mse <= bound * bound)
    }
    // all-constant input reconstructs exactly
    val const = Seq((1L, Array(3.0f, 3.0f)), (2L, Array(3.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    graft.functions.VectorFunctions
      .quantizeInt8Error(const, "embedding", "vec_id")
      .collect().foreach { r =>
        assert(r.getAs[Double]("max_abs_err") === 0.0)
        assert(r.getAs[Double]("mse") === 0.0)
      }
  }

  test("media headers (property): generated PNG/WAV fixtures always " +
    "round-trip their header fields") {
    import graft.operators.MediaHeaders
    val gen = for {
      w <- Gen.choose(1, 10000)
      h <- Gen.choose(1, 10000)
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      samples <- Gen.choose(0, 100000)
      channels <- Gen.choose(1, 2)
    } yield (w, h, rate, samples, channels)
    val prop = forAll(gen) { case (w, h, rate, samples, channels) =>
      val png = MediaHeaders.parsePng(MediaHeaders.pngBytes(w, h))
      val wav = MediaHeaders.parseWav(
        MediaHeaders.wavBytes(rate, samples, channels))
      png.contains(MediaHeaders.PngInfo(w, h)) &&
        wav.exists(i => i.sampleRate == rate && i.channels == channels &&
          i.durationMs == samples.toLong * 1000 / rate)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(30))
    assert(res.passed, res.status.toString)
  }

  test("ols fit (property): recovers arbitrary integer lines exactly") {
    val gen = for {
      slope <- Gen.choose(-50L, 50L)
      icept <- Gen.choose(-1000L, 1000L)
      n <- Gen.choose(2, 10)
      xs <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    } yield (slope, icept, xs.distinct)
    val prop = forAll(gen) { case (m, b, xs) =>
      xs.size < 2 || {
        val pts = xs.map(x => ("g", x, m * x + b)).toDF("g", "x", "y")
        val r = graft.operators.TrendFit
          .olsFit(pts, Seq("g"), col("x"), col("y")).head()
        // exact integer points on a line: closed form is exact in
        // double arithmetic for these magnitudes (products < 2^53)
        r.getAs[Double]("slope") == m.toDouble &&
          r.getAs[Double]("intercept") == b.toDouble
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("random projection (property): expression matches the driver-" +
    "side sign matrix on arbitrary vectors") {
    val gen = Gen.listOfN(64, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    val prop = forAll(gen) { vec =>
      val df = Seq((1L, vec.toArray)).toDF("id", "v")
      val got = graft.operators.Projection.randomProject(df, "v", "id")
        .orderBy("dim").collect()
        .map(r => r.getAs[Long]("proj_micro"))
      val xs = vec.map(x => graft.functions.RandomProjectExpr
        .roundMicro(x.toDouble))
      val want = (0 until 16).map(j =>
        (0 until 64).map(i =>
          graft.operators.Projection.sign(j, i) * xs(i)).sum)
      got.toSeq == want
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(10))
    assert(res.passed, res.status.toString)
  }

  test("ranked-oracle contract (property): top-k on round(score,4) " +
    "with id tie-break is invariant under sub-ulp score perturbation") {
    import org.apache.spark.sql.expressions.Window
    // scores sit on the 1e-4 grid ± jitter ≤ 1e-6 (the rank-on-rounded
    // contract's stable region), with PLANTED exact ties at the
    // rounded level; perturbation ±1e-12 models cross-engine float
    // noise. The r5 q118 failure mode was exactly rank-k/rank-k+1
    // flipping under such noise when ranking used the raw double.
    def topk(scores: Seq[(Long, Double)], k: Int): Seq[Long] = {
      val w = Window.orderBy(col("r").desc, col("id"))
      scores.toDF("id", "s")
        .withColumn("r", round(col("s"), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .orderBy("rk").select("id").as[Long].collect().toSeq
    }
    val gen = for {
      n <- Gen.choose(8, 24)
      grid <- Gen.listOfN(n, Gen.choose(0, 9999))
      jit <- Gen.listOfN(n, Gen.choose(-1000, 1000))
      noise <- Gen.listOfN(n, Gen.oneOf(-1e-12, 0.0, 1e-12))
    } yield (grid, jit, noise)
    val prop = forAll(gen) { case (grid, jit, noise) =>
      val base = grid.zip(jit).zipWithIndex.map { case ((g, j), i) =>
        (i.toLong, g * 1e-4 + j * 1e-9)
      }
      val perturbed = base.zip(noise).map { case ((id, s), e) => (id, s + e) }
      topk(base, 5) == topk(perturbed, 5)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("bounded edit distance (property): graft_edit_within equals " +
    "the builtin levenshtein contract for arbitrary strings and k") {
    import org.apache.spark.unsafe.types.UTF8String
    // Mixed alphabets: shared-prefix entity names (the q205 shape the
    // prefix-strip optimizes), short adversarial strings, and
    // non-ASCII incl. surrogate pairs (𝄞) to exercise the code-point
    // decode path. The reference value is Spark's own levenshtein
    // evaluated WITHOUT a bound, post-thresholded.
    val alpha = Gen.oneOf(
      Gen.listOf(Gen.oneOf('a', 'b', '#', '0', '1')).map(_.mkString),
      Gen.listOf(Gen.oneOf('é', 'ß', '中', 'a')).map(_.mkString),
      Gen.listOf(Gen.oneOf("a", "b", "𝄞")).map(_.mkString),
      for {
        p <- Gen.choose(0, 12); t1 <- Gen.choose(0, 999)
      } yield s"Customer#${"0" * p}$t1")
    val gen = for {
      a <- alpha; b <- alpha; k <- Gen.choose(0, 6)
    } yield (a, b, k)
    val prop = forAll(gen) { case (a, b, k) =>
      val got = graft.functions.BoundedEdit.editWithin(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      val full = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b))
      val want = if (full <= k) full else -1
      got == want
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(500))
    assert(res.passed, res.status.toString)
  }

  test("interval-overlap join (property): equals the brute-force " +
    "theta join exactly-once for arbitrary intervals and widths") {
    val iv = for {
      s <- Gen.choose(0L, 200L); len <- Gen.choose(0L, 60L)
    } yield (s, s + len)
    val gen = for {
      na <- Gen.choose(1, 8); nb <- Gen.choose(1, 8)
      a <- Gen.listOfN(na, iv); b <- Gen.listOfN(nb, iv)
      w <- Gen.oneOf(1L, 7L, 30L, 500L)
    } yield (a, b, w)
    val prop = forAll(gen) { case (a, b, w) =>
      val adf = a.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("id", "s", "e")
      val bdf = b.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("id", "s", "e")
      val got = graft.operators.IntervalJoin
        .overlap(adf, bdf, "id", "s", "e", w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      val want = (for {
        ((as, ae), ai) <- a.zipWithIndex
        ((bs, be), bi) <- b.zipWithIndex
        if as <= be && bs <= ae
      } yield (ai.toLong, bi.toLong,
        math.min(ae, be) - math.max(as, bs))).sorted
      got == want // sorted SEQ compare: duplicates would fail, not hide
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(40))
    assert(res.passed, res.status.toString)
  }

  test("ExactSubstr (property): islands equal the brute-force " +
    "k-gram dup scan merged greedily, for arbitrary tiny corpora") {
    val word = Gen.oneOf("x", "y", "z", "w")
    val doc = for {
      n <- Gen.choose(0, 24)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val gen = for {
      nd <- Gen.choose(1, 5); docs <- Gen.listOfN(nd, doc)
      k <- Gen.oneOf(2, 3)
    } yield (docs, k)
    val prop = forAll(gen) { case (docs, k) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.SpanDedup
        .exactSubstrIntervals(df, "doc_id", "text", minTokens = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // brute force: every (doc, offset) k-gram, first occurrence in
      // (doc, pos) order, dup offsets merged into maximal runs
      val grams = for {
        (t, di) <- docs.zipWithIndex
        toks = t.split(" ").filter(_.nonEmpty)
        i <- 0 to toks.length - k
      } yield (di.toLong, i.toLong, toks.slice(i, i + k).mkString(" "))
      val first = grams.groupBy(_._3)
        .map { case (g, occ) => g -> occ.map(o => (o._1, o._2)).min }
      val dups = grams.filter { case (d2, i, g) =>
        Ordering[(Long, Long)].lt(first(g), (d2, i)) }
        .map(o => (o._1, o._2)).sorted
      val want = dups.groupBy { case (d2, i) =>
        (d2, i - dups.count(o => o._1 == d2 && o._2 < i))
      }.values.map { run =>
        val is = run.map(_._2)
        (run.head._1, is.min, is.max - is.min + k)
      }.toSet
      got == want
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(40))
    assert(res.passed, res.status.toString)
  }
}
