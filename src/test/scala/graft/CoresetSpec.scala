package graft

import graft.operators.Coreset

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-exact replica of graft_cosine's sequential double fold. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Independent driver-side greedy k-center (same seed + tie rules). */
  private def refKCenters(rows: Seq[(Long, Array[Float])],
                          k: Int): Seq[(Long, Long, Double)] = {
    val firstId = rows.map(_._1).min
    val byId = rows.toMap
    var centers = Vector((1L, firstId, -1.0))
    var dist = rows.map { case (id, v) =>
      id -> (1.0 - cosine(v, byId(firstId))) }.toMap
    for (j <- 2 to math.min(k, rows.size)) {
      val (fid, fd) = dist.toSeq.maxBy { case (id, d) => (d, -id) }
      centers :+= ((j.toLong, fid, fd))
      dist = dist.map { case (id, d) =>
        id -> math.min(d, 1.0 - cosine(byId(id), byId(fid))) }
    }
    centers
  }

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(id =>
      id -> Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  test("matches the independent reference on random vectors") {
    val rows = randVecs(60, 8, seed = 7)
    val got = Coreset.kCenters(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = refKCenters(rows, 6)
    assert(got.map(t => (t._1, t._2)).toSeq === exp.map(t => (t._1, t._2)),
      "selection order/ids diverge from reference")
    got.zip(exp).foreach { case ((_, _, rg), (_, _, re)) =>
      assert(math.abs(rg - re) < 1e-12, s"radius $rg vs $re") }
  }

  test("planted clusters: k=4 selects one point from each cluster") {
    // 4 orthogonal directions with small within-cluster noise: greedy
    // farthest-point must visit all clusters before revisiting one
    val rnd = new scala.util.Random(11)
    val rows = for {
      c <- 0 until 4; i <- 0 until 10
    } yield {
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.01f)
      v(c * 2) += 1.0f
      ((c * 10 + i + 1).toLong, v)
    }
    val sel = Coreset.kCenters(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 4)
      .collect().map(_.getLong(1))
    val clusters = sel.map(id => (id - 1) / 10).toSet
    assert(clusters.size === 4, s"selected $sel → clusters $clusters")
  }

  test("radius is non-increasing after the seed row") {
    val rows = randVecs(40, 6, seed = 3)
    val radii = Coreset.kCenters(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 8)
      .orderBy("sel_order").collect().map(_.getDouble(2)).drop(1)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-12 },
      radii.mkString(", "))
  }

  test("k larger than n clamps; selection is deterministic") {
    val rows = randVecs(5, 4, seed = 9)
    val df = rows.toDF("vec_id", "embedding")
    val a = Coreset.kCenters(df, "embedding", "vec_id", k = 50).collect()
    val b = Coreset.kCenters(df, "embedding", "vec_id", k = 50).collect()
    assert(a.length === 5)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  // ------------------- batched (tournament) variant -------------------

  /** True cover radius of a selection over the full point set. */
  private def coverRadius(rows: Seq[(Long, Array[Float])],
                          selected: Seq[Long]): Double = {
    val byId = rows.toMap
    rows.map { case (_, v) =>
      selected.map(s => 1.0 - cosine(v, byId(s))).min }.max
  }

  test("batched equals sequential exactly at numPartitions = 1") {
    // with one partition the local greedy nominates exactly the global
    // selection, and the driver greedy re-derives the same sequence —
    // ids, order, AND radii
    val rows = randVecs(60, 8, seed = 7)
    val df = rows.toDF("vec_id", "embedding")
    val seq = Coreset.kCenters(df, "embedding", "vec_id", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bat = Coreset.kCentersBatched(df, "embedding", "vec_id", k = 6,
        numPartitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(bat.map(t => (t._1, t._2)).toSeq === seq.map(t => (t._1, t._2)).toSeq)
    bat.zip(seq).foreach { case ((_, _, rb), (_, _, rs)) =>
      assert(math.abs(rb - rs) < 1e-12) }
  }

  test("batched covers all planted clusters across partitions") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      c <- 0 until 4; i <- 0 until 10
    } yield {
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.01f)
      v(c * 2) += 1.0f
      ((c * 10 + i + 1).toLong, v)
    }
    val sel = Coreset.kCentersBatched(rows.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k = 4, numPartitions = 3)
      .collect().map(_.getLong(1))
    val clusters = sel.map(id => (id - 1) / 10).toSet
    assert(clusters.size === 4, s"selected ${sel.toSeq} → $clusters")
  }

  test("batched cover radius stays within 3x of sequential") {
    // the constant-factor guarantee of the two-level scheme, checked
    // empirically on random data (typical gap is far below the bound)
    val rows = randVecs(200, 8, seed = 13)
    val df = rows.toDF("vec_id", "embedding")
    val seqSel = Coreset.kCenters(df, "embedding", "vec_id", k = 8)
      .collect().map(_.getLong(1)).toSeq
    val batSel = Coreset.kCentersBatched(df, "embedding", "vec_id", k = 8,
        numPartitions = 4)
      .collect().map(_.getLong(1)).toSeq
    val rs = coverRadius(rows, seqSel)
    val rb = coverRadius(rows, batSel)
    assert(rb <= 3.0 * rs + 1e-9, s"batched cover $rb vs sequential $rs")
  }

  test("batched is deterministic and layout-independent") {
    val rows = randVecs(80, 6, seed = 17)
    val df1 = rows.toDF("vec_id", "embedding")
    val df2 = rows.reverse.toDF("vec_id", "embedding").repartition(7)
    val a = Coreset.kCentersBatched(df1, "embedding", "vec_id", k = 5,
      numPartitions = 4).collect().map(_.toString).toSeq
    val b = Coreset.kCentersBatched(df2, "embedding", "vec_id", k = 5,
      numPartitions = 4).collect().map(_.toString).toSeq
    assert(a === b) // hash-of-id partitions ignore the input layout
  }
}
