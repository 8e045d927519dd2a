package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorSim

/** Specs for similarity search (extension tier). */
class VectorSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("knnBruteForce ranks by cosine with vec_id tiebreak") {
    val e = emb(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(1f, 0.1f), 0), // closest to 0
      (2L, Seq(0.5f, 0.5f), 0), // diagonal
      (3L, Seq(0f, 1f), 0)) // orthogonal to 0
    val out = VectorSim.knnBruteForce(e.where($"vec_id" === 0), e, k = 3)
      .orderBy("rank").select("neighbor_id", "rank").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("clusterNearDup only pairs within a label and applies the threshold") {
    val e = emb(
      (0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0.01f), 0), // same label, near-identical
      (2L, Seq(1f, 0f), 1), // identical direction, different label
      (3L, Seq(0f, 1f), 0)) // same label, orthogonal
    val out = VectorSim.clusterNearDup(e, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L)),
      "cross-label identicals and within-label orthogonals are excluded")
  }

  test("knnLsh results are a subset of brute-force scores for same pairs") {
    val rnd = new scala.util.Random(7)
    val e = emb((0L until 64L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat), 0)): _*)
    val queries = e.where($"vec_id" < 2)
    val brute = VectorSim.knnBruteForce(queries, e, k = 64)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = VectorSim.knnLsh(queries, e, k = 5, dim = 16, bits = 2, tables = 8)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "2-bit bucketing leaves ~16 candidates per bucket")
    lsh.foreach { case (q, n, c) =>
      assert(brute((q, n)) == c, "LSH scores must equal brute-force scores")
    }
    // Multi-table recall: the true top-5 per query, recovered at >= 60%
    // even on near-orthogonal random vectors (deterministic seed).
    val bruteTop = VectorSim.knnBruteForce(queries, e, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lshPairs = lsh.map { case (q, n, _) => (q, n) }.toSet
    val recall = (lshPairs intersect bruteTop).size.toDouble / bruteTop.size
    assert(recall >= 0.6, s"8-table LSH recall@5 too low: $recall")
  }

  test("kmeans quantizer separates well-separated clusters and is deterministic") {
    val rnd = new scala.util.Random(11)
    // Three tight blobs around orthogonal axes in 8 dims.
    val e = emb((0L until 60L).map { i =>
      val axis = (i % 3).toInt
      val v = Seq.tabulate(8)(d =>
        (if (d == axis) 10f else 0f) + rnd.nextGaussian().toFloat * 0.1f)
      (i, v, axis)
    }: _*)
    val cen = VectorSim.kmeansCentroids(e, k = 3, iters = 3)
    assert(cen.size == 3 && cen.forall(_.length == 8))
    assert(cen.map(_.toSeq) == VectorSim.kmeansCentroids(e, k = 3, iters = 3).map(_.toSeq),
      "identical input must reproduce identical centroids")
    val assign = VectorSim.kmeansAssignments(e, cen)
      .as[(Long, Int)].collect().toMap
    assert(assign.size == 60 && assign.values.forall(c => c >= 0 && c < 3))
    // Quantization must recover the generating blobs exactly: every
    // true blob maps to exactly one learned cluster id.
    val byBlob = (0 until 3).map(b =>
      (0L until 60L).filter(_ % 3 == b).map(assign).toSet)
    assert(byBlob.forall(_.size == 1) && byBlob.flatten.toSet.size == 3,
      s"blobs not cleanly separated: $byBlob")
  }

  test("hardNegatives excludes the query's own cell and ranks cross-cell by cosine") {
    val rnd = new scala.util.Random(11)
    val e = emb((0L until 60L).map { i =>
      val axis = (i % 3).toInt
      val v = Seq.tabulate(8)(d =>
        (if (d == axis) 10f else 0f) + rnd.nextGaussian().toFloat * 0.1f)
      (i, v, axis)
    }: _*)
    val cen = VectorSim.kmeansCentroids(e, k = 3, iters = 3)
    val assign = VectorSim.kmeansAssignments(e, cen)
      .as[(Long, Int)].collect().toMap
    val queries = e.where($"vec_id" < 2)
    val out = VectorSim.hardNegatives(queries, e, cen, k = 5)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length == 10, "two queries x k=5")
    out.foreach { case (q, n, _, _) =>
      assert(assign(n) != assign(q),
        s"neighbor $n shares query $q's cell — not a hard negative")
    }
    // Per query: ranks 1..5, cosine non-increasing, and the result
    // equals the brute-force top-k restricted to cross-cell rows.
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5))
      assert(sorted.sliding(2).forall(p => p(0)._3 >= p(1)._3))
      val bruteCross = VectorSim.knnBruteForce(
        e.where($"vec_id" === q),
        e.where(!$"vec_id".isin(
          assign.filter(_._2 == assign(q)).keys.toSeq.map(Long.box): _*)),
        k = 5)
        .select("neighbor_id").as[Long].collect().toSet
      assert(sorted.map(_._2).toSet == bruteCross,
        s"query $q: hard negatives differ from cross-cell brute force")
    }
  }

  test("contrastivePairs: one same-cell positive (not self), negatives == hardNegatives") {
    val rnd = new scala.util.Random(11)
    val e = emb((0L until 60L).map { i =>
      val axis = (i % 3).toInt
      val v = Seq.tabulate(8)(d =>
        (if (d == axis) 10f else 0f) + rnd.nextGaussian().toFloat * 0.1f)
      (i, v, axis)
    }: _*)
    val cen = VectorSim.kmeansCentroids(e, k = 3, iters = 3)
    val assign = VectorSim.kmeansAssignments(e, cen)
      .as[(Long, Int)].collect().toMap
    val queries = e.where($"vec_id" < 2)
    val out = VectorSim.contrastivePairs(queries, e, cen, kNeg = 4)
      .select("query_id", "pair_type", "neighbor_id", "rank")
      .as[(Long, String, Long, Int)].collect()
    val pos = out.filter(_._2 == "positive")
    assert(pos.length == 2 && pos.forall(p => p._4 == 1 && p._3 != p._1),
      "exactly one rank-1 positive per query, never the anchor itself")
    pos.foreach(p => assert(assign(p._3) == assign(p._1),
      "the positive must come from the anchor's own cell"))
    val negs = out.filter(_._2 == "negative").map(p => (p._1, p._3)).toSet
    val hn = VectorSim.hardNegatives(queries, e, cen, k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(negs == hn, "the negative half must equal the hardNegatives mining")
  }

  test("dense treeAggregate round == row-shaped explode/groupBy reduction, bit-exact") {
    val rnd = new scala.util.Random(23)
    val e = emb((0L until 97L).map(i =>
      (i, Seq.fill(7)(rnd.nextGaussian().toFloat), 0)): _*)
    val init = VectorSim.kmeansInitSample(e, k = 5)
    val dense = VectorSim.kmeansCentroidsFrom(e, init, iters = 1)
    // The pre-r04 row-shaped reduction, replicated inline: one Lloyd's
    // round as explode -> groupBy(cluster, pos) -> sum/count -> collect.
    import org.apache.spark.sql.functions.{posexplode, sum => fsum, count => fcount, lit => flit}
    val assigned = VectorSim.kmeansAssignments(e, init)
      .join(e, "vec_id")
      .select($"cluster", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"cluster", $"pos")
      .agg(fsum($"v".cast("double")).as("s"), fcount(flit(1)).as("n"))
      .collect().groupBy(_.getInt(0))
    val rowShaped = init.zipWithIndex.map { case (old, j) =>
      assigned.get(j) match {
        case Some(rows) =>
          val byPos = rows.map(r => r.getInt(1) -> (r.getDouble(2) / r.getLong(3))).toMap
          Array.tabulate(old.length)(byPos)
        case None => old
      }
    }
    assert(dense.map(_.toSeq) == rowShaped.map(_.toSeq),
      "dense per-partition fold must reproduce the row-shaped sums exactly")
    // Empty-cluster rule survives: k > distinct rows keeps orphan seeds.
    val tiny = emb((0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0f), 0))
    val initT = Seq(Array(1.0, 0.0), Array(100.0, 100.0))
    val out = VectorSim.kmeansCentroidsFrom(tiny, initT, iters = 1)
    assert(out(0).toSeq == Seq(1.0, 0.0) && out(1).toSeq == Seq(100.0, 100.0),
      "cluster with no members must keep its previous centroid")
  }

  test("oversampled farthest-first init: no worse inertia than the sample init, deterministic") {
    val rnd = new scala.util.Random(19)
    // 8 tight blobs on axes in 16 dims — k=8 seeds from a plain md5
    // sample often double up on a blob; farthest-first cannot.
    val e = emb((0L until 160L).map { i =>
      val axis = (i % 8).toInt
      (i, Seq.tabulate(16)(d =>
        (if (d == axis) 10f else 0f) + rnd.nextGaussian().toFloat * 0.1f), axis)
    }: _*)
    val initS = VectorSim.kmeansInitSample(e, k = 8)
    val initO = VectorSim.kmeansInitOversampled(e, k = 8, factor = 4)
    assert(initO.map(_.toSeq) ==
      VectorSim.kmeansInitOversampled(e, k = 8, factor = 4).map(_.toSeq),
      "oversampled init must be deterministic")
    val iS = VectorSim.kmeansInertia(e, VectorSim.kmeansCentroidsFrom(e, initS, 2))
    val iO = VectorSim.kmeansInertia(e, VectorSim.kmeansCentroidsFrom(e, initO, 2))
    assert(iO <= iS, s"oversampled init inertia $iO worse than sample init $iS")
    // On this fixture the spread seeds must actually recover all blobs.
    val assign = VectorSim.kmeansAssignments(e, VectorSim.kmeansCentroidsFrom(e, initO, 2))
      .as[(Long, Int)].collect().toMap
    assert((0L until 160L).map(assign).toSet.size == 8,
      "farthest-first seeds must give every blob its own cluster")
  }

  test("parallel-chunk oversampled init is bit-identical to the sequential traversal") {
    // The chunked update (VERDICT r04 item 3) must not change a single
    // bit of the selection: same distances on the same operands, ties
    // to the earliest candidate. Compare against a plain sequential
    // reference over the same md5-ordered candidate sample, including a
    // fixture with EXACT duplicate vectors (guaranteed distance ties).
    import graft.functions.expr.CentroidKernel.round6
    val rnd = new scala.util.Random(43)
    val e = emb((0L until 96L).map { i =>
      val v =
        if (i % 3 == 0) Seq.tabulate(8)(d => (d + 1).toFloat) // planted ties
        else Seq.tabulate(8)(_ => rnd.nextGaussian().toFloat)
      (i, v, (i % 4).toInt)
    }: _*)
    def sequential(k: Int, factor: Int): Seq[Seq[Double]] = {
      val cand = e.orderBy(org.apache.spark.sql.functions.md5(
          $"vec_id".cast("string")), $"vec_id")
        .limit(factor * k).select("embedding").collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val minDist = Array.fill(cand.length)(Double.PositiveInfinity)
      val chosen = scala.collection.mutable.ArrayBuffer(cand(0))
      while (chosen.length < k) {
        val s = chosen.last; val cc = dot(s, s)
        var best = 0; var bestV = Double.NegativeInfinity; var i = 0
        while (i < cand.length) {
          val d = round6((dot(cand(i), cand(i)) - 2.0 * dot(cand(i), s)) + cc)
          if (d < minDist(i)) minDist(i) = d
          if (minDist(i) > bestV) { bestV = minDist(i); best = i }
          i += 1
        }
        chosen += cand(best)
      }
      chosen.toSeq.map(_.toSeq)
    }
    for ((k, f) <- Seq((6, 4), (12, 8))) {
      assert(VectorSim.kmeansInitOversampled(e, k, f).map(_.toSeq) ==
        sequential(k, f), s"selection diverged at k=$k factor=$f")
    }
  }

  test("ivfNearDup pairs only within a learned cluster, scored exactly") {
    val e = emb(
      (0L, Seq(10f, 0f, 0.1f), 0), (1L, Seq(10f, 0.1f, 0f), 0),
      (2L, Seq(0f, 10f, 0.1f), 1), (3L, Seq(0.1f, 10f, 0f), 1),
      (4L, Seq(-10f, 0f, 0f), 2))
    val out = VectorSim.ivfNearDup(e, k = 3, iters = 2, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L), (2L, 3L)),
      "near-identical same-blob pairs only; opposite vector pairs with nobody")
  }

  test("knnIvf: scores equal brute-force, recall grows with nprobe, full probe = brute force") {
    val rnd = new scala.util.Random(13)
    // Blobby corpus (4 loose clusters) — the regime IVF is built for.
    val e = emb((0L until 80L).map { i =>
      val axis = (i % 4).toInt
      (i, Seq.tabulate(8)(d =>
        (if (d == axis) 5f else 0f) + rnd.nextGaussian().toFloat), axis)
    }: _*)
    val queries = e.where($"vec_id" < 3)
    val brute = VectorSim.knnBruteForce(queries, e, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bruteScores = VectorSim.knnBruteForce(queries, e, k = 80)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val ivf = VectorSim.knnIvf(queries, e, k = 5, kClusters = 4, iters = 2, nprobe = 2)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    ivf.foreach { case (q, n, c) =>
      assert(bruteScores((q, n)) == c, "IVF scores must equal brute-force scores")
    }
    val recall = (ivf.map { case (q, n, _) => (q, n) }.toSet intersect brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"nprobe=2/4 recall@5 too low: $recall")
    // Probing every cell must reproduce brute force exactly.
    val full = VectorSim.knnIvf(queries, e, k = 5, kClusters = 4, iters = 2, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
  }

  test("hyperplane buckets are deterministic across invocations") {
    import graft.functions.VectorFunctions.hyperplaneBucket
    import org.apache.spark.sql.functions.col
    val e = emb((0L, Seq(1f, 2f, 3f), 0), (1L, Seq(-1f, 0.5f, -2f), 0))
    def buckets() = e
      .select(hyperplaneBucket(col("embedding"), 3, 8).as("b"))
      .as[Long].collect().toSeq
    assert(buckets() == buckets())
  }

  test("pqSearch: exact distances when codewords capture the corpus") {
    // 4 distinct vectors, k=4 codewords per subspace: training
    // converges every codeword onto a vector, so ADC distance equals
    // the true squared L2 for every pair.
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f, 2f, 0f, 0f, 0f)),
      (1L, Seq(0f, 3f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 2f, 0f, 0f, 0f, 4f, 0f)),
      (3L, Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 3f)))
    val e = emb(vecs.map { case (i, v) => (i, v, 0) }: _*)
    val m = VectorSim.pqTrain(e, dim = 8, subspaces = 2, k = 4, iters = 2)
    val out = VectorSim.pqSearch(e, e, m, k = 3)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 4 * 3, "every query ranks all other vectors")
    val byId = vecs.toMap
    out.foreach { case (q, n, adist) =>
      val (a, b) = (byId(q), byId(n))
      val l2 = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum.toDouble
      assert(math.abs(adist - l2) < 1e-6,
        s"ADC($q,$n)=$adist must equal true squared L2 $l2")
    }
  }

  test("pqSearch recall on clustered vectors; deterministic") {
    val rnd = new scala.util.Random(31)
    val centers = Seq.fill(3)(Seq.fill(16)(rnd.nextGaussian().toFloat * 3))
    val e = emb((0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f), 0)
    }: _*)
    val queries = e.where($"vec_id" < 3)
    val m = VectorSim.pqTrain(e, dim = 16, subspaces = 4, k = 8, iters = 2)
    def run() = VectorSim.pqSearch(queries, e, m, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(t => (t._1, t._3))
    val pq = run()
    assert(run() == pq, "PQ search is deterministic")
    // What PQ promises at this fixture's resolution (within-cluster
    // jitter sigma=0.1 is below the quantization cell size, so ADC
    // ordering AMONG same-cluster members is not meaningful — asserting
    // recall vs exact L2 there demands what PQ cannot deliver):
    // (a) every top-k neighbor is in the query's true cluster
    //     (cluster of vec i is i % 3);
    pq.foreach { case (q, n, _) =>
      assert(n % 3 == q % 3,
        s"top-k neighbor $n of query $q crosses clusters")
    }
    // (b) ADC ranking agrees with exact L2 BETWEEN clusters: ranking
    //     every corpus vector, all 19 same-cluster members must come
    //     before any cross-cluster vector.
    val fullRank = VectorSim.pqSearch(queries, e, m, k = 59)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    fullRank.foreach { case (q, n, rank) =>
      if (rank <= 19) assert(n % 3 == q % 3,
        s"query $q rank $rank is cross-cluster neighbor $n — " +
          "ADC disagrees with exact L2 at cluster granularity")
    }
    // (c) codebook utilization: the codebooks must resolve structure,
    //     not collapse the corpus onto a few code tuples (probed: 40
    //     distinct tuples over the 60 vectors).
    val tuples = VectorSim.pqEncode(e, m)
      .select("c0", "c1", "c2", "c3").distinct().count()
    assert(tuples >= 20, s"codebook utilization too low: $tuples tuples")
  }

  test("pqSearchIvf: full probe == pqSearch; pruned probe scores match; same-cluster recall") {
    val rnd = new scala.util.Random(47)
    val centers = Seq.fill(4)(Seq.fill(16)(rnd.nextGaussian().toFloat * 4))
    val e = emb((0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + rnd.nextGaussian().toFloat * 0.2f), 0)
    }: _*)
    val queries = e.where($"vec_id" < 4)
    val m = VectorSim.pqTrain(e, dim = 16, subspaces = 4, k = 8, iters = 2)
    // Probing every coarse cell must reproduce the unpruned ADC scan
    // exactly — IVFADC is a prune, never a rescore.
    val flat = VectorSim.pqSearch(queries, e, m, k = 5)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val full = VectorSim.pqSearchIvf(queries, e, m,
        kClusters = 4, iters = 2, nprobe = 4, k = 5)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == flat, "nprobe = kClusters must equal the flat ADC scan")
    // Pruned probes: every returned (query, neighbor) carries the SAME
    // ADC distance as the flat scan (pruning changes the candidate
    // set, never a score), and neighbors stay in the query's cluster.
    val flatScores = VectorSim.pqSearch(queries, e, m, k = 79)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    val pruned = VectorSim.pqSearchIvf(queries, e, m,
        kClusters = 4, iters = 2, nprobe = 2, k = 5)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect()
    assert(pruned.length == 4 * 5, "every query still fills top-5 from probed cells")
    pruned.foreach { case (q, n, d) =>
      assert(flatScores((q, n)) == d, "pruned ADC scores must equal flat ADC scores")
      assert(n % 4 == q % 4, s"probed neighbor $n of query $q crosses clusters")
    }
    // Deterministic across invocations.
    val again = VectorSim.pqSearchIvf(queries, e, m,
        kClusters = 4, iters = 2, nprobe = 2, k = 5)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect()
    assert(again.toSeq.sorted == pruned.toSeq.sorted, "pqSearchIvf is deterministic")
  }

  test("ANN artifact: train -> write -> read -> search == in-call (VERDICT r06 item 4)") {
    val rnd = new scala.util.Random(53)
    val centers = Seq.fill(4)(Seq.fill(16)(rnd.nextGaussian().toFloat * 4))
    val e = emb((0L until 60L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + rnd.nextGaussian().toFloat * 0.2f), 0)
    }: _*)
    val m = VectorSim.pqTrain(e, dim = 16, subspaces = 4, k = 8, iters = 2)
    val cen = VectorSim.kmeansCentroids(e, 4, 2)
    val dir = TestSpark.tmpDir("annart")
    VectorSim.annModelFrame(spark, m, cen)
      .write.mode("overwrite").parquet(s"$dir/model")
    VectorSim.annCodesFrame(e, m, cen)
      .write.mode("overwrite").parquet(s"$dir/codes")
    // Model state round-trips bit-for-bit (parquet doubles are exact).
    val (m2, cen2) = VectorSim.annModelFromFrame(spark.read.parquet(s"$dir/model"))
    assert(m2.subspaces == m.subspaces && m2.dsub == m.dsub)
    assert(m2.codebooks.flatten.map(_.toSeq) == m.codebooks.flatten.map(_.toSeq),
      "PQ codebooks must survive the parquet round trip bit-for-bit")
    assert(cen2.map(_.toSeq) == cen.map(_.toSeq),
      "coarse centroids must survive the round trip bit-for-bit")
    // Artifact-served search == in-call search, exactly.
    val queries = e.where($"vec_id" < 4)
    val inCall = VectorSim.pqSearchIvf(queries, e, m, cen, nprobe = 2, k = 5)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val served = VectorSim.pqSearchIvfFromCodes(queries,
        spark.read.parquet(s"$dir/codes"), m2, cen2, nprobe = 2, k = 5)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == inCall,
      "search over the persisted artifact must equal the in-call search")
  }

  test("semanticCells / semanticPairsIncremental: frozen-quantizer incremental == full (VERDICT r06 item 3)") {
    val rnd = new scala.util.Random(61)
    val centers = Seq.fill(3)(Seq.fill(8)(rnd.nextGaussian().toFloat * 4))
    def mk(ids: Range) = emb(ids.map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.05f), 0)
    }: _*)
    val old = mk(0 until 40)
    val batch = mk(40 until 60)
    val all = old.unionByName(batch)
    val cen = VectorSim.kmeansCentroids(old, 3, 2) // frozen at "init"
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cellsAll = VectorSim.semanticCells(all, cen)
    val full = pairsOf(VectorSim.semanticPairsIncremental(
      cellsAll, all, cellsAll.select("vec_id"), 0.99))
    val cellsOld = VectorSim.semanticCells(old, cen)
    val oldPairs = pairsOf(VectorSim.semanticPairsIncremental(
      cellsOld, old, cellsOld.select("vec_id"), 0.99))
    val newPairs = pairsOf(VectorSim.semanticPairsIncremental(
      cellsAll, all, batch.select("vec_id"), 0.99))
    assert(full.nonEmpty, "fixture must produce near-dup pairs")
    assert((oldPairs ++ newPairs) == full,
      "old-run pairs + new-vs-composed pairs must cover the full pair set")
    assert(newPairs.forall { case (a, b) => a >= 40 || b >= 40 },
      "the incremental call must only emit pairs touching the batch")
    // Fixed salt subdivides deterministically and only ever REMOVES
    // candidate pairs (the LSH-band recall trade, never new links).
    val salted = VectorSim.semanticCells(all, cen, salt = 3)
    val fullSalted = pairsOf(VectorSim.semanticPairsIncremental(
      salted, all, salted.select("vec_id"), 0.99))
    assert(fullSalted.subsetOf(full), "salting must only drop pairs")
    assert(salted.collect().sameElements(
      VectorSim.semanticCells(all, cen, salt = 3).collect()),
      "cell assignment is deterministic")
  }

  test("quantizerDrift: an off-distribution batch scores worse than the state's own fit") {
    val rnd = new scala.util.Random(71)
    val centers = Seq.fill(3)(Seq.fill(8)(rnd.nextGaussian().toFloat * 4))
    def near(id: Long) = {
      val c = centers((id % 3).toInt)
      (id, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f), 0)
    }
    val state = emb((0L until 60L).map(near): _*)
    val batchSame = emb((100L until 130L).map(near): _*)
    // Shifted: a new mode far from every state blob.
    val batchShifted = emb((200L until 230L).map { i =>
      (i, Seq.fill(8)(12f + rnd.nextGaussian().toFloat * 0.1f), 0)
    }: _*)
    val cen = VectorSim.kmeansCentroids(state, 3, 2)
    val rows = VectorSim.quantizerDrift(
      Seq("state" -> state, "same" -> batchSame, "shifted" -> batchShifted), cen)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows("state")._1 == 60L && rows("same")._1 == 30L)
    // An in-distribution batch fits about as well as the state itself;
    // the shifted mode is far worse — the retrain trigger.
    assert(rows("same")._2 < rows("state")._2 * 3,
      s"in-distribution batch should fit: ${rows("same")._2} vs ${rows("state")._2}")
    assert(rows("shifted")._2 > rows("state")._2 * 10,
      s"shifted batch must show drift: ${rows("shifted")._2} vs ${rows("state")._2}")
    assert(rows.values.forall(v => v._3 >= 0 && v._2 <= v._3),
      "mean <= max, distances non-negative")
  }

  test("semanticDedup: one disposition row per vector, one survivor per group") {
    // Two tight planted duplicate bundles + isolated singletons.
    val rnd = new scala.util.Random(11)
    def jitter(base: Seq[Float]): Seq[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
    val bundleA = Seq(1f, 0f, 0f, 0f)
    val bundleB = Seq(0f, 1f, 0f, 0f)
    val rows =
      (0L until 3L).map(i => (i, jitter(bundleA), 0)) ++
      (3L until 6L).map(i => (i, jitter(bundleB), 0)) ++
      Seq((6L, Seq(0f, 0f, 1f, 0f), 0), (7L, Seq(0f, 0f, 0f, 1f), 0))
    val e = emb(rows: _*)
    val out = VectorSim.semanticDedup(e, k = 4, iters = 2, threshold = 0.9)
      .select("vec_id", "group_id", "cos_centroid", "keep")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._1).sorted.toSeq == (0L until 8L),
      "every vector gets exactly one disposition row")
    val byGroup = out.groupBy(_._2)
    byGroup.foreach { case (g, members) =>
      assert(members.count(_._4 == 1) == 1,
        s"group $g must keep exactly one member")
      val survivor = members.find(_._4 == 1).get
      val best = members.minBy(m => (m._3, m._1))
      assert(survivor._1 == best._1,
        "survivor is the least-prototypical member (min cos_centroid, id tiebreak)")
    }
    // The planted bundles must collapse: <= 4 groups over 8 vectors
    // (2 bundles + 2 singletons), and the singletons keep themselves.
    assert(byGroup.size <= 4)
    Seq(6L, 7L).foreach { id =>
      assert(out.find(_._1 == id).get._4 == 1, s"singleton $id keeps itself")
    }
  }

  test("semanticDedup is deterministic across invocations") {
    val rnd = new scala.util.Random(23)
    val e = emb((0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat), 0)): _*)
    def run() = VectorSim.semanticDedup(e, k = 4, iters = 2, threshold = 0.5)
      .select("vec_id", "cluster", "group_id", "cos_centroid", "keep")
      .as[(Long, Int, Long, Double, Int)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("semanticDedup cell guard: no-op under the cap, bounded + deterministic on planted skew") {
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cluster", "group_id", "cos_centroid", "keep")
      .as[(Long, Int, Long, Double, Int)].collect().sortBy(_._1).toSeq
    // Non-skewed input: a cap above every cell population must produce
    // the IDENTICAL disposition — the guard is a pure no-op until a
    // cell actually exceeds it.
    val rnd = new scala.util.Random(31)
    val even = emb((0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat), 0)): _*)
    assert(
      collect(VectorSim.semanticDedup(even, k = 4, iters = 2,
        threshold = 0.5, maxCellSize = 40)) ==
      collect(VectorSim.semanticDedup(even, k = 4, iters = 2,
        threshold = 0.5)),
      "cap above all cell sizes must equal the unguarded run")
    // Planted skew: 60 of 80 vectors are EXACT duplicates — identical
    // rows share every centroid distance, so they land in ONE cell no
    // matter how the init sampled (the degenerate cell VERDICT r05
    // flagged). cap=15 salts that cell into ceil(n_cell/15) sub-cells
    // on md5(vec_id); the bundle then resolves to at most nsalt
    // groups (the documented recall trade), one survivor each, and
    // every vector still gets exactly one disposition row.
    val base = Seq.fill(8)(1f)
    val rows =
      (0L until 60L).map(i => (i, base, 0)) ++
      (60L until 80L).map(i =>
        (i, Seq.fill(8)(rnd.nextGaussian().toFloat * 3), 0))
    val skew = emb(rows: _*)
    val guarded = collect(VectorSim.semanticDedup(skew, k = 8, iters = 2,
      threshold = 0.99, maxCellSize = 15))
    assert(guarded.map(_._1) == (0L until 80L),
      "one disposition row per vector under the guard")
    val bundleCell = guarded.find(_._1 == 0L).get._2
    assert(guarded.count(r => r._1 < 60 && r._2 == bundleCell) == 60,
      "exact duplicates must share one cell")
    val cellN = guarded.count(_._2 == bundleCell)
    val nsalt = (cellN + 14) / 15
    assert(nsalt >= 4, s"guard must actually trigger (cell pop $cellN)")
    val bundleGroups = guarded.filter(_._1 < 60).map(_._3).distinct
    assert(bundleGroups.size <= nsalt,
      s"salted bundle must form <= $nsalt groups, got ${bundleGroups.size}")
    assert(bundleGroups.size > 1,
      "salting must actually split the oversized cell's pair space")
    assert(guarded.count(r => r._1 < 60 && r._5 == 1) == bundleGroups.size,
      "exactly one survivor per salted sub-group")
    assert(guarded == collect(VectorSim.semanticDedup(skew, k = 8,
      iters = 2, threshold = 0.99, maxCellSize = 15)),
      "guarded disposition is deterministic")
  }

  test("randomProjection: deterministic, norm-preserving in expectation") {
    // 60 deterministic pseudo-random unit-scale vectors in 32 dims —
    // md5-derived so they are statistically independent of the
    // 'hp-...'-keyed projection planes (a linear-congruential fixture
    // correlates with the fixed matrix and skews the norm ratios).
    def coord(i: Long, d: Int): Float = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"vec-$i-$d".getBytes("UTF-8"))
      (((h(0) & 0xff) * 256 + (h(1) & 0xff)).toFloat / 65536f) - 0.5f
    }
    val vecs = (0L until 60L).map(i => (i, (0 until 32).map(d => coord(i, d)), 0))
    val e = emb(vecs: _*)
    val proj = VectorSim.randomProjection(e, dim = 32, outDim = 8, seed = 7L)
    assert(proj.columns.toSeq == "vec_id" +: (0 until 8).map(i => s"p$i"))
    val rows = proj.orderBy("vec_id").collect()
    assert(rows.length == 60)
    assert(rows.sameElements(
      VectorSim.randomProjection(e, 32, 8, 7L).orderBy("vec_id").collect()),
      "projection is deterministic")
    // JL with the sqrt(3/outDim) scale preserves squared norms in
    // EXPECTATION: the mean ratio over 60 vectors should sit near 1
    // (individual ratios vary widely at outDim = 8 — that is the JL
    // variance, not a bug).
    val ratios = rows.map { r =>
      val id = r.getLong(0)
      val orig = (0 until 32).map(d => coord(id, d).toDouble)
      val p2 = (1 to 8).map(j => r.getDouble(j)).map(x => x * x).sum
      p2 / orig.map(x => x * x).sum
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
  }

  test("retrievalMetrics: MRR / nDCG / recall on a hand-built ranking") {
    // truth: q1 -> {10, 11}, q2 -> {10, 12}. Ranked lists (k = 2):
    //   q1: 10@1, 11@2  (perfect -> rr = 1, ndcg = 1, 2 hits)
    //   q2: 99@1, 10@2  (first hit at 2 -> rr = 0.5, 1 hit)
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 99L, 1), (2L, 10L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = VectorSim.retrievalMetrics(ranked, truth, k = 2)
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 == 2L, "two queries")
    assert(out._2 == 0.75, "mrr = (1 + 1/2) / 2")
    assert(out._4 == 0.75, "recall = 3 hits / (2 queries * k=2)")
    // q1 ndcg = 1 exactly; q2 ndcg = g(2)/(g(1)+g(2)) with
    // g(r) = 1/log2(r+1): ~0.6309/1.6309 ~ 0.3869 -> mean ~ 0.6934.
    assert(out._3 > 0.69 && out._3 < 0.70, s"mean ndcg ${out._3}")
    // No-hit query still counts in the means.
    val none = Seq((1L, 50L, 1), (1L, 51L, 2), (2L, 99L, 1), (2L, 10L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out2 = VectorSim.retrievalMetrics(none, truth, k = 2)
      .as[(Long, Double, Double, Double)].head()
    assert(out2._1 == 2L && out2._2 == 0.25 && out2._4 == 0.25)
  }

  test("retrievalMetrics: sparse truth reaches recall/ndcg 1.0 (ADVICE r06)") {
    // q1 has ONE relevant row; a ranking that finds it at position 1
    // must score recall 1 and ndcg 1, not be capped at 1/k forever.
    val truth = Seq((1L, 10L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    val ranked = Seq((1L, 10L, 1), (1L, 99L, 2), (2L, 10L, 1), (2L, 12L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = VectorSim.retrievalMetrics(ranked, truth, k = 2)
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 == 2L && out._2 == 1.0, "both first hits at rank 1")
    assert(out._3 == 1.0, "ideal DCG sized to each query's truth count")
    assert(out._4 == 1.0, "recall = 3 hits / (1 + 2 achievable)")
  }
}
