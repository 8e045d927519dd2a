package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataMix

/** Specs for corpus-composition operators: deterministic stratified
  * sampling and sequence packing. */
class DataMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lengthBatching: power-of-two bands, fixed capacities, batch cuts") {
    val docs = Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L), (5L, 9L), (6L, 1L))
      .toDF("doc_id", "nt")
    val out = DataMix.lengthBatching(docs, "doc_id", "nt", budget = 16L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // Band 8 holds nt 5..8, capacity 16 div 8 = 2; ordered nt desc:
    // doc4, doc3 -> batch 0; doc2, doc1 -> batch 1.
    assert(out(4L) == ((8L, 8L, 2L, 0L)) && out(3L) == ((7L, 8L, 2L, 0L)))
    assert(out(2L) == ((6L, 8L, 2L, 1L)) && out(1L) == ((5L, 8L, 2L, 1L)))
    assert(out(5L) == ((9L, 16L, 1L, 0L)), "nt 9 -> band 16, capacity 1")
    assert(out(6L) == ((1L, 1L, 16L, 0L)), "nt 1 -> band 1")
  }

  test("lengthBatching: oversize docs clamp into the top band, zero-length excluded") {
    // ADVICE r06: nt > 2^20 used to find no band and silently vanish.
    val docs = Seq((1L, (1L << 20) + 77L), (2L, 1L << 20), (3L, 0L))
      .toDF("doc_id", "nt")
    val out = DataMix.lengthBatching(docs, "doc_id", "nt", budget = 4096L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(1L, 2L), "oversize kept, zero-length excluded")
    assert(out(1L) == (((1L << 20) + 77L, 1L << 20, 1L, 0L)),
      "oversize doc lands in the top band with its TRUE nt, capacity 1")
    assert(out(2L)._2 == (1L << 20) && out(2L)._4 == 1L,
      "exact top-band doc batches after the larger one")
  }

  test("stratified sample is deterministic and tracks target fractions") {
    val df = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "stratum")
    def run() = DataMix.stratifiedSample(df, "id", "stratum",
      Map("a" -> 0.25), default = 0.9)
      .select("id").as[Long].collect().toSet
    val kept = run()
    assert(kept == run(), "same input must keep exactly the same rows")
    val aRate = kept.count(_ % 2 == 0) / 2000.0
    val bRate = kept.count(_ % 2 == 1) / 2000.0
    assert(math.abs(aRate - 0.25) < 0.05, s"stratum a rate $aRate far from 0.25")
    assert(math.abs(bRate - 0.9) < 0.05, s"stratum b rate $bRate far from 0.9")
  }

  test("tokenBudgetSample fills each stratum's budget in md5 order, crossing doc included") {
    val df = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L)).toDF("id", "stratum", "n_tokens")
    def run() = DataMix.tokenBudgetSample(df, "id", "stratum", "n_tokens",
      budgets = Map("a" -> 100L), default = 55L)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    val kept = run()
    assert(kept == run(), "same input must keep exactly the same rows")
    // 10-token docs: budget 100 -> exactly 10 docs (exclusive prefix of
    // the 10th is 90 < 100; of the 11th is 100). Budget 55 -> 6 docs
    // (the crossing doc, exclusive prefix 50 < 55, is included).
    assert(kept.count(_._2 == "a") == 10)
    assert(kept.count(_._2 == "b") == 6)
    // The kept set is the md5-order PREFIX of each stratum: every kept
    // doc's order key precedes every dropped doc's within its stratum.
    def md5Key(i: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    Seq("a", "b").foreach { s =>
      val (in, outS) = (0L until 200L).filter(i =>
        (if (i % 2 == 0) "a" else "b") == s)
        .partition(i => kept.contains((i, s)))
      assert(in.map(md5Key).max < outS.map(md5Key).min,
        s"stratum $s: kept docs must be the md5-order prefix")
    }
  }

  test("packSequences bins by exclusive prefix sum within shards") {
    // One shard (shards=1), budget 100: docs of 60+60 straddle, the
    // bin is chosen by the tokens BEFORE the doc.
    val docs = Seq((0L, 60L), (1L, 60L), (2L, 60L), (3L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = DataMix.packSequences(docs, "doc_id", "n_tokens",
      budget = 100L, shards = 1)
      .orderBy("bin")
      .select("bin", "n_docs", "total_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // prefixes: 0, 60, 120, 180 -> bins 0, 0, 1, 1
    assert(out == Seq((0L, 2L, 120L), (1L, 2L, 70L)))
  }

  test("packSequenceContents emits ordered member ids and concatenated text per bin") {
    val docs = Seq(
      (0L, 60L, "alpha"), (2L, 60L, "beta"), (4L, 60L, "gamma"), (6L, 10L, "delta"))
      .toDF("doc_id", "n_tokens", "text")
    val out = DataMix.packSequenceContents(docs, "doc_id", "n_tokens", "text",
      budget = 100L, shards = 1)
      .orderBy("bin")
      .select("bin", "doc_ids", "packed_text", "n_docs", "total_tokens")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    // prefixes 0,60,120,180 -> bins 0,0,1,1; contents follow doc order.
    assert(out == Seq(
      (0L, "0,2", "alpha\nbeta", 2L, 120L),
      (1L, "4,6", "gamma\ndelta", 2L, 70L)))
  }

  test("packSequences shards are independent and cover all docs") {
    val docs = (0L until 100L).map(i => (i, 50L)).toDF("doc_id", "n_tokens")
    val out = DataMix.packSequences(docs, "doc_id", "n_tokens",
      budget = 200L, shards = 4)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .as[Long].head() == 100L)
    assert(out.select("shard").distinct().count() == 4)
  }

  test("shardManifest totals match the packed frame; checksum ignores partition order") {
    val docs = (0L until 40L).map(i => (i, s"doc number $i words", 4L))
      .toDF("doc_id", "text", "n_tokens")
    val packed = DataMix.packSequenceContents(docs, "doc_id", "n_tokens", "text",
      budget = 10L, shards = 4)
    def manifest(p: org.apache.spark.sql.DataFrame) =
      DataMix.shardManifest(p)
        .select("shard", "n_bins", "n_docs", "total_tokens", "checksum")
        .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val m = manifest(packed)
    assert(m.map(_._3).sum == 40L, "doc totals cover every input doc")
    assert(m.map(_._4).sum == 160L, "token totals cover every input token")
    assert(manifest(packed.repartition(7)) == m,
      "the sum-of-hashes checksum is independent of partitioning")
  }

  test("importanceResample prefers target-profile docs, deterministic, no replacement") {
    // Raw pool: 20 docs speaking the target's vocabulary, 20 speaking
    // an alien one. Target: 5 docs of the first vocabulary.
    val likeTarget = "the quick brown fox jumps over the lazy dog"
    val alien = "zx qv wm kj pq rs tu vw xy zz"
    val raw = ((0L until 20L).map(i => (i, likeTarget)) ++
      (20L until 40L).map(i => (i, alien))).toDF("doc_id", "text")
    val target = (100L until 105L).map(i => (i, likeTarget)).toDF("doc_id", "text")
    def run() = DataMix.importanceResample(raw, target, "doc_id", "text",
      buckets = 256, take = 10)
      .select("rank", "doc_id", "importance", "sel_key")
      .as[(Int, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val out = run()
    assert(out.map(_._1) == (1 to 10), "ranks are contiguous from 1")
    assert(out.map(_._2).distinct.size == 10, "drawn without replacement")
    // Gumbel noise can reorder near-ties, but the importance gap
    // between vocabularies is large: every selected doc is target-like.
    assert(out.forall(_._2 < 20L),
      s"selection must prefer target-profile docs, got ${out.map(_._2)}")
    assert(run() == out, "the draw is deterministic")
    // sel_key = importance + Gumbel, monotone non-increasing in rank.
    assert(out.map(_._4) == out.map(_._4).sorted.reverse)
  }

  test("importance statistics compose additively from batch count slices") {
    // The weekly-cadence pin for quality-model state: ratios from
    // union-of-slices must equal ratios trained on the concatenated
    // raw corpus — so a batch writes only ITS bucket counts, and old
    // batches' text is never re-scanned.
    val mk = (r: Range, t: String) => r.map(i => (i.toLong, t))
    val batchA = (mk(0 until 20, "the quick brown fox jumps high") ++
      mk(20 until 30, "zx qv wm kj pq")).toDF("doc_id", "text")
    val batchB = (mk(30 until 40, "the lazy dog sleeps under trees") ++
      mk(40 until 45, "zx qv wm kj pq")).toDF("doc_id", "text")
    val target = mk(100 until 105, "the quick dog runs").toDF("doc_id", "text")
    val sliceA = DataMix.importanceCounts(batchA, "doc_id", "text", 256)
    val sliceB = DataMix.importanceCounts(batchB, "doc_id", "text", 256)
    val composed = DataMix.importanceTrainFromCounts(
      sliceA.unionByName(sliceB), target, "doc_id", "text", 256)
    val scratch = DataMix.importanceTrain(
      batchA.unionByName(batchB), target, "doc_id", "text", 256)
    def ratios(s: DataMix.ImportanceStats) = s.ratio
      .select($"b", $"r".cast("string")).as[(Long, String)].collect().toSet
    assert(ratios(composed) == ratios(scratch),
      "slice-composed ratios must equal from-scratch training")
  }

  test("groupCap equals the row_number-window reference, incl. a skewed group") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // Group "hot" holds 80% of rows — the shape the bounded-aggregate
    // form exists for.
    val df = (0L until 500L).map(i =>
      (i, if (i < 400) "hot" else s"g${i % 7}")).toDF("doc_id", "source")
    val got = DataMix.groupCap(df, "doc_id", "source", cap = 10)
      .select("doc_id", "source", "rank")
      .as[(Long, String, Int)].collect().toSet
    val want = df
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(conv(substring(md5(col("doc_id").cast("string")), 1, 13),
          16, 10).cast("long"), col("doc_id"))).cast("int"))
      .filter(col("rank") <= 10)
      .select("doc_id", "source", "rank")
      .as[(Long, String, Int)].collect().toSet
    assert(got == want, "bounded top-k must equal the window form")
    assert(got.count(_._2 == "hot") == 10, "hot group capped at 10")
    assert(got.groupBy(_._2).values.forall(_.size <= 10))
    // Groups under the cap keep every row, ranked 1..n.
    val small = got.filter(_._2 == "g0").toSeq.sortBy(_._3)
    assert(small.map(_._3) == (1 to small.size))
  }

  test("epoch mix: whole epochs replicate, fractional epochs subset, zero drops") {
    val docs = (1L to 400L).map { i =>
      (i, i % 4 match { case 0 => "a"; case 1 => "b"; case 2 => "c"; case _ => "d" })
    }.toDF("doc_id", "source")
    val out = DataMix.epochMix(docs, "doc_id", "source",
      Map("a" -> 250, "b" -> 100, "c" -> 50, "d" -> 0), defaultPct = 100)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Int)].collect()
    val byDoc = out.groupBy(_._1)
    // a: 2.5 epochs -> every doc 2 or 3 times, epochs contiguous 1..n.
    val aDocs = (1L to 400L).filter(_ % 4 == 0)
    aDocs.foreach { d =>
      val es = byDoc(d).map(_._3).sorted.toSeq
      assert(es == (1 to es.length) && (es.length == 2 || es.length == 3))
    }
    val aExtra = aDocs.count(d => byDoc(d).length == 3)
    assert(aExtra > 25 && aExtra < 75, s"~half of 'a' get the 3rd epoch: $aExtra/100")
    // b: exactly once; c: at most once, roughly half; d: dropped.
    assert((1L to 400L).filter(_ % 4 == 1).forall(d => byDoc(d).map(_._3).toSeq == Seq(1)))
    val cKept = (1L to 400L).filter(_ % 4 == 2).count(byDoc.contains)
    assert(cKept > 25 && cKept < 75, s"c subsampled at ~50%: $cKept/100")
    assert((1L to 400L).filter(_ % 4 == 3).forall(d => !byDoc.contains(d)))
    // Deterministic.
    val again = DataMix.epochMix(docs, "doc_id", "source",
      Map("a" -> 250, "b" -> 100, "c" -> 50, "d" -> 0), defaultPct = 100)
      .select("doc_id", "source", "epoch").as[(Long, String, Int)].collect()
    assert(out.toSet == again.toSet)
  }

  test("leakage-safe split: cluster-mates always share a split; weights honored") {
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // Clusters pair 2k with 2k+1 (canonical = 2k): 200 clusters of 2.
    val clusters = (1L to 400L)
      .map(i => (i, if (i % 2 == 0) i else i - 1))
      .filter { case (d, c) => c >= 1 } // doc 1 pairs down to 0 -> keep unclustered
      .toDF("doc_id", "canonical_id")
    val out = DataMix.leakageSafeSplit(docs, clusters, "doc_id",
      Seq("train" -> 96, "val" -> 2, "test" -> 2))
      .select("doc_id", "split_key", "bucket", "split")
      .as[(Long, Long, Int, String)].collect()
    assert(out.length == 400)
    // The guarantee: one split per split_key.
    out.groupBy(_._2).foreach { case (k, rows) =>
      assert(rows.map(_._4).distinct.length == 1,
        s"cluster $k straddles splits: ${rows.toSeq}")
    }
    // Buckets map to the declared bounds.
    out.foreach { case (_, _, b, s) =>
      assert(b >= 0 && b < 100)
      val expect = if (b < 96) "train" else if (b < 98) "val" else "test"
      assert(s == expect)
    }
    // All three splits are nonempty at this size and roughly weighted.
    val bySplit = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 300)
  }

  test("epochMixByPlan equals epochMix for the equivalent static map; default fills gaps") {
    val docs = (0L until 300L).map(i =>
      (i, "s" + (i % 3))).toDF("doc_id", "source")
    val byMap = DataMix.epochMix(docs, "doc_id", "source",
      Map("s0" -> 250, "s1" -> 40), defaultPct = 100)
      .as[(Long, String, Int)].collect().toSet
    val plan = Seq(("s0", 250), ("s1", 40)).toDF("source", "pct")
    val byPlan = DataMix.epochMixByPlan(docs, "doc_id", "source", plan,
      defaultPct = 100)
      .as[(Long, String, Int)].collect().toSet
    assert(byPlan == byMap,
      "plan-frame routing must replicate exactly like the static map")
    assert(byPlan.exists(_._2 == "s2"),
      "sources absent from the plan ride the default percent")
  }

  test("temperatureMixHalf: sqrt weights, exact-decimal total, floored targets") {
    val docs = Seq(
      (0L, "a", 100L), (1L, "b", 400L))
      .toDF("doc_id", "source", "n_tokens")
    val out = DataMix.temperatureMixHalf(docs, "source", "n_tokens",
      budgetTokens = 900L)
      .select("source", "n_tokens", "weight", "share", "target_tokens")
      .as[(String, Long, Double, Double, Long)].collect().sortBy(_._1)
    // weights sqrt(100)=10, sqrt(400)=20; shares 10/30, 20/30 at 6dp;
    // targets floor(900 * share).
    assert(out.toSeq == Seq(
      ("a", 100L, 10.0, 0.333333, 299L),
      ("b", 400L, 20.0, 0.666667, 600L)))
  }

  test("balancedShards round-robins descending token order; shardBalance reports fill") {
    val docs = Seq(
      (0L, "g", 10L), (1L, "g", 9L), (2L, "g", 8L), (3L, "g", 7L))
      .toDF("doc_id", "source", "n_tokens")
    val assigned = DataMix.balancedShards(docs, "doc_id", "source",
      "n_tokens", shards = 2)
    val byDoc = assigned.select("doc_id", "shard").as[(Long, Int)]
      .collect().toMap
    // rank order by tokens desc: 10 -> shard 0, 9 -> 1, 8 -> 0, 7 -> 1.
    assert(byDoc == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1))
    val bal = DataMix.shardBalance(assigned, "n_tokens")
      .select("shard", "n_docs", "total_tokens", "fill_ratio")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(bal.toSeq == Seq(
      (0, 2L, 18L, 1.0), (1, 2L, 16L, 0.888889)))
  }

  test("mixDrift: exact shares per wave, drift over rounded shares, flag") {
    val docs = Seq(
      ("x", 30L, 0L), ("x", 10L, 1L),   // x: 30 of wave A, 10 of wave B
      ("y", 70L, 0L), ("y", 90L, 1L))   // y: 70 of A, 90 of B
      .toDF("source", "n_tokens", "batch")
    val out = DataMix.mixDrift(docs, "source", "n_tokens", "batch",
      flagThreshold = 0.01)
      .select("source", "tokens_a", "tokens_b", "share_a", "share_b",
        "share_drift", "drift_flag")
      .as[(String, Long, Long, Double, Double, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("x", 30L, 10L, 0.3, 0.1, -0.2, true),
      ("y", 70L, 90L, 0.7, 0.9, 0.2, true)))
  }

  test("packingEfficiency reports per-shard bin fill against the budget") {
    val docs = Seq((0L, 60L), (1L, 60L), (2L, 60L), (3L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = DataMix.packingEfficiency(
      DataMix.packSequences(docs, "doc_id", "n_tokens",
        budget = 100L, shards = 1),
      budget = 100L)
      .select("shard", "n_bins", "n_docs", "total_tokens",
        "capacity_tokens", "fill_ratio")
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    // bins (0: 120 tokens, 1: 70) -> 190/200 = 0.95 fill.
    assert(out.toSeq == Seq((0, 2L, 4L, 190L, 200L, 0.95)))
  }
}
