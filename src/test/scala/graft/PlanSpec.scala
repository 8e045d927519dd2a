package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CoreQueries, ExtQueries}

/** Physical-plan assertions — the scale contract. These pin the plan
  * shapes that make the engine viable at 100 TB: filters reaching the
  * parquet scan, column pruning, broadcast joins for dims, partition
  * pruning on the partitioned fact, and whole-stage codegen on hot
  * paths. A regression here is a performance bug even when results stay
  * correct.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .where($"l_quantity" > 30.0)
      .select($"l_orderkey", $"l_quantity")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must read only the 2 projected columns:\n$plan")
  }

  test("star enrichment broadcasts every dimension") {
    val plan = planOf(CoreQueries.q05StarEnrichment(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"customer/nation/region joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") || plan.indexOf("SortMergeJoin") > 0,
      "fact-orders join may SMJ; dims must not")
  }

  test("grouped aggregation uses partial (map-side) aggregation") {
    val plan = planOf(CoreQueries.q01PricingSummary(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"partial+final hash aggregate expected:\n$plan")
    assert(plan.contains("partial_sum"),
      s"map-side combine must shrink the shuffle:\n$plan")
  }

  test("partitioned fact prunes partitions on year/month predicates") {
    val dir = TestSpark.tmpDir("prune")
    Seq(
      (1L, "2021-01-05 10:00:00", 2021, 1),
      (2L, "2021-02-05 10:00:00", 2021, 2),
      (3L, "2022-01-05 10:00:00", 2022, 1))
      .toDF("id", "ts", "year", "month")
      .write.partitionBy("year", "month").parquet(s"$dir/fact")
    val read = spark.read.parquet(s"$dir/fact")
      .where($"year" === 2021 && $"month" === 1)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*year[^\\]]*2021[^\\]]*\\].*"),
      s"year/month predicates must become partition filters, not row filters:\n$scan")
    assert(!scan.matches("(?s).*PushedFilters: \\[[^\\]]*year[^\\]]*\\].*"),
      s"partition predicates must not degrade to data filters:\n$scan")
    assert(read.count() == 1, "only the matching partition's row survives")
  }

  test("minhash signature aggregates map-side (partial before shuffle)") {
    val plan = planOf(ExtQueries.q22MinhashLsh(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"signature build must partial-aggregate:\n$plan")
  }

  test("knn brute force broadcasts the query side, never the corpus") {
    val plan = planOf(ExtQueries.q25KnnBruteForce(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no unpartitioned cartesian product allowed:\n$plan")
  }

  test("knn ranking is a partial top-k aggregate, not a window sort") {
    val plan = planOf(ExtQueries.q25KnnBruteForce(spark, sf))
    assert("top_k_by_score".r.findAllIn(plan).size >= 2,
      s"partial+final top_k_by_score expected (map tasks keep <= k per query):\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"scored pairs must not be sorted just to keep k of them:\n$plan")
  }

  test("vocab/BPE top-k is TakeOrderedAndProject, never a global sort") {
    Seq(ExtQueries.q62VocabTopk(spark, sf), ExtQueries.q63BpePairs(spark, sf))
      .foreach { df =>
        val plan = planOf(df)
        assert(plan.contains("TakeOrderedAndProject"),
          s"global top-k must be a per-partition partial top-k:\n$plan")
        // The only Sort permitted is the one ranking the <= k survivors
        // (driver-side row count); the key space itself must not sort.
        assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
          s"counts must combine map-side before the exchange:\n$plan")
      }
  }

  test("float_dot is registered as a SQL function via GraftExtensions") {
    val v = spark.sql(
      "SELECT float_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    import org.apache.spark.sql.functions.rand
    val n = 1000
    val left = spark.range(n).withColumnRenamed("id", "k")
      .withColumn("lv", rand(1))
    val right = spark.range(n).withColumnRenamed("id", "k")
      .withColumn("rv", rand(2))
    left.write.mode("overwrite").bucketBy(8, "k").saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").saveAsTable("bkt_right")
    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    // Force SMJ consideration by disabling broadcast for this check.
    val plan = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(j.count() == n)
      j.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed co-located join must not shuffle either side:\n$plan")
    spark.sql("DROP TABLE bkt_left"); spark.sql("DROP TABLE bkt_right")
  }

  private def withConf[T](kv: (String, String)*)(f: => T): T = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("LSH keying stage is fully codegen'd (no interpreted HOF lambdas)") {
    import graft.functions.VectorFunctions
    val df = spark.range(10)
      .select($"id".as("vec_id"),
        array((1 to 8).map(i => ($"id" * i).cast("float")): _*).as("emb"))
      .select($"vec_id",
        VectorFunctions.hyperplaneTableKeys($"emb", dim = 8, bits = 2, tables = 4)
          .as("keys"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("float_dot_product"),
      s"keying must use the native codegen'd dot product:\n$plan")
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      s"keying must not fall back to interpreted HOF lambdas:\n$plan")
  }

  test("salted join fans hot keys across buckets") {
    import graft.operators.SkewJoin
    val hot = (1 to 1000).map(i => (1L, i)) ++ Seq((2L, 0))
    val large = hot.toDF("k", "v")
    val small = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(large, small, Seq("k"),
      buckets = 8, saltExpr = pmod(hash($"v"), lit(8)))
    assert(out.count() == 1001, "salting must not change join cardinality")
    val salts = large.withColumn("__salt", pmod(hash($"v"), lit(8)) % 8)
      .where($"k" === 1L).select("__salt").distinct().count()
    assert(salts > 1, "hot key must spread over multiple salt buckets")
  }

  test("salted join is safe for raw (sign-preserving) salt expressions") {
    import graft.operators.SkewJoin
    // hash() is negative ~half the time; pmod inside saltedJoin must
    // keep those rows joinable against the replicated 0..buckets-1 side.
    val large = (1 to 500).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "one")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(large, small, Seq("k"),
      buckets = 8, saltExpr = hash($"v"))
    assert(out.count() == 500, "no rows may be dropped for negative salts")
  }

  test("bloom gate: exactly one join (the confirm); probe is a map-tier predicate") {
    val plan = planOf(ExtQueries.q91BloomDedup(spark, sf))
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)"
      .r.findAllIn(plan).size
    assert(joins == 1,
      s"bloom-negatives must bypass every join; expected 1 confirm join, got $joins:\n$plan")
    assert(plan.contains("bloom_might_contain"),
      s"the bloom probe must appear as a plan predicate:\n$plan")
  }

  test("url normalization is shuffle-free map tier") {
    val plan = planOf(ExtQueries.q92UrlNormalize(spark, sf))
    assert(!plan.contains("Exchange"),
      s"canonicalization must not shuffle — pure projection over the scan:\n$plan")
  }

  test("hard negatives: queries broadcast, corpus never sorted, partial top-k") {
    val plan = planOf(ExtQueries.q104HardNegatives(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the (tiny) query side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no unpartitioned cartesian product allowed:\n$plan")
    assert("top_k_by_score".r.findAllIn(plan).size >= 2,
      s"partial+final top_k_by_score expected:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"scored pairs must not be sorted just to keep k of them:\n$plan")
  }

  test("cross-source overlap: candidates from a hash equi-join, no nested loop") {
    val plan = planOf(ExtQueries.q101SourceOverlap(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the pair join must be a key equi-join on the shingle hash:\n$plan")
  }

  test("cdc chunking: no cartesian; per-doc windows only") {
    val plan = planOf(ExtQueries.q105CdcChunks(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cut-set join must be an equi-join on (doc_id, pos):\n$plan")
    // Every window/sort in the plan partitions by the __ent-marked
    // doc id — bounded by one document's tokens, never a global sort.
    assert(!plan.contains("Window [") ||
      plan.contains("windowspecdefinition(__ent_doc_id"),
      s"chunk-id windows must partition per document:\n$plan")
  }

  test("artifact-served ANN: corpus pays NO encode pass; probes broadcast (q138)") {
    import graft.operators.VectorSim
    val rnd = new scala.util.Random(29)
    val e = (0L until 40L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val m = VectorSim.pqTrain(e, dim = 16, subspaces = 4, k = 8, iters = 1)
    val cen = VectorSim.kmeansCentroids(e, 4, 1)
    val dir = TestSpark.tmpDir("planann")
    VectorSim.annCodesFrame(e, m, cen).write.mode("overwrite")
      .parquet(s"$dir/codes")
    val served = VectorSim.pqSearchIvfFromCodes(e.where($"vec_id" < 2),
      spark.read.parquet(s"$dir/codes"), m, cen, nprobe = 2, k = 3)
    val plan = planOf(served)
    // The codes parquet is consumed as-is: the ONLY kernel calls are
    // the query-side probe derivation (centroid_distances over the
    // 2-row query frame), never a corpus re-encode — at 100 TB the
    // encode pass is exactly what the artifact buys.
    assert(!plan.contains("nearest_centroid("),
      s"corpus must NOT be re-encoded when serving from codes:\n$plan")
    assert(plan.contains("centroid_distances") &&
      plan.contains("BroadcastExchange"),
      s"query-side probe selection must broadcast:\n$plan")
    assert(plan.contains("Scan parquet"),
      s"search must read the persisted code table:\n$plan")
  }

  test("q138 catalog entry: serving path never re-encodes the corpus") {
    // Same contract as the fixture pin above, but on the REAL catalog
    // entry (VERDICT r07 item 5): after training + landing the
    // artifact, the RETURNED search plan reads the codes parquet and
    // derives probes from the 5-row query side only.
    val served = ExtQueries.q138AnnArtifactSearch(spark, sf)
    val plan = planOf(served)
    assert(!plan.contains("nearest_centroid("),
      s"corpus must NOT be re-encoded when serving from the artifact:\n$plan")
    assert(plan.contains("centroid_distances") && plan.contains("Scan parquet"),
      s"query-side probes + persisted code table expected:\n$plan")
  }

  test("q108 has no unpartitioned corpus-scale WindowExec (VERDICT r07 item 1)") {
    val df = ExtQueries.q108ClassifierCalibration(spark, sf)
    val hits = WindowTripwire.scan(df.queryExecution.executedPlan)
    assert(hits.isEmpty,
      s"single-partition window over the per-doc frame:\n${hits.mkString("\n")}")
    // and the quartiles still come out: 4 buckets exist at sf0.001
    assert(df.select("quartile").distinct().count() === 4)
  }

  test("q143 quantile report has no unpartitioned corpus-scale WindowExec") {
    // Same contract as the q108 pin: the percentile picks must ride the
    // distinct-value histogram (bounded, __bnd-sanctioned), never a
    // global sort of per-document rows.
    val df = ExtQueries.q143QuantileReport(spark, sf)
    val hits = WindowTripwire.scan(df.queryExecution.executedPlan)
    assert(hits.isEmpty,
      s"single-partition window over the per-doc frame:\n${hits.mkString("\n")}")
    // 6 percentiles x 2 metrics, every value present
    val rows = df.collect()
    assert(rows.length === 12 && rows.forall(r => !r.isNullAt(2)))
  }

  test("catalog-wide window sweep: every WindowExec is bounded, tie-grouped, or __ent-marked (VERDICT r08 item 7, r09 item 2)") {
    // The hazard class WindowTripwire cannot see statically: a window
    // PARTITIONED by a low-cardinality key (source, band, language,
    // flag) still sorts the dominant group on one task. r07 closed
    // q108; r08 widened the pin to the whole catalog with a NAME-based
    // entity allowlist; r09 replaces names with __ent provenance —
    // each legitimate entity-keyed site renames its partition column
    // to __ent_<name>, so a future corpus frame that merely REUSES a
    // name like doc_id no longer rides through (the planted test
    // below pins that direction). The predicate itself lives in
    // WindowTripwire.staticAudit beside the runtime counters.
    import org.apache.spark.sql.execution.SparkPlan
    val violations = new scala.collection.mutable.ArrayBuffer[String]
    def audit(name: String, plan: SparkPlan): Unit =
      WindowTripwire.staticAudit(plan).foreach(v => violations += s"$name: $v")
    // Eager entries (q137/q141/q146, the trainers) execute their whole
    // pipeline INSIDE the query fn and return a tiny result frame —
    // auditing only the returned plan would exclude exactly the
    // heaviest pipelines. A listener captures every plan EXECUTED
    // while an entry builds, so those interior actions are swept too.
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkPlan)]
    @volatile var current = ""
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = captured.add(current -> qe.executedPlan)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        current = s"$name (interior action)"
        val df = fn(spark, sf)
        audit(name, df.queryExecution.executedPlan)
        // Drain per entry: listener delivery is async, and `current`
        // is read at DELIVERY time — without the drain an event from
        // this entry lands while the loop is already on the next one
        // and a violation is reported under the wrong entry name.
        // The drain must SUCCEED (ADVICE r09): a timed-out drain would
        // silently mislabel late events or drop post-loop ones — the
        // exact eager entries the listener exists to sweep.
        assert(org.apache.spark.graft.SparkShims
          .waitUntilListenerBusEmpty(spark, 60000),
          s"listener bus failed to drain within 60s after $name — " +
            "sweep coverage would be incomplete")
      }
      // One final drain before unregistering: events from the last
      // entry still in flight must land while the listener is alive.
      assert(org.apache.spark.graft.SparkShims
        .waitUntilListenerBusEmpty(spark, 60000),
        "listener bus failed its final drain — sweep coverage would " +
          "be incomplete")
    } finally {
      spark.listenerManager.unregister(listener)
      // The sweep BUILDS lease-bearing entries without running them —
      // drain the armed one-shot listeners so they don't scan every
      // later suite's actions for plans that will never execute. In
      // the finally: a mid-sweep throw must not skip the drain.
      graft.operators.CacheLease.releaseAll()
    }
    import scala.jdk.CollectionConverters._
    captured.asScala.foreach { case (name, plan) => audit(name, plan) }
    assert(violations.isEmpty,
      s"unsanctioned window partitioning (single-key corpus window?):\n${violations.mkString("\n")}")
  }

  test("window sweep flags a corpus frame whose key is merely NAMED doc_id (VERDICT r09 item 2)") {
    import org.apache.spark.sql.expressions.Window
    // The r08 allowlist sanctioned this BY NAME — the gap the __ent
    // provenance marker closes: a column named doc_id carries no
    // evidence its per-key groups are entity-bounded.
    val planted = spark.range(1000)
      .select(($"id" % 3).as("doc_id"), $"id".as("v"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"doc_id").orderBy($"v")))
    assert(WindowTripwire.staticAudit(planted.queryExecution.executedPlan).nonEmpty,
      "a single-key window on an unmarked doc_id column must be flagged")
    // The declared form passes: the site renames its key to __ent_*.
    val declared = spark.range(1000)
      .select(($"id" % 3).as("__ent_doc_id"), $"id".as("v"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"__ent_doc_id").orderBy($"v")))
    assert(WindowTripwire.staticAudit(declared.queryExecution.executedPlan).isEmpty,
      "an __ent-marked entity window must pass the sweep")
    // LITERAL partition keys reference no attribute — a one-task
    // global sort wearing a partitionBy costume. The vacuous-forall
    // hole would sanction it as entity-keyed (and two literals as a
    // tie group); both must flag.
    val litKey = spark.range(1000)
      .select($"id".as("v"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(lit(0)).orderBy($"v")))
    assert(WindowTripwire.staticAudit(litKey.queryExecution.executedPlan).nonEmpty,
      "a literal partition key is an unpartitioned sort in disguise")
    val litKeys = spark.range(1000)
      .select($"id".as("v"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(lit(0), lit(1)).orderBy($"v")))
    assert(WindowTripwire.staticAudit(litKeys.queryExecution.executedPlan).nonEmpty,
      "two literal keys are not a tie group")
  }

  test("q130 fused quality scan is ONE whole-stage codegen span") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val exec = ExtQueries.q130QualitySignals(spark, sf)
      .queryExecution.executedPlan
    val spans = exec.collect { case w: WholeStageCodegenExec => w.codegenStageId }
    assert(spans.distinct.size === 1 && exec.toString.startsWith("*(1)"),
      s"the six fused signals must ride a single codegen'd map stage, got $spans:\n$exec")
  }
}
