package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact global ranking (VERDICT r07 item 1; tie-group
  * hardening VERDICT r08 item 1).
  *
  * `row_number()/ntile()` over an UNPARTITIONED window moves every row
  * to one task and sorts there — correct at test SF, a single-task sort
  * over billions of rows at corpus scale (the q108 defect). This
  * packages the two ingredients the engine already proved out —
  * histogram-cumulative bucketing ([[TextAnalysis.perplexityBuckets]])
  * and two-level bucket-offset prefix sums
  * ([[DataMix.tokenBudgetSample]]) — as a reusable exact-rank operator,
  * so report-tier rankings never regrow the single-partition path.
  *
  * Shape: one map-side-combined `groupBy(orderCol, tieBucket)` builds
  * the distinct-(value, tie-bucket) histogram; a TWO-LEVEL exclusive
  * cumulative (level 1 over the |distinct values| per-value histogram,
  * level 2 per value over its <= 4096 tie buckets — both frames carry
  * the [[graft.WindowTripwire.Marker]] prefix declaring them bounded,
  * and the single-task level-1 frame never inflates with the bucket
  * fan-out) yields each (value, bucket)'s global offset; an equi-join
  * (AQE broadcasts when small — never pinned, an 8dp score grid grows
  * with the corpus) puts the offset back on every row; and a
  * `row_number` over the (value, tie-bucket) partition completes the
  * exact 1-based rank.
  *
  * Tie order is the MD5 order of the tiebreak column — rank is under
  * (`orderCol`, `md5(cast(tieCol as string))`, `tieCol`), the same
  * deterministic engine-reproducible draw [[DataMix]] samples by, and
  * any SQL engine replays it verbatim (`ORDER BY v, md5(CAST(id AS
  * VARCHAR)), id`). That contract is what closes the r07→r08 residue:
  * a plain `ORDER BY tieCol` tie split cannot be bucketed (md5 buckets
  * interleave arbitrarily in tieCol order), so the final window had to
  * partition by the order VALUE alone — and for a LOW-cardinality
  * metric (a boolean gate, a 0–7 rule count) the tie group IS the
  * corpus, the q108 hazard one quantized score away. Under md5 tie
  * order the 12-bit md5 prefix is an ORDER-PRESERVING coarse key, so
  * the per-row window partitions by (value, bucket): a pathological
  * all-one-value column degrades to ~1/4096 of the corpus per task,
  * not the corpus.
  *
  * Null contract (all rank entry points): rows with a NULL group or
  * order value are EXCLUDED from the output — declared by an explicit
  * `WHERE` in the plan, not an accident of the offset equi-join. (A
  * sorted window would rank them nulls-first; callers rank non-null
  * metrics — coalesce first if null keys must rank, as
  * [[DataMix.balancedShards]] does.) A NULL TIE value draws
  * `md5('')` — so the exact window twin is `row_number()` over
  * `ORDER BY (orderCol, md5(coalesce(cast(tieCol as string), '')),
  * tieCol)`: the null tie sorts at md5('')'s position
  * ('d41d8cd9...', mid-range among the hex draws), NOT nulls-first,
  * and only WITHIN that md5 group does the trailing `tieCol`
  * (asc = nulls first) order it before any non-null collision
  * (RankingSpec pins the null-tie ORDER against this twin).
  */
object Ranking {

  /** 12-bit md5 prefix → 4096 tie sub-buckets: the same two-level
    * split [[DataMix.tokenBudgetSample]] uses, sized so a dominant
    * tie group's per-task slice is ~1/4096 of it. */
  private val TieBucketLen = 3

  private def tieMd5(tieCol: String): Column =
    md5(coalesce(col(tieCol).cast("string"), lit("")))

  /** Shared histogram + two-level tie-split core of [[globalRank]] /
    * [[groupedRank]]. Appends `rankName` (and, when asked, the total
    * group row count) to `df`'s columns. */
  private def rankCore(df: DataFrame, groupCols: Seq[String],
      orderCol: String, tieCol: String, rankName: String,
      descending: Boolean, totalName: Option[String]): DataFrame = {
    val gcols = groupCols.map(col)
    // Declared null contract: null group/order keys are filtered, not
    // silently lost in the offset equi-join.
    val nonNull = (gcols :+ col(orderCol))
      .map(_.isNotNull).reduce(_ && _)
    val d = df.where(nonNull)
      .withColumn("__tmd", tieMd5(tieCol))
      .withColumn("__tbkt", substring(col("__tmd"), 1, TieBucketLen))
    val hist = d.groupBy((gcols :+ col(orderCol) :+ col("__tbkt")): _*)
      .agg(count(lit(1)).as("__bnd_nb"))
    val ord = if (descending) col(orderCol).desc else col(orderCol).asc
    // TWO-LEVEL exclusive cumulative (the tokenBudgetSample shape).
    // One cumulative over the full (value, bucket) histogram would
    // put up to 4096 rows PER DISTINCT VALUE on the single-task
    // sorted frame — for a mid-cardinality metric with small tie
    // groups that frame approaches the corpus, re-growing through the
    // __bnd exemption the very hazard the buckets exist to kill.
    // Level 1 runs over the per-VALUE histogram (|distinct values|
    // rows — the bounded claim, __bnd-named so the WindowTripwire
    // sanctions it and its runtime audit sizes the claim per run);
    // level 2 is per-value over the tie buckets (<= 4096 rows per
    // partition BY CONSTRUCTION, __bnd-sanctioned likewise).
    val valHist = hist.groupBy((gcols :+ col(orderCol)): _*)
      .agg(sum(col("__bnd_nb")).as("__bnd_nv"))
    val valW = (if (groupCols.isEmpty) Window.orderBy(ord)
      else Window.partitionBy(gcols: _*).orderBy(ord))
      .rowsBetween(Window.unboundedPreceding, -1)
    val valOffs0 = valHist.withColumn("__voff",
      coalesce(sum(col("__bnd_nv")).over(valW), lit(0L)))
    val valOffs = (totalName match {
      case Some(_) =>
        val nW = if (groupCols.isEmpty) Window.partitionBy()
          else Window.partitionBy(gcols: _*)
        valOffs0.withColumn("__n", sum(col("__bnd_nv")).over(nW))
      case None => valOffs0
    }).drop("__bnd_nv")
    val bktW = Window.partitionBy((gcols :+ col(orderCol)): _*)
      .orderBy(col("__tbkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("__boff", coalesce(sum(col("__bnd_nb")).over(bktW), lit(0L)))
      .join(valOffs, groupCols :+ orderCol)
      .withColumn("__off", col("__voff") + col("__boff"))
      .drop("__bnd_nb", "__voff", "__boff")
    // Plain equi-join: AQE broadcasts the offsets when they are small.
    // NOT a pinned broadcast() — the histogram is |distinct (value,
    // bucket)| rows, which for an 8dp-rounded score can reach 1e8 at
    // corpus scale (the engine-wide rule: never pin broadcast on
    // corpus-scaled frames).
    val ranked = d.join(offs, groupCols ++ Seq(orderCol, "__tbkt"))
      .withColumn(rankName,
        col("__off") + row_number().over(
          Window.partitionBy((gcols :+ col(orderCol) :+ col("__tbkt")): _*)
            .orderBy(col("__tmd"), col(tieCol))))
      .drop("__tmd", "__tbkt", "__off")
    totalName match {
      case Some(n) => ranked.withColumnRenamed("__n", n)
      case None => ranked
    }
  }

  /** Exact 1-based global rank of every row under
    * (`orderCol` ASC, md5 tie order) — equal to `row_number().over(
    * Window.orderBy(orderCol, md5(coalesce(cast(tieCol as string),
    * '')), tieCol))` (spec-pinned, including the null-tie order)
    * without the single-partition sort and without a
    * corpus-scale tie-group partition. Rows with a NULL `orderCol`
    * are excluded (see the null contract above). `totalName`, when
    * set, also appends the total ranked row count N (needed by
    * [[exactNtile]]; computed as a window over the histogram, no
    * extra corpus pass). */
  def globalRank(df: DataFrame, orderCol: String, tieCol: String,
      rankName: String = "rank", totalName: Option[String] = None): DataFrame =
    rankCore(df, Nil, orderCol, tieCol, rankName,
      descending = false, totalName = totalName)

  /** Exact order-statistic quantiles of `orderCol` — the
    * `quantile_disc` rule (value of the ceil(p·N)-th smallest row,
    * integer arithmetic so any engine picks the identical row) as a
    * BROADCAST-ABLE |percentiles|-row frame (percentile, value), never
    * a corpus sort: the same histogram + cumulative-count shape as
    * [[globalRank]], with the pick a bounded-frame filter over the
    * histogram. Ties need no tiebreak — equal values are one histogram
    * row, and the order statistic is a VALUE. */
  def exactQuantiles(df: DataFrame, orderCol: String,
      percentiles: Seq[Int]): DataFrame =
    exactQuantilesBy(df.withColumn("__qk", lit(1)), "__qk", orderCol,
      percentiles).select(col("percentile"), col("value"))

  /** [[exactQuantiles]] grouped by `keyCol` — ONE corpus pass for any
    * number of groups and percentiles. The histogram is per (key,
    * value); the cumulative windows partition by the key (bounded:
    * |distinct values in that group| rows each); the percentile picks
    * ride one broadcast nested-loop join of the |percentiles|-row
    * literal frame against the histogram (bounded × tiny — explicitly
    * NOT a corpus-side theta join), so no branch of the plan rescans
    * `df` per percentile. The ceil(p·N/100) target rank is TRUE
    * integer arithmetic (`div`, no double rounding), exact at any N.
    * Rows with a NULL key or value are excluded (null contract
    * above). Output: (keyCol, percentile, value). */
  def exactQuantilesBy(df: DataFrame, keyCol: String, orderCol: String,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $percentiles")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .where(col(keyCol).isNotNull && col(orderCol).isNotNull)
      .groupBy(col(keyCol), col(orderCol))
      .agg(count(lit(1)).as("__bnd_nb"))
    // Bounded frames (|distinct values| rows per group) — __bnd
    // sanctions the cumulative windows for the WindowTripwire.
    val cum = hist
      .withColumn("__cum", sum(col("__bnd_nb"))
        .over(Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__bnd_nb"))
        .over(Window.partitionBy(col(keyCol))))
    val ps = percentiles.toDF("percentile")
    // target rank = ceil(p*N/100) = (p*N + 99) div 100, exact in
    // integer arithmetic; the quantile is the smallest value whose
    // cumulative count reaches it.
    cum.join(broadcast(ps),
        col("__cum") >= expr("(__n * percentile + 99) div 100"))
      .groupBy(col(keyCol), col("percentile"))
      .agg(min(col(orderCol)).as("value"))
  }

  /** Exact per-GROUP 1-based rank under (`orderCol` ASC|DESC, md5 tie
    * order) — equal to `row_number().over(Window.partitionBy(groupCols)
    * .orderBy(orderCol, md5(coalesce(cast(tieCol as string), '')),
    * tieCol))` (spec-pinned) without the group-scale sorted window. A window
    * partitioned by a LOW-cardinality key (source, length band, shard
    * group) is the same scale hazard as an unpartitioned one — the
    * dominant group's rows all sort on one task — and it is invisible
    * to [[graft.WindowTripwire]], which can only see that a partition
    * key exists. The histogram discipline applies unchanged: per-
    * (group, value, tie-bucket) counts, an exclusive cumulative over
    * that bounded frame, offsets equi-joined back (AQE broadcasts when
    * small), and a `row_number` whose partition is (group, value,
    * tie-bucket) — a pathological all-equal column degrades to
    * ~1/4096 of the group per task, never the group.
    *
    * Rows with a NULL group or order value are excluded (null
    * contract above; [[DataMix.balancedShards]] coalesces its weight
    * column first so no document can silently vanish). */
  def groupedRank(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, rankName: String,
      descending: Boolean = false): DataFrame =
    rankCore(df, groupCols, orderCol, tieCol, rankName,
      descending = descending, totalName = None)

  /** Exact `ntile(n)` under (`orderCol` ASC, md5 tie order) — bucket
    * boundaries and tie-splitting IDENTICAL to SQL `ntile` over the
    * same order (the first N mod n buckets hold ceil(N/n) rows, the
    * rest floor(N/n); ranks split ties across bucket edges exactly as
    * the global sort would), so an ntile oracle ordering by
    * (orderCol, md5(tie), tie) needs no semantic change. TRUE integer
    * arithmetic throughout (`div`, exact at any N — no 2^53 double
    * ceiling): with q = N div n and rem = N mod n, bucket(r) =
    * ceil(r/(q+1)) while r lands in the big buckets, else
    * rem + ceil((r - rem*(q+1))/q). */
  def exactNtile(df: DataFrame, orderCol: String, tieCol: String,
      n: Int, bucketName: String): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    val ranked = globalRank(df, orderCol, tieCol, "__r", totalName = Some("__nt"))
      .withColumn("__q", expr(s"__nt div CAST($n AS BIGINT)"))
      .withColumn("__rem", col("__nt") % n)
    val bigSpan = (col("__q") + 1) * col("__rem")
    // CaseWhen evaluates only the matched branch, so the small-bucket
    // arm's `div __q` never runs when q = 0 (N < n ⇒ all buckets big).
    val bucket = when(col("__r") <= bigSpan,
        expr("(__r + __q) div (__q + 1)"))
      .otherwise(col("__rem") +
        expr("(__r - (__q + 1) * __rem + __q - 1) div __q"))
    ranked.withColumn(bucketName, bucket.cast("int"))
      .drop("__r", "__nt", "__q", "__rem")
  }
}
