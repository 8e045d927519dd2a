package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact global ranking (VERDICT r07 item 1).
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
  * Shape: one map-side-combined `groupBy(orderCol)` builds the
  * distinct-value histogram; an exclusive cumulative sum over that
  * SMALL frame (|distinct values| rows, never corpus rows — its window
  * columns carry the [[graft.WindowTripwire.Marker]] prefix marking the
  * frame bounded) yields each value's global offset; a broadcast join
  * puts the offset back on every row; and a `row_number` over the
  * PER-VALUE partition (ordered by the tiebreak) completes the exact
  * 1-based dense global rank. The only unbounded per-row window is
  * partitioned by `orderCol` — partition size = tie-group size, which
  * for a continuous score is tiny; a pathological all-one-value column
  * degrades to the tie-group, not the corpus.
  */
object Ranking {

  /** Exact 1-based global rank of every row under
    * (`orderCol` ASC, `tieCol` ASC) — equal to
    * `row_number().over(Window.orderBy(orderCol, tieCol))` (spec-pinned)
    * without the single-partition sort. `totalName`, when set, also
    * appends the total row count N (needed by [[exactNtile]]; computed
    * as a window over the histogram, no extra corpus pass). */
  def globalRank(df: DataFrame, orderCol: String, tieCol: String,
      rankName: String = "rank", totalName: Option[String] = None): DataFrame = {
    val hist = df.groupBy(col(orderCol)).agg(count(lit(1)).as("__bnd_nb"))
    // Bounded frame: |distinct orderCol values| rows. The __bnd_nb
    // column name sanctions these two unpartitioned windows for the
    // WindowTripwire (they run over the histogram, not the corpus).
    val offs = hist
      .withColumn("__off", coalesce(sum(col("__bnd_nb"))
        .over(Window.orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__bnd_nb")).over(Window.partitionBy()))
      .drop("__bnd_nb")
    // Plain equi-join: AQE broadcasts the offsets when they are small.
    // NOT a pinned broadcast() — the histogram is |distinct values|
    // rows, which for an 8dp-rounded score can reach 1e8 at corpus
    // scale; a forced broadcast would grow with the corpus (the
    // engine-wide rule: never pin broadcast on corpus-scaled frames).
    val ranked = df.join(offs, Seq(orderCol))
      .withColumn(rankName,
        col("__off") + row_number().over(
          Window.partitionBy(col(orderCol)).orderBy(col(tieCol))))
    totalName match {
      case Some(n) => ranked.withColumnRenamed("__n", n).drop("__off")
      case None => ranked.drop("__off", "__n")
    }
  }

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
    * `df` per percentile. Output: (keyCol, percentile, value). */
  def exactQuantilesBy(df: DataFrame, keyCol: String, orderCol: String,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $percentiles")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.groupBy(col(keyCol), col(orderCol))
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
        col("__cum") >= ((col("__n") * col("percentile") + 99) / 100).cast("long"))
      .groupBy(col(keyCol), col("percentile"))
      .agg(min(col(orderCol)).as("value"))
  }

  /** Exact per-GROUP 1-based rank under (`orderCol` ASC|DESC, `tieCol`
    * ASC) — equal to `row_number().over(Window.partitionBy(groupCols)
    * .orderBy(orderCol, tieCol))` (spec-pinned) without the group-scale
    * sorted window. A window partitioned by a LOW-cardinality key
    * (source, length band, shard group) is the same scale hazard as an
    * unpartitioned one — the dominant group's rows all sort on one
    * task — and it is invisible to [[graft.WindowTripwire]], which can
    * only see that a partition key exists. The histogram discipline
    * applies unchanged: per-(group, value) counts, an exclusive
    * cumulative over that bounded frame (|distinct values per group|
    * rows), offsets equi-joined back (AQE broadcasts when small), and
    * a `row_number` whose partition is the TIE GROUP (group, value) —
    * a pathological all-equal column degrades to the tie group, never
    * the whole group.
    *
    * Null contract: the offset join is an equi-join, so rows with a
    * NULL group or order value are dropped (a sorted window would rank
    * them nulls-first). Callers rank non-null metrics (token counts,
    * scores); pre-filter or coalesce if nullable keys ever matter. */
  def groupedRank(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, rankName: String,
      descending: Boolean = false): DataFrame = {
    val gcols = groupCols.map(col)
    val hist = df.groupBy((gcols :+ col(orderCol)): _*)
      .agg(count(lit(1)).as("__bnd_nb"))
    val ord = if (descending) col(orderCol).desc else col(orderCol).asc
    // Bounded frame — __bnd sanctions the cumulative for the tripwire
    // when groupCols is empty (the partitioned forms are bounded by
    // |distinct values per group| regardless).
    val histW = (if (groupCols.isEmpty) Window.orderBy(ord)
      else Window.partitionBy(gcols: _*).orderBy(ord))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("__off", coalesce(sum(col("__bnd_nb")).over(histW), lit(0L)))
      .drop("__bnd_nb")
    df.join(offs, groupCols :+ orderCol)
      .withColumn(rankName,
        col("__off") + row_number().over(
          Window.partitionBy((gcols :+ col(orderCol)): _*)
            .orderBy(col(tieCol))))
      .drop("__off")
  }

  /** Exact `ntile(n)` under (`orderCol` ASC, `tieCol` ASC) — bucket
    * boundaries and tie-splitting IDENTICAL to SQL `ntile` (the first
    * N mod n buckets hold ceil(N/n) rows, the rest floor(N/n); ranks
    * split ties across bucket edges exactly as the global sort would),
    * so an existing ntile oracle needs no semantic change. Integer
    * arithmetic throughout: with q = N div n and rem = N mod n,
    * bucket(r) = ceil(r/(q+1)) while r lands in the big buckets, else
    * rem + ceil((r - rem*(q+1))/q). */
  def exactNtile(df: DataFrame, orderCol: String, tieCol: String,
      n: Int, bucketName: String): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    val ranked = globalRank(df, orderCol, tieCol, "__r", totalName = Some("__nt"))
    val q = (col("__nt") / n).cast("long")
    val rem = col("__nt") % n
    val bigSpan = (q + 1) * rem
    val bucket = when(col("__r") <= bigSpan,
        ((col("__r") + q) / (q + 1)).cast("long"))
      .otherwise(rem + ((col("__r") - bigSpan + q - 1) / q).cast("long"))
    ranked.withColumn(bucketName, bucket.cast("int")).drop("__r", "__nt")
  }
}
