package graft

import org.apache.spark.sql.functions._

/** Diagnostic: print the physical plan of one classifier GD-iteration
  * update job under BOTH training-cache layouts — the feature cache as
  * the feature aggregate leaves it (hash-partitioned by (doc_id, b);
  * the pre-r14 layout) vs repartitioned by doc_id at build (the r14
  * layout) — so the per-iteration Exchange removal is a checkable
  * artifact (plans/r14/q83_*): the doc-keyed score aggregate and the
  * feat/score/label joins reuse the cache's partitioning, leaving the
  * <= buckets-row gradient aggregate as the only shuffle.
  * `sbt "runMain graft.TrainPlan"` — plans to stdout, sf0.001.
  */
object TrainPlan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "graft-train-plan")
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
    def iterationPlan(partitionByDoc: Boolean): String = {
      // The docBuckets feature shape, inlined (the operator itself is
      // package-private): unigram+bigram hash buckets per doc.
      val featRaw = {
        import graft.functions.TextFunctions.{tokens, wordNgramsNative}
        val toks = tokens(col("text"))
        docs.select(col("doc_id"),
            explode(concat(toks, wordNgramsNative(toks, 2))).as("g"))
          .withColumn("b", graft.operators.DataMix.gramBucket(col("g"), 256))
          .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      }
      val feat = (if (partitionByDoc) featRaw.repartition(col("doc_id"))
                  else featRaw).persist()
      val labRaw = docs.select(col("doc_id"), col("y"))
      val lab = (if (partitionByDoc) labRaw.repartition(col("doc_id"))
                 else labRaw).persist()
      // Materialize the caches so the plan below shows the
      // InMemoryTableScan partitioning actually used per iteration.
      feat.queryExecution.toRdd.count(); lab.queryExecution.toRdd.count()
      // One iteration's update DAG under an empty weight table — the
      // exact shape QualityClassifier.train executes per iteration.
      val wDf = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("b",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.DecimalType(20, 8), nullable = false))))
      val p = feat
        .join(broadcast(wDf), Seq("b"), "left")
        .withColumn("nw", col("n").cast("decimal(10,0)") *
          coalesce(col("w"), lit(0).cast("decimal(20,8)")))
        .groupBy(col("doc_id")).agg(sum(col("nw")).as("z"))
        .select(col("doc_id"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 8)
            .cast("decimal(20,8)").as("p"))
      val upd = feat.join(p, Seq("doc_id")).join(lab, Seq("doc_id"))
        .groupBy(col("b"))
        .agg(sum(col("n").cast("decimal(10,0)") * (col("p") - col("y")))
          .as("gsum"))
      val s = upd.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      feat.unpersist(); lab.unpersist()
      s
    }
    println("==== BEFORE (caches as the feature agg leaves them) ====")
    println(iterationPlan(partitionByDoc = false))
    println("==== AFTER (caches repartitioned by doc_id at build) ====")
    println(iterationPlan(partitionByDoc = true))
    spark.stop()
  }
}
