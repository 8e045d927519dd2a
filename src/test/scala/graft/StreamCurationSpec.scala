package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{DataMix, TextAnalysis}

case class CurDoc(doc_id: Long, text: String)

case class LmDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

case class EmbCurDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
    embedding: Seq[Float])

/** The stateless curation operators (redaction, quality scoring,
  * stratified sampling, chunking) are pure per-row transformations, so
  * the SAME operator code runs on a Structured Streaming source
  * unchanged — this spec pins that batch/streaming parity. At 100 TB
  * that is the difference between a backfill pipeline and a live one:
  * one operator library serves both.
  */
class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  

  private val docs = Seq(
    CurDoc(1L, "mail me at a@b.co or visit https://x.io today"),
    CurDoc(2L, "the quick brown fox jumps over the lazy dog"),
    CurDoc(3L, "el rapido zorro marron salta sobre el perro"),
    CurDoc(4L, "short"))

  test("redact + quality + sample give identical results in batch and streaming") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CurDoc]
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val redacted = TextAnalysis.redact(df, "doc_id", "text")
      val scored = TextAnalysis.qualityScore(
        redacted.withColumnRenamed("clean_text", "text"), "doc_id", "text")
      DataMix.stratifiedSample(
        redacted.join(scored, "doc_id"),
        "doc_id", "clean_text", fractions = Map.empty, default = 0.9)
    }
    val q = curate(mem.toDF()).writeStream
      .format("memory").queryName("stream_curation")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("scur")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streaming = spark.sql("SELECT * FROM stream_curation")
        .orderBy("doc_id").collect().toSeq
      val batch = curate(docs.toDF()).orderBy("doc_id").collect().toSeq
      assert(streaming == batch, "one operator library must serve both modes")
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("gopher rules run unchanged on a stream (stateless parity)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CurDoc]
    def gate(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.gopherRules(df, "doc_id", "text", minWords = 3)
    val q = gate(mem.toDF()).writeStream
      .format("memory").queryName("stream_gopher")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("sgph")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streaming = spark.sql("SELECT * FROM stream_gopher")
        .orderBy("doc_id").collect().toSeq
      val batch = gate(docs.toDF()).orderBy("doc_id").collect().toSeq
      assert(streaming == batch)
      assert(streaming.size == docs.size)
    } finally q.stop()
  }

  test("classifier scoring: stream scored under batch-trained weights == batch operator") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    import graft.operators.QualityClassifier
    val mem = MemoryStream[LmDoc]
    // Train on the full doc set (doc 2's vocabulary positive): every
    // stream gram is trained, so stream scores must equal batch.
    val labeled = docs.toDF().withColumn("y",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("doc_id") === 2L, 1).otherwise(0))
    val w = QualityClassifier.train(labeled, "doc_id", "text", "y",
      buckets = 128, iters = 2, lr = 0.5).persist()
    val scored = StreamClassifier.score(mem.toDF(), w, buckets = 128,
      "doc_id", "text", "ts", delay = "5 seconds", windowDur = "1 minute")
    val q = scored.writeStream
      .format("memory").queryName("stream_classifier")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("sclf")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs.map(d => LmDoc(d.doc_id, t("2024-01-01 00:00:10"), d.text)): _*)
      q.processAllAvailable()
      mem.addData(LmDoc(99L, t("2024-01-01 00:30:00"), "late watermark sentinel"))
      q.processAllAvailable()
      mem.addData(LmDoc(98L, t("2024-01-01 00:31:00"), "second sentinel"))
      q.processAllAvailable()
      val streaming = spark.sql(
        "SELECT doc_id, score, predicted FROM stream_classifier WHERE doc_id < 90")
        .orderBy("doc_id").as[(Long, Double, Boolean)].collect().toSeq
      val batch = QualityClassifier.score(docs.toDF(), "doc_id", "text", w,
          buckets = 128)
        .select("doc_id", "score", "predicted")
        .orderBy("doc_id").as[(Long, Double, Boolean)].collect().toSeq
      assert(streaming == batch,
        "streaming scores must equal the batch operator's, row for row")
      assert(streaming.size == docs.size, "every on-time document must emit")
    } finally { q.stop(); w.unpersist() }
  }

  test("LM scoring: stream scored against batch-trained counts == batch operator") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[LmDoc]
    val train = docs.toDF()
    val stats = TextAnalysis.lmTrain(train, "text").persist()
    val scored = StreamLmScore.score(mem.toDF(), stats, "doc_id", "text", "ts",
      delay = "5 seconds", windowDur = "1 minute")
    val q = scored.writeStream
      .format("memory").queryName("stream_lm")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("slm")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs.map(d => LmDoc(d.doc_id, t("2024-01-01 00:00:10"), d.text)): _*)
      q.processAllAvailable()
      // Two later batches push the watermark past the first window's
      // end so its finished scores emit in append mode.
      mem.addData(LmDoc(99L, t("2024-01-01 00:30:00"), "late watermark sentinel"))
      q.processAllAvailable()
      mem.addData(LmDoc(98L, t("2024-01-01 00:31:00"), "second sentinel"))
      q.processAllAvailable()
      val streaming = spark.sql(
        "SELECT doc_id, n_bigrams, avg_logprob FROM stream_lm WHERE doc_id < 90")
        .orderBy("doc_id").collect().toSeq
      val batch = TextAnalysis.ngramLmScore(train, docs.toDF(), "doc_id", "text")
        .select("doc_id", "n_bigrams", "avg_logprob")
        .orderBy("doc_id").collect().toSeq
      assert(streaming == batch,
        "streaming scores must equal the batch operator's, row for row")
      assert(streaming.size == docs.size, "every on-time document must emit")
    } finally { q.stop(); stats.unpersist() }
  }

  test("importance scoring: stream scored against batch-trained ratios == batch operator") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[LmDoc]
    // Train on the full doc set as raw, doc 2 as target, then stream
    // the SAME raw docs — every bucket is trained, so scores must
    // equal the batch operator's importance column exactly.
    val raw = docs.toDF()
    val target = docs.filter(_.doc_id == 2L).toDF()
    val stats = DataMix.importanceTrain(raw, target, "doc_id", "text",
      buckets = 256).persist()
    val scored = StreamImportance.score(mem.toDF(), stats, "doc_id", "text",
      "ts", delay = "5 seconds", windowDur = "1 minute")
    val q = scored.writeStream
      .format("memory").queryName("stream_importance")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("simp")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs.map(d => LmDoc(d.doc_id, t("2024-01-01 00:00:10"), d.text)): _*)
      q.processAllAvailable()
      mem.addData(LmDoc(99L, t("2024-01-01 00:30:00"), "late watermark sentinel"))
      q.processAllAvailable()
      mem.addData(LmDoc(98L, t("2024-01-01 00:31:00"), "second sentinel"))
      q.processAllAvailable()
      val streaming = spark.sql(
        "SELECT doc_id, importance FROM stream_importance WHERE doc_id < 90")
        .orderBy("doc_id").as[(Long, Double)].collect().toSeq
      val batch = DataMix.importanceResample(raw, target, "doc_id", "text",
        buckets = 256, take = docs.size)
        .select("doc_id", "importance")
        .orderBy("doc_id").as[(Long, Double)].collect().toSeq
      assert(streaming == batch,
        "streaming importance must equal the batch operator's, row for row")
      assert(streaming.size == docs.size, "every on-time document must emit")
    } finally { q.stop(); stats.unpersist() }
  }

  test("decontamination: stream screened against static benchmark == batch operator") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[LmDoc]
    // Benchmark = doc 2's text: doc 2 is fully contaminated, the rest
    // share no 3-gram with it.
    val bench = docs.filter(_.doc_id == 2L).toDF()
    val bsh = StreamDecontaminate.benchmarkShingles(bench, "doc_id", "text", n = 3)
    bsh.persist()
    val screened = StreamDecontaminate.contaminated(mem.toDF(), bsh,
      "doc_id", "text", "ts", n = 3, delay = "5 seconds", windowDur = "1 minute")
    val q = screened.writeStream
      .format("memory").queryName("stream_decon")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("sdec")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(docs.map(d => LmDoc(d.doc_id, t("2024-01-01 00:00:10"), d.text)): _*)
      q.processAllAvailable()
      mem.addData(LmDoc(99L, t("2024-01-01 00:30:00"), "late watermark sentinel"))
      q.processAllAvailable()
      mem.addData(LmDoc(98L, t("2024-01-01 00:31:00"), "second sentinel"))
      q.processAllAvailable()
      val streaming = spark.sql(
        "SELECT doc_id, n_contaminated_shingles FROM stream_decon WHERE doc_id < 90")
        .orderBy("doc_id").collect().toSeq
      val batch = graft.operators.TextDedup.contaminated(
        docs.toDF(), bench, "doc_id", "text", n = 3)
        .orderBy("doc_id").collect().toSeq
      assert(streaming == batch,
        "streaming contamination counts must equal the batch operator's")
      assert(streaming.map(_.getLong(0)) == Seq(2L),
        "only the benchmark-copied doc is contaminated")
    } finally { q.stop(); bsh.unpersist() }
  }

  test("composed streaming curation: gate + first-seen dedup + sample, no joins") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val goodEn = "the quick brown fox jumps over the lazy dog while the calm " +
      "river flows past the old stone bridge near the quiet village green"
    val goodEs = "el zorro marron salta sobre el perro perezoso mientras la " +
      "luna brilla sobre el valle y la gente duerme en la aldea tranquila"
    val mem = MemoryStream[LmDoc]
    val out = StreamCuration.curate(mem.toDF(), "doc_id", "text", "ts",
      delay = "10 minutes")
    // One stateful operator only: the within-watermark dedup.
    val q = out.writeStream
      .format("memory").queryName("stream_curate_full")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("scf")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        LmDoc(1L, t("2024-01-01 00:00:10"), goodEn),
        LmDoc(3L, t("2024-01-01 00:00:11"), "z z z z z z"), // gate casualty
        LmDoc(4L, t("2024-01-01 00:00:12"), goodEs))
      q.processAllAvailable()
      // Second micro-batch: an exact (case-varied) dup of doc 1 inside
      // the horizon — dropped deterministically as not-first-seen.
      mem.addData(LmDoc(2L, t("2024-01-01 00:01:00"), goodEn.toUpperCase))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, detected_lang, quality_score FROM stream_curate_full")
        .orderBy("doc_id").collect().toSeq
      assert(rows.map(_.getLong(0)) == Seq(1L, 4L),
        "low quality and not-first-seen content must be dropped")
      val langs = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(langs == Map(1L -> "en", 4L -> "es"))
      assert(rows.forall(_.getDouble(2) >= 0.5))
    } finally q.stop()
  }

  test("composed streaming curation with the model gate stays join-free") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    import graft.operators.QualityClassifier
    val goodEn = "the quick brown fox jumps over the lazy dog while the calm " +
      "river flows past the old stone bridge near the quiet village green"
    // Alien vocabulary long enough to PASS the heuristic gate; only
    // the model gate can drop it.
    val alien = "qq1 ww2 ee3 rr4 tt5 yy6 uu7 ii8 oo9 pp0 aa1 ss2 dd3 ff4 " +
      "gg5 hh6 jj7 kk8 ll9 zz0 qq2 ww3 ee4 rr5"
    val w = QualityClassifier.train(
      Seq((10L, goodEn, 1), (12L, alien, 0)).toDF("doc_id", "text", "y"),
      "doc_id", "text", "y", buckets = 128, iters = 3, lr = 0.5)
    val model = QualityClassifier.weightsModel(w, buckets = 128)
    val mem = MemoryStream[LmDoc]
    val out = StreamCuration.curate(mem.toDF(), "doc_id", "text", "ts",
      delay = "10 minutes", classifier = Some(model))
    // Still no joins: the model gate is a kernel column, not a
    // stream-static join.
    val q = out.writeStream
      .format("memory").queryName("stream_curate_model")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("scm")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        LmDoc(1L, t("2024-01-01 00:00:10"), goodEn),
        LmDoc(2L, t("2024-01-01 00:00:11"), alien))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM stream_curate_model")
        .as[Long].collect().toSet
      assert(ids == Set(1L), "the model gate drops the alien doc on-stream")
      val plan = out.queryExecution.analyzed.toString
      assert(!plan.toLowerCase.contains("join"),
        s"model-gated streaming curation must stay join-free:\n$plan")
    } finally q.stop()
  }

  test("composed streaming curation with the SEMANTIC gate (stream-static anti join)") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    import graft.operators.VectorSim
    val goodEn = "the quick brown fox jumps over the lazy dog while the calm " +
      "river flows past the old stone bridge near the quiet village green"
    val goodEs = "el zorro marron salta sobre el perro perezoso mientras la " +
      "luna brilla sobre el valle y la gente duerme en la aldea tranquila"
    // Composed corpus state: two embedded docs.
    val stateEmb = Seq(
      (101L, Seq(1f, 0f, 0f, 0f)),
      (102L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val cen = VectorSim.kmeansCentroids(stateEmb, 2, 2)
    val state = StreamSemanticGate.stateCells(stateEmb, cen).persist()
    state.count()
    val mem = MemoryStream[EmbCurDoc]
    val out = StreamCuration.curate(mem.toDF(), "doc_id", "text", "ts",
      delay = "10 minutes",
      semantic = Some((state, cen, 0.99, 1)))
    val q = out.writeStream
      .format("memory").queryName("stream_curate_sem")
      .outputMode("append")
      .option("checkpointLocation", s"${TestSpark.tmpDir("scs")}/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        // Paraphrase of state 101 (cosine ~0.999): semantic casualty.
        EmbCurDoc(1L, t("2024-01-01 00:00:10"), goodEn, Seq(0.999f, 0.04f, 0f, 0f)),
        // Novel embedding direction: passes every gate.
        EmbCurDoc(2L, t("2024-01-01 00:00:11"), goodEs, Seq(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, detected_lang FROM stream_curate_sem")
        .as[(Long, String)].collect().toMap
      assert(rows == Map(2L -> "es"),
        "the state paraphrase drops; the novel doc lands curated")
      // The embedding column is a gate input, not an output.
      assert(!spark.table("stream_curate_sem").columns.contains("embedding"))
    } finally { q.stop(); state.unpersist() }
  }
}
