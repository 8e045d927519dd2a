package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.C4Doc

/** Deliberate replica of the round-6 `GopherMeasures` bug: the JVM
  * BINARY array class name (`[Lorg...UTF8String;`) passed as the Java
  * cast type for `addReferenceObj`. Janino cannot parse the generated
  * cast, the stage fails to compile, and a production session would
  * silently run interpreted. Test-only — exists to prove the tripwire
  * catches exactly this class of bug. */
case class BrokenRefArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  @transient private lazy val arr: Array[UTF8String] =
    Array(UTF8String.fromString("x"))
  override def nullSafeEval(s: Any): Any = arr.length
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("brokenArr", arr,
      classOf[Array[UTF8String]].getName) // the bug: binary name, not Java source syntax
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $r.length;")
  }
  override protected def withNewChildInternal(c: Expression): BrokenRefArray =
    copy(child = c)
}

/** Codegen-health gate (VERDICT r06 items 1+2): a generated-code
  * compile error must be loud.
  *
  * Round 6 shipped with `GopherMeasures` silently deoptimizing every
  * plan that contained it — 256 green tests, a green oracle, and a
  * regenerated PLANS.md all failed to notice, because (a) production
  * Spark falls back to interpreted execution on codegen compile errors
  * and only logs a warning, and (b) every parity fixture was a
  * `Seq(...).toDF` LocalRelation that `ConvertToLocalRelation`
  * evaluated interpreted at OPTIMIZATION time, so the broken
  * `doGenCode` never even ran under test. This suite pins the fix and
  * the gate:
  *
  *   - the replica of the exact bug now THROWS under the strict test
  *     session and fires the `CodegenTripwire` counter (red branch);
  *   - the fixed `gopher_measures` executes inside WholeStageCodegen
  *     over a non-foldable physical source with zero fallbacks (green
  *     branch, batch);
  *   - the fused quality projection (q130's shape) runs compiled under
  *     a `MemoryStream` — the execution path the batch fixture can't
  *     reach — with zero fallbacks (green branch, streaming).
  */
class CodegenTripwireSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tripwire is red on the unfixed addReferenceObj pattern") {
    val before = CodegenTripwire.fallbacks
    val df = TestSpark.nonFoldable(Seq("alpha", "beta"))
      .select(ColumnBridge.column(
        BrokenRefArray(ColumnBridge.expression(col("text")))).as("n"))
    val thrown = intercept[Throwable] { df.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(thrown).exists(t =>
      String.valueOf(t.getMessage).toLowerCase.contains("compile")),
      s"strict session must surface the compile error, got: $thrown")
    assert(CodegenTripwire.fallbacks > before,
      "the log tripwire must record the compile failure")
    // Don't poison later suites: the deliberate failure is accounted for.
    CodegenTripwire.reset()
  }

  test("gopher_measures compiles and runs inside WholeStageCodegen (batch)") {
    val before = CodegenTripwire.fallbacks
    val docs = TestSpark.nonFoldable(Seq(
      "the cat sat on the mat and that have with more words here today",
      "short",
      "• bullet one\n• bullet two\nnormal line with the and of words…"))
      .select(monotonically_increasing_id().as("doc_id"), col("text"))
    val out = TextAnalysis.qualitySignals(docs, "doc_id", "text")
    val rows = out.collect()
    assert(rows.length == 3)
    assert(CodegenTripwire.fallbacks == before,
      s"no codegen fallback allowed, saw: ${CodegenTripwire.messages}")
    // `toString` renders whole-stage spans as a `*(n)` prefix; assert on
    // the physical node class so the pin is unambiguous.
    val plan = out.queryExecution.executedPlan
    val spans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(spans.nonEmpty,
      s"fused quality scan must run inside whole-stage codegen:\n$plan")
  }

  test("fused quality projection compiles under MemoryStream (q130 shape)") {
    implicit val sc = spark.sqlContext
    val before = CodegenTripwire.fallbacks
    val mem = MemoryStream[C4Doc]
    val out = TextAnalysis.qualitySignals(mem.toDF(), "doc_id", "text")
    val dir = TestSpark.tmpDir("cgw")
    val q = out.writeStream
      .format("memory").queryName("cgw_test")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        C4Doc(1L, "the cat sat on the mat and that have with more words"),
        C4Doc(2L, "@@@@ #### %%%% symbols only @@@@"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM cgw_test").as[Long].collect()
      assert(got.sorted.toSeq == Seq(1L, 2L))
      assert(CodegenTripwire.fallbacks == before,
        s"streaming gopher plan must compile, saw: ${CodegenTripwire.messages}")
    } finally q.stop()
  }
}
