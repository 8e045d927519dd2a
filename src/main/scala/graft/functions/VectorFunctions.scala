package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns
  * (BASELINE.json north star: similarity search at 100 TB scale).
  *
  * Built on `zip_with`/`aggregate` higher-order functions: codegen'd,
  * null-safe-enough for the synthetic tables, and identical semantics to
  * the DuckDB oracle (`list_cosine_similarity` on DOUBLE[]) when elements
  * are cast to double first — float-accumulated dot products would drift
  * from the oracle's double accumulation.
  */
object VectorFunctions {

  /** Elementwise-double dot product over `array<float>` columns (the
    * embeddings layout), via the native codegen'd
    * [[graft.functions.expr.FloatDotProduct]] — the declarative
    * `aggregate(zip_with(...))` form is interpreted (CodegenFallback)
    * and allocates per evaluation, which dominates in pairwise scoring
    * loops. For other element types use [[dotHof]] (same arithmetic). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Declarative dot product (any numeric element type, interpreted). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: one bit per
    * hyperplane = sign of the dot product with a fixed random direction.
    *
    * Hyperplanes are generated driver-side from a fixed seed and folded
    * into the expression as literals — deterministic across runs and
    * cluster layouts. `dim` x `bits` doubles live in the plan (tiny).
    *
    * Scale path: bucket id becomes the shuffle key, so candidate
    * generation for ANN is a hash-partitioned equi-join instead of a
    * cross join — the difference between O(n^2) and O(sum of bucket^2). */
  def hyperplaneBucket(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    // Gaussian directions; sign-of-dot is invariant to normalization.
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    val bitCols = planes.zipWithIndex.map { case (plane, b) =>
      val d = aggregate(
        zip_with(vec, array(plane.map(lit): _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Multi-table LSH keys: `tables` independent `bits`-bit hyperplane
    * buckets, each prefixed with its table id. Two vectors are
    * candidates if they collide in ANY table — recall
    * 1-(1-p^bits)^tables for per-plane agreement probability p, the
    * standard L-table construction. Measured on the synthetic corpus
    * (near-orthogonal embeddings, recall@10 vs brute force):
    * single-table bits=2 gives 0.40; 8 tables at bits=2 give 0.98.
    * Grow `bits` with corpus size (bucket occupancy ~n/2^bits) and
    * `tables` with the recall target. */
  def hyperplaneTableKeys(vec: Column, dim: Int, bits: Int, tables: Int,
      seed: Long = 42L): Column =
    array((0 until tables).map { t =>
      concat(lit(s"$t|"),
        hyperplaneBucket(vec, dim, bits, seed + 1000L * t).cast("string"))
    }: _*)
}
