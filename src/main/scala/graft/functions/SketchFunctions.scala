package graft.functions

import org.apache.spark.sql.Column

import graft.functions.expr.BloomRef

/** Column wrappers for the sketch-backed kernels (the
  * [[TextFunctions]] convention for the Bloom family). */
object SketchFunctions {

  /** Approximate membership of a 64-bit key column in a referenced
    * Bloom filter — false is definite non-membership, true needs an
    * exact confirm at rate fpp. */
  def bloomMightContain(bloom: BloomRef, h64: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.BloomMightContain(
      ColumnBridge.expression(h64), bloom))
  }
}
