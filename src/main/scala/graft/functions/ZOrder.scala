package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) key construction from built-in bitwise columns — the
  * classic magic-mask bit spread, expressed entirely in codegen'd
  * functions (shiftleft / bitwiseAND / bitwiseOR), no UDF and no custom
  * Expression: four mask rounds spread 16 bits across 32, and two
  * spreads interleave into one key.
  *
  * Why the engine wants this: parquet stores per-file and per-row-group
  * min/max for every column, and readers (Spark's footer filter, any
  * lakehouse scan) skip files whose [min,max] box misses the predicate.
  * A layout sorted by ONE column gives tight boxes on that column only —
  * a filter on the other column prunes nothing. Sorting by the Morton
  * key gives every file a LOCAL box in BOTH dimensions (the curve visits
  * space in nested quads), so two-dimensional point/range predicates
  * prune on either axis. See [[graft.operators.Layout]] for the writer
  * and the measured pruning spec.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit lane: bit i moves to bit 2i. Input outside 0..65535 is
    * masked (callers normalize first — [[graft.operators.Layout]]).
    */
  def spread16(c: Column): Column = {
    val rounds = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    rounds.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** 32-bit Morton key of two 16-bit lanes: a's bits land on even
    * positions, b's on odd.
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference scalar implementation for specs. */
  def mortonRef(a: Int, b: Int): Long = {
    var r = 0L
    var i = 0
    while (i < 16) {
      r |= ((a >> i) & 1).toLong << (2 * i)
      r |= ((b >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    r
  }
}
