package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FreqSketch

/** Exact corpus-wide frequent terms via the two-pass sketch protocol:
  *
  *   pass 1 — one Misra–Gries aggregate ([[graft.functions.FreqSketch]])
  *   over the token stream yields ≤ m candidate terms plus the exact
  *   stream length N. Map-side partials bound the shuffle at m counters
  *   per partition; the driver holds ≤ m strings (bounded by
  *   construction, not by data volume).
  *
  *   pass 2 — exact counts for the candidates only: the m-term set
  *   compiles to a codegen'd InSet probe at the scan (map-only filter,
  *   no join), then one partial-agg groupBy over ≤ m distinct keys.
  *
  * The MG guarantee (any term with count > N/(m+1) survives pass 1)
  * makes the final answer EXACT — not approximate — for any support
  * threshold φ ≥ 1/(m+1): candidates ⊇ {terms with count ≥ φN}, and
  * pass 2 replaces sketch weights with true counts. The candidate SET
  * from pass 1 varies with merge order; the thresholded pass-2 output
  * does not (spec'd under repartition).
  *
  * This is the dataset-card "vocabulary head" statistic — at 100 TB a
  * full token GROUP BY shuffles the vocabulary (billions of keys); this
  * shuffles m counters per partition and then ≤ m keys.
  */
object HeavyHitters {

  /** Terms appearing in at least fraction 1/`supportDenom` of all
    * tokens, with exact counts, ordered count-desc then term-asc.
    * Requires m + 1 ≥ supportDenom so the MG guarantee covers the
    * threshold.
    */
  def frequentTerms(
      docs: DataFrame,
      supportDenom: Long = 500L,
      m: Int = 1024): DataFrame = {
    require(m + 1 >= supportDenom,
      s"capacity m=$m too small for support 1/$supportDenom (need m+1 >= denom)")
    val tokens = docs.select(explode(split(col("text"), " ")).as("term"))
    // one job: sketch + exact N share the same partial-agg pass
    val row = tokens.agg(
      FreqSketch.mgSketch(col("term"), m).as("sketch"),
      count(lit(1)).as("n")).head()
    val candidates = row.getMap[String, Long](0).keys.toSeq
    val n = row.getLong(1)
    tokens
      .where(col("term").isInCollection(candidates))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(supportDenom) >= lit(n))
      .orderBy(col("cnt").desc, col("term"))
  }
}
