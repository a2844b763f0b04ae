package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text → fixed-dim vector bridge (the hashing trick / signed feature
  * hashing): every token lands in `pmod(hash(token), dim)` with a ±1 sign
  * from an independent hash bit, so E[dot(u,v)] = 0 for unrelated docs and
  * shared vocabulary accumulates positive cosine — the classic model-free
  * document embedding (Weinberger et al. 2009). This closes the loop
  * between the text stack and the embedding stack: [[Ann.semanticDedup]],
  * near-dup pairs, and every ANN index run directly on corpus text with no
  * external model.
  *
  * Scale shape: MAP-ONLY — one aggregate HOF per row folds the token array
  * into the dim-width vector (O(tokens·dim) arithmetic inside codegen-
  * friendly higher-order functions, zero shuffles, zero joins; plan-assert
  * spec'd). At dim 64 that is ~100× fewer bytes than the text it encodes;
  * downstream ops shuffle ids and buckets, never the text.
  */
object TextVectors {

  /** Signed-hash token bucket: (index, ±1). Independent xxhash64 salts for
    * position and sign keep the two uncorrelated.
    */
  private def idx(t: Column, dim: Int): Column = pmod(xxhash64(lit("tv:idx"), t), lit(dim.toLong))
  private def sgn(t: Column): Column =
    when(pmod(xxhash64(lit("tv:sgn"), t), lit(2L)) === 0L, lit(1.0f)).otherwise(lit(-1.0f))

  /** (doc_id → vec_id, embedding: array<float> of `dim`, L2-normalized;
    * empty/whitespace docs yield the zero vector, which every downstream
    * op already norm-filters).
    *
    * Computed by the native one-pass kernel
    * ([[graft.functions.TextHashes.hashedVec]]): the original HOF fold
    * (kept below as [[hashedVectorsHof]], the spec's cross-check
    * reference) rebuilt the dim-array per token through interpreted
    * lambdas — tokens×dim ArrayTransform evals per row, measured ~2 min
    * per sf0.1 corpus scan in the driver's bench, the exact failure mode
    * TextHashes' scaladoc documents for SimHash. Same output bit-for-bit
    * (TextVectorsSpec).
    */
  def hashedVectors(documents: DataFrame, dim: Int = 64): DataFrame =
    documents.select(
      col("doc_id").as("vec_id"),
      graft.functions.TextHashes.hashedVec(col("text"), dim).as("embedding"))

  /** The declarative HOF formulation — semantically the spec of
    * [[hashedVectors]]; interpreted (CodegenFallback) and O(tokens·dim)
    * array rebuilds per row, so tests only.
    */
  def hashedVectorsHof(documents: DataFrame, dim: Int = 64): DataFrame = {
    // empty tokens (leading/double/trailing spaces, empty docs) carry no
    // signal and would otherwise hash into a real bucket
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val zero = array_repeat(lit(0.0f), dim)
    val summed = aggregate(toks, zero,
      (acc, t) => {
        val i = idx(t, dim)
        val s = sgn(t)
        transform(acc, (v, j) => v + when(j.cast("long") === i, s).otherwise(lit(0.0f)))
      })
    val nrm = sqrt(aggregate(summed, lit(0.0d), (a, v) => a + (v * v).cast("double")))
    documents.select(
      col("doc_id").as("vec_id"),
      when(nrm > 0.0d,
        transform(summed, v => (v / nrm).cast("float")))
        .otherwise(zero).as("embedding"))
  }
}
