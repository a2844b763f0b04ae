package graft

import graft.functions.Md5Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-parity of the fused md5-56 kernels (r13) against the composed
  * Column spellings they replaced — the spellings the DuckDB oracle still
  * re-derives, so parity here IS the oracle contract for every consumer
  * (novelty, source overlap, containment, exact minhash, exact simhash).
  */
class Md5TextSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The pre-r13 composed spelling of gramKeys, verbatim. */
  private def composedGramKeys(documents: DataFrame, n: Int): DataFrame = {
    val toks = filter(split(col("text"), " "), w => length(w) > 0)
    documents
      .select(col("doc_id") +:
        Seq(explode(when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("gram")): _*)
      .select(col("doc_id"), graft.functions.HashConv.md5Long56(col("gram")).as("g"))
      .distinct()
  }

  /** The pre-r13 composed spelling of the exact-simhash signature. */
  private def composedSimhash(documents: DataFrame): DataFrame = {
    val words = documents
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), w => length(w) > 0)).as("w"))
      .select(col("doc_id"), graft.functions.HashConv.md5Long56(col("w")).as("h"))
    val bitSums = (0 until 56).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b"))
    words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 56).map(b =>
          shiftleft(when(col(s"b$b") > 0, 1L).otherwise(0L), b))
          .reduce(_ + _).as("sig"))
  }

  private val edgeDocs = docs(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a b c a b c a b c", // duplicate grams — the in-row dedup arm
    3L -> "one  two   three four", // multi-space runs → empty tokens dropped
    4L -> "", // no tokens
    5L -> "   ", // only separators
    6L -> "solo", // under n tokens
    7L -> "two words", // exactly n-1
    8L -> "naïve café über — αβγ 日本語 emoji 🙂 mix", // multi-byte UTF-8
    9L -> "x y", // n-1 again with distinct words
    10L -> " leading and trailing spaces ")

  test("gramKeys56 matches the composed md5/conv spelling on edge cases") {
    val fused = edgeDocs.select(col("doc_id"),
      explode(Md5Text.gramKeys56(col("text"), 3)).as("g"))
    val composed = composedGramKeys(edgeDocs, 3)
    assert(fused.count() === composed.count(), "one row per distinct (doc, gram)")
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
    // docs 4,5,6,7,9 carry no 3-gram
    val present = fused.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(present === Set(1L, 2L, 3L, 8L, 10L))
    // doc 2: 7 gram positions but only 3 distinct grams survive the dedup
    assert(fused.where(col("doc_id") === 2L).count() === 3L)
  }

  test("gramKeys56 matches the composed spelling on the real corpus (sf0.001)") {
    val documents = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (n <- Seq(2, 3, 5)) {
      val fused = documents.select(col("doc_id"),
        explode(Md5Text.gramKeys56(col("text"), n)).as("g"))
      val composed = composedGramKeys(documents, n)
      assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
        s"n=$n must be bit-identical to the oracle spelling")
    }
  }

  test("simhash56 matches the composed 56-sum spelling; wordless docs sentinel -1") {
    val fused = edgeDocs
      .select(col("doc_id"), Md5Text.simhash56(col("text")).as("sig"))
    assert(fused.where(col("text").isNull).isEmpty) // sanity: no null texts
    val sentinel = fused.where(col("sig") < 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sentinel === Set(4L, 5L), "only wordless docs take the sentinel")
    val composed = composedSimhash(edgeDocs)
    val joined = fused.where(col("sig") >= 0L).as("f")
      .join(composed.as("c"), col("f.doc_id") === col("c.doc_id"))
      .where(col("f.sig") =!= col("c.sig"))
    assert(joined.isEmpty, "signatures must be bit-identical")

    val documents = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fusedCorpus = documents
      .select(col("doc_id"), Md5Text.simhash56(col("text")).as("sig"))
      .where(col("sig") >= 0L)
    val composedCorpus = composedSimhash(documents)
    assert(fusedCorpus.count() === composedCorpus.count())
    assert(fusedCorpus.exceptAll(composedCorpus).isEmpty &&
      composedCorpus.exceptAll(fusedCorpus).isEmpty)
  }

  test("the 56-bit key equals Spark's own md5 prefix (single gram)") {
    // anchor the byte-level digest-prefix extraction against the engine
    // convention itself: md5("a b c") first 14 hex chars as a long
    val one = docs(1L -> "a b c")
    val viaKernel = one.select(explode(Md5Text.gramKeys56(col("text"), 3)).as("g"))
      .collect().map(_.getLong(0)).toSeq
    val viaConvention = one
      .select(graft.functions.HashConv.md5Long56(lit("a b c")).as("g"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaKernel === viaConvention)
  }
}
