package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against a linear scan of the base. No shuffle of the base except
  *    the final per-query top-k, which runs on the engine's bounded-heap
  *    [[graft.functions.TopKAgg]] so only k·queries rows per partition
  *    ever cross the wire.
  *  - [[lshTopK]]: random-hyperplane LSH — bucket base and queries by the
  *    sign-bit key, search only matching buckets. The 100 TB path: the scan
  *    is pruned to candidate buckets, trading recall for a ~2^bits fan-in
  *    reduction.
  *
  * Determinism: dot products accumulate CAST(x*y AS DECIMAL(28,18)) — exact,
  * order-independent — then one double division/sqrt (IEEE-exact), so Spark
  * and the DuckDB oracle agree bit-for-bit and ranking has no ulp ties;
  * remaining ties break on neighbor id.
  */
object Ann {

  /** Exact decimal dot product of two float arrays (cast to double per
    * element; products are IEEE-identical cross-engine, the decimal sum is
    * associative so parallelism can't reorder it into a different answer).
    */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(28,18)")),
      lit(0).cast("decimal(28,18)"),
      (acc, x) => (acc + x).cast("decimal(28,18)")
    )

  def norm(a: Column): Column = sqrt(dotDecimal(a, a).cast("double"))

  /** Per-query top-k ranking of a scored (qid, nid, cosine) frame via the
    * engine's bounded-heap [[graft.functions.TopKAgg]] instead of a
    * `row_number()` window: partials combine map-side, so the shuffle
    * carries at most k·queries·partitions rows — the answer, not the
    * candidate set. Ordering (cosine desc, nid asc) is encoded as the
    * struct's lexicographic order on (−cosine, nid); output is identical
    * to the window formulation (AnnSpec pins this). Caveat: for NaN cosines
    * negate(NaN)=NaN would sort GREATEST here while a `cosine desc` window
    * puts NaN first — so every caller excludes zero-norm vectors (the only
    * NaN source, 0/0) before scoring and the two formulations agree.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val item = struct(negate(col("cosine")).as("neg_cosine"), col("nid").as("nid"), col("cosine").as("cosine"))
    scored
      .groupBy("qid")
      .agg(graft.functions.TopKAgg.topK(item, k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.nid").as("nid"), col("col.cosine").as("cosine"),
        (col("pos") + 1).cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  def bruteForceTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 5): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
    val base = embeddings.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    // cosine is rounded to 12 dp: the decimal dot is exact, but sqrt/divide
    // accumulate engine-specific last-ulp noise; ranking on the rounded value
    // keeps ordering identical cross-engine (ties then break on nid).
    val scored = base.crossJoin(broadcast(q))
      .select(
        col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine")
      )
    rankTopK(scored, k)
  }

  /** Cheap double cosine for bucketing decisions (not oracle-checked —
    * `aggregate` folds sequentially, so still deterministic).
    */
  private def cosFast(a: Column, b: Column, an: Column, bn: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x) / (an * bn)

  /** IVF-style ANN: coarse quantizer (centroid set) partitions the base into
    * inverted lists; a query probes only its `nprobe` nearest centroids'
    * lists. At 100 TB the assignment is a write-once index (bucketed table
    * partitioned by cid); query cost drops from |base| to
    * nprobe/numCentroids of it. Centroids here are the first `numCentroids`
    * base vectors (deterministic seed — a k-means refinement pass drops in
    * without changing any plumbing).
    */
  def ivfTopK(embeddings: DataFrame, numCentroids: Int = 16, nprobe: Int = 4,
              numQueries: Int = 5, k: Int = 5): DataFrame = {
    val base = embeddings.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val centroids = base.orderBy("nid").limit(numCentroids)
      .select(col("nid").as("cid"), col("ne").as("ce"), col("nn").as("cn"))
    // inverted lists: each base vector → nearest centroid (argmax cosine,
    // ties to smallest cid), one broadcast + one partial-agg shuffle
    val assigned = base.crossJoin(broadcast(centroids))
      .groupBy("nid")
      .agg(
        max_by(col("cid"), struct(round(cosFast(col("ne"), col("ce"), col("nn"), col("cn")), 12).as("s"),
          (lit(0L) - col("cid")).as("t"))).as("cid"),
        first(col("ne")).as("ne"), first(col("nn")).as("nn"))
    // probe lists: nprobe nearest centroids per query (tiny cross join)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
    val wProbe = Window.partitionBy("qid")
      .orderBy(col("c_sim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qe"), col("qn"), col("cid"),
        round(cosFast(col("qe"), col("ce"), col("qn"), col("cn")), 12).as("c_sim"))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nprobe)
      .select("qid", "qe", "qn", "cid")
    // exact (decimal) scoring only inside probed lists
    val scored = probes.join(assigned, "cid")
      .select(col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine"))
    rankTopK(scored, k)
  }

  /** Random-hyperplane sign-bit bucket key — the readable Column-expression
    * REFERENCE formulation. Hyperplane h_i components are derived
    * deterministically from (table, i, dim) via xxhash64 → uniform in
    * [-0.5, 0.5): reproducible with zero stored state. Distinct `table`
    * values give independent hash tables for multi-probe recall
    * compounding. Hot paths use the bit-identical native
    * [[graft.functions.LshKeys.signKeys]] (this tree is numTables×bits×dim
    * multiply nodes — past what codegen handles well); LshKeysSpec pins the
    * two against each other bit-for-bit.
    */
  def lshKey(e: Column, dim: Int, bits: Int, table: Int = 0): Column = {
    def planeComponent(i: Int, d: Int): Column =
      (xxhash64(lit(s"plane:$table:$i:$d")).cast("double") / lit(Long.MaxValue.toDouble) / 2.0d)
    val bitCols = (0 until bits).map { i =>
      val dot = (0 until dim).map(d => get(e, lit(d)).cast("double") * planeComponent(i, d)).reduce(_ + _)
      when(dot >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat_ws("", bitCols: _*)
  }

  /** Embedding-cosine near-duplicate pairs: multi-table random-hyperplane
    * LSH. Each of `numTables` independent sign-bit keys buckets the base;
    * candidate pairs are the union of within-bucket pairs across tables,
    * deduplicated BEFORE scoring (a pair sharing 3 tables' buckets is scored
    * once, not 3×). The embedding leg of the dedup family (SURVEY §2 #24-27
    * cover text; this covers representations) — same bounded-bucket join
    * shape as minhash LSH banding, so candidate cost is Σ bucket² per table,
    * never n², and recall compounds as 1−(1−p^bits)^numTables.
    *
    * Scoring uses the sequential-fold double cosine (deterministic: Spark
    * folds `aggregate` left-to-right within a row) rounded to 12 dp — this
    * path is verified against brute force in AnnSpec rather than a SQL
    * oracle, so the decimal-exact machinery of [[bruteForceTopK]] isn't
    * needed in the hot loop.
    *
    * Shuffle shape (the 100 TB property): candidate generation shuffles
    * (vec_id, bucket) longs ONLY — 16 bytes/row regardless of embedding
    * width or numTables. The full embeddings cross the wire exactly once
    * per join side, fetched back by vec_id for scoring, instead of riding
    * numTables exploded copies through the bucket self-join (which would
    * shuffle ~2·numTables× the corpus).
    */
  def embeddingNearDupPairs(embeddings: DataFrame, dim: Int = 64, bits: Int = 8,
                            numTables: Int = 8, threshold: Double = 0.4): DataFrame = {
    val keys = graft.functions.LshKeys.signKeys(col("embedding"), dim, bits, numTables)
    val keyed = embeddings.select(col("vec_id"), explode(keys).as("bucket"))
    // candidate pairs, deduped across tables before the expensive dot product
    val candidates = keyed.as("a")
      .join(keyed.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val base = embeddings.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    candidates
      .join(base.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
      .join(base.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosFast(col("ea"), col("eb"), col("na"), col("nb")), 12).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  def lshTopK(embeddings: DataFrame, dim: Int = 64, bits: Int = 8,
              numQueries: Int = 5, k: Int = 5): DataFrame = {
    val keyed = embeddings.select(col("vec_id"), col("embedding"),
      get(graft.functions.LshKeys.signKeys(col("embedding"), dim, bits, 1), lit(0)).as("bucket"))
    val q = keyed.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"), col("bucket"))
      .where(col("qn") > 0)
    val base = keyed.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"), col("bucket"))
      .where(col("nn") > 0)
    val scored = base.join(broadcast(q), "bucket")
      .select(col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine"))
    rankTopK(scored, k)
  }
}
