package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pipeline-integrity operators: gap detection, last-valid watermark, reorg
  * fingerprint check, complete-group selection, incremental import.
  *
  * Reference semantics:
  *  - `Sources/GapSource.cs:14` re-emits block numbers missing from the
  *    `block` table.
  *  - `Persistence/BlockTracker.cs:14` computes the last fully-imported block
  *    as `min(requested block not present in actual) − 1`, falling back to
  *    `max(actual)`.
  *  - `Sources/ReorgSource.cs:64` re-reads the last ~16 blocks, recomputes
  *    each hash and finds the oldest mismatch.
  *  - `import_from_staging` (README "Import from staging") selects staging
  *    rows forming a *complete block* (distinct tx count == declared
  *    total_transaction_count), skips rows already imported (anti-join), and
  *    inserts the distinct remainder.
  */
object Integrity {

  /** Contiguity gaps in a key sequence, without a global-order window.
    *
    * A naive `lag() over (order by k)` forces ALL keys into one partition —
    * fine at 60k rows, dead at 100 TB (billions of block numbers). Instead:
    * gap *starts* are keys whose successor is absent (self anti-join on
    * k+1), gap *ends* are keys whose predecessor is absent; both shuffle
    * hash-partitioned and scale linearly. Starts and ends interleave 1:1 in
    * key order, so pairing them is a window over the (tiny) gap set only.
    */
  def gaps(keys: DataFrame, keyCol: String): DataFrame = {
    val k = keys.select(col(keyCol).cast("long").as("k")).distinct()
    val bounds = k.agg(min("k").as("lo"), max("k").as("hi"))
    val starts = k.as("a")
      .join(k.as("b"), col("a.k") + 1 === col("b.k"), "left_anti")
      .join(broadcast(bounds), col("a.k") < col("hi"))
      .select((col("a.k") + 1).as("gap_start"))
    val ends = k.as("a")
      .join(k.as("b"), col("a.k") - 1 === col("b.k"), "left_anti")
      .join(broadcast(bounds), col("a.k") > col("lo"))
      .select((col("a.k") - 1).as("gap_end"))
    val ws = Window.orderBy("gap_start")
    val we = Window.orderBy("gap_end")
    starts.withColumn("i", row_number().over(ws))
      .join(ends.withColumn("i", row_number().over(we)), "i")
      .select("gap_start", "gap_end")
      .orderBy("gap_start")
  }

  /** Last contiguous key: `min(requested ∉ actual) − 1`, else `max(actual)`
    * (BlockTracker.GetLastValidBlock). One broadcast-able anti-join + a
    * 1-row aggregate.
    */
  def lastValid(requested: DataFrame, reqCol: String, actual: DataFrame, actCol: String): DataFrame = {
    val req = requested.select(col(reqCol).cast("long").as("k"))
    val act = actual.select(col(actCol).cast("long").as("k")).distinct()
    val minMissing = req.join(act, Seq("k"), "left_anti").agg(min("k").as("min_missing"))
    val maxActual = act.agg(max("k").as("max_actual"))
    minMissing.crossJoin(maxActual)
      .select(coalesce(col("min_missing") - 1, col("max_actual")).as("last_valid"))
  }

  /** Reorg check: recompute a deterministic fingerprint of the newest
    * `lastN` rows (by key desc) for comparison against stored state — the
    * Spark half of ReorgSource's "hash still matches?" loop. Top-K by key is
    * a sort-limit (Spark takes per-partition top-K then merges K·parts rows —
    * no full sort).
    */
  /** The deterministic row fingerprint both halves of the reorg loop use
    * (stored tail vs freshly re-read rows) — ReorgSource compares the
    * node's block hash; content-addressing the row is the table-side twin.
    */
  def rowFingerprint: org.apache.spark.sql.Column =
    md5(concat_ws("|", col("event_id"), col("event_type"), col("props")))

  def reorgFingerprints(events: DataFrame, lastN: Int = 16): DataFrame =
    events
      .orderBy(col("event_id").desc)
      .limit(lastN)
      .select(col("event_id"), rowFingerprint.as("fingerprint"))
      .orderBy(col("event_id").desc)

  /** Complete groups: parent rows whose child count equals the declared
    * total (import_from_staging step 1.1: distinct tx count ==
    * total_transaction_count). Here: orders whose lineitem count reaches
    * max(l_linenumber). Count+max combine map-side; one shuffle on the key.
    */
  def completeGroups(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), max("l_linenumber").as("declared"))
      .where(col("n_items") === col("declared"))
      .select("o_orderkey", "n_items")
      .orderBy("o_orderkey")

  /** first_incomplete_block (0.0.64.sql:1643): the OLDEST group whose child
    * count hasn't reached its declared total — the cut point
    * `delete_incomplete_blocks` truncates from. Same one-shuffle count+max
    * shape as [[completeGroups]], reduced to a 1-row min; at scale the
    * group frontier under inspection is the recent ingest window, so the
    * scan partition-prunes to it.
    */
  def firstIncomplete(children: DataFrame, groupCol: String,
                      declaredCol: String): DataFrame =
    children
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), max(col(declaredCol)).as("declared"))
      .where(col("n_rows") < col("declared"))
      .agg(min(col(groupCol)).as("first_incomplete"))

  /** Staging → main incremental import: distinct(staging) ANTI-JOIN main
    * (StagingTables.cs allows duplicate staging rows; import_from_staging
    * inserts only rows not already present). The staging/main split is
    * modeled with stable modulo predicates so it is scale-factor-invariant.
    *
    * Scale: `distinct` and the anti-join share the event_id hash
    * partitioning; when `main`'s key frontier is small (the common
    * incremental case) Catalyst broadcasts it — both paths covered in tests.
    */
  def incrementalImport(staging: DataFrame, main: DataFrame, key: String): DataFrame =
    staging.dropDuplicates(key).join(main.select(key), Seq(key), "left_anti")

  /** The q_incremental_import query: staging = two overlapping slices of
    * events (duplicates on purpose), main = already-imported slice.
    */
  def incrementalImportQuery(events: DataFrame): DataFrame = {
    val staging = events.where(col("event_id") % 10 < 8)
      .unionAll(events.where(col("event_id") % 10 >= 4))
    val main = events.where(col("event_id") % 10 < 2)
    incrementalImport(staging, main, "event_id")
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** ORDER-INDEPENDENT dataset checksum — the reproducibility fingerprint
    * a data contract pins ("this exact release"): per-row 56-bit
    * md5-prefix hashes (the engine's cross-engine hash convention, as in
    * the shard writer) summed as exact decimals and folded mod 2^64, plus
    * the row count. Any permutation/partitioning of the same rows gives
    * the same checksum (sum is commutative); any changed/added/dropped
    * row changes it (up to the 2^-64 collision trade every hash twin in
    * the engine accepts). One map-side hash + one bounded agg — no
    * shuffle wider than the partial sums. Checksum is emitted as a STRING
    * so the DuckDB twin (HUGEINT arithmetic) compares exactly.
    *
    * Null discipline: every column coalesces to "" BEFORE the join (bare
    * concat_ws would SKIP a null including its separator, silently making
    * (NULL,"x") ≡ ("x",NULL) and diverging from any ||-based twin), so
    * NULL ≡ empty string is the one documented ambiguity; pre-encode a
    * sentinel if a column legitimately distinguishes the two.
    */
  def datasetChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum: no columns")
    val rowHash = graft.functions.HashConv.md5Long56(concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
    df.select(rowHash.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(coalesce(sum(col("h").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")),
          lit("18446744073709551616").cast("decimal(38,0)"))
          .cast("string").as("checksum"))
  }

  /** SCHEMA DIFF between two dataset versions — the evolution guard a
    * data contract enforces before a new snapshot replaces an old one
    * ([[datasetChecksum]] fingerprints VALUES; this fingerprints SHAPE):
    * each column classified added / removed / type_changed /
    * nullability_changed / unchanged. Pure metadata — the frames' data
    * is never touched (schemas live on the driver), so it costs nothing
    * at any scale; emitted as a DataFrame so contract checks compose
    * with the rest of the report machinery. Column order is not part of
    * the contract (parquet reads are by-name); `keepUnchanged=false`
    * drops the no-news rows like [[Dedup.snapshotDiff]].
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame,
                 keepUnchanged: Boolean = false): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name -> f).toMap
    val n = newDf.schema.map(f => f.name -> f).toMap
    val rows = (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      (o.get(c), n.get(c)) match {
        case (None, Some(f)) =>
          (c, "added", null: String, f.dataType.sql)
        case (Some(f), None) =>
          (c, "removed", f.dataType.sql, null: String)
        case (Some(a), Some(b)) if a.dataType != b.dataType =>
          (c, "type_changed", a.dataType.sql, b.dataType.sql)
        case (Some(a), Some(b)) if a.nullable != b.nullable =>
          (c, "nullability_changed", a.dataType.sql, b.dataType.sql)
        case (Some(a), Some(b)) =>
          (c, "unchanged", a.dataType.sql, b.dataType.sql)
        case (None, None) => // unreachable: c comes from o.keySet ++ n.keySet
          sys.error(s"column '$c' in neither schema")
      }
    }
    val out = rows.toDF("column", "status", "old_type", "new_type")
    if (keepUnchanged) out else out.where(col("status") =!= "unchanged")
  }
}
