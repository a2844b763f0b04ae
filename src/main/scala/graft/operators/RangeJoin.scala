package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-equi temporal joins re-expressed as equi-joins Spark can hash-
  * partition — a genuine engine gap: a plain `start <= t AND t < end`
  * join condition has no equi-key, so Catalyst plans a
  * BroadcastNestedLoopJoin — O(|A|·|B|) comparisons and a broadcast of
  * one whole side, which is exactly what dies first at 100 TB.
  * Bucketizing the time axis into fixed-width cells turns each join into
  * ONE hash equi-join on the cell id plus a residual range predicate:
  * partition-parallel, AQE-skew-splittable, shuffle-sized by the data.
  *
  * Cell ids use integral `div` (exact past 2^53 — the engine's
  * floating-floor doctrine) and are floor-aligned for the non-negative
  * domains timestamps live in; a signed domain would need a true
  * floordiv.
  *
  * Reference tie-in: the catalog's per-day stats and the sessionizer
  * bucket time the same way; this generalizes the shape to arbitrary
  * interval joins (event-in-maintenance-window, session-overlap).
  */
object RangeJoin {

  /** Point-in-interval join: points (pid, t) × intervals (iid, start,
    * end) — half-open [start, end) — → (iid, pid, t).
    *
    * Each interval replicates to its ceil(len/width) covering cells;
    * each point lands in exactly ONE cell, so every match is found
    * exactly once and no post-join distinct is needed. The shuffle
    * carries points once and intervals ~len/width times — pick `width`
    * near the typical interval length to keep the replication factor
    * ~2×. (Wildly mixed interval lengths would want a multi-resolution
    * cell hierarchy — an interval tree — before this shape degrades.)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      width: Long): DataFrame = {
    val cells = intervals
      .where(col("end") > col("start"))
      .select(col("iid"), col("start"), col("end"),
        explode(sequence(expr(s"start div ${width}L"),
          expr(s"(end - 1) div ${width}L"))).as("cell"))
    val pts = points.select(col("pid"), col("t"),
      expr(s"t div ${width}L").as("cell"))
    cells.join(pts, Seq("cell"))
      .where(col("t") >= col("start") && col("t") < col("end"))
      .select(col("iid"), col("pid"), col("t"))
      .orderBy("iid", "pid")
  }

  /** Interval-overlap join: (lid, lstart, lend) × (rid, rstart, rend),
    * half-open overlap `lstart < rend AND rstart < lend` → (lid, rid).
    *
    * Both sides replicate to their covering cells; a pair is emitted
    * ONLY in the later of the two first-cells (`cell ==
    * max(l_first, r_first)`) — the standard dedup-free trick: two
    * overlapping intervals both cover exactly that cell (the later
    * starter's first cell sits inside the earlier one's span), and no
    * other shared cell satisfies the equality, so each pair appears
    * exactly once without a distinct.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      width: Long): DataFrame = {
    def cells(df: DataFrame, id: String, s: String, e: String) = df
      .where(col(e) > col(s))
      .select(col(id), col(s).as(s"${id}_s"), col(e).as(s"${id}_e"),
        expr(s"$s div ${width}L").as(s"${id}_first"),
        explode(sequence(expr(s"$s div ${width}L"),
          expr(s"($e - 1) div ${width}L"))).as("cell"))
    cells(left, "lid", "lstart", "lend")
      .join(cells(right, "rid", "rstart", "rend"), Seq("cell"))
      .where(col("lid_s") < col("rid_e") && col("rid_s") < col("lid_e") &&
        col("cell") === greatest(col("lid_first"), col("rid_first")))
      .select(col("lid"), col("rid"))
      .orderBy("lid", "rid")
  }
}
