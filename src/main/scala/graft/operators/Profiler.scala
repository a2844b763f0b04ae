package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling + data-quality assertion reports — the warehouse-side
  * "dataset card": what an operator of the indexer (or a curator of a
  * training corpus) checks before trusting a table. The reference's import
  * procedure embeds exactly these invariants procedurally (complete blocks,
  * no duplicate staging rows, parent/child consistency —
  * Persistence/ImportProcedure.cs); this surfaces them as queryable frames.
  *
  * Scale shapes: [[profile]] is ONE scan of the table — per-column
  * aggregates in a single `agg` (Catalyst plans the multi-distinct via one
  * Expand: k column-profiles cost one pass + a k-way expand shuffle, never
  * k scans), unpivoted map-only into one row per column. [[dqReport]] is a
  * union of bounded partial-agg / anti-join legs, each the engine's
  * standard incremental-import shape; every leg projects only its key
  * columns (parquet pruning), so a 100 TB fact table contributes
  * key-column bytes only.
  */
object Profiler {

  /** One row per profiled numeric column: row/null/distinct counts, range,
    * and the decimal-summed mean (the cross-engine double-sum parity rule;
    * round-12 like every mean the engine emits).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast("decimal(28,8)")).as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        when(col(s"__n_$c") > col(s"__nulls_$c"),
          round(col(s"__sum_$c").cast("double") /
            (col(s"__n_$c") - col(s"__nulls_$c")), 12)).as("mean_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("column")
  }

  /** Referential/uniqueness/nullability violations between a child and a
    * parent table: one row per check with its violation count (0 rows pass
    * too — the report is the contract, dashboards alert on > 0).
    *
    * - `orphan_children`: child keys with no parent (anti-join; the
    *   incremental-import dedup shape reversed)
    * - `childless_parents`: parents with no child rows
    * - `duplicate_child_pk`: child primary-key groups with count > 1
    * - `null_child_fk`: child rows with a NULL foreign key
    */
  def dqReport(child: DataFrame, parent: DataFrame,
               childFk: String, parentPk: String,
               childPk: Seq[String]): DataFrame = {
    val orphans = child.select(col(childFk).as("k")).where(col("k").isNotNull)
      .join(parent.select(col(parentPk).as("k")), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orphan_children").as("check"), col("n_violations"))
    val childless = parent.select(col(parentPk).as("k"))
      .join(child.select(col(childFk).as("k")), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("childless_parents").as("check"), col("n_violations"))
    val dups = child.groupBy(childPk.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("duplicate_child_pk").as("check"), col("n_violations"))
    val nullFk = child
      .agg(count(when(col(childFk).isNull, lit(1))).as("n_violations"))
      .select(lit("null_child_fk").as("check"), col("n_violations"))
    orphans.unionByName(childless).unionByName(dups).unionByName(nullFk)
      .orderBy("check")
  }
}
