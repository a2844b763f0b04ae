package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for the iterative operators ([[Graph.pageRank]],
  * [[Graph.personalizedPageRank]], [[Graph.widestPaths]],
  * [[Dedup.dupClusters]]).
  *
  * Default (no `checkpointDir`): eager `localCheckpoint` per round — flat
  * plans (the 2^n-lineage rule), zero external storage. The blocks live in
  * EXECUTOR storage though, and localCheckpoint TRUNCATES lineage, so at
  * cluster scale one lost executor mid-iteration kills the job — fine on
  * local[32] and for short loops, not for a 1000-executor hour-long run.
  *
  * With `checkpointDir` set (an HDFS/object-store path at cluster scale):
  * every `every`-th cut is a RELIABLE eager `checkpoint()` to that
  * directory, and the cuts in between persist WITH lineage intact, so a
  * lost executor recomputes from the last reliable checkpoint instead of
  * failing the job. The cost: one distributed write per `every` rounds,
  * and plans that grow for up to `every` rounds between cuts (bounded —
  * for a loop that references its state twice per round the plan tree is
  * ≤ 2^every nodes, so keep `every` modest; 5 ≈ 32-node plans).
  *
  * Results are knob-INDEPENDENT (spec'd in CheckpointKnobSpec): the policy
  * changes where blocks live, never what is computed.
  */
object Checkpoints {

  /** Cut `df`'s lineage per the policy. `round` 0 is the pre-loop frame
    * (always reliably checkpointed when a dir is set — everything chains
    * from it); rounds 1.. are loop iterations.
    */
  def cut(df: DataFrame, round: Int, checkpointDir: Option[String],
          every: Int = 5): DataFrame = {
    require(every >= 1, s"checkpoint every < 1: $every")
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        if (round % every == 0) df.checkpoint(true)
        else df.persist()
      case None => df.localCheckpoint(true)
    }
  }

  /** Free the storage behind a frame [[cut]] returned, once it is
    * SUPERSEDED — the new round's frame is materialized with no lineage
    * back to this one. Without this, a long loop's executor-storage
    * footprint grows linearly with round count (one sketch/arrival frame
    * per round). localCheckpoint frames are invisible to the CacheManager
    * (`Dataset.unpersist` is a no-op on them), so the backing RDD inside
    * the LogicalRDD is unpersisted directly; CacheManager-persisted
    * frames go through the normal unpersist path; reliable-checkpoint
    * frames keep their files (unpersisting the wrapper RDD is harmless).
    * NEVER call this on a frame a live plan still depends on: a
    * localCheckpoint's lineage is truncated, so its blocks cannot be
    * recomputed.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist(blocking = false)
    }
}
