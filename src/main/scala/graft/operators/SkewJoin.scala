package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for equi-joins with EXTREME key skew — the engine's
  * standing valve (minhash hot-bucket cap, prefix-index token salting,
  * triangle-bucket pair joins) packaged as a reusable operator for plain
  * fact⋈dim joins.
  *
  * Why it exists when AQE has a skew-join: AQE splits oversized SORT-MERGE
  * partitions at runtime, but (a) a medium dim (too big to broadcast) with
  * a pathological hot key still lands one reducer with the hot key's whole
  * build side, (b) AQE's split is a runtime re-plan — a bucketed/
  * pre-partitioned pipeline that must keep a STATIC layout (the view
  * store, the IVF lists) can't accept it, and (c) the salt factor gives a
  * deterministic worst-case bound (hot-key rows / salts per reducer)
  * instead of a heuristic threshold. The trade is replicating the dim side
  * `salts`× — the classic replicate-small/split-big skew join.
  *
  * Mechanics: every fact row gets ONE salt from a row-distinguishing
  * column (deterministic — the repo's reproducibility doctrine — so the
  * same row salts identically on any partitioning/cluster), the dim side
  * explodes map-only to ALL salts, and the join key widens to
  * (keys…, salt). Each matching pair meets exactly once (the fact row
  * exists at one salt; the dim row at every salt), so the result is
  * row-for-row the plain join — proven in SkewJoinSpec against every
  * supported join type.
  *
  * Join types: fact-preserving only (`inner`, `left_outer`, `left_semi`,
  * `left_anti`). Right/full-outer are rejected — an unmatched dim row
  * would surface once per salt.
  */
object SkewJoin {

  private val supported = Set("inner", "left_outer", "left", "left_semi", "left_anti")

  /** @param saltBy a high-cardinality fact column (its primary key) that
    *               spreads the hot key's rows across salts; determinism of
    *               the result does not depend on it, determinism of the
    *               PARTITION LAYOUT does.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
                 saltBy: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    require(supported.contains(joinType),
      s"saltedJoin: '$joinType' would replicate unmatched dim rows; use ${supported.mkString("/")}")
    val factsS = facts.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val dimsS = dims.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    factsS.join(dimsS, keys :+ "__salt", joinType).drop("__salt")
  }
}
