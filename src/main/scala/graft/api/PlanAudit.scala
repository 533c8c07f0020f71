package graft.api

import org.apache.spark.sql.DataFrame

/** Checkpoint shim that makes the suppressor family's INNER plan shapes
  * auditable. The suppressors `localCheckpoint()` every stage (their
  * per-micro-batch lifecycle needs eager materialization + release), so
  * the frames a caller can `.explain()` show only `Scan ExistingRDD` —
  * which is exactly how an O(batch²) candidate join once shipped with no
  * plan test able to see it. Every suppressor-stage materialization now
  * routes through [[checkpoint]]; PlanShapeSpec installs a [[probe]] to
  * capture each stage's REAL physical plan (pre-checkpoint) and pins
  * banded/cell-keyed candidate joins — no BroadcastNestedLoopJoin, no
  * CartesianProduct. Production cost: one volatile read per stage. */
private[graft] object PlanAudit {
  @volatile private[graft] var probe: Option[DataFrame => Unit] = None

  def checkpoint(df: DataFrame): DataFrame = {
    probe.foreach(_(df))
    df.localCheckpoint()
  }

  /** [[checkpoint]] for a frame whose plan ends in an explicit
    * `repartition(np, keys...)` (or an exchange-free chain on top of
    * one): re-declares the hash layout the checkpoint's `LogicalRDD`
    * drops under AQE, so downstream joins/aggregations keyed on `keys`
    * read the materialized rows co-located instead of re-shuffling
    * them once per consumer — see
    * [[org.apache.spark.sql.GraftCheckpointBridge]] for the soundness
    * rule (declares only when the partition count proves the explicit
    * repartition survived; silently falls back to the undeclared frame
    * otherwise). */
  def checkpointHash(df: DataFrame, np: Int, keys: Seq[String]): DataFrame =
    org.apache.spark.sql.GraftCheckpointBridge.declareHashPartitioning(
      checkpoint(df), keys, np)
}
