package graft.tools

/** Fresh-JVM leg of the scale smoke's IVF-build + graph stages
  * (VERDICT r16 #2): the in-suite smoke runs LAST in a Bench session,
  * so its per-stage numbers measure ~50 minutes of heap history — the
  * r16 A/B pinned graph_lpa at 94.2 s in-suite vs 27.2 s fresh-JVM and
  * ivf_index at 164 vs 84.4, both at quiet CPU and quiet IO, a
  * variance class no box-level gate can see and only a fresh JVM can
  * avoid. `ScaleSmoke.runForkedStages` forks this main (via the
  * generalized `RaceChild.spawn`) and merges its fields into the
  * record under the canonical stage names.
  *
  *   runMain graft.tools.SmokeStagesChild <embParquet> <ivfTarget> <indexRows> <ivfCells>
  *
  * Runs `ScaleSmoke.ivfStage` (building the IVF index at `ivfTarget`,
  * which the parent's semantic suppressor then consumes) and
  * `ScaleSmoke.graphStages` — the same shared stage bodies, same
  * closed-form asserts — and prints every recorded field as
  * `SMOKE_CHILD_FIELD=<key>,<value>`. A drift assert fails the child
  * (non-zero exit), which the parent records as `smoke_fork_error` and
  * re-runs in-suite, where the same assert fails the smoke loudly. */
object SmokeStagesChild {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: SmokeStagesChild <embParquet> <ivfTarget> <indexRows> <ivfCells>")
    val Array(embPath, ivfTarget, indexRowsS, ivfCellsS) = args
    val spark = graft.core.Sessions.local("graft-smoke-child")
    graft.AmbientLoad.start()
    try {
      val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      graft.ScaleSmoke.ivfStage(spark, times, embPath, ivfTarget,
        indexRowsS.toLong, ivfCellsS.toInt)
      graft.ScaleSmoke.graphStages(spark, times, indexRowsS.toLong)
      // Double.toString is locale-independent; keys carry no commas
      times.foreach { case (k, v) => println(s"SMOKE_CHILD_FIELD=$k,$v") }
      System.out.flush()
    } finally spark.stop()
  }
}
