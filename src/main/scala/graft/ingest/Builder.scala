package graft.ingest

import org.apache.spark.sql.SparkSession

/** Programmatic builder facade — the reference's third entry point
  * (library use via `Culvert.newBuilder()` / `Stream.newBuilder()`,
  * reference `Culvert.java:59-98`, `Stream.java:90-166`). Builder
  * method names and defaults mirror the reference's `StreamBuilder`
  * (`Stream.java:94-102`: eps=10.0, commitAfterNRows=10000,
  * txnsPerBatch=10, timeout=-1 → run until stopped), which
  * deliberately differ from the CLI defaults (`CulvertCLI.java:36-47`)
  * — both default sets are preserved, each on its own entry point.
  *
  * A culvert without an output path degrades to the console sink, the
  * reference's only non-Hive mode (`Stream.java:190-191`).
  */
final class CulvertBuilder private () {
  private var cfg = IngestConfig(
    outputPath = None,
    eventsPerSecond = 10,
    commitAfterNRows = 10000,
    transactionBatchSize = 10,
    timeoutMs = -1L)

  def withName(name: String): CulvertBuilder = { cfg = cfg.copy(name = name); this }
  def withOutputPath(path: String): CulvertBuilder = { cfg = cfg.copy(outputPath = Some(path)); this }
  def withParallelism(p: Int): CulvertBuilder = { cfg = cfg.copy(parallelism = p); this }
  def withEventsPerSecond(eps: Int): CulvertBuilder = { cfg = cfg.copy(eventsPerSecond = eps); this }
  def withCommitAfterRows(n: Int): CulvertBuilder = { cfg = cfg.copy(commitAfterNRows = n); this }
  def withTimeout(ms: Long): CulvertBuilder = { cfg = cfg.copy(timeoutMs = ms); this }
  def withDynamicPartitioning(dp: Boolean): CulvertBuilder = { cfg = cfg.copy(dynamicPartitioning = dp); this }
  def withStreamLaunchDelay(ms: Long): CulvertBuilder = { cfg = cfg.copy(streamLaunchDelayMs = ms); this }
  def withTxnsPerBatch(n: Int): CulvertBuilder = { cfg = cfg.copy(transactionBatchSize = n); this }
  def withStreamingOptimizations(on: Boolean): CulvertBuilder = { cfg = cfg.copy(streamingOptimizations = on); this }
  def withBuckets(b: Int): CulvertBuilder = { cfg = cfg.copy(buckets = b); this }
  def withSeed(seed: Long): CulvertBuilder = { cfg = cfg.copy(seed = seed); this }
  /** Extension (no reference analogue): split the run into g
    * concurrently-committing query groups — see IngestConfig.commitGroups. */
  def withCommitGroups(g: Int): CulvertBuilder = { cfg = cfg.copy(commitGroups = g); this }
  def withSeenFilter(path: String): CulvertBuilder = { cfg = cfg.copy(seenFilterPath = Some(path)); this }
  /** Schema override — the reference's `withColumns`
    * (`Culvert.java:81-84`, `Stream.java:73-75`): replace the default
    * Yahoo-benchmark column list. The first column becomes the bucket
    * key (the reference clusters on user_id, its first column). */
  def withColumns(specs: Seq[Gen.ColSpec]): CulvertBuilder = {
    require(specs.nonEmpty, "column override needs at least one column")
    cfg = cfg.copy(columns = Some(specs)); this
  }

  def config: IngestConfig = cfg

  /** Launch and block until the timeout (reference
    * `startCulvert` → latch await → summary, `Culvert.java:152-172`).
    * A non-positive timeout mirrors the builder default (run until the
    * caller's own timeout) — normalized here to 60 s for safety. */
  def run(spark: SparkSession): IngestResult = {
    val effective = if (cfg.timeoutMs > 0) cfg else cfg.copy(timeoutMs = 60000L)
    Ingest.run(spark, effective)
  }
}

object CulvertBuilder {
  def newBuilder(): CulvertBuilder = new CulvertBuilder()
}
