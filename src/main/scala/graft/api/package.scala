package graft

/** The corpus-agnostic operator library: every function is
  * `DataFrame → DataFrame`, takes id/text/vector column names as
  * parameters, and assumes nothing about where the corpus came from.
  * The `graft.queries` fixture queries are the oracle-checked
  * instantiations of these operators.
  *
  * ==Caching side effect==
  * Several operators (`Dedup.nearDupPairsExact`, `minHashLshPairs`,
  * `simHashPairs`, `keepOne`; `Similarity.hyperplaneAnnTopK`,
  * `ivfAnnTopK`) `cache()` or `localCheckpoint()` an intermediate that
  * the returned plan references more than once (shingle sets, norms,
  * the edge list) — without it the corpus would be re-scanned and
  * re-tokenized per reference. Spark offers no hook to unpersist a
  * lazily-returned frame after its action completes, so those blocks
  * stay pinned until the caller releases them: call
  * `spark.catalog.clearCache()` (and unpersist via
  * `sparkContext.getPersistentRDDs`) between operator invocations when
  * memory pressure matters — exactly what `graft.Verify` and
  * `graft.Bench` do per query.
  */
package object api
