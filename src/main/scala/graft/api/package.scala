package graft

/** The corpus-agnostic operator library: every function is
  * `DataFrame → DataFrame`, takes id/text/vector column names as
  * parameters, and assumes nothing about where the corpus came from.
  * The `graft.queries` fixture queries are the oracle-checked
  * instantiations of these operators.
  *
  * ==Materialized results==
  * Operators whose plan references an intermediate more than once
  * (shingle sets, norms, posting tables, the edge list —
  * `Dedup.nearDupPairsExact`, `minHashLshPairs`, `simHashPairs`/
  * `hammingPairs`, `containmentPairs`, `containmentAgainstCorpus`,
  * `containmentFilterAgainstIndex`, `keepOne`, the suppress-and-index
  * family; `Similarity.hyperplaneAnnTopK`, `ivfAnnTopK`) materialize
  * those intermediates via `localCheckpoint`, RELEASE them before
  * returning, and return a MATERIALIZED result frame: work happens at
  * call time, and the only storage still pinned afterwards is the
  * result itself. Consume it, then call `Dedup.releaseMaterialized`
  * (idempotent, no-op on non-checkpointed frames) — a long-lived
  * session that skips the release accumulates result-sized blocks per
  * call, never corpus-sized ones (the pre-r12 internal `cache()`s
  * pinned corpus-sized intermediates with no release path at all).
  * `graft.Verify` and `graft.Bench` clear everything between queries
  * via `clearCache` + `getPersistentRDDs` unpersist.
  */
package object api
