package graft

import graft.tools.PlanFingerprint
import graft.tools.PlanFingerprint.Fp

/** Physical-plan fingerprints of the 20 most expensive bench keys
  * (BENCH_QUIET_r5_cpus4 ranking, dump/stream legs excluded), pinned so
  * a refactor that adds a shuffle, drops a broadcast, or un-stages a
  * relation fails HERE — in CI — instead of surfacing as a regressed
  * number in a bench round.
  *
  * On mismatch: if the change is intentional (a better plan), re-pin
  * via `tools/run.sh graft.tools.Prof <sf> fingerprint <keys>`; the
  * failure message shows got-vs-pinned per field.
  */
class PlanFingerprintSpec extends SparkTestBase {

  // relocatable like SchemasSpec: derive from GRAFT_TEST_SF_ROOT and
  // skip (not error) when the testdata tree is absent
  private val sf =
    sys.env.getOrElse("GRAFT_TEST_SF_ROOT", "/root/testdata") + "/sf0.001"

  // Fp(shuffles, broadcasts, scans, rddScans, windows, sortMergeJoins)
  private val pinned: Seq[(String, Fp)] = Seq(
    "dedup_eval" -> Fp(11, 11, 2, 14, 0, 0),
    "dedup_prefix" -> Fp(3, 4, 0, 7, 0, 0),
    "pagerank_weighted" -> Fp(3, 1, 0, 3, 0, 1),
    "graph_modularity" -> Fp(3, 0, 0, 3, 0, 1),
    "pagerank_norm" -> Fp(1, 0, 0, 0, 0, 0),
    "graph_lpa" -> Fp(1, 0, 0, 0, 0, 0),
    "graph_triangles" -> Fp(4, 2, 0, 5, 0, 0),
    "histogram_equidepth" -> Fp(3, 1, 2, 0, 0, 0),
    "pagerank_oracle" -> Fp(1, 0, 0, 0, 0, 0),
    "graph_hits" -> Fp(1, 0, 0, 1, 0, 0),
    "pagerank_personal" -> Fp(1, 0, 0, 0, 0, 0),
    "pagerank" -> Fp(1, 0, 0, 0, 0, 0),
    "similarity_ivf" -> Fp(6, 2, 3, 0, 2, 0),
    "graph_assortativity" -> Fp(3, 1, 0, 4, 0, 0),
    "graph_jaccard" -> Fp(3, 2, 0, 5, 0, 0),
    "curate_corpus_neardup" -> Fp(1, 1, 1, 0, 0, 0),
    "graph_sssp" -> Fp(1, 0, 0, 0, 0, 0),
    "dedup_embedding_clusters" -> Fp(1, 0, 0, 0, 0, 0),
    "mmr_rerank" -> Fp(1, 0, 0, 1, 0, 0),
    "dedup_edit" -> Fp(3, 4, 2, 5, 0, 0),
    // mid-cost tier (audited clean in round 6) — pinned for coverage
    "split_leakage_free" -> Fp(1, 1, 1, 0, 0, 0),
    "graph_project" -> Fp(3, 0, 1, 0, 0, 0),
    "graph_bfs" -> Fp(1, 0, 0, 0, 0, 0),
    "graph_kcore" -> Fp(1, 0, 0, 0, 0, 0),
    "dedup_containment" -> Fp(3, 4, 2, 5, 0, 0),
    "robust_outliers" -> Fp(4, 3, 4, 0, 0, 0),
    "collocation_pmi" -> Fp(2, 4, 0, 5, 0, 0),
    "golden_record" -> Fp(2, 1, 1, 0, 0, 0),
    "rank_fusion" -> Fp(7, 5, 1, 4, 3, 0),
    "session_paths" -> Fp(2, 0, 1, 0, 2, 0))

  for ((key, want) <- pinned)
    test(s"$key plan fingerprint unchanged") {
      assume(new java.io.File(sf).isDirectory, s"testdata absent at $sf")
      val got = PlanFingerprint.of(
        SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString)
      assert(got == want,
        s"$key plan shape drifted: got $got, pinned $want " +
          "(shuffles, broadcasts, scans, rddScans, windows, sortMergeJoins) — " +
          "re-pin via Prof fingerprint if intentional")
    }
}
