package graft

import graft.operators.Curation

/** Ratchet on the connected-components loop's ROUND COUNT: alternating
  * large-star/small-star contraction promises O(log² n) rounds
  * REGARDLESS of graph diameter (the reason the d95 giant component —
  * measured diameter 85 at sf0.1 — closes in single-digit rounds).
  * A change that quietly re-couples rounds to diameter (e.g. dropping
  * one of the star passes, or weakening the rewrite to plain label
  * propagation) would surface only as a bench slowdown; these pins
  * make it a loud test failure instead. Pinned values are measured
  * rounds +1 slack — a count BELOW the pin is progress: tighten it. */
class CcConvergenceSpec extends SparkSpec {

  private val sfBig = "/root/testdata/sf0.1"

  /** Runs `body` (whose query construction executes the CC fixpoint
    * eagerly on this thread) and returns the loop's round count. */
  private def roundsAfter(body: => Unit): Int = {
    Curation.lastCcRounds.remove()
    body
    val r = Curation.lastCcRounds.get
    assert(r != null, "the CC loop did not run")
    r.intValue
  }

  test("d24 dup-cluster CC rounds hold at 10× data (shallow LSH graph)") {
    val r1 = roundsAfter(SparkEntry.queries("d24_dup_clusters")(spark, sf))
    val r2 = roundsAfter(SparkEntry.queries("d24_dup_clusters")(spark, sfBig))
    info(s"d24 CC rounds: sf0.001=$r1 sf0.1=$r2")
    assert(r1 >= 1 && r1 <= 4, s"d24 sf0.001 rounds drifted: $r1")
    assert(r2 >= 1 && r2 <= 5, s"d24 sf0.1 rounds drifted: $r2")
  }

  test("d106 histogram rides the same CC loop at the same round count as d24") {
    // d106 re-runs d24's clustering before rolling it up — if its copy
    // of the loop ever diverged (different pair source, different
    // contraction), the round counts would split before the histogram
    // values would
    val r24 = roundsAfter(SparkEntry.queries("d24_dup_clusters")(spark, sf))
    val r106 = roundsAfter(SparkEntry.queries("d106_cluster_size_hist")(spark, sf))
    info(s"CC rounds: d24=$r24 d106=$r106")
    assert(r106 == r24, s"d106's CC loop diverged from d24's: $r106 vs $r24")
  }

  test("d95 community CC rounds stay diameter-independent at sf0.1") {
    // the mutual-kNN giant component is the adversarial input: long
    // path-shaped chains (diameter 85) that label propagation needed
    // 37 rounds for — star contraction must keep closing it in ≤8
    val r2 = roundsAfter(SparkEntry.queries("d95_knn_communities")(spark, sfBig))
    info(s"d95 CC rounds: sf0.1=$r2")
    assert(r2 >= 1 && r2 <= 8,
      s"d95 sf0.1 rounds drifted to $r2 — star contraction no longer " +
        "diameter-independent?")
  }
}
