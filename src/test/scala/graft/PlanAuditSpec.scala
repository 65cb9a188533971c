package graft

/** Audit: self-join operators must not recompute their expensive
  * subtree — the exchange feeding both sides should be reused. */
class PlanAuditSpec extends SparkSpec {

  private def audit(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("b05 computes the manifest dedupe exactly once") {
    // one events scan in the final plan (toString includes the AQE
    // initial plan too, so ≤2 across both)
    val p = audit("b05_reclaimable")
    assert("FileScan".r.findAllIn(p).length <= 2, p)
  }

  test("d05 simhash fingerprints are per-row (scan-side kernel, no word shuffle)") {
    // the fingerprint build must be a projection at the scan (SimHash32
    // kernel), never an explode+distinct+groupBy over |words| rows —
    // re-scanning the docs twice for the self-join shuffles ~100× less
    // than exchanging word-level rows would. toString includes the AQE
    // initial plan too, so ≤ 4 scans across both copies.
    val p = audit("d05_simhash")
    assert(p.contains("graft_simhash32"), s"per-row kernel not in plan:\n$p")
    assert("FileScan".r.findAllIn(p).length <= 4, p)
  }

  for (q <- Seq("d02_dedup_ngram", "d04_minhash_lsh", "d07_ann_lsh",
      "d17_dedup_embed")) {
    test(s"$q self-join reuses the build-side computation") {
      val p = audit(q)
      info(s"$q: ReusedExchange=" + p.contains("ReusedExchange")
        + " scans=" + "FileScan".r.findAllIn(p).length)
      assert(p.contains("ReusedExchange") || "FileScan".r.findAllIn(p).length <= 2, p)
    }
  }

  test("b18 incremental plan prunes to an anti-join against the external inventory") {
    // x04: the remote listing is a REAL external source (parquet round-
    // trip through IO), and the incremental diff is a left-anti join —
    // never a full-materialized set-difference
    val p = audit("b18_remote_inventory")
    assert(p.contains("LeftAnti"), s"no anti-join in incremental plan:\n$p")
    assert(p.contains("graft_remote_inventory"),
      s"inventory not read from the external source:\n$p")
  }
}
