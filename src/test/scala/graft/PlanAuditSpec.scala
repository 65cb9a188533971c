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

  test("§2.C scan-count ratchet: every operator reads its big table at most the pinned number of times") {
    // [[ScanCount.counts]] counts MATERIALIZED big-table scans in the
    // executed plan (reused exchanges and persisted relations count
    // once, at their single materialization) — the structural guard
    // against double-evaluation regressions (pre-r7 d35 scanned + folded
    // the corpus twice; this spec would have failed it with
    // embeddings=2 > 1). Pinned counts are the CURRENT audited plans:
    //   1  = single-pass operators;
    //   2  = a second legitimate pass (self-join payload probe, d15's
    //        two k-means passes, tf×df joins, d43's ≤100-doc bench
    //        slice);
    //   3+ = the declared exact baselines' gram-join sides (d02/d30),
    //        d22's three input roles, d34's exact+sketch QA pair.
    // A count BELOW the pin is progress: tighten the pin.
    // d24 reads 0 because its corpus work happens inside localCheckpoint
    // materialization, opaque to the final plan — its single-dedupe
    // guard is the b05-style test above.
    val expected: Map[String, (Int, Int)] = Map( // name -> (documents, embeddings)
      "d01_dedup_exact" -> (1, 0), "d02_dedup_ngram" -> (3, 0),
      "d03_minhash" -> (1, 0), "d04_minhash_lsh" -> (1, 0),
      "d05_simhash" -> (2, 0), "d06_cosine_topk" -> (0, 2),
      "d07_ann_lsh" -> (0, 2), "d08_langid" -> (1, 0),
      "d09_quality" -> (1, 0), "d10_tokens" -> (1, 0),
      "d11_fingerprint" -> (1, 0), "d12_embed_norm" -> (0, 1),
      "d13_knn_centroid" -> (0, 1), "d14_multimodal" -> (1, 0),
      "d15_ann_ivf" -> (0, 2), "d16_vocab" -> (1, 0),
      "d17_dedup_embed" -> (0, 2), "d18_frame_sample" -> (1, 0),
      "d19_tfidf" -> (2, 0), "d20_kmv_sketch" -> (1, 0),
      "d21_corpus_select" -> (1, 0), "d22_decontaminate" -> (3, 0),
      "d23_corpus_mix" -> (1, 0), "d24_dup_clusters" -> (0, 0),
      "d25_pii_scrub" -> (1, 0), "d26_kmv_by_source" -> (1, 0),
      "d27_clip_dedup" -> (2, 0), "d28_corpus_stats" -> (1, 0),
      "d29_repetition" -> (2, 0), "d30_containment" -> (3, 0),
      "d31_url_extract" -> (1, 0), "d32_embed_quant" -> (0, 1),
      "d33_zorder" -> (1, 0), "d34_lsh_recall" -> (4, 0),
      "d35_semdedup" -> (0, 1), "d36_tile_dedup" -> (2, 0),
      "d37_lm_novelty" -> (2, 0), "d38_corpus_sample" -> (1, 0),
      "d39_seq_pack" -> (1, 0), "d40_cell_balance" -> (0, 1),
      "d41_dedup_consensus" -> (1, 3), "d42_semantic_decon" -> (0, 2),
      "d43_curation_pipeline" -> (2, 0))
    val dQueries = SparkEntry.queries.keys.filter(_.startsWith("d")).toSeq.sorted
    assert(dQueries.toSet == expected.keySet,
      s"§2.C inventory drifted — update the pins: ${dQueries.toSet.diff(expected.keySet)} / ${expected.keySet.diff(dQueries.toSet)}")
    val over = dQueries.flatMap { name =>
      val c = ScanCount.counts(spark, name, sf)
      val (d, e) = (c.getOrElse("documents", 0), c.getOrElse("embeddings", 0))
      val (ed, ee) = expected(name)
      if (d > ed || e > ee)
        Some(s"$name: documents=$d (pin $ed), embeddings=$e (pin $ee)")
      else None
    }
    assert(over.isEmpty,
      s"big-table scan count regressed:\n${over.mkString("\n")}")
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
