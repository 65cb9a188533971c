package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.model.Corpus

/** §2.C d08–d11 — text analysis over the document corpus.
  *
  * All metrics reduce to integer counts (char/word/match counts) so
  * the derived ratio doubles are bit-identical across engines. Every
  * operator is a per-row projection plus at most one bounded-key
  * aggregation — embarrassingly parallel at 100 TB (no cross-doc
  * shuffle except the langid argmax window, partitioned per doc).
  */
object TextAnalysis {

  /** Per-language stopword lexicon, langs in tie-break (alphabetical)
    * order. The lexicon is a compile-time constant, so language scoring
    * is a pure per-row projection — no explode, no join, no shuffle. */
  /** d84's query-term catalog — a bounded literal set standing in for
    * the term lists a retrieval deployment broadcasts; shared verbatim
    * with the DuckDB oracle. */
  private val bm25Terms: Seq[String] =
    Seq("customer", "filter", "join", "stream", "vector", "window")

  private[graft] val langWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "et", "les", "des", "un"))

  private[operators] val enStop = Seq("the", "a", "and", "of", "to", "in", "is")
  private[operators] val enStopSqlList = enStop.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Occurrences of `ws` elements inside a CONSTANT word list, on the
    * SortedHitCount codegen kernel (r19) — the drop-in for
    * `size(filter(ws, w -> array_contains(<list>, w)))`, whose lambda
    * is CodegenFallback and ran INTERPRETED once per corpus row in
    * every quality/langid/curation scorer. Same count (per
    * occurrence, binary string equality); the list is sorted ascending
    * at build time (the kernel's contract — ASCII word lists sort
    * identically under String and UTF8String orderings). */
  private[operators] def wordHits(ws: org.apache.spark.sql.Column,
      list: Seq[String]): org.apache.spark.sql.Column =
    graft.functions.SortedHitCount(ws, array(list.sorted.map(lit): _*))

  /** Non-empty token count — `size(filter(ws, x -> x != ''))` without
    * the interpreted lambda: total size minus the ''-occurrence count
    * (split() yields [''] only for an empty normalized text, so the
    * subtraction is exact). */
  private[graft] def nonEmptyCount(ws: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(ws).cast("long") - graft.functions.SortedHitCount(ws, array(lit("")))

  /** d08's per-row language scorer over a docs-shaped frame: one
    * stop-word hit count per candidate language, `score` = the max,
    * `pred_lang` = the first language (in [[langWords]] order)
    * attaining it, 'und' when nothing matches — ONE definition shared
    * by the d08 report and the d101 confusion eval. Pure per-row HOF
    * work, no shuffle. */
  private def langidScored(docs: DataFrame): DataFrame = {
    val scored = langWords.foldLeft(docs) {
      case (df, (lang, ws)) =>
        df.withColumn(s"sc_$lang", wordHits(col("ws"), ws))
    }
    val scoreCols = langWords.map { case (lang, _) => col(s"sc_$lang") }
    val m = greatest(scoreCols: _*)
    val pred = langWords.foldLeft(when(m === 0L, "und")) {
      case (c, (lang, _)) => c.when(col(s"sc_$lang") === m, lang)
    }
    scored.withColumn("score", m).withColumn("pred_lang", pred)
  }

  /** d100's per-language fertility profile over a docs-shaped frame —
    * ONE definition shared by the batch report and the s40 live state
    * (count/sums are associative: micro-batches merge exactly in
    * complete mode, state bounded by the language domain). */
  private[graft] def tokenFertility(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        size(col("ws")).cast("long").as("nw"),
        size(regexp_extract_all(lower(col("text")), lit(tokenRe), lit(0)))
          .cast("long").as("nt"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("nt")).as("n_tokens"), sum(col("nc")).as("n_chars"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens"))

  /** The d09 per-row quality columns over a docs-shaped frame (`text`
    * + `ws`) — ONE definition shared by the batch query and the
    * streaming curation gate (s08), so stream and batch provably score
    * identically. Stateless and per-row: safe on any streaming source. */
  private[graft] def qualityCols(docs: DataFrame): DataFrame = {
    docs
      .withColumn("cc", CharCounts(col("text")))
      .withColumn("n_chars_raw", length(col("text")).cast("long"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_digits", element_at(col("cc"), 1))
      .withColumn("n_punct", element_at(col("cc"), 2))
      .withColumn("n_stop", wordHits(col("ws"), enStop))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / greatest(col("n_words"), lit(1L)))
      .withColumn("punct_ratio",
        col("n_punct").cast("double") / greatest(col("n_chars_raw"), lit(1L)))
      .withColumn("quality",
        col("stop_ratio") - col("punct_ratio")
          + when(col("n_words").between(5, 200), 0.1).otherwise(0.0))
  }

  /** The Gopher/MassiveText quality-rule PANEL (Rae et al. 2021,
    * Appendix A — the named rule set Gopher/Chinchilla corpora were
    * filtered with) over a docs-shaped frame (`doc_id` + `ws`):
    * word-count window, mean-word-length window, substantive-token
    * floor, stop-word presence, and top-unigram dominance, each as a
    * SEPARATE attributable verdict plus the conjunctive keep. Every
    * verdict is an integer CROSS-MULTIPLY of exact per-row counts (no
    * float threshold anywhere), and the whole panel is per-row higher-
    * order-function work — no explode, no shuffle, stateless — so the
    * batch sweep (d92) and the ingestion gate (s37) are ONE transform
    * at scan cost. The canonical alphabetic-word rule is vacuous on an
    * all-alphabetic corpus, so the panel keeps its spirit as the
    * substantive-token fraction (words of ≥3 chars ≥ 80%). Dominance
    * is the unigram face of Gopher's repetition family (d29 owns the
    * n-gram/line faces). */
  private[graft] def gopherPanel(docs: DataFrame): DataFrame = {
    val enArr = array(enStop.map(lit): _*)
    docs
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("wchars",
        expr("CAST(aggregate(ws, 0, (acc, x) -> acc + length(x)) AS LONG)"))
      .withColumn("n_subst",
        expr("CAST(size(filter(ws, x -> length(x) >= 3)) AS LONG)"))
      .withColumn("n_stop_kinds",
        size(array_intersect(array_distinct(col("ws")), enArr)).cast("long"))
      // top-unigram count via sort + one linear run-length fold
      // (w·log w per row) — the distinct×filter formulation is
      // quadratic per row and measured 2× slower at sf0.1
      .withColumn("top_word_n", expr(
        """CAST(aggregate(array_sort(ws),
          |  named_struct('p', CAST(NULL AS STRING), 'r', 0, 'b', 0),
          |  (acc, x) -> named_struct('p', x,
          |    'r', IF(acc.p <=> x, acc.r + 1, 1),
          |    'b', greatest(acc.b, IF(acc.p <=> x, acc.r + 1, 1))),
          |  acc -> acc.b) AS LONG)""".stripMargin))
      .withColumn("r_count", col("n_words").between(50L, 100000L))
      .withColumn("r_wlen",
        col("wchars") >= lit(3L) * col("n_words")
          && col("wchars") <= lit(10L) * col("n_words"))
      .withColumn("r_subst", lit(5L) * col("n_subst") >= lit(4L) * col("n_words"))
      .withColumn("r_stop", col("n_stop_kinds") >= 2L)
      .withColumn("r_rep", lit(5L) * col("top_word_n") <= col("n_words"))
      .withColumn("keep",
        col("r_count") && col("r_wlen") && col("r_subst")
          && col("r_stop") && col("r_rep"))
      .select("doc_id", "n_words", "wchars", "n_subst", "n_stop_kinds",
        "top_word_n", "r_count", "r_wlen", "r_subst", "r_stop", "r_rep", "keep")
  }

  private val tokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** URL pattern (Java-regex ∩ RE2 common subset, as d25's patterns):
    * group 1 = domain, group 2 = path segment. */
  private[graft] val urlRe = """https?://([a-z0-9.]+)/([a-z0-9]+)"""

  /** Deterministic in-text URL injection shared by d31 (domain
    * inventory) and d72 (domain reputation): every 3rd doc cites a
    * `site<id%50>.example.com` page, every 13th a `cdn<id%7>
    * .example.org` asset — the corpus text is synthetic word salad, so
    * provenance is INJECTED from doc_id (the d25 PII pattern) and the
    * operators under test are the extract→rollup pipelines. Mirrored
    * verbatim by [[rawsCteSql]]. */
  private[graft] def withInjectedUrls(df: DataFrame): DataFrame =
    df.withColumn("raw", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" http://site"), (col("doc_id") % 50).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 97).cast("string")))
        .otherwise(""),
      when(col("doc_id") % 13 === 0,
        concat(lit(" https://cdn"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/x"), (col("doc_id") % 31).cast("string")))
        .otherwise("")))

  /** DuckDB twin of [[withInjectedUrls]] over `documents` — a CTE body
    * yielding raws(doc_id, raw) (plus whatever columns the enclosing
    * query re-joins). */
  private[graft] val rawsCteSql: String =
    """raws AS (
      |  SELECT doc_id, concat(text,
      |    CASE WHEN doc_id % 3 = 0
      |         THEN ' http://site' || CAST(doc_id % 50 AS VARCHAR) ||
      |              '.example.com/p' || CAST(doc_id % 97 AS VARCHAR) ELSE '' END,
      |    CASE WHEN doc_id % 13 = 0
      |         THEN ' https://cdn' || CAST(doc_id % 7 AS VARCHAR) ||
      |              '.example.org/x' || CAST(doc_id % 31 AS VARCHAR) ELSE '' END) AS raw
      |  FROM documents)""".stripMargin

  /** DuckDB twin of [[domainReputation]] minus the final tiering
    * SELECT — a CTE chain (scored → links → dom → ranked) appended
    * after `docs` + `raws`; shared by the d72 oracle and s28's
    * streaming-gate oracle. */
  private[graft] lazy val domainRepCteSql: String =
    s"""scored AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
       |      / greatest(len(ws), 1)
       |    - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
       |      / greatest(length(text), 1)
       |    + CASE WHEN len(ws) BETWEEN 5 AND 200 THEN 0.1 ELSE 0.0 END AS quality
       |  FROM docs),
       |links AS (
       |  SELECT r.doc_id, s.quality, regexp_extract(t.url, '$urlRe', 1) AS domain
       |  FROM raws r
       |  JOIN scored s ON s.doc_id = r.doc_id,
       |  UNNEST(regexp_extract_all(r.raw, '$urlRe')) t(url)),
       |dom AS (
       |  SELECT domain, count(1) AS n_docs,
       |    SUM(CAST(quality AS DECIMAL(28,12))) AS q_sum
       |  FROM links GROUP BY 1),
       |ranked AS (
       |  SELECT domain, n_docs,
       |    CAST(q_sum AS DOUBLE) / n_docs AS avg_quality,
       |    row_number() OVER (ORDER BY CAST(q_sum AS DOUBLE) / n_docs ASC, domain ASC) AS q_rank,
       |    count(1) OVER () AS nd
       |  FROM dom)""".stripMargin

  /** Deterministic crawl URL fixture: the canonical page
    * `site<id%5>.example.com/p<id%23>` decorated with a variant
    * (scheme case, `www.`, trailing slash, utm query, fragment) by
    * id%4 — shared by d60 (batch dedup) and s24 (ingest gate). */
  def crawlUrl(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      when(id % 4 === 2, "HTTP://").otherwise(
        when(id % 4 === 0, "http://").otherwise("https://")),
      when(id % 4 === 1, "www.").otherwise(""),
      when(id % 4 === 2, "SITE").otherwise("site"),
      (id % 5).cast("string"), lit(".example.com/p"),
      (id % 23).cast("string"),
      when(id % 4 === 1, "/").otherwise(""),
      when(id % 4 === 2, "?utm_source=feed").otherwise(""),
      when(id % 4 === 3, "#frag").otherwise(""))

  /** Canonicalization kernel: strip scheme/`www.`/query/fragment/
    * trailing slash, lowercase — a chain of codegen'd regexps. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lower(url),
      "^https?://", ""), "^www\\.", ""), "[?#].*$", ""), "/$", "")

  /** d60's core over any (doc_id, url) frame: canonicalize per row,
    * then the min-doc_id keeper per canonical page via AGGREGATE +
    * JOIN — deliberately NOT `min().over(Window.partitionBy(url))`:
    * a window packs each key into ONE task, so the hot URL every
    * web corpus has (the boilerplate page crawled a billion times)
    * stalls a single sorter at 100 TB. The aggregate partial-combines
    * the hot key map-side (d01's skew-safety law), its output is one
    * row per DISTINCT page (broadcastable when the page space is
    * bounded; AQE skew-splits the join when it isn't), and the data
    * side never sorts. SkewSpec pins skew-split execution on this
    * exact shape under a 95%-one-URL stream. */
  private[graft] def urlDedupOver(urls: DataFrame): DataFrame = {
    val canon = urls.withColumn("canonical_url", canonicalUrl(col("url")))
    val keepers = canon.groupBy("canonical_url")
      .agg(min(col("doc_id")).as("keeper_id"))
    canon.join(keepers, Seq("canonical_url"))
      .select(col("doc_id"), col("url"), col("canonical_url"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"))
  }

  /** d72's doc→domain link stream: one corpus scan, the d09 quality
    * score attached per row, one link row per extracted URL. */
  private def domainLinks(s: SparkSession, dir: String): DataFrame =
    qualityCols(withInjectedUrls(Corpus.docs(s, dir)))
      .select(col("doc_id"), col("quality"),
        explode(regexp_extract_all(col("raw"), lit(urlRe), lit(0))).as("url"))
      .withColumn("domain", regexp_extract(col("url"), urlRe, 1))

  /** The d72 domain-reputation index (domain, n_docs, avg_quality,
    * q_rank, tier) — shared with s28's streaming ingest gate. Quality
    * sums are exact DECIMALs (one cast per row, associative-exact
    * aggregation, one final divide), and the quartile tiering is an
    * EXACT global rank (rank 1 = worst): bottom quartile = "low",
    * top quartile = "high".
    *
    * The rank is computed with the two-stage BANDED pattern (q31's
    * decile law, d33's prefix law) rather than one unpartitioned
    * row_number: the domain table is corpus-proportional (a 100 TB
    * web corpus has ~10⁸ domains — a global window would funnel all
    * of them through ONE task), but the quality METRIC's range is
    * fixed (stop_ratio − punct_ratio + bonus ∈ [−1, 1.1]), so
    * floor(avg_quality·1024) yields ≤ ~2.2k monotone bands no matter
    * the corpus size. Stage 1 ranks WITHIN each band (partitioned,
    * parallel); stage 2 prefix-sums band counts over the bounded band
    * aggregate (the only unpartitioned window — ≤2.2k rows by the
    * metric's range, never by n) and broadcasts the offsets back.
    * offset + band-local rank ≡ the global row_number exactly,
    * because the band function is monotone in the sort key. */
  private[graft] def domainReputation(s: SparkSession, dir: String): DataFrame = {
    // persist the domain aggregate: both the band-offset side and the
    // final ranked frame consume it (the d15/d35 multi-consumer
    // persist convention — caller-owned lifecycle via clearCache);
    // without it each side would re-scan the corpus (pin documents=1)
    val agg = domainLinks(s, dir)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("quality").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .as("q_sum"))
      .withColumn("avg_quality", col("q_sum").cast("double") / col("n_docs"))
      .withColumn("qband", floor(col("avg_quality") * 1024.0).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wBand = Window.partitionBy("qband")
      .orderBy(col("avg_quality").asc, col("domain").asc)
    val wPrefix = Window.orderBy("qband")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = agg.groupBy("qband").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(wPrefix), lit(0L)))
      .withColumn("nd", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("qband", "offset", "nd")
    agg
      .withColumn("band_rn", row_number().over(wBand).cast("long"))
      .join(broadcast(offsets), Seq("qband"))
      // tier math on LONGs (rank·4 would wrap an int past 5·10⁸ rows);
      // q_rank exits as int to keep row_number's output schema
      .withColumn("rank_l", col("offset") + col("band_rn"))
      .withColumn("q_rank", col("rank_l").cast("int"))
      .withColumn("tier",
        when(col("rank_l") * 4 <= col("nd"), "low")
          .when(col("rank_l") * 4 > col("nd") * 3, "high")
          .otherwise("mid"))
      .select("domain", "n_docs", "avg_quality", "q_rank", "tier")
  }

  /** The sorted-run `aggregate` HOF fold computing [types, hapax, Σc²]
    * per word array — the PORTABLE formulation of x09's
    * [[graft.functions.DiversityStats]] kernel, kept as the
    * spec-pinned equivalence baseline (FunctionsSpec proves kernel ≡
    * fold on the corpus plus edge rows; the oracle closes the triangle
    * through the relational GROUP BY histogram). */
  private[graft] val diversityFoldSql: String =
    """transform(array(aggregate(
      |  array_sort(ws),
      |  named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
      |               'types', CAST(0 AS BIGINT), 'hapax', CAST(0 AS BIGINT),
      |               'sumsq', CAST(0 AS BIGINT)),
      |  (acc, w) -> IF(acc.prev IS NOT NULL AND w = acc.prev,
      |    named_struct('prev', w, 'run', acc.run + CAST(1 AS BIGINT),
      |                 'types', acc.types, 'hapax', acc.hapax, 'sumsq', acc.sumsq),
      |    named_struct('prev', w, 'run', CAST(1 AS BIGINT),
      |                 'types', acc.types + CAST(1 AS BIGINT),
      |                 'hapax', acc.hapax + IF(acc.run = 1, CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
      |                 'sumsq', acc.sumsq + acc.run * acc.run)),
      |  acc -> named_struct(
      |    'types', acc.types,
      |    'hapax', acc.hapax + IF(acc.run = 1, CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
      |    'sumsq', acc.sumsq + acc.run * acc.run))),
      |  s -> array(s.types, s.hapax, s.sumsq))[0]""".stripMargin

  /** Per-doc lexical-diversity panel over ANY frame with (doc_id,
    * text) — shared by d107 (batch) and s43 (the live gate), so both
    * sides score identically. ZERO shuffles: each row's word array
    * goes through ONE x09 [[graft.functions.DiversityStats]] kernel
    * call (sort + run-length scan, primitive loop inside whole-stage
    * codegen) carrying (types, hapax, Σc²) directly — the per-doc word
    * histogram never materializes, which is what makes the panel
    * streamable per-row in the first place. All ratios are rational
    * arithmetic over exact integers — IEEE-identical cross-engine
    * (§4: Simpson replaces entropy for exactly this reason). */
  private[graft] def diversityPanel(df: DataFrame): DataFrame =
    Corpus.normalized(df)
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        graft.functions.DiversityStats(col("ws")).as("d"))
      .select(col("doc_id"), col("n_tokens"),
        col("d")(0).as("n_types"), col("d")(1).as("n_hapax"),
        (col("d")(0).cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("d")(1).cast("double") / col("d")(0).cast("double"))
          .as("hapax_frac"),
        (col("d")(2).cast("double") / col("n_tokens").cast("double")
          / col("n_tokens").cast("double")).as("simpson"))
      .withColumn("low_diversity", col("ttr") < 0.35)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ZIPF HEAD CURVE — rank-frequency over the top-100 terms by
    // corpus frequency, with each rank's share and the CUMULATIVE
    // share of the head: the "how head-heavy is this corpus" panel
    // that sizes tokenizer vocabularies and stopword lists (a head
    // covering 60% of tokens in 100 terms is a very different
    // tokenization problem from one covering 5%). d16 ranks by
    // DOCUMENT frequency (which docs to prune); this ranks by TOKEN
    // mass (where the token budget goes). One word-keyed aggregate
    // (the d16 shuffle), top-100 via TakeOrderedAndProject (no
    // global sort), total-token scalar from the SAME aggregated
    // frame (exchange reuse, not a second corpus scan), and the
    // running head-mass is a window over the bounded 100 rows.
    // Shares divide exact longs → bit-identical doubles.
    "d86_zipf_curve" -> { (s, dir) =>
      val cf = Corpus.docs(s, dir)
        .select(explode(col("ws")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cf"))
      val tot = cf.agg(sum(col("cf")).as("total"))
      val top = cf.orderBy(col("cf").desc, col("w").asc).limit(100)
      val rw = Window.orderBy(col("cf").desc, col("w").asc)
      top.crossJoin(broadcast(tot))
        .withColumn("rnk", row_number().over(rw).cast("long"))
        .withColumn("cum_cf",
          sum(col("cf")).over(rw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rnk"), col("w"), col("cf"),
          (col("cf").cast("double") / col("total").cast("double")).as("share"),
          (col("cum_cf").cast("double") / col("total").cast("double")).as("cum_share"))
        .orderBy("rnk")
    },

    // Language ID: stopword-lexicon scoring, argmax lang per doc
    // ('und' when nothing matches). Entirely per-row — one scan, zero
    // shuffles: each language's score is size(filter(ws, ...)) against
    // its constant lexicon, the argmax is a greatest + CASE cascade in
    // tie-break order. At 100 TB this is embarrassingly parallel.
    "d08_langid" -> { (s, dir) =>
      langidScored(Corpus.docs(s, dir))
        .select(col("doc_id"), col("pred_lang"), col("score"))
        .orderBy("doc_id")
    },

    // LANGID CONFUSION — the eval that closes d08's loop: predicted
    // vs DECLARED language as a confusion matrix (per cell the count,
    // per declared lang its total and the cell's share — the d75/d98
    // external-validation shape for the language identifier). The
    // number a multilingual pipeline reads before trusting d08's
    // routing: which language pairs the stop-word heuristic confuses,
    // and how much mass falls to 'und'. ONE corpus scan into a
    // lang²-bounded aggregate; the row totals ride a window over the
    // 25-cell aggregate output (no second scan, no persist). Share
    // divides identical integers both engines → bit-identical doubles.
    "d101_langid_confusion" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      langidScored(Corpus.docs(s, dir))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_lang", sum(col("n")).over(w))
        .withColumn("share", col("n").cast("double") / col("n_lang"))
        .orderBy("lang", "pred_lang")
    },

    // Quality scoring from integer-count ratios. Digit/punct counts come
    // from the single-pass CharCounts kernel (one byte loop per row)
    // instead of two full regex passes — same values, ~half the text
    // scanning cost of the hottest per-row operator.
    "d09_quality" -> { (s, dir) =>
      qualityCols(Corpus.docs(s, dir))
        .select("doc_id", "n_chars_raw", "n_words", "n_digits", "n_punct",
          "n_stop", "stop_ratio", "punct_ratio", "quality")
        .orderBy("doc_id")
    },

    // The Gopher rule PANEL — d09 scores quality on a continuous
    // scale; this is the named RULE SET (Rae et al. 2021) with each
    // rule's verdict attributable per doc, the report a curation run
    // publishes so "why was this dropped?" has an answer. Per-row
    // HOF work over one corpus scan, zero shuffles (see gopherPanel).
    "d92_gopher_rules" -> { (s, dir) =>
      gopherPanel(Corpus.docs(s, dir)).orderBy("doc_id")
    },

    // Token counting: whitespace words, regex tokens, BPE-ish estimate.
    "d10_tokens" -> { (s, dir) =>
      Corpus.docs(s, dir)
        .withColumn("ws_tokens", size(col("ws")).cast("long"))
        .withColumn("re_tokens",
          size(regexp_extract_all(lower(col("text")), lit(tokenRe), lit(0))).cast("long"))
        .withColumn("bpe_est", ceil(length(col("text")) / 4.0).cast("long"))
        .select("doc_id", "ws_tokens", "re_tokens", "bpe_est")
        .orderBy("doc_id")
    },

    // TOKEN FERTILITY per language — the multilingual cost profile
    // (how many tokenizer tokens each language pays per word, and how
    // many characters per token — the fertility numbers XLM-R/mT5-
    // style corpus planning reads next to d94's α-law: a
    // high-fertility language consumes its token budget faster than
    // its document share suggests). Exact integer sums of d10's three
    // counters folded per language in ONE corpus scan into a
    // lang-bounded aggregate; the ratios are one-shot divides of
    // identical integers both engines → bit-identical doubles.
    "d100_token_fertility" -> { (s, dir) =>
      tokenFertility(Corpus.docs(s, dir)).orderBy("lang")
    },

    // Corpus vocabulary: top-20 words by document frequency — the
    // df table a corpus-level quality/stopword pipeline starts from.
    // One distinct + one agg + TakeOrderedAndProject (no global sort).
    "d16_vocab" -> { (s, dir) =>
      Corpus.docs(s, dir)
        .select(col("doc_id"), explode(col("ws")).as("w"))
        .distinct()
        .groupBy("w")
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("w").asc)
        .limit(20)
    },

    // TF-IDF top terms: tf × (N/df) with a RATIONAL idf — log() is not
    // bit-stable across engines' libm, but tf·N/df ranks identically
    // (log is monotone) and divides exact integers → bit-identical
    // doubles. Shuffles: one per-doc-word agg, a word-keyed df join
    // (NO broadcast hint — the vocabulary is unbounded at 100 TB, so
    // Catalyst must stay free to shuffle it; it auto-broadcasts small
    // vocabularies anyway), and a broadcast scalar N. The top-3-per-doc
    // runs on the custom TopKPerGroup operator (x04): a map-side
    // partial keeps ≤3 rows per doc per partition in bounded heaps, so
    // the rank exchange carries ~3/|terms per doc| of the rows the
    // row_number window formulation would shuffle AND sort.
    "d19_tfidf" -> { (s, dir) =>
      val docs = Corpus.docs(s, dir)
      val wa = docs.select(col("doc_id"), explode(col("ws")).as("w"))
      val tf = wa.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      // document frequency DERIVES from tf (one row per (doc, w), so
      // rows-per-w IS the df) — the tf exchange is computed once and
      // reused, instead of a second scan + explode + distinct shuffle
      // of every word occurrence. The tf >= 1 filter is trivially true
      // (counts are positive) but keeps `tf` referenced: without it the
      // optimizer prunes the inner count, the two agg subtrees diverge,
      // and the exchange reuse is lost (measured: 3 scans instead of 2).
      val dfreq = tf.filter(col("tf") >= 1)
        .groupBy("w").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, Seq("w"))
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
      graft.plans.TopK.perGroup(scored,
          Seq("doc_id"), Seq(("score", true), ("w", false)), k = 3, rankName = "rn")
        .select("doc_id", "w", "tf", "df", "score", "rn")
        .orderBy("doc_id", "rn")
    },

    // BM25 RETRIEVAL — the lexical-search baseline every retrieval
    // pipeline (and every RAG evaluation) starts from: top-5 docs per
    // query term under BM25 (k1=1.2, b=0.75), with the RATIONAL idf
    // variant (N−df+0.5)/(df+0.5) — log() is not bit-stable across
    // engines' libm (d19's finding) and is monotone, so per-term
    // rankings are IDENTICAL to the log form; only the absolute
    // scores differ, and the emitted score is then a pure function of
    // exact integers through IEEE +,*,/ → bit-identical cross-engine.
    // ONE token pass carries tf AND dl (doc length rides the explode,
    // so no per-doc join back); df derives from the tf frame (d19's
    // exchange-reuse derivation — the tf >= 1 filter keeps the
    // subtrees shared); N and avgdl come from one corpus-stats scalar
    // (a second, column-pruned scan) broadcast into the score. Top-5
    // per term runs on TopKPerGroup (x04): the map-side partial keeps
    // ≤5 rows per term per partition, so the rank exchange carries
    // ~terms×5×partitions rows however large the corpus. The query
    // catalog is a bounded literal set — at 100 TB the same plan
    // serves any term list that fits a broadcast.
    "d84_bm25" -> { (s, dir) =>
      val docs = Corpus.docs(s, dir)
      val dlCol = size(filter(col("ws"), w => w =!= "")).cast("long")
      val toks = docs
        .select(col("doc_id"), dlCol.as("dl"), explode(col("ws")).as("w"))
        .filter(col("w").isin(bm25Terms: _*))
      val tf = toks.groupBy("doc_id", "w")
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      // both predicates are trivially true; they keep tf AND dl
      // referenced so column pruning cannot diverge the two tf-agg
      // subtrees — diverged subtrees lose exchange reuse and the
      // token pass runs twice (d19's finding, extended: max(dl) must
      // survive in BOTH copies for the exchanges to be identical)
      val dfreq = tf.filter(col("tf") >= 1 && col("dl") >= 1)
        .groupBy("w").agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(dlCol).as("sum_dl"))
      val scored = tf.join(dfreq, Seq("w"))
        .crossJoin(broadcast(stats))
        .withColumn("score",
          ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)))
            * (col("tf").cast("double") * lit(2.2))
            / (col("tf").cast("double") + lit(1.2) * (lit(0.25)
              + lit(0.75) * (col("dl").cast("double") * col("n_docs").cast("double") / col("sum_dl").cast("double")))))
      graft.plans.TopK.perGroup(scored,
          Seq("w"), Seq(("score", true), ("doc_id", false)), k = 5, rankName = "rn")
        .select("w", "doc_id", "tf", "dl", "df", "score", "rn")
        .orderBy("w", "rn")
    },

    // KMV (k-minimum-values) distinct-count sketch: est = (k−1)·2³²/h_k
    // where h_k is the k-th smallest distinct hash. Unlike HLL (whose
    // registers differ per implementation), KMV is exactly mirrorable
    // across engines. The dedup happens on the 8-byte HASH, not the
    // word: map-side partial distinct dedupes within partitions — which
    // IS the distributed KMV merge — and the shuffle carries narrow
    // long rows; TakeOrdered then picks the k smallest without a
    // global sort. The error baseline is the distinct-HASH count
    // (named honestly: ~n²/2³³ birthday collisions below the true
    // distinct-word count at large n).
    "d20_kmv_sketch" -> { (s, dir) =>
      val k = 64
      val hashes = Corpus.docs(s, dir)
        .select(explode(col("ws")).as("w"))
        .select(hash32(col("w")).as("h")).distinct()
      val kth = hashes
        .orderBy("h").limit(k)
        .agg(max(col("h")).as("h_k"), count(lit(1)).as("k_actual"))
      val exact = hashes.agg(count(lit(1)).as("n_distinct_hashes"))
      kth.crossJoin(broadcast(exact))
        .withColumn("est_distinct",
          // standard KMV: when the sketch isn't full the set IS exact
          when(col("k_actual") < k, col("n_distinct_hashes").cast("double"))
            .otherwise(
              lit((k - 1).toDouble) * lit(4294967296.0) / col("h_k").cast("double")))
        .select("k_actual", "h_k", "est_distinct", "n_distinct_hashes")
    },

    // Repetition detection — the Gopher/RefinedWeb-style quality
    // filter: the fraction of a document's word bigrams taken by its
    // single most frequent bigram (degenerate machine-generated text
    // scores high). Rational arithmetic only (count / count → exact
    // double), and the per-doc argmax runs on TopKPerGroup with k=1 —
    // the exchange carries ONE bigram per (doc, partition), not the
    // full bigram frequency table a row_number window would sort.
    "d29_repetition" -> { (s, dir) =>
      val docs = Corpus.docs(s, dir).filter(size(col("ws")) >= 2)
      // bigram build on the GramShingles codegen kernel — the
      // transform HOF it replaces folded interpreted per word
      val bg = docs.select(col("doc_id"),
        explode(graft.functions.GramShingles(col("ws"), 2, distinct = false)).as("bg"))
      val counts = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      val top = graft.plans.TopK.perGroup(counts,
        Seq("doc_id"), Seq(("c", true), ("bg", false)), k = 1)
      val nbg = docs.select(col("doc_id"), (size(col("ws")) - 1).cast("long").as("n_bigrams"))
      top.join(nbg, Seq("doc_id"))
        .withColumn("top_frac", col("c").cast("double") / col("n_bigrams"))
        .withColumn("repetitive", col("top_frac") >= 0.2)
        .select("doc_id", "bg", "c", "n_bigrams", "top_frac", "repetitive")
        .orderBy("doc_id")
    },

    // LEXICAL-DIVERSITY panel — the vocabulary-concentration quality
    // signals (type-token ratio, hapax fraction, Simpson repeat
    // probability) that separate written prose from keyword-stuffed /
    // template junk, per doc: TTR = |types|/|tokens|, hapax_frac =
    // once-words/|types|, simpson = Σc²/n² (the probability two
    // sampled tokens are the SAME word — the full-distribution dual
    // of d29's top-bigram fraction). ZERO shuffles: the per-doc word
    // histogram never materializes — each row sorts its own word
    // array and folds one O(n) run-length scan (aggregate HOF) that
    // carries (types, hapax, Σc²) directly, so at 100 TB the whole
    // panel is a map-only pass inside codegen (d29 pays a doc×word
    // shuffle for the same histogram; this is the row-local form).
    // All ratios are rational arithmetic over exact integers — IEEE-
    // identical cross-engine (§4: no transcendental in a compared
    // column; Simpson replaces entropy for exactly this reason). The
    // oracle recomputes the panel through the RELATIONAL histogram
    // (explode → GROUP BY), so the hash compare also proves the
    // sorted-run fold ≡ the group-by histogram. Pin documents=1.
    "d107_lexical_diversity" -> { (s, dir) =>
      diversityPanel(graft.sources.Tables.documents(s, dir)).orderBy("doc_id")
    },

    // VOCABULARY-GROWTH curve (Heaps' law, measured not fitted) — how
    // fast does the corpus vocabulary grow as ingestion proceeds? Docs
    // in ingestion order (doc_id — dense by the fixture contract, the
    // crawl-order prefix) are cut into 4 equal prefixes; each word is
    // charged to the quarter where it FIRST appears (one min(doc_id)
    // aggregate over the word stream — map-side partial on the word
    // key, the d16 shuffle), and the running type/token totals give
    // the prefix TTR whose DECAY is the Heaps signal a tokenizer-
    // sizing / dedup-health check reads (a corpus whose vocabulary
    // grows LINEARLY is id-stuffed or unnormalized; sublinear is
    // healthy prose). Two corpus passes (pin documents=2, the d19
    // tf+df convention): the word stream for first-occurrence, the
    // doc stream for per-quarter token mass — persisting the exploded
    // word stream to fuse them would cache corpus-sized state for a
    // one-row-per-quarter output. The cumulation window runs over 4
    // rows (declared in PlanSpec's bounded-window set). Quarter cut
    // is integer arithmetic (doc_id·4 div N) — engine-exact; ratios
    // divide exact integers (§4).
    "d109_vocab_growth" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val n = graft.sources.Stats.parquetRowCount(s, s"$dir/documents.parquet")
      val docs = Corpus.docs(s, dir)
      val firstSeen = docs
        .select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy("w").agg(min(col("doc_id")).as("first_doc"))
        .select(expr(s"least(CAST(3 AS BIGINT), first_doc * 4 div $n) + 1")
          .as("quarter"))
        .groupBy("quarter").agg(count(lit(1)).as("new_types"))
      val toks = docs
        .select(expr(s"least(CAST(3 AS BIGINT), doc_id * 4 div $n) + 1")
          .as("quarter"), size(col("ws")).cast("long").as("nt"))
        .groupBy("quarter").agg(sum(col("nt")).as("n_tokens"))
      val w = Window.orderBy("quarter")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks.join(firstSeen, Seq("quarter"), "left")
        .na.fill(0L, Seq("new_types"))
        .withColumn("n_docs_prefix", expr(s"CAST($n AS BIGINT) * quarter div 4"))
        .withColumn("cum_types", sum(col("new_types")).over(w))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("prefix_ttr",
          col("cum_types").cast("double") / col("cum_tokens").cast("double"))
        .select("quarter", "n_docs_prefix", "new_types", "cum_types",
          "n_tokens", "cum_tokens", "prefix_ttr")
        .orderBy("quarter")
    },

    // Corpus length statistics — the quality-dashboard numbers every
    // ingestion pipeline tracks per stratum. Spark's EXACT percentile
    // aggregate buffers a value→count map per group: for a bounded
    // domain like document lengths (thousands of distinct values, not
    // billions), that partial map merges associatively and the
    // exchange carries one bounded map per (lang, partition) — exact
    // quantiles at 100 TB without a global sort. The interpolation
    // ((n−1)·q position, linear between neighbors) is the same
    // definition DuckDB's quantile_cont uses, over exact integer
    // inputs — bit-identical doubles.
    "d28_corpus_stats" -> { (s, dir) =>
      graft.sources.Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").as("ps"),
          sum(col("n_chars")).as("total_chars"))
        .select(col("lang"), col("n_docs"),
          col("ps")(0).as("p50"), col("ps")(1).as("p90"), col("ps")(2).as("p99"),
          col("total_chars"))
        .orderBy("lang")
    },

    // Column PROFILE — the ANALYZE-style schema report run before a
    // corpus is trusted (null fractions, cardinalities, value widths
    // per column): ALL columns profile in ONE scan — the per-column
    // non-null/distinct/width aggregates ride a single pass (the
    // multi-distinct Expand, q32's machinery, fans each row once per
    // distinct panel AFTER column pruning), and the per-column report
    // rows come from exploding a 5-struct array over the 1-row
    // aggregate — the melt never touches the table. Exact distincts
    // are the declared baseline; at 100 TB the same report downgrades
    // to approx_count_distinct per column (mergeable HLL, no Expand).
    // Pin documents=1.
    "d70_profile" -> { (s, dir) =>
      val d = graft.sources.Tables.documents(s, dir)
      def cols3(c: String, strForm: org.apache.spark.sql.Column) = Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        sum(length(strForm)).as(s"len_$c"))
      val agg = d.agg(
        count(lit(1)).as("n_rows"),
        cols3("doc_id", col("doc_id").cast("string")) ++
          cols3("text", col("text")) ++
          cols3("lang", col("lang")) ++
          cols3("source", col("source")) ++
          cols3("n_chars", col("n_chars").cast("string")): _*)
      val percol = Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        struct(lit(c).as("col_name"), col(s"nn_$c").as("n_nonnull"),
          col(s"nd_$c").as("n_distinct"), col(s"len_$c").as("sum_len")))
      agg.select(col("n_rows"), explode(array(percol: _*)).as("p"))
        .select(col("p.col_name").as("col_name"), col("n_rows"),
          col("p.n_nonnull").as("n_nonnull"), col("p.n_distinct").as("n_distinct"),
          ((col("n_rows") - col("p.n_nonnull")).cast("double")
            / col("n_rows").cast("double")).as("null_frac"),
          (col("p.sum_len").cast("double")
            / greatest(col("p.n_nonnull"), lit(1L)).cast("double")).as("avg_len"))
        .orderBy("col_name")
    },

    // GROUPED distinct-count sketches in ONE pass: per-source
    // distinct-word estimates via the KMV TypedImperativeAggregate
    // (x06). Where d20's global formulation shuffles every distinct
    // hash, this carries one ≤64-long serialized buffer per (source,
    // partition) through the exchange — the partial/final merge tree
    // IS the sketch union, so the cost per group is O(k) regardless of
    // corpus size.
    "d26_kmv_by_source" -> { (s, dir) =>
      Corpus.docs(s, dir)
        .select(col("source"), explode(col("ws")).as("w"))
        .select(col("source"), hash32(col("w")).as("h"))
        .groupBy("source")
        .agg(KmvSketchAgg(col("h"), 64).as("kmv"))
        .select(col("source"), col("kmv.k_actual").as("k_actual"),
          col("kmv.h_k").as("h_k"), col("kmv.est_distinct").as("est_distinct"))
        .orderBy("source")
    },

    // End-to-end training-set selection: the composition a real corpus
    // pipeline ships — keep a doc iff (a) its quality score clears the
    // bar and (b) it is the canonical keeper of its exact-dup group
    // (min doc_id per content hash). One scan computes quality per-row;
    // the dedup keeper is a window over the same pass (no groupBy +
    // join-back, which would recompute the normalization lineage).
    "d21_corpus_select" -> { (s, dir) =>
      val keepW = Window.partitionBy("content_hash")
      Corpus.docs(s, dir)
        .withColumn("content_hash", md5(col("norm")))
        .withColumn("n_words", size(col("ws")).cast("long"))
        .withColumn("n_stop", wordHits(col("ws"), enStop))
        .withColumn("stop_ratio",
          col("n_stop").cast("double") / greatest(col("n_words"), lit(1L)))
        .withColumn("keeper", min(col("doc_id")).over(keepW))
        .filter(col("doc_id") === col("keeper")
          && col("stop_ratio") >= 0.05 && col("n_words").between(5, 500))
        .select("doc_id", "content_hash", "n_words", "stop_ratio")
        .orderBy("doc_id")
    },

    // Quality × duplication CORRELATION diagnostic — "are my low-
    // quality docs also my duplicated docs?", the question that
    // decides whether one filter can do two jobs. Duplication =
    // LSH-candidate membership (any of the doc's d04 band signatures
    // shared — the corpus dup fixture is NEAR-identical copies, never
    // byte-identical, so a content-hash flag would be degenerately
    // zero; the band-bucket window prices near-dup membership WITHOUT
    // materializing pairs). Quality bins are FIXED (floor(q·20) —
    // per-row binning, no global rank sort: fixed bins scale where
    // deciles need a global order). Two cheap passes (signature +
    // quality) joined per doc, then one bounded bin aggregate;
    // binning on exact cross-engine doubles keeps floor()
    // deterministic.
    // Quality-bar YIELD CURVE — the threshold sweep run before fixing
    // the corpus quality cutoff, completing the tuning-curve family
    // across all three filter axes (d71 prices the Jaccard cutoff,
    // d68 the ANN nprobe, this the d09/d21 quality bar): at τ ∈
    // {0.05, 0.10, 0.20, 0.30}, how many documents and tokens survive,
    // and how near-dup-exposed is the surviving set (does the quality
    // bar ALSO do dedup's job — d77's correlation question asked as
    // an actionable per-cutoff trade)? Two cheap passes (the d77
    // shape: quality+tokens on one corpus scan, dup membership priced
    // on the signature pass), then every doc fans to the 4 bounded
    // threshold rows and ONE conditional aggregate emits the whole
    // curve — the sweep never re-scans. Counts exact ints, fractions
    // one-shot divides.
    "d83_quality_curve" -> { (s, dir) =>
      val sigW = Window.partitionBy("band", "sig")
      val dup = Dedup.bandSigs(s, dir)
        .withColumn("bn", count(lit(1)).over(sigW))
        .groupBy("doc_id")
        .agg(max(when(col("bn") > 1, 1L).otherwise(0L)).as("is_dup"))
      val perDoc = qualityCols(Corpus.docs(s, dir))
        .select(col("doc_id"), col("quality"),
          expr("CAST(size(filter(ws, x -> x != '')) AS BIGINT)").as("n_tokens"))
        .join(dup, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      perDoc
        .select(col("quality"), col("n_tokens"), col("is_dup"),
          explode(array(lit(0.05), lit(0.10), lit(0.20), lit(0.30))).as("t"))
        .groupBy("t")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("quality") >= col("t"), 1L).otherwise(0L)).as("docs_kept"),
          sum(when(col("quality") >= col("t"), col("n_tokens")).otherwise(0L)).as("tokens_kept"),
          sum(when(col("quality") >= col("t"), col("is_dup")).otherwise(0L)).as("dup_kept"))
        .withColumn("keep_frac", col("docs_kept").cast("double") / col("n_docs"))
        .withColumn("dup_rate_kept",
          col("dup_kept").cast("double") / greatest(col("docs_kept"), lit(1L)))
        .orderBy("t")
    },

    "d77_quality_dup_corr" -> { (s, dir) =>
      val sigW = Window.partitionBy("band", "sig")
      val dup = Dedup.bandSigs(s, dir)
        .withColumn("bucket_n", count(lit(1)).over(sigW))
        .groupBy("doc_id")
        .agg(max(when(col("bucket_n") > 1, 1L).otherwise(0L)).as("is_dup"))
      qualityCols(Corpus.docs(s, dir))
        .select(col("doc_id"), col("quality"))
        .join(dup, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
        .withColumn("qbin", floor(col("quality") * 20).cast("long"))
        .groupBy("qbin")
        .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dup_docs"))
        .withColumn("dup_rate", col("n_dup_docs").cast("double") / col("n_docs"))
        .orderBy("qbin")
    },

    // QUALITY ↔ GOPHER CALIBRATION — do the two quality axes agree?
    // d09 scores a continuous scalar, d92 votes a hard rule panel;
    // this is d77's correlation shape between THEM: per d77-style
    // quality bin (floor(quality·20)) the doc count, how many the
    // Gopher panel keeps, and the keep rate — the calibration curve
    // that decides whether the cheap scalar can stand in for the rule
    // panel at a given cutoff (and where the two disagree enough that
    // a pipeline must run both). Two per-row passes joined on doc_id
    // (d77's two-pass shape, pin documents=2); the bin aggregate is
    // 20-row bounded; keep_rate divides identical integers both
    // engines.
    "d102_quality_calibration" -> { (s, dir) =>
      val q = qualityCols(Corpus.docs(s, dir)).select(col("doc_id"), col("quality"))
      val g = gopherPanel(Corpus.docs(s, dir)).select(col("doc_id"), col("keep"))
      q.join(g, Seq("doc_id"))
        .withColumn("qbin", floor(col("quality") * 20).cast("long"))
        .groupBy("qbin")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
        .withColumn("keep_rate", col("n_keep").cast("double") / col("n_docs"))
        .orderBy("qbin")
    },

    // Per-source DATASET CARD — the datasheet a corpus release ships
    // (Datasheets for Datasets, Gebru et al. 2021), one row per
    // source: volume (docs, tokens), language spread, mean length,
    // provenance coverage (share citing a URL), and near-dup exposure
    // (share in a shared LSH bucket — d77's membership flag). The
    // card COMPOSES existing passes rather than inventing new
    // metrics: one corpus scan carries tokens/langs/length/URL flags,
    // the signature pass prices dup membership, and ONE bounded
    // per-source aggregate emits the panel. Every fraction is a
    // one-shot divide of exact longs.
    "d79_dataset_card" -> { (s, dir) =>
      val sigW = Window.partitionBy("band", "sig")
      val dup = Dedup.bandSigs(s, dir)
        .withColumn("bn", count(lit(1)).over(sigW))
        .groupBy("doc_id")
        .agg(max(when(col("bn") > 1, 1L).otherwise(0L)).as("is_dup"))
      withInjectedUrls(Corpus.docs(s, dir))
        .withColumn("has_url",
          size(regexp_extract_all(col("raw"), lit(urlRe), lit(0))) > 0)
        .join(dup, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("ws"))).cast("long").as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          sum(when(col("has_url"), 1L).otherwise(0L)).as("n_with_url"),
          sum(col("is_dup")).as("n_dup"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
          (col("sum_chars").cast("double") / col("n_docs")).as("mean_chars"),
          (col("n_with_url").cast("double") / col("n_docs")).as("url_frac"),
          (col("n_dup").cast("double") / col("n_docs")).as("dup_frac"))
        .orderBy("source")
    },

    // Document fingerprint: min rolling hash over stride-4 8-char
    // windows of the normalized text (winnowing-style min-sampling;
    // the stride cuts hash work 4× with the same min-sketch shape).
    // One Fingerprint kernel call per row AT THE SCAN — the previous
    // explode formulation (which the oracle still mirrors) fanned each
    // doc out to |windows| ≈ len/4 rows and shuffled them into a
    // per-doc aggregate; at 100 TB that multiplies the dominant
    // exchange by the window count for a value-identical result.
    "d11_fingerprint" -> { (s, dir) =>
      Corpus.docs(s, dir)
        .filter(length(col("norm")) >= 8)
        .withColumn("fpv", Fingerprint(col("norm")))
        .select(col("doc_id"),
          element_at(col("fpv"), 1).as("fp_min"),
          element_at(col("fpv"), 2).as("n_uniq_windows"))
        .orderBy("doc_id")
    },

    // URL extraction + per-domain inventory — the provenance report a
    // crawl corpus runs before domain-level filtering/deduplication.
    // The corpus text is synthetic word salad, so URLs are INJECTED
    // deterministically from doc_id (mirrored in the oracle CTE; same
    // pattern as d25's PII injection) — the operator under test is the
    // extract→explode→per-domain rollup. The countDistinct Expand runs
    // over the extracted URL stream (≤2 rows/doc by construction, and
    // in a real crawl |urls| ≪ |text bytes|), never the corpus scan.
    "d31_url_extract" -> { (s, dir) =>
      val raw = withInjectedUrls(graft.sources.Tables.documents(s, dir))
      raw.select(col("doc_id"),
          explode(regexp_extract_all(col("raw"), lit(urlRe), lit(0))).as("url"))
        .withColumn("domain", regexp_extract(col("url"), urlRe, 1))
        .withColumn("path", regexp_extract(col("url"), urlRe, 2))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"),
          countDistinct(col("path")).as("n_paths"))
        .orderBy("domain")
    },

    // Domain REPUTATION index — the filter table a web corpus builds
    // from d31's provenance: per domain, how good are the documents
    // citing it, and where does it rank? One corpus scan builds the
    // doc→domain link stream with the d09 quality score already
    // attached per row; the per-domain aggregate is bounded (domains ≪
    // docs) with exact DECIMAL quality sums (no float summation-order
    // drift), and the quartile tiering is a rank window over the
    // BOUNDED domain table only — rank-based tiers (bottom quartile =
    // "low") stay discriminative at every corpus size where absolute
    // cutoffs drift with the mix. s28 consumes this index as the
    // streaming ingest gate.
    "d72_domain_reputation" -> { (s, dir) =>
      domainReputation(s, dir).orderBy("domain")
    },

    // Source-overlap MATRIX via mergeable KMV sketch algebra — "how
    // much content do my ingest sources share?" asked WITHOUT an
    // all-pairs content join: one corpus pass folds each source's
    // word-3-gram stream into a ≤k-value sketch (the x06 aggregate's
    // payload form — the shuffle carries ≤k longs per source per
    // partition), then every source PAIR union-merges two bounded
    // arrays: the k smallest of the merged sketches is a valid sketch
    // of the union, so |A∪B|, |A∩B| and Jaccard fall out of pure
    // array arithmetic on 20 rows — no second data pass, no gram
    // rejoin. At 100 TB this is the only affordable shape for an S²
    // overlap report. Estimates are the d26 KMV law (exact when a
    // sketch never filled); every double derives from one division of
    // exact integers, so the matrix is bit-identical cross-engine.
    "d73_source_overlap" -> { (s, dir) =>
      import org.apache.spark.sql.Column
      val k = 64
      val sk = Corpus.docs(s, dir)
        .select(col("source"), explode(Corpus.gramsArr).as("gram"))
        .select(col("source"), hash32(col("gram")).as("h"))
        .groupBy("source")
        .agg(KmvValuesAgg(col("h"), k).as("hs"))
        // persist: both pair sides reference this aggregate, and AQE
        // exchange reuse is best-effort (the lshPairs lesson) — the
        // frame is ≤k longs per source, so the cache is trivial and
        // the one-corpus-scan pin becomes structural
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sk.select(col("source").as("a_source"), col("hs").as("a_hs"))
      val b = sk.select(col("source").as("b_source"), col("hs").as("b_hs"))
      def est(hs: Column): Column =
        when(size(hs) < k, size(hs).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0)
            / element_at(hs, size(hs)).cast("double"))
      a.join(broadcast(b), col("a_source") < col("b_source"))
        .withColumn("u_hs",
          slice(array_sort(array_union(col("a_hs"), col("b_hs"))), 1, k))
        .withColumn("est_a", est(col("a_hs")))
        .withColumn("est_b", est(col("b_hs")))
        .withColumn("est_union", est(col("u_hs")))
        .withColumn("est_inter",
          greatest(lit(0.0), (col("est_a") + col("est_b")) - col("est_union")))
        .withColumn("jaccard_est", col("est_inter") / col("est_union"))
        .select("a_source", "b_source", "est_a", "est_b", "est_union",
          "est_inter", "jaccard_est")
        .orderBy("a_source", "b_source")
    },

    // Z-order data layout (x07 kernel in production): a 32-bit Morton
    // key over (length bucket, source bucket) — the clustering key a
    // 100 TB corpus would range-partition + sort by so scans filtering
    // on EITHER dimension prune files via min/max stats. The report
    // groups docs into the 16 top-level Z-ranges (the key's high 4
    // bits = the 4×4 grid cell both dimensions quartered) and shows
    // the layout is balanced + range-contiguous. Key computation is
    // the branch-free ZOrder2 codegen kernel — a pure per-row
    // projection at the scan, no shuffle before the 16-group agg.
    "d33_zorder" -> { (s, dir) =>
      graft.sources.Tables.documents(s, dir)
        .withColumn("x", least(col("n_chars") * 100, lit(65535L)))
        .withColumn("y", pmod(hash32(col("source")), lit(65536L)))
        .withColumn("zkey", ZOrder2(col("x"), col("y")))
        .withColumn("zrange", shiftright(col("zkey"), 28))
        .groupBy("zrange")
        .agg(count(lit(1)).as("n_docs"),
          min(col("zkey")).as("min_z"),
          max(col("zkey")).as("max_z"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("zrange")
    },

    // Bigram LM novelty filter — the CCNet/KenLM quality-filter shape
    // with bit-stable arithmetic: the corpus bigram model scores each
    // transition p(w2|w1) = c(w1w2)/c(w1·), and each doc reports its
    // rarest and commonest transition plus the fraction of transitions
    // it ALONE contributes to the corpus (c2 = 1 — pure novel text vs
    // formulaic recombination). All model statistics are integer
    // counts; the only float ops are per-row IEEE divides of those
    // integers (no float SUM anywhere — min/max/count aggregate the
    // divides order-independently), so scores are bit-identical
    // cross-engine: d19's rational-idf determinism trick applied to
    // LM scoring. Scale: the full bigram stream crosses exactly TWO
    // exchanges — one hash partition by bg (built once; ReuseExchange
    // serves both the c2 aggregate and the model join probe) and the
    // final per-doc aggregate. The unigram denominators come from the
    // c2 TABLE (c1(w1) = Σ c2 over w1's bigrams — |model| rows, not
    // the stream), so the model enrich join never touches the corpus.
    "d37_lm_novelty" -> { (s, dir) =>
      val docs = Corpus.docs(s, dir).filter(size(col("ws")) >= 2)
      // bigram build on the GramShingles codegen kernel (the struct
      // transform it replaces folded interpreted per word); the stream
      // no longer carries w1 per row — words are space-free (split
      // output), so w1 ≡ the bigram's prefix before the space and is
      // recovered on the |model|-row aggregate instead: one narrower
      // exchange (doc_id, bg), same exact model.
      val bg = docs.select(col("doc_id"),
        explode(graft.functions.GramShingles(col("ws"), 2, distinct = false)).as("bg"))
      // bg determines w1. materialize-once: c2 feeds BOTH the model
      // join and c1's aggregation — without the persist each consumer
      // re-runs the full bigram-stream aggregate (measured: 3 corpus
      // scans). The cached frame is the MODEL (distinct bigrams), not
      // the corpus; persist keeps lineage for executor-loss recompute.
      val c2 = bg.groupBy("bg")
        .agg(count(lit(1)).as("c2"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
      val model = c2.join(c1, Seq("w1"))
        .select(col("bg"), col("c2"), col("c1"))
      bg.join(model, Seq("bg"))
        .withColumn("p", col("c2").cast("double") / col("c1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("c2") === 1, 1L).otherwise(0L)).as("n_novel"),
          min(col("p")).as("min_p"),
          max(col("p")).as("max_p"))
        .withColumn("novelty", col("n_novel").cast("double") / col("n_bigrams"))
        .orderBy("doc_id")
    },

    // Canonical-URL dedup — the first dedup pass a web corpus runs,
    // BEFORE any content hashing: the same page crawled as
    // `http://…`, `https://www.…/`, `HTTP://…?utm_…`, `…#frag` is one
    // document. Each doc carries a deterministic crawl URL whose
    // variant decoration depends on doc_id%4; canonicalization strips
    // scheme/`www.`/query/fragment/trailing slash and lowercases the
    // host, then the keeper per canonical page is the min doc_id —
    // computed by [[urlDedupOver]]'s AGGREGATE+JOIN (skew-survivable),
    // not a partition window (which would stall one task on a hot
    // URL). Pure per-row string kernels (codegen'd regexps) front the
    // two cheap pruned passes.
    "d60_url_dedup" -> { (s, dir) =>
      urlDedupOver(graft.sources.Tables.documents(s, dir)
        .select(col("doc_id"), crawlUrl(col("doc_id")).as("url")))
        .orderBy("doc_id")
    },

    // Count-Min sketch heavy hitters — the frequency twin of d20's KMV
    // (distinct-count) sketch: 4 hash rows × 1024 cells, every token
    // occurrence incrementing one cell per row; an estimate is the MIN
    // over a token's 4 cells, always ≥ the true count (one-sided
    // error — the property the spec pins). The sketch agg is the
    // 100 TB path: a BOUNDED 4096-cell aggregate whose map-side
    // partials collapse each partition before the shuffle, vs the
    // exact count's full token-keyed exchange. The exact top-20 ride
    // along as the declared QA baseline (the d34 pattern) so the
    // report carries measured inflation, not hoped-for accuracy; the
    // 4096-row sketch broadcasts to the probe join.
    "d61_cms_heavy" -> { (s, dir) =>
      val cellsOf = Corpus.cmsCellsSql
      val toks = Corpus.docs(s, dir)
        .select(explode(col("ws")).as("w")).filter(col("w") =!= "")
      val sketch = toks
        .select(explode(expr(cellsOf)).as("rc"))
        .select(col("rc.i").as("i"), col("rc.cell").as("cell"))
        .groupBy("i", "cell").agg(count(lit(1)).as("c"))
      val exact = toks.groupBy("w").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("w").asc).limit(20)
      exact
        .select(col("w"), col("n_exact"), explode(expr(cellsOf)).as("rc"))
        .select(col("w"), col("n_exact"),
          col("rc.i").as("i"), col("rc.cell").as("cell"))
        .join(broadcast(sketch), Seq("i", "cell"))
        .groupBy("w", "n_exact")
        .agg(min(col("c")).as("n_cms"))
        .withColumn("inflation", col("n_cms") - col("n_exact"))
        .orderBy(col("n_exact").desc, col("w").asc)
    },

    // BPE merge-pair statistics — the counting round a tokenizer
    // trainer runs at corpus scale: every adjacent CHARACTER pair,
    // weighted by corpus word frequency (train on the word TABLE, not
    // the token stream — the BPE trick that makes corpus size
    // irrelevant: the heavy explode runs over the bounded vocabulary,
    // the corpus contributes only the frequency weights from one
    // token-stream agg). Two counts per pair, both exact integers:
    // the sliding count (every position — what frequency ranking
    // uses) and the NON-OVERLAPPING merge count (what one BPE apply
    // round would actually perform, via the replace() length-delta —
    // 'aaa' holds two sliding 'aa's but ONE merge), plus the distinct
    // words carrying the pair. Top-10 by sliding count.
    "d64_bpe_pairs" -> { (s, dir) =>
      // the bounded word table persists: both pair counts branch from
      // it, and without the persist each branch would re-run the
      // corpus token agg
      val words = Corpus.docs(s, dir)
        .select(explode(col("ws")).as("w")).filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .filter(length(col("w")) >= 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = words
        .select(col("w"), col("n"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("p"))
      val naive = pairs.groupBy("p").agg(sum(col("n")).as("pair_count"))
      val merged = pairs.distinct()
        .withColumn("m",
          col("n") * expr("(length(w) - length(replace(w, p, ''))) div 2"))
        .groupBy("p")
        .agg(sum(col("m")).as("merge_count"), count(lit(1)).as("n_words"))
      naive.join(merged, Seq("p"))
        .orderBy(col("pair_count").desc, col("p").asc)
        .limit(10)
    }
  )

  val oracle: Map[String, String] = Map(
    "d86_zipf_curve" -> (Corpus.docsCte +
      """, cf AS (
        |  SELECT w, count(1) AS cf
        |  FROM (SELECT unnest(ws) AS w FROM docs) t
        |  WHERE w <> '' GROUP BY w),
        |tot AS (SELECT sum(cf) AS total FROM cf),
        |top AS (SELECT w, cf FROM cf ORDER BY cf DESC, w LIMIT 100)
        |SELECT ROW_NUMBER() OVER (ORDER BY cf DESC, w) AS rnk, w, cf,
        |  CAST(cf AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  CAST(sum(cf) OVER (ORDER BY cf DESC, w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    / CAST(total AS DOUBLE) AS cum_share
        |FROM top CROSS JOIN tot ORDER BY rnk""".stripMargin),

    "d08_langid" -> (Corpus.docsCte + {
      val scExprs = langWords.map { case (lang, ws) =>
        val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(ws, w -> list_contains($lst, w))) AS BIGINT) AS sc_$lang"
      }.mkString(",\n|    ")
      val scNames = langWords.map { case (l, _) => s"sc_$l" }.mkString(", ")
      val cases = langWords.map { case (l, _) => s"WHEN sc_$l = m THEN '$l'" }
        .mkString("\n|       ")
      s""", sc AS (
         |  SELECT doc_id,
         |    $scExprs
         |  FROM docs),
         |mx AS (SELECT doc_id, $scNames, greatest($scNames) AS m FROM sc)
         |SELECT doc_id,
         |  CASE WHEN m = 0 THEN 'und'
         |       $cases
         |  END AS pred_lang,
         |  m AS score
         |FROM mx ORDER BY doc_id""".stripMargin
    }),

    "d101_langid_confusion" -> (Corpus.docsCte + {
      val scExprs = langWords.map { case (lang, ws) =>
        val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(ws, w -> list_contains($lst, w))) AS BIGINT) AS sc_$lang"
      }.mkString(",\n|    ")
      val scNames = langWords.map { case (l, _) => s"sc_$l" }.mkString(", ")
      val cases = langWords.map { case (l, _) => s"WHEN sc_$l = m THEN '$l'" }
        .mkString("\n|       ")
      s""", sc AS (
         |  SELECT doc_id, lang,
         |    $scExprs
         |  FROM docs),
         |mx AS (SELECT doc_id, lang, $scNames, greatest($scNames) AS m FROM sc),
         |pred AS (
         |  SELECT lang,
         |    CASE WHEN m = 0 THEN 'und'
         |         $cases
         |    END AS pred_lang
         |  FROM mx)
         |SELECT lang, pred_lang, count(1) AS n,
         |  CAST(sum(count(1)) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
         |  CAST(count(1) AS DOUBLE)
         |    / CAST(sum(count(1)) OVER (PARTITION BY lang) AS BIGINT) AS share
         |FROM pred GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin
    }),

    "d100_token_fertility" -> (Corpus.docsCte +
      s"""SELECT lang, count(1) AS n_docs,
         |  CAST(sum(len(ws)) AS BIGINT) AS n_words,
         |  CAST(sum(len(regexp_extract_all(lower(text), '$tokenRe'))) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  CAST(CAST(sum(len(regexp_extract_all(lower(text), '$tokenRe'))) AS BIGINT) AS DOUBLE)
         |    / CAST(sum(len(ws)) AS BIGINT) AS fertility,
         |  CAST(CAST(sum(length(text)) AS BIGINT) AS DOUBLE)
         |    / CAST(sum(len(regexp_extract_all(lower(text), '$tokenRe'))) AS BIGINT) AS chars_per_token
         |FROM docs GROUP BY lang ORDER BY lang""".stripMargin),

    "d09_quality" -> (Corpus.docsCte +
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars_raw,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
         |  CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS BIGINT) AS n_stop,
         |  CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
         |    / greatest(len(ws), 1) AS stop_ratio,
         |  CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1) AS punct_ratio,
         |  CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
         |    / greatest(len(ws), 1)
         |  - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1)
         |  + CASE WHEN len(ws) BETWEEN 5 AND 200 THEN 0.1 ELSE 0.0 END AS quality
         |FROM docs ORDER BY doc_id""".stripMargin),

    "d92_gopher_rules" -> (Corpus.docsCte +
      s""", wtab AS (SELECT doc_id, unnest(ws) AS w FROM docs),
         |per AS (
         |  SELECT doc_id, w, count(1) AS c, len(w) AS wl
         |  FROM wtab GROUP BY doc_id, w),
         |agg AS (
         |  SELECT doc_id,
         |    CAST(sum(c) AS BIGINT) AS n_words,
         |    CAST(sum(c * wl) AS BIGINT) AS wchars,
         |    CAST(sum(CASE WHEN wl >= 3 THEN c ELSE 0 END) AS BIGINT) AS n_subst,
         |    CAST(count(CASE WHEN list_contains($enStopSqlList, w) THEN 1 END) AS BIGINT) AS n_stop_kinds,
         |    CAST(max(c) AS BIGINT) AS top_word_n
         |  FROM per GROUP BY doc_id)
         |SELECT doc_id, n_words, wchars, n_subst, n_stop_kinds, top_word_n,
         |  n_words BETWEEN 50 AND 100000 AS r_count,
         |  (wchars >= 3 * n_words AND wchars <= 10 * n_words) AS r_wlen,
         |  5 * n_subst >= 4 * n_words AS r_subst,
         |  n_stop_kinds >= 2 AS r_stop,
         |  5 * top_word_n <= n_words AS r_rep,
         |  ((n_words BETWEEN 50 AND 100000)
         |   AND wchars >= 3 * n_words AND wchars <= 10 * n_words
         |   AND 5 * n_subst >= 4 * n_words
         |   AND n_stop_kinds >= 2
         |   AND 5 * top_word_n <= n_words) AS keep
         |FROM agg ORDER BY doc_id""".stripMargin),

    "d10_tokens" -> (Corpus.docsCte +
      s"""SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '$tokenRe')) AS BIGINT) AS re_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
         |FROM docs ORDER BY doc_id""".stripMargin),

    "d16_vocab" -> (Corpus.docsCte +
      """SELECT w, COUNT(1) AS doc_freq FROM
        |  (SELECT DISTINCT doc_id, w FROM
        |    (SELECT doc_id, unnest(ws) AS w FROM docs) u) t
        |GROUP BY w ORDER BY doc_freq DESC, w ASC LIMIT 20""".stripMargin),

    "d84_bm25" -> (Corpus.docsCte + {
      val termList = bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
      s""", toks AS (
         |  SELECT doc_id, CAST(len(list_filter(ws, x -> x <> '')) AS BIGINT) AS dl,
         |    unnest(ws) AS w
         |  FROM docs),
         |tf AS (
         |  SELECT doc_id, w, count(1) AS tf, max(dl) AS dl
         |  FROM toks WHERE w IN $termList GROUP BY doc_id, w),
         |dfq AS (SELECT w, count(1) AS df FROM tf GROUP BY w),
         |st AS (SELECT count(1) AS n_docs,
         |  sum(CAST(len(list_filter(ws, x -> x <> '')) AS BIGINT)) AS sum_dl FROM docs),
         |sc AS (
         |  SELECT tf.w, tf.doc_id, tf.tf, tf.dl, dfq.df,
         |    ((CAST(st.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
         |      / (CAST(dfq.df AS DOUBLE) + 0.5))
         |      * (CAST(tf.tf AS DOUBLE) * 2.2)
         |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25
         |        + 0.75 * (CAST(tf.dl AS DOUBLE) * CAST(st.n_docs AS DOUBLE) / CAST(st.sum_dl AS DOUBLE)))) AS score
         |  FROM tf JOIN dfq USING (w) CROSS JOIN st)
         |SELECT w, doc_id, tf, dl, df, score, rn FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY w ORDER BY score DESC, doc_id ASC) AS rn
         |  FROM sc) t
         |WHERE rn <= 5 ORDER BY w, rn""".stripMargin
    }),

    "d19_tfidf" -> (Corpus.docsCte +
      """, wa AS (SELECT doc_id, unnest(ws) AS w FROM docs),
        |tf AS (SELECT doc_id, w, count(1) AS tf FROM wa GROUP BY 1, 2),
        |dfreq AS (SELECT w, count(1) AS df FROM (SELECT DISTINCT doc_id, w FROM wa) t GROUP BY w),
        |n AS (SELECT count(1) AS n_docs FROM docs)
        |SELECT doc_id, w, tf, df, score, rn FROM (
        |  SELECT t.doc_id, t.w, t.tf, d.df,
        |    CAST(t.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY
        |      CAST(t.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) DESC,
        |      t.w ASC) AS rn
        |  FROM tf t JOIN dfreq d USING (w) CROSS JOIN n) x
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin),

    "d20_kmv_sketch" -> (Corpus.docsCte + {
      val h = Corpus.hash32Sql("w")
      s""", hd AS (SELECT DISTINCT $h AS h FROM (SELECT doc_id, unnest(ws) AS w FROM docs) t),
         |hs AS (SELECT h FROM hd ORDER BY h LIMIT 64),
         |kth AS (SELECT CAST(max(h) AS BIGINT) AS h_k, count(1) AS k_actual FROM hs),
         |ex AS (SELECT count(1) AS n_distinct_hashes FROM hd)
         |SELECT k_actual, h_k,
         |  CASE WHEN k_actual < 64 THEN CAST(n_distinct_hashes AS DOUBLE)
         |       ELSE 63.0 * 4294967296.0 / CAST(h_k AS DOUBLE) END AS est_distinct,
         |  n_distinct_hashes
         |FROM kth, ex""".stripMargin
    }),

    "d29_repetition" -> (Corpus.docsCte +
      """, bgs AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
        |  FROM docs, UNNEST(range(1, len(ws))) t(i)
        |  WHERE len(ws) >= 2),
        |counts AS (SELECT doc_id, bg, count(1) AS c FROM bgs GROUP BY 1, 2),
        |ranked AS (
        |  SELECT doc_id, bg, c,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg ASC) AS rn
        |  FROM counts),
        |nb AS (SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_bigrams
        |       FROM docs WHERE len(ws) >= 2)
        |SELECT r.doc_id, r.bg, r.c, n.n_bigrams,
        |  CAST(r.c AS DOUBLE) / n.n_bigrams AS top_frac,
        |  CAST(r.c AS DOUBLE) / n.n_bigrams >= 0.2 AS repetitive
        |FROM ranked r JOIN nb n USING (doc_id)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin),

    "d107_lexical_diversity" -> (Corpus.docsCte +
      """, words AS (
        |  SELECT doc_id, ws[i] AS w
        |  FROM docs, UNNEST(range(1, len(ws) + 1)) t(i)),
        |wc AS (SELECT doc_id, w, count(1) AS c FROM words GROUP BY 1, 2),
        |div AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(1) AS n_types,
        |    count(CASE WHEN c = 1 THEN 1 END) AS n_hapax,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq
        |  FROM wc GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
        |  CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_frac,
        |  CAST(sumsq AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    / CAST(n_tokens AS DOUBLE) AS simpson,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.35
        |    AS low_diversity
        |FROM div ORDER BY doc_id""".stripMargin),

    "d109_vocab_growth" -> (Corpus.docsCte +
      """, n AS (SELECT count(1) AS n FROM documents),
        |words AS (
        |  SELECT doc_id, ws[i] AS w
        |  FROM docs, UNNEST(range(1, len(ws) + 1)) t(i)),
        |fs AS (SELECT w, min(doc_id) AS first_doc FROM words GROUP BY 1),
        |nt AS (
        |  SELECT least(CAST(3 AS BIGINT), first_doc * 4 // (SELECT n FROM n)) + 1 AS quarter,
        |    count(1) AS new_types
        |  FROM fs GROUP BY 1),
        |tk AS (
        |  SELECT least(CAST(3 AS BIGINT), doc_id * 4 // (SELECT n FROM n)) + 1 AS quarter,
        |    CAST(sum(len(ws)) AS BIGINT) AS n_tokens
        |  FROM docs GROUP BY 1)
        |SELECT quarter,
        |  CAST((SELECT n FROM n) AS BIGINT) * quarter // 4 AS n_docs_prefix,
        |  CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
        |  CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY quarter) AS BIGINT) AS cum_types,
        |  tk.n_tokens,
        |  CAST(sum(tk.n_tokens) OVER (ORDER BY quarter) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY quarter) AS DOUBLE)
        |    / CAST(sum(tk.n_tokens) OVER (ORDER BY quarter) AS DOUBLE) AS prefix_ttr
        |FROM tk LEFT JOIN nt USING (quarter) ORDER BY quarter""".stripMargin),

    "d70_profile" ->
      """WITH a AS (
        |  SELECT count(1) AS n_rows,
        |    count(doc_id) AS nn_doc_id, count(DISTINCT doc_id) AS nd_doc_id,
        |    CAST(sum(length(CAST(doc_id AS VARCHAR))) AS BIGINT) AS len_doc_id,
        |    count(text) AS nn_text, count(DISTINCT text) AS nd_text,
        |    CAST(sum(length(text)) AS BIGINT) AS len_text,
        |    count(lang) AS nn_lang, count(DISTINCT lang) AS nd_lang,
        |    CAST(sum(length(lang)) AS BIGINT) AS len_lang,
        |    count(source) AS nn_source, count(DISTINCT source) AS nd_source,
        |    CAST(sum(length(source)) AS BIGINT) AS len_source,
        |    count(n_chars) AS nn_n_chars, count(DISTINCT n_chars) AS nd_n_chars,
        |    CAST(sum(length(CAST(n_chars AS VARCHAR))) AS BIGINT) AS len_n_chars
        |  FROM documents)
        |SELECT col_name, n_rows, n_nonnull, n_distinct,
        |  CAST(n_rows - n_nonnull AS DOUBLE) / n_rows AS null_frac,
        |  CAST(sum_len AS DOUBLE) / greatest(n_nonnull, 1) AS avg_len
        |FROM (
        |  SELECT 'doc_id' AS col_name, n_rows, nn_doc_id AS n_nonnull, nd_doc_id AS n_distinct, len_doc_id AS sum_len FROM a
        |  UNION ALL SELECT 'text', n_rows, nn_text, nd_text, len_text FROM a
        |  UNION ALL SELECT 'lang', n_rows, nn_lang, nd_lang, len_lang FROM a
        |  UNION ALL SELECT 'source', n_rows, nn_source, nd_source, len_source FROM a
        |  UNION ALL SELECT 'n_chars', n_rows, nn_n_chars, nd_n_chars, len_n_chars FROM a)
        |ORDER BY col_name""".stripMargin,

    "d28_corpus_stats" ->
      """SELECT lang, COUNT(1) AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "d26_kmv_by_source" -> (Corpus.docsCte + {
      val h = Corpus.hash32Sql("w")
      s""", wh AS (
         |  SELECT DISTINCT dd.source, $h AS h
         |  FROM (SELECT doc_id, unnest(ws) AS w FROM docs) t
         |  JOIN documents dd USING (doc_id)),
         |r AS (
         |  SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         |    count(1) OVER (PARTITION BY source) AS nd
         |  FROM wh)
         |SELECT source,
         |  CAST(least(nd, 64) AS BIGINT) AS k_actual,
         |  CAST(max(CASE WHEN rn <= 64 THEN h END) AS BIGINT) AS h_k,
         |  CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
         |       ELSE 63.0 * 4294967296.0 / CAST(max(CASE WHEN rn <= 64 THEN h END) AS DOUBLE) END AS est_distinct
         |FROM r GROUP BY source, nd ORDER BY source""".stripMargin
    }),

    "d21_corpus_select" -> (Corpus.docsCte +
      s""", scored AS (
         |  SELECT doc_id, md5(norm) AS content_hash,
         |    CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
         |      / greatest(len(ws), 1) AS stop_ratio,
         |    MIN(doc_id) OVER (PARTITION BY md5(norm)) AS keeper
         |  FROM docs
         |)
         |SELECT doc_id, content_hash, n_words, stop_ratio
         |FROM scored
         |WHERE doc_id = keeper AND stop_ratio >= 0.05 AND n_words BETWEEN 5 AND 500
         |ORDER BY doc_id""".stripMargin),

    "d11_fingerprint" -> (Corpus.docsCte +
      s""", wins AS (
         |  SELECT doc_id, substr(norm, i, 8) AS w8
         |  FROM docs, UNNEST(range(1, length(norm) - 6, 4)) t(i)
         |  WHERE length(norm) >= 8
         |)
         |SELECT doc_id, min(${Corpus.hash32Sql("w8")}) AS fp_min,
         |  count(DISTINCT w8) AS n_uniq_windows
         |FROM wins GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "d31_url_extract" ->
      s"""WITH $rawsCteSql,
         |urls AS (
         |  SELECT doc_id, unnest(regexp_extract_all(raw, '$urlRe')) AS url FROM raws)
         |SELECT regexp_extract(url, '$urlRe', 1) AS domain,
         |  count(1) AS n_urls,
         |  count(DISTINCT doc_id) AS n_docs,
         |  count(DISTINCT regexp_extract(url, '$urlRe', 2)) AS n_paths
         |FROM urls GROUP BY 1 ORDER BY domain""".stripMargin,

    "d79_dataset_card" -> (Dedup.bandSigsCte +
      s""", $rawsCteSql,
         |dup AS (
         |  SELECT doc_id,
         |    max(CASE WHEN bn > 1 THEN 1 ELSE 0 END) AS is_dup
         |  FROM (SELECT doc_id, count(1) OVER (PARTITION BY band, sig) AS bn FROM sig) t
         |  GROUP BY 1)
         |SELECT d.source, count(1) AS n_docs,
         |  CAST(sum(len(d.ws)) AS BIGINT) AS n_tokens,
         |  count(DISTINCT d.lang) AS n_langs,
         |  CAST(CAST(sum(length(d.text)) AS BIGINT) AS DOUBLE) / count(1) AS mean_chars,
         |  CAST(CAST(sum(CASE WHEN len(regexp_extract_all(r.raw, '$urlRe')) > 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / count(1) AS url_frac,
         |  CAST(CAST(sum(COALESCE(dup.is_dup, 0)) AS BIGINT) AS DOUBLE) / count(1) AS dup_frac
         |FROM docs d
         |JOIN raws r ON r.doc_id = d.doc_id
         |LEFT JOIN dup ON dup.doc_id = d.doc_id
         |GROUP BY 1 ORDER BY d.source""".stripMargin),

    "d83_quality_curve" -> (Dedup.bandSigsCte +
      s""", dup AS (
         |  SELECT doc_id,
         |    max(CASE WHEN bn > 1 THEN 1 ELSE 0 END) AS is_dup
         |  FROM (SELECT doc_id, count(1) OVER (PARTITION BY band, sig) AS bn FROM sig) t
         |  GROUP BY 1),
         |sc AS (
         |  SELECT d.doc_id,
         |    CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
         |      / greatest(len(ws), 1)
         |    - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1)
         |    + CASE WHEN len(ws) BETWEEN 5 AND 200 THEN 0.1 ELSE 0.0 END AS quality,
         |    CAST(len(list_filter(ws, x -> x <> '')) AS BIGINT) AS n_tokens,
         |    COALESCE(dup.is_dup, 0) AS is_dup
         |  FROM docs d LEFT JOIN dup ON d.doc_id = dup.doc_id),
         |th AS (SELECT unnest(CAST([0.05, 0.10, 0.20, 0.30] AS DOUBLE[])) AS t)
         |SELECT th.t, count(1) AS n_docs,
         |  CAST(sum(CASE WHEN sc.quality >= th.t THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
         |  CAST(sum(CASE WHEN sc.quality >= th.t THEN sc.n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
         |  CAST(sum(CASE WHEN sc.quality >= th.t THEN sc.is_dup ELSE 0 END) AS BIGINT) AS dup_kept,
         |  CAST(sum(CASE WHEN sc.quality >= th.t THEN 1 ELSE 0 END) AS DOUBLE) / count(1) AS keep_frac,
         |  CAST(sum(CASE WHEN sc.quality >= th.t THEN sc.is_dup ELSE 0 END) AS DOUBLE)
         |    / greatest(sum(CASE WHEN sc.quality >= th.t THEN 1 ELSE 0 END), 1) AS dup_rate_kept
         |FROM sc CROSS JOIN th
         |GROUP BY th.t ORDER BY th.t""".stripMargin),

    "d77_quality_dup_corr" -> (Dedup.bandSigsCte +
      s""", dup AS (
         |  SELECT doc_id,
         |    max(CASE WHEN bn > 1 THEN 1 ELSE 0 END) AS is_dup
         |  FROM (SELECT doc_id, count(1) OVER (PARTITION BY band, sig) AS bn FROM sig) t
         |  GROUP BY 1),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
         |      / greatest(len(ws), 1)
         |    - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1)
         |    + CASE WHEN len(ws) BETWEEN 5 AND 200 THEN 0.1 ELSE 0.0 END AS quality
         |  FROM docs)
         |SELECT CAST(floor(sc.quality * 20) AS BIGINT) AS qbin,
         |  count(1) AS n_docs,
         |  CAST(sum(COALESCE(dup.is_dup, 0)) AS BIGINT) AS n_dup_docs,
         |  CAST(sum(COALESCE(dup.is_dup, 0)) AS DOUBLE) / count(1) AS dup_rate
         |FROM sc LEFT JOIN dup ON sc.doc_id = dup.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    "d102_quality_calibration" -> (Corpus.docsCte +
      s""", wtab AS (SELECT doc_id, unnest(ws) AS w FROM docs),
         |per AS (
         |  SELECT doc_id, w, count(1) AS c, len(w) AS wl
         |  FROM wtab GROUP BY doc_id, w),
         |agg AS (
         |  SELECT doc_id,
         |    CAST(sum(c) AS BIGINT) AS n_words,
         |    CAST(sum(c * wl) AS BIGINT) AS wchars,
         |    CAST(sum(CASE WHEN wl >= 3 THEN c ELSE 0 END) AS BIGINT) AS n_subst,
         |    CAST(count(CASE WHEN list_contains($enStopSqlList, w) THEN 1 END) AS BIGINT) AS n_stop_kinds,
         |    CAST(max(c) AS BIGINT) AS top_word_n
         |  FROM per GROUP BY doc_id),
         |gk AS (
         |  SELECT doc_id,
         |    ((n_words BETWEEN 50 AND 100000)
         |     AND wchars >= 3 * n_words AND wchars <= 10 * n_words
         |     AND 5 * n_subst >= 4 * n_words
         |     AND n_stop_kinds >= 2
         |     AND 5 * top_word_n <= n_words) AS keep
         |  FROM agg),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(ws, w -> list_contains($enStopSqlList, w))) AS DOUBLE)
         |      / greatest(len(ws), 1)
         |    - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1)
         |    + CASE WHEN len(ws) BETWEEN 5 AND 200 THEN 0.1 ELSE 0.0 END AS quality
         |  FROM docs)
         |SELECT CAST(floor(sc.quality * 20) AS BIGINT) AS qbin,
         |  count(1) AS n_docs,
         |  CAST(sum(CASE WHEN gk.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(sum(CASE WHEN gk.keep THEN 1 ELSE 0 END) AS DOUBLE) / count(1) AS keep_rate
         |FROM sc JOIN gk USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    "d72_domain_reputation" -> (Corpus.docsCte + ", " + rawsCteSql + ",\n" +
      domainRepCteSql +
      """
        |SELECT domain, n_docs, avg_quality, q_rank,
        |  CASE WHEN q_rank * 4 <= nd THEN 'low'
        |       WHEN q_rank * 4 > nd * 3 THEN 'high'
        |       ELSE 'mid' END AS tier
        |FROM ranked ORDER BY domain""".stripMargin),

    "d73_source_overlap" -> (Corpus.docsCte + {
      val h = Corpus.hash32Sql("g.gram")
      s""", sg AS (
         |  SELECT DISTINCT d2.source, $h AS h
         |  FROM grams g JOIN documents d2 USING (doc_id)),
         |r AS (
         |  SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM sg),
         |sk AS (
         |  SELECT source, list(h ORDER BY h) AS hs
         |  FROM r WHERE rn <= 64 GROUP BY source),
         |p AS (
         |  SELECT a.source AS a_source, b.source AS b_source,
         |         a.hs AS a_hs, b.hs AS b_hs
         |  FROM sk a JOIN sk b ON a.source < b.source),
         |m AS (
         |  SELECT *, (list_sort(list_distinct(list_concat(a_hs, b_hs))))[1:64] AS u_hs
         |  FROM p),
         |e AS (
         |  SELECT a_source, b_source,
         |    CASE WHEN len(a_hs) < 64 THEN CAST(len(a_hs) AS DOUBLE)
         |         ELSE 63.0 * 4294967296.0 / CAST(a_hs[64] AS DOUBLE) END AS est_a,
         |    CASE WHEN len(b_hs) < 64 THEN CAST(len(b_hs) AS DOUBLE)
         |         ELSE 63.0 * 4294967296.0 / CAST(b_hs[64] AS DOUBLE) END AS est_b,
         |    CASE WHEN len(u_hs) < 64 THEN CAST(len(u_hs) AS DOUBLE)
         |         ELSE 63.0 * 4294967296.0 / CAST(u_hs[64] AS DOUBLE) END AS est_union
         |  FROM m),
         |f AS (
         |  SELECT *, greatest(0.0, (est_a + est_b) - est_union) AS est_inter FROM e)
         |SELECT a_source, b_source, est_a, est_b, est_union, est_inter,
         |  est_inter / est_union AS jaccard_est
         |FROM f ORDER BY a_source, b_source""".stripMargin
    }),

    "d33_zorder" ->
      s"""WITH zt AS (
         |  SELECT doc_id, source,
         |    least(n_chars * 100, 65535) AS x,
         |    ${Corpus.hash32Sql("source")} % 65536 AS y
         |  FROM documents),
         |zk AS (
         |  SELECT doc_id, source,
         |    CAST(list_sum(list_transform(range(0, 16), j ->
         |      ((x >> j) & 1) * (CAST(1 AS BIGINT) << (2 * j))
         |      + ((y >> j) & 1) * (CAST(1 AS BIGINT) << (2 * j + 1)))) AS BIGINT) AS zkey
         |  FROM zt)
         |SELECT zkey >> 28 AS zrange, count(1) AS n_docs,
         |  min(zkey) AS min_z, max(zkey) AS max_z,
         |  count(DISTINCT source) AS n_sources
         |FROM zk GROUP BY 1 ORDER BY zrange""".stripMargin,

    "d37_lm_novelty" -> (Corpus.docsCte +
      """, bgs AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS bg
        |  FROM docs, UNNEST(range(1, len(ws))) t(i)
        |  WHERE len(ws) >= 2),
        |c2 AS (SELECT bg, count(1) AS c2 FROM bgs GROUP BY 1),
        |c1 AS (SELECT w1, count(1) AS c1 FROM bgs GROUP BY 1)
        |SELECT b.doc_id, count(1) AS n_bigrams,
        |  CAST(sum(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  min(CAST(c2.c2 AS DOUBLE) / c1.c1) AS min_p,
        |  max(CAST(c2.c2 AS DOUBLE) / c1.c1) AS max_p,
        |  CAST(sum(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(1) AS novelty
        |FROM bgs b JOIN c2 ON b.bg = c2.bg JOIN c1 ON b.w1 = c1.w1
        |GROUP BY b.doc_id
        |ORDER BY doc_id""".stripMargin),

    "d60_url_dedup" ->
      """WITH urls AS (
        |  SELECT doc_id, concat(
        |    CASE WHEN doc_id % 4 = 2 THEN 'HTTP://'
        |         WHEN doc_id % 4 = 0 THEN 'http://' ELSE 'https://' END,
        |    CASE WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END,
        |    CASE WHEN doc_id % 4 = 2 THEN 'SITE' ELSE 'site' END,
        |    CAST(doc_id % 5 AS VARCHAR), '.example.com/p',
        |    CAST(doc_id % 23 AS VARCHAR),
        |    CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END,
        |    CASE WHEN doc_id % 4 = 2 THEN '?utm_source=feed' ELSE '' END,
        |    CASE WHEN doc_id % 4 = 3 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id, url,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(url),
        |      '^https?://', ''), '^www\.', ''), '[?#].*$', ''), '/$', '')
        |      AS canonical_url
        |  FROM urls)
        |SELECT doc_id, url, canonical_url,
        |  doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS is_keeper
        |FROM canon ORDER BY doc_id""".stripMargin,

    "d61_cms_heavy" -> (Corpus.docsCte + {
      val cellSql = (i: String) => Corpus.hash32Sql(
        s"concat('cms', CAST($i AS VARCHAR), '#', w)") + " % 1024"
      s""", toks AS (
        |  SELECT w FROM (SELECT unnest(ws) AS w FROM docs) u WHERE w <> ''),
        |sketch AS (
        |  SELECT i, ${cellSql("i")} AS cell, count(1) AS c
        |  FROM toks, UNNEST(range(0, 4)) t(i) GROUP BY 1, 2),
        |exact AS (
        |  SELECT w, count(1) AS n_exact FROM toks GROUP BY w
        |  ORDER BY n_exact DESC, w ASC LIMIT 20),
        |probes AS (
        |  SELECT e.w, e.n_exact, t.i, ${cellSql("t.i")} AS cell
        |  FROM exact e, UNNEST(range(0, 4)) t(i))
        |SELECT p.w, p.n_exact, min(s.c) AS n_cms,
        |  min(s.c) - p.n_exact AS inflation
        |FROM probes p JOIN sketch s ON p.i = s.i AND p.cell = s.cell
        |GROUP BY p.w, p.n_exact
        |ORDER BY n_exact DESC, w ASC""".stripMargin
    }),

    "d64_bpe_pairs" -> (Corpus.docsCte +
      """, words AS (
        |  SELECT w, count(1) AS n
        |  FROM (SELECT unnest(ws) AS w FROM docs) u WHERE w <> ''
        |  GROUP BY w HAVING length(w) >= 2),
        |pairs AS (
        |  SELECT w, n, substr(w, CAST(i AS INT), 2) AS p
        |  FROM words, UNNEST(range(1, length(w))) t(i)),
        |naive AS (
        |  SELECT p, CAST(sum(n) AS BIGINT) AS pair_count FROM pairs GROUP BY p),
        |merged AS (
        |  SELECT p,
        |    CAST(sum(n * ((length(w) - length(replace(w, p, ''))) // 2)) AS BIGINT)
        |      AS merge_count,
        |    count(1) AS n_words
        |  FROM (SELECT DISTINCT w, n, p FROM pairs) nv GROUP BY p)
        |SELECT nv.p, nv.pair_count, m.merge_count, m.n_words
        |FROM naive nv JOIN merged m ON nv.p = m.p
        |ORDER BY nv.pair_count DESC, nv.p ASC LIMIT 10""".stripMargin)
  )
}
