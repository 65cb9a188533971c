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

  /** (lang, word) stopword lexicon — broadcast-joined against the
    * exploded word stream for language scoring. */
  private val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "and", "en" -> "of", "en" -> "to",
    "en" -> "in", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "fr" -> "le", "fr" -> "et", "fr" -> "les", "fr" -> "des", "fr" -> "un")

  private val stopwordsValuesSql: String =
    stopwords.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  private val enStop = Seq("the", "a", "and", "of", "to", "in", "is")
  private val enStopSqlList = enStop.map(w => s"'$w'").mkString("[", ", ", "]")

  private val tokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Language ID: stopword-lexicon scoring, argmax lang per doc
    // ('und' when nothing matches).
    "d08_langid" -> { (s, dir) =>
      import s.implicits._
      val lex = stopwords.toDF("slang", "w")
      val wordsAll = Corpus.docs(s, dir)
        .select(col("doc_id"), explode(col("ws")).as("w"))
      val scores = wordsAll.join(broadcast(lex), Seq("w"))
        .groupBy("doc_id", "slang")
        .agg(count(lit(1)).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("slang").asc)
      val best = scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "slang", "score")
      Corpus.docs(s, dir).select("doc_id")
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("slang"), lit("und")).as("pred_lang"),
          coalesce(col("score"), lit(0L)).as("score"))
        .orderBy("doc_id")
    },

    // Quality scoring from integer-count ratios.
    "d09_quality" -> { (s, dir) =>
      val enArr = array(enStop.map(lit): _*)
      Corpus.docs(s, dir)
        .withColumn("n_chars_raw", length(col("text")).cast("long"))
        .withColumn("n_words", size(col("ws")).cast("long"))
        .withColumn("n_digits", length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
        .withColumn("n_punct", length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("long"))
        .withColumn("n_stop", size(filter(col("ws"), w => array_contains(enArr, w))).cast("long"))
        .withColumn("stop_ratio",
          col("n_stop").cast("double") / greatest(col("n_words"), lit(1L)))
        .withColumn("punct_ratio",
          col("n_punct").cast("double") / greatest(col("n_chars_raw"), lit(1L)))
        .withColumn("quality",
          col("stop_ratio") - col("punct_ratio")
            + when(col("n_words").between(5, 200), 0.1).otherwise(0.0))
        .select("doc_id", "n_chars_raw", "n_words", "n_digits", "n_punct",
          "n_stop", "stop_ratio", "punct_ratio", "quality")
        .orderBy("doc_id")
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

    // Document fingerprint: min rolling hash over stride-4 8-char
    // windows of the normalized text (winnowing-style min-sampling;
    // the stride cuts hash work 4× with the same min-sketch shape).
    "d11_fingerprint" -> { (s, dir) =>
      Corpus.docs(s, dir)
        .filter(length(col("norm")) >= 8)
        .select(col("doc_id"), col("norm"),
          explode(expr("sequence(1, length(norm) - 7, 4)")).as("i"))
        .withColumn("w8", expr("substr(norm, i, 8)"))
        .groupBy("doc_id")
        .agg(
          min(hash32(col("w8"))).as("fp_min"),
          countDistinct(col("w8")).as("n_uniq_windows"))
        .orderBy("doc_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "d08_langid" -> (Corpus.docsCte +
      s""", lex(slang, w) AS (SELECT * FROM (VALUES $stopwordsValuesSql) v),
         |wa AS (SELECT doc_id, unnest(ws) AS w FROM docs),
         |sc AS (SELECT doc_id, slang, count(1) AS score
         |       FROM wa JOIN lex USING (w) GROUP BY doc_id, slang),
         |best AS (SELECT doc_id, slang, score,
         |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, slang ASC) AS rn
         |         FROM sc)
         |SELECT d.doc_id,
         |  COALESCE(b.slang, 'und') AS pred_lang,
         |  COALESCE(b.score, 0) AS score
         |FROM docs d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
         |ORDER BY doc_id""".stripMargin),

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

    "d11_fingerprint" -> (Corpus.docsCte +
      s""", wins AS (
         |  SELECT doc_id, substr(norm, i, 8) AS w8
         |  FROM docs, UNNEST(range(1, length(norm) - 6, 4)) t(i)
         |  WHERE length(norm) >= 8
         |)
         |SELECT doc_id, min(${Corpus.hash32Sql("w8")}) AS fp_min,
         |  count(DISTINCT w8) AS n_uniq_windows
         |FROM wins GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )
}
