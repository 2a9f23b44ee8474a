package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, token counting, document fingerprinting, language ID.
  * All pure narrow transformations (no shuffle) built from codegen'd
  * built-ins — at 100 TB these run at scan speed inside one
  * WholeStageCodegen span; only downstream aggregates shuffle.
  */
object TextAnalysis {

  /** Punctuation class used by quality metrics (kept explicit so the DuckDB
    * oracle can state the identical class).
    */
  val PunctClass = """[.,;:!?'"()\-]"""

  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish surface tokenization: letter runs, digit runs, single
    * non-alphanumeric marks — the standard pre-tokenizer shape.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Stopword list for quality scoring (top English function words). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with", "as", "by")

  /** Length / punctuation / stopword quality metrics per document. */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = wsTokens(t)
    val sw = array(Stopwords.map(lit): _*)
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_punct",
        (length(t) - length(regexp_replace(t, PunctClass, ""))).cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, x => array_contains(sw, lower(x)))).cast("long"))
      .withColumn("punct_ratio", round(col("n_punct") / col("n_chars"), 6))
      .withColumn("stopword_ratio", round(col("n_stopwords") / col("n_tokens"), 6))
      .withColumn("avg_token_len",
        round(aggregate(transform(toks, x => length(x)), lit(0), (a, x) => a + x)
          / col("n_tokens"), 6))
  }

  /** Canonical document fingerprint: md5 over lowercased,
    * whitespace-collapsed text — the exact-dedup key that survives
    * formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Per-document top-k TF-IDF terms (lowercased whitespace tokens,
    * smoothed idf = ln((N+1)/(df+1)) + 1). Two shuffles: term-frequency
    * groupBy and the per-doc top-k window; only the 1-row corpus size
    * broadcasts. The document-frequency table gets NO broadcast hint: its
    * cardinality is the vocabulary, which at corpus scale is unbounded
    * (hundreds of millions of terms at 100 TB) — AQE may still broadcast
    * it at runtime when it measures small, but a forced hint would OOM the
    * driver at scale. Ranking ties (identical (tf, df) pairs produce
    * bit-identical scores) break on the term string — deterministic, and
    * exactly reproducible in SQL.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      explode(wsTokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfc, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc"), col("rn"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))
  }

  /** Stopword-profile language ID. Scores each candidate language by the
    * fraction of tokens found in its function-word profile; argmax wins,
    * alphabetical tie-break, 'und' (undetermined) when no profile scores.
    * A profile heuristic, not a model — by design cheap enough to run at
    * scan speed over 100 TB.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "des", "du", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que", "por", "para"),
    "it" -> Seq("il", "la", "gli", "e", "è", "un", "una", "di", "che", "per", "non", "sono"))

  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val profile = array(words.map(lit): _*)
      struct((size(filter(toks, t => array_contains(profile, t))) / size(toks)).as("score"),
        lit(lang).as("lang"))
    }
    // array_max over (score, lang) structs: highest score wins; ties fall
    // back to the lang field (last alphabetically) — deterministic.
    val best = array_max(array(scored: _*))
    df.withColumn("lang_pred",
        when(best("score") > 0, best("lang")).otherwise(lit("und")))
      .withColumn("lang_score", round(best("score"), 6))
  }
}
