package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: posting-list inverted index + tf-scored
  * top-k retrieval — the index/lookup half of a RAG pipeline (the vector
  * half is [[Similarity]]/[[Quantize]]; [[Corpus.tokenChunks]] is the
  * chunking that usually precedes both).
  *
  * Everything is integer arithmetic over whitespace tokens (lowercased),
  * so the whole surface carries exact DuckDB oracles — scoring is raw
  * term-frequency sums, deliberately not a log-weighted BM25: the ranking
  * is deterministic, engine-portable, and still the standard conjunctive
  * candidate shape (BM25's idf/length terms are a re-rank away and change
  * nothing structural about the plan).
  */
object Retrieval {

  /** One row per (doc, term): term frequency. The shared scan both the
    * index build and retrieval start from.
    */
  def termFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))

  /** Inverted index: one row per term with document frequency, corpus
    * term frequency, and the doc-ordered posting list serialized as
    * `"doc:tf,doc:tf,..."` — a flat string rather than a nested array so
    * the frame stays engine-portable (and hash-comparable) end to end.
    *
    * `maxDf` drops terms occurring in more than `maxDf` documents. Stop
    * terms are the scale hazard of an inverted index: their posting list
    * is O(corpus) — one skewed groupBy key AND a useless candidate
    * generator (a term every document matches selects nothing). Capping
    * df bounds every posting row; the dropped terms are exactly the ones
    * [[searchTopK]] would waste its probe on. Plan shape: one shuffle for
    * termFreqs, one for the per-term aggregation.
    *
    * The postings string sorts by the struct (doc, tf) — numeric doc
    * order, not lexicographic. The transform lambda runs interpreted but
    * only on post-aggregation arrays already bounded by `maxDf`.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long = Long.MaxValue): DataFrame =
    termFreqs(df, idCol, textCol)
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        concat_ws(",", transform(
          sort_array(collect_list(struct(col("doc"), col("tf")))),
          e => concat(e("doc").cast("string"), lit(":"), e("tf").cast("string"))))
          .as("postings"))
      .filter(col("df") <= maxDf)

  /** Top-k keyword retrieval: score(q, d) = Σ over q's distinct terms of
    * tf(term, d), keep docs matching at least `minMatch` distinct query
    * terms, rank per query by (score DESC, doc ASC) — fully deterministic.
    *
    * Scale: the query set is the small side by definition — its distinct
    * (qid, term) table broadcasts, so candidate generation is one
    * broadcast-join pass over the term-frequency table (the inverted
    * probe: only docs sharing a term with the query are ever touched) and
    * the per-query top-k is a window PARTITIONED by qid. The corpus never
    * shuffles except the termFreqs groupBy; add a df cap upstream (filter
    * against [[invertedIndex]] terms) if stop-term queries are possible.
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 5, minMatch: Int = 1): DataFrame = {
    require(k >= 1 && minMatch >= 1)
    val tf = termFreqs(docs, idCol, textCol)
    val qterms = queries.select(col(qidCol).as("qid"),
        explode(TextAnalysis.wsTokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    val scored = tf.join(broadcast(qterms), Seq("term"))
      .groupBy("qid", "doc")
      .agg(sum("tf").as("score"), count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc"), col("score"), col("n_matched"))
  }
}
