package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import graft.llmops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (SURVEY §2.11 north-star extensions)
  * over the `documents` / `embeddings` tables. SQL-expressible operators
  * carry a DuckDB oracle; the LSH/approximate paths are rows-only here and
  * recall-tested against exact ground truth in DedupSpec/SimilaritySpec.
  */
object LlmOpsQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))
  private def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, None)

  private val stopwordSqlList =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  val queries: Seq[OracleQuery] = Seq(
    // exact dedup on raw content hash
    q("q_x_dedup_exact",
      "SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY 1 ORDER BY 1") { (s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text").orderBy("content_hash")
    },

    // quality metrics — every count exact-integer, ratios rounded to 6dp
    q("q_x_text_quality",
      "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\-]', '', 'g')) AS BIGINT) AS n_punct, " +
        s"CAST(len(list_filter(toks, x -> list_contains($stopwordSqlList, lower(x)))) AS BIGINT) AS n_stopwords, " +
        "round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\-]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio, " +
        s"round(CAST(len(list_filter(toks, x -> list_contains($stopwordSqlList, lower(x)))) AS DOUBLE) / len(toks), 6) AS stopword_ratio, " +
        "round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS avg_token_len " +
        "FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents) ORDER BY doc_id") { (s, d) =>
      TextAnalysis.withQuality(Tables.documents(s, d))
        .select("doc_id", "n_chars", "n_tokens", "n_punct", "n_stopwords",
          "punct_ratio", "stopword_ratio", "avg_token_len")
        .orderBy("doc_id")
    },

    // BPE-ish token histogram
    q("q_x_text_tokens",
      "SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS tok FROM documents) GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.documents(s, d)
        .select(explode(TextAnalysis.bpeishTokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy("tok")
    },

    // normalized fingerprint dedup
    q("q_x_text_fingerprint",
      "SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.documents(s, d)
        .select(TextAnalysis.fingerprint(col("text")).as("fp"), col("doc_id"))
        .groupBy("fp").agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
        .orderBy("fp")
    },

    // multimodal: binary payload metadata (bytes stand in for media blobs)
    q("q_x_multimodal_meta",
      "SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, sha256(text) AS sha256 FROM documents ORDER BY media_id") { (s, d) =>
      Multimodal.withMetadata(Multimodal.payloadFrom(Tables.documents(s, d), "doc_id", "text"))
        .select("media_id", "byte_len", "sha256")
        .orderBy("media_id")
    },

    // exact n-gram Jaccard near-dup pairs (threshold catches the planted dups)
    q("q_x_dedup_ngram_jaccard",
      "WITH sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents) WHERE len(t) >= 3), ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh), pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), sizes AS (SELECT doc_id, len(shingles) AS n FROM sh) SELECT id_a, id_b, round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8 ORDER BY 1, 2") { (s, d) =>
      // the oracle states the quadratic definition; the engine runs the
      // prefix-filtered exact algorithm — results must be identical.
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")
    },

    // brute-force cosine top-k (queries = vec_id < 5, k = 5)
    q("q_x_embed_cosine_topk",
      "WITH q AS (SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS qv FROM embeddings WHERE vec_id < 5), c AS (SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS cv FROM embeddings), dots AS (SELECT qid, cid, sum(qv * cv) AS dot, sqrt(sum(qv * qv)) AS qn, sqrt(sum(cv * cv)) AS cn FROM q JOIN c USING (i) GROUP BY qid, cid), sims AS (SELECT qid, cid, dot / (qn * cn) AS cos, row_number() OVER (PARTITION BY qid ORDER BY dot / (qn * cn) DESC, cid) AS rn FROM dots WHERE qid <> cid) SELECT qid, cid, CAST(rn AS BIGINT) AS rn, round(cos, 6) AS cos FROM sims WHERE rn <= 5 ORDER BY qid, rn") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .orderBy("qid", "rn")
    },

    // embedding-cosine near-dup pairs (exact baseline, LSH path rows-only)
    q("q_x_dedup_embed_cosine",
      "WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot, sqrt(sum(a.v * a.v)) AS na, sqrt(sum(b.v * b.v)) AS nb FROM e a JOIN e b USING (i) WHERE a.vec_id < b.vec_id GROUP BY 1, 2) SELECT id_a, id_b, round(dot / (na * nb), 6) AS cos FROM dots WHERE dot / (na * nb) >= 0.4 ORDER BY 1, 2") { (s, d) =>
      Similarity.cosinePairs(Tables.embeddings(s, d), threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // approximate paths — deterministic but not SQL-expressible → rows-only;
    // recall vs the exact paths is asserted in DedupSpec / SimilaritySpec.
    rowsOnly("q_x_dedup_minhash") { (s, d) =>
      Dedup.minHashPairs(Tables.documents(s, d), "doc_id", "text")
        .orderBy("id_a", "id_b")
    },
    rowsOnly("q_x_dedup_simhash") { (s, d) =>
      Dedup.simHashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 10)
        .orderBy("id_a", "id_b")
    },
    rowsOnly("q_x_ann_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .orderBy("qid", "rn")
    },
    rowsOnly("q_x_text_langid") { (s, d) =>
      TextAnalysis.withLangId(Tables.documents(s, d))
        .select("doc_id", "lang_pred", "lang_score")
        .orderBy("doc_id")
    },
    rowsOnly("q_x_multimodal_features") { (s, d) =>
      Multimodal.extractFeatures(
        Multimodal.payloadFrom(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("byte_len"),
          round(element_at(col("features"), 1), 4).as("f0"))
        .orderBy("media_id")
    }
  )
}
