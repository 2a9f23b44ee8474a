package graft.llmops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, NGram, RegexTokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact → fuzzy:
  *
  *  - exact: hash-groupBy on a content fingerprint (one shuffle).
  *  - n-gram Jaccard: exact set similarity over word shingles via an
  *    inverted-index self-join — the verifier for the approximate paths.
  *  - MinHash LSH: Spark ML MinHashLSH (seeded, deterministic) for
  *    sub-quadratic candidate generation at scale.
  *  - SimHash: 64-bit signature + banded Hamming candidates, all
  *    codegen'd built-ins (no UDF).
  *
  * Scale notes: the quadratic risk in near-dup detection is always the
  * candidate join. Both fuzzy paths bound it — LSH by banding, the
  * inverted index by dropping ubiquitous shingles (`maxShingleDf`), which
  * is also what kills the skewed-key hot partitions at 100 TB.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per distinct content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per document. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact n-gram Jaccard near-dup pairs (ids ordered a < b).
    * Candidates from the inverted shingle index; shingles appearing in more
    * than `maxShingleDf` docs are dropped from candidate generation (they
    * only create quadratic noise) but still counted in the union sizes, so
    * reported Jaccard stays exact for pairs sharing at least one rare
    * shingle.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxShingleDf: Int = 1000): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("doc"), size(col("sh")).as("n_sh"))
    val ex = sh.select(col("doc"), explode(col("sh")).as("s"))
      .withColumn("s", xxhash64(col("s"))) // hash early: narrow shuffle rows
    val rare = ex.groupBy("s").count().filter(col("count") <= maxShingleDf).select("s")
    val exRare = ex.join(rare, Seq("s"), "left_semi")
    val pairs = exRare.alias("x")
      .join(exRare.alias("y"), col("x.s") === col("y.s") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash-LSH near-dup candidate pairs via Spark ML (seeded →
    * deterministic). Returns (id_a < id_b, jaccard_dist).
    */
  def minHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxJaccardDist: Double = 0.3, numHashTables: Int = 5, n: Int = 3): DataFrame = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__toks")
      .setPattern("\\s+")
    val ngram = new NGram().setN(n).setInputCol("__toks").setOutputCol("__ngrams")
    val tf = new HashingTF().setInputCol("__ngrams").setOutputCol("__features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(ngram.transform(tok.transform(df)))
      .filter(size(col("__ngrams")) > 0)
    val lsh = new MinHashLSH().setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, maxJaccardDist, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("id_a"), col(s"datasetB.$idCol").as("id_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** 64-bit SimHash signature per document from whitespace-token hashes —
    * built entirely from codegen'd expressions: explode tokens, per-bit
    * ±1 majority vote, reassemble the sign bits.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums: Seq[org.apache.spark.sql.Column] = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i")
    }
    val voted = toks.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    voted.select(col("doc"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * blocks (any exact block match → candidate — guarantees recall of all
    * pairs with Hamming distance ≤ 3), then filter by true Hamming
    * distance.
    */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = simHash(df, idCol, textCol)
    val banded = sigs.select(col("doc"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bkey"))): _*))
        .as("bb"))
      .select(col("doc"), col("simhash"), col("bb.band"), col("bb.bkey"))
    val cands = banded.alias("x")
      .join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .dropDuplicates("id_a", "id_b")
    cands
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
