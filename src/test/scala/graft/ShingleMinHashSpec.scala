package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.ShingleMinHash
import graft.llmops.PortableHash

/** The compiled shingle/minhash kernel must be value-exact against the
  * SQL expressions it replaced: hash52 (conv(substr(md5, 1, 13), 16, 10)),
  * xxhash64, the distinct-set semantics, and the per-table signature
  * minima — the DuckDB oracles replay all of them bit for bit.
  */
class ShingleMinHashSpec extends SparkTestBase {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog", // duplicate doc
    "a b a b a b a b",                              // repeating shingles
    "  leading and   trailing   whitespace  ",
    "ümlaut ünïcode tøkens mixed ascii here",
    "one two",                                      // fewer than n tokens
    "",                                             // empty text
    "solo").zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def df = {
    import spark.implicits._
    texts.toDF("doc", "text")
  }

  private def kernel(n: Int, k: Int, md5_52: Boolean) =
    df.select(col("doc"), ShingleMinHash.of(
      split(trim(col("text")), "\\s+"), n, k, md5_52).as("sh"))

  private def oldRows(n: Int, hashFn: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column) = {
    // the pre-r16 window shape, verbatim
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col("doc"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
    val wTok = Window.partitionBy("doc").orderBy("pos")
    val leads = (1 until n).map(kk => lead(col("tok"), kk).over(wTok))
    val withLeads = toks.select(col("doc") +: col("tok") +: leads.zipWithIndex
      .map { case (c, i) => c.as(s"_t$i") }: _*)
    withLeads
      .filter(col(s"_t${n - 2}").isNotNull)
      .select(col("doc"), hashFn(concat_ws(" ",
        col("tok") +: (0 until n - 1).map(i => col(s"_t$i")): _*)).as("s"))
      .dropDuplicates("doc", "s")
  }

  private def asSets(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  test("md5-52 hashes equal the conv(substr(md5)) expression, set-exact") {
    for (n <- Seq(2, 3, 5)) {
      val got = asSets(kernel(n, 0, md5_52 = true)
        .select(col("doc"), explode(col("sh")("hashes")).as("s")).collect())
      val want = asSets(oldRows(n, PortableHash.hash52).collect())
      assert(got === want, s"n=$n")
    }
  }

  test("xxhash64 hashes equal the built-in expression, set-exact") {
    for (n <- Seq(3, 5)) {
      val got = asSets(kernel(n, 0, md5_52 = false)
        .select(col("doc"), explode(col("sh")("hashes")).as("s")).collect())
      val want = asSets(oldRows(n, xxhash64(_)).collect())
      assert(got === want, s"n=$n")
    }
  }

  test("signature minima equal groupBy(min(perm)) over the old rows") {
    val k = 5
    val got = kernel(3, k, md5_52 = true)
      .select(col("doc"), posexplode(col("sh")("sigs")).as(Seq("band", "sig")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val aggs = (0 until k).map(i =>
      min(PortableHash.minhashPerm(col("s"), i)).as(s"_m$i"))
    val want = oldRows(3, PortableHash.hash52)
      .groupBy("doc").agg(aggs.head, aggs.tail: _*)
      .select(col("doc"),
        posexplode(array((0 until k).map(i => col(s"_m$i")): _*))
          .as(Seq("band", "sig")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("short/empty docs yield empty arrays (no rows after explode)") {
    val got = kernel(3, 5, md5_52 = true)
      .select(col("doc"), size(col("sh")("hashes")).as("nh"),
        size(col("sh")("sigs")).as("ns"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(5L) === ((0, 0))) // "one two" < 3 tokens
    assert(got(6L) === ((0, 0))) // empty text
    assert(got(7L) === ((0, 0))) // single token
  }
}
