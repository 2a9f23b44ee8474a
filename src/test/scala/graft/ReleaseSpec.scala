package graft

import graft.llmops.{PortableHash, Release}
import org.apache.spark.sql.functions._

/** The release composer end to end on a planted corpus: directory layout,
  * every curation stage visibly firing, split disjointness/completeness,
  * and the manifest checksum RE-VERIFIED from the shipped shards (the
  * replica-verification story, actually performed).
  */
class ReleaseSpec extends SparkTestBase {

  test("release: curate -> split -> Example shards -> ledger/card/manifest, shards verify the manifest") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def text(i: Int) =
      (0 until 8).map(k => words((i * 3 + k * 7 + k * k) % words.length) + (i + k * 13))
        .mkString(" ")
    val normal = (0 until 80).map(i => (i.toLong, text(i), s"s${i % 4}"))
    val blocked = Seq((900L, text(17), "badsrc"))
    val dup = Seq((901L, text(5), "s1")) // exact twin of doc 5
    val benchText = "orange purple silver golden copper bronze iron steel nickel zinc"
    val contaminated = Seq((902L, "prefix words here " + benchText, "s2"))
    val docs = (normal ++ blocked ++ dup ++ contaminated).toDF("doc_id", "text", "source")
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val blockedSources = Seq("badsrc").toDF("src")

    val dir = java.nio.file.Files.createTempDirectory("graft_release").toString
    val manifest = Release.release(docs, "doc_id", "text", "source",
      bench, blockedSources, dir, quota = 1000, shards = 2,
      splits = Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))

    // ledger: every planted pathology fired its stage
    val ledger = spark.read.parquet(s"$dir/_ledger")
    def stageOf(id: Long) =
      ledger.filter(col("doc") === id).head().getAs[String]("stage")
    assert(stageOf(900L) === "blocked_source")
    assert(stageOf(901L) === "exact_dup")
    assert(stageOf(902L) === "contaminated")
    val keptIds = ledger.filter(col("kept")).select("doc")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds.size === 80 + 1 - 1, "one of the exact twins survives") // 5 or 901
    assert(!keptIds.contains(900L) && !keptIds.contains(902L))

    // manifest totals == kept docs, split over the three dirs
    val m = manifest.collect().map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(m.values.sum === keptIds.size.toLong)

    // read every split's shards back: gzip Example records, typed
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType), StructField("src", StringType)))
    val perSplit = m.keys.map { s =>
      val f = graft.ingest.TfRecords.readExamples(spark, s"$dir/$s", schema)
        .localCheckpoint(true)
      assert(f.where(!col("ok")).isEmpty)
      s -> f
    }.toMap
    val idsBySplit = perSplit.map { case (s, f) =>
      s -> f.select("id").collect().map(_.getLong(0)).toSet
    }
    // disjoint and complete
    assert(idsBySplit.values.map(_.size).sum === keptIds.size)
    assert(idsBySplit.values.reduce(_ ++ _) === keptIds)
    // per-split counts match the manifest
    idsBySplit.foreach { case (s, ids) => assert(ids.size.toLong === m(s), s) }

    // the replica check: the manifest's order-invariant checksum
    // recomputed from the SHIPPED shard contents must match exactly
    perSplit.foreach { case (s, f) =>
      val xor = f.select(PortableHash.hash52(
          concat(col("id").cast("string"), lit(":"), col("t"))).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      val recorded = manifest.filter(col("split") === s)
        .head().getAs[Long]("content_xor")
      assert(xor === recorded, s"checksum mismatch for split $s")
    }

    // card sidecar readable, one row per source of the released corpus
    val card = spark.read.parquet(s"$dir/_card")
    assert(card.select("source").collect().map(_.getString(0)).toSet ===
      Set("s0", "s1", "s2", "s3"))
  }
}
