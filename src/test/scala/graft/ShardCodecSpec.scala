package graft

import java.nio.file.Files

import graft.ingest.{TfRecords, Warc}
import org.apache.spark.sql.functions._

/** zstd shard compression across the custom sinks: TFRecord whole-file
  * streams and WARC frame-per-record shards round-trip byte-exactly,
  * corrupt zstd quarantines like corrupt gzip, unknown codecs fail
  * loudly, and compression actually compresses.
  */
class ShardCodecSpec extends SparkTestBase {

  test("TFRecord zstd: whole-file .tfrecord.zst round trips typed Examples; corrupt zstd quarantines") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
        (i.toLong, s"doc $i 機械学習 ü payload " + ("pad " * (i % 9))))
      .toDF("id", "t")
    val dir = Files.createTempDirectory("tfr_zst").toString
    val manifest = TfRecords.writeExamples(docs, dir, shards = 2, codec = "zstd")
    assert(manifest.count() === 2)
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === Set("part-00000.tfrecord.zst", "part-00001.tfrecord.zst"))

    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val back = TfRecords.readExamples(spark, dir, schema).localCheckpoint(true)
    assert(back.where(!col("ok")).isEmpty)
    assert(back.select("id", "t").as[(Long, String)].collect().toMap ===
      docs.as[(Long, String)].collect().toMap)

    // zstd compresses the padded corpus vs raw shards
    val rawDir = Files.createTempDirectory("tfr_raw").toString
    TfRecords.writeExamples(docs, rawDir, shards = 2, codec = "none")
    def bytes(d: String) = new java.io.File(d).listFiles().map(_.length()).sum
    assert(bytes(dir) < bytes(rawDir), "zstd must compress")

    // flip a byte mid-stream: exactly one ok=false row for that shard
    val f = new java.io.File(dir).listFiles().head
    val raw = Files.readAllBytes(f.toPath)
    raw(raw.length / 2) = (raw(raw.length / 2) ^ 0x55).toByte
    Files.write(f.toPath, raw)
    val after = TfRecords.read(spark, dir).localCheckpoint(true)
    assert(after.where(!col("ok")).count() === 1L)
  }

  test("WARC zstd: frame-per-record .warc.zst round trips byte-exactly; unknown codec throws") {
    import spark.implicits._
    val docs = (0 until 50).map(i =>
        (s"https://ex.test/$i", s"doc-$i データ é " + ("y" * (i % 23))))
      .toDF("uri", "text")
    val dir = Files.createTempDirectory("warc_zst").toString
    val manifest = Warc.write(docs, col("uri"), col("text"), dir,
      shards = 2, codec = "zstd")
    assert(manifest.agg(sum("n_records")).head().getLong(0) === 50L)
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === Set("part-00000.warc.zst", "part-00001.warc.zst"))
    val back = Warc.read(spark, dir).localCheckpoint(true)
    assert(back.where(!col("ok")).isEmpty)
    val got = back.select(col("target_uri"), col("payload").cast("string"))
      .as[(String, String)].collect().toMap
    assert(got === docs.as[(String, String)].collect().toMap)

    val ex = intercept[IllegalArgumentException] {
      Warc.write(docs, col("uri"), col("text"),
        Files.createTempDirectory("warc_bad").toString, shards = 1,
        codec = "brotli")
    }
    assert(ex.getMessage.contains("unsupported codec"))
  }
}
