package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.ingest.TfRecords
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.{Crc32C, TfRecordFrame}

/** TFRecord export: CRC32C check value, mask, frame layout, the SQL
  * surface, and the distributed shard writer/reader round trip (with a
  * corrupt-shard quarantine case). The masked-crc arithmetic is
  * additionally oracled cross-engine in q_x_tfrecord_frame.
  */
class TfRecordsSpec extends SparkTestBase {

  test("crc32c matches the canonical check value") {
    // The CRC-32C (Castagnoli) check value: crc32c("123456789") = 0xE3069283.
    assert(Crc32C.of("123456789".getBytes("UTF-8")) === 0xE3069283L)
    assert(Crc32C.of(Array.emptyByteArray) === 0L)
  }

  test("tfrecord mask matches the published formula") {
    // mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8 (mod 2^32)
    val c = 0xE3069283L
    val expected = (((c >>> 15) | ((c << 17) & 0xFFFFFFFFL)) + 0xa282ead8L) & 0xFFFFFFFFL
    assert(TfRecordFrame.masked(c) === expected)
    assert(TfRecordFrame.masked(0L) === 0xa282ead8L)
  }

  test("frame layout is byte-exact: LE length, masked len crc, payload, masked payload crc") {
    val payload = "hello tfrecord".getBytes("UTF-8")
    val frame = TfRecordFrame.frame(payload)
    assert(frame.length === 16 + payload.length)
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getLong(0) === payload.length.toLong)
    val lenBytes = java.util.Arrays.copyOfRange(frame, 0, 8)
    assert((bb.getInt(8) & 0xFFFFFFFFL) === TfRecordFrame.masked(Crc32C.of(lenBytes)))
    assert(java.util.Arrays.copyOfRange(frame, 12, 12 + payload.length)
      .sameElements(payload))
    assert((bb.getInt(12 + payload.length) & 0xFFFFFFFFL) ===
      TfRecordFrame.masked(Crc32C.of(payload)))
  }

  test("SQL surface: graft_crc32c and graft_tfrecord_frame registered; codegen path agrees with interpreted") {
    val row = spark.sql(
      "SELECT graft_crc32c(encode('123456789', 'UTF-8')) AS c, " +
        "length(graft_tfrecord_frame(encode('abc', 'UTF-8'))) AS l").head()
    assert(row.getLong(0) === 0xE3069283L)
    assert(row.getInt(1) === 19)
    // non-literal path (codegen over rows, no constant folding)
    import spark.implicits._
    val vals = Seq("123456789", "", "graft").toDF("s")
      .select(Crc32C.crc32c(encode(col("s"), "UTF-8")).as("c"))
      .collect().map(_.getLong(0))
    assert(vals(0) === 0xE3069283L)
    assert(vals(1) === 0L)
    assert(vals(2) === Crc32C.of("graft".getBytes("UTF-8")))
  }

  test("shard writer round trip: every payload survives, manifest counts agree, crc verified on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tfrec").toString
    val docs = (0 until 257).map(i => (i.toLong, s"doc-$i-" + ("x" * (i % 53))))
      .toDF("id", "text")
    val manifest = TfRecords.write(docs, col("text"), dir, shards = 4)
    val m = manifest.collect()
    assert(m.length === 4)
    assert(m.map(_.getAs[Long]("n_records")).sum === 257L)
    // release-artifact hygiene: shard files only, no Hadoop .crc sidecars
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === (0 until 4).map(i => f"part-$i%05d.tfrecord").toSet)
    val back = TfRecords.read(spark, dir)
    assert(back.where(!col("ok")).isEmpty)
    val payloads = back.select(col("payload").cast("string")).as[String]
      .collect().toSet
    val expected = docs.select("text").as[String].collect().toSet
    assert(payloads === expected)
  }

  test("corrupt shard degrades to a quarantine row, never kills the read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tfrec-bad").toString
    val docs = (0 until 10).map(i => (i.toLong, s"payload-$i")).toDF("id", "text")
    TfRecords.write(docs, col("text"), dir, shards = 1)
    // flip one payload byte mid-file: that frame's crc check must fail
    val f = Paths.get(dir, "part-00000.tfrecord")
    val bytes = Files.readAllBytes(f)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x1).toByte
    Files.write(f, bytes)
    val back = TfRecords.read(spark, dir).collect()
    val bad = back.filter(!_.getAs[Boolean]("ok"))
    assert(bad.length === 1)
    assert(bad.head.getAs[Array[Byte]]("payload") === null)
    // frames before the corruption still parse
    assert(back.count(_.getAs[Boolean]("ok")) === bad.head.getAs[Long]("rec_idx"))
  }

  test("parseFrames handles torn tail and empty input") {
    assert(TfRecords.parseFrames(Array.emptyByteArray).toSeq === Seq.empty)
    val good = TfRecordFrame.frame("abc".getBytes("UTF-8"))
    val torn = good ++ good.take(10)
    val parsed = TfRecords.parseFrames(torn).toSeq
    assert(parsed.length === 2)
    assert(parsed.head._2.map(new String(_, "UTF-8")) === Some("abc"))
    assert(parsed(1)._2 === None)
  }

  test("session Hadoop conf reaches executor-side shard writers (object-store credential path)") {
    import spark.implicits._
    // A scheme only THIS SESSION's conf can resolve: if the writer rebuilt
    // a default Configuration() on executors (the pre-r10 behavior), the
    // task would die with "No FileSystem for scheme: graftfake" — the
    // exact failure shape of per-job object-store credentials not
    // propagating. The broadcast SerializableConfiguration makes it land.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfake.impl", classOf[GraftFakeFs].getName)
    try {
      val dir = Files.createTempDirectory("tfrec-fakefs").toString
      val docs = (0 until 20).map(i => (i.toLong, s"doc-$i")).toDF("id", "text")
      val manifest =
        TfRecords.write(docs, col("text"), "graftfake://" + dir, shards = 2)
      assert(manifest.collect().map(_.getAs[Long]("n_records")).sum === 20L)
      // the bytes really landed (read back through the plain local path)
      val back = TfRecords.read(spark, dir)
      assert(back.where(!col("ok")).isEmpty)
      assert(back.count() === 20L)
    } finally spark.sparkContext.hadoopConfiguration.unset("fs.graftfake.impl")
  }
}

/** A local FS under a session-private scheme — resolvable ONLY through the
  * session's Hadoop conf, never from defaults (the credential-propagation
  * probe above).
  */
class GraftFakeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfake"
  override def getUri: java.net.URI = java.net.URI.create("graftfake:///")
}
