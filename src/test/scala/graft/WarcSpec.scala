package graft

import java.nio.file.{Files, Paths}

import graft.ingest.Warc
import org.apache.spark.sql.functions._

/** WARC ingestion: byte-pinned foreign-record parse, write→read round
  * trip (gzip member per record, non-ASCII payloads), torn-record and
  * corrupt-gzip quarantine, HTTP body extraction, streaming absorption.
  * The cross-engine aggregate identity is oracled in q_x_warc_interop.
  */
class WarcSpec extends SparkTestBase {

  private def crlf(lines: String*): Array[Byte] =
    lines.mkString("", "\r\n", "\r\n").getBytes("UTF-8")

  /** A hand-assembled two-record WARC the way a FOREIGN producer writes
    * it: response record with HTTP payload + extra headers we don't
    * model, then a resource record.
    */
  private def foreignWarc: Array[Byte] = {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    crlf(
      "WARC/1.0",
      "WARC-Type: response",
      "WARC-Record-ID: <urn:uuid:0001>",
      "WARC-Date: 2024-01-01T00:00:00Z",
      "WARC-Target-URI: https://example.org/a",
      "WARC-IP-Address: 192.0.2.1",
      "Content-Type: application/http;msgtype=response",
      s"Content-Length: ${http.getBytes("UTF-8").length}",
      "") ++ http.getBytes("UTF-8") ++ crlf("", "") ++
      crlf(
        "warc/1.0".toUpperCase,
        "warc-type: resource", // header names are case-insensitive per spec
        "WARC-Target-URI: https://example.org/b",
        "Content-Length: 5",
        "") ++ "hello".getBytes("UTF-8") ++ crlf("", "")
  }

  test("foreign WARC parses: fields, payloads, case-insensitive headers, unknown headers ignored") {
    val dir = Files.createTempDirectory("warc-foreign").toString
    Files.write(Paths.get(dir, "crawl.warc"), foreignWarc)
    val rows = Warc.read(spark, dir).orderBy("rec_idx").collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Boolean]("ok")))
    val r0 = rows(0)
    assert(r0.getAs[String]("warc_type") === "response")
    assert(r0.getAs[String]("target_uri") === "https://example.org/a")
    assert(r0.getAs[String]("record_id") === "<urn:uuid:0001>")
    assert(r0.getAs[String]("warc_date") === "2024-01-01T00:00:00Z")
    assert(new String(r0.getAs[Array[Byte]]("payload"), "UTF-8")
      .startsWith("HTTP/1.1 200 OK"))
    val r1 = rows(1)
    assert(r1.getAs[String]("warc_type") === "resource")
    assert(new String(r1.getAs[Array[Byte]]("payload"), "UTF-8") === "hello")

    // httpBodyText: HTTP payload → body only; non-HTTP passes through.
    val bodies = Warc.read(spark, dir)
      .select(col("rec_idx"), Warc.httpBodyText(col("payload")).as("t"))
      .orderBy("rec_idx").collect().map(_.getString(1))
    assert(bodies(0) === "<html>hi</html>")
    assert(bodies(1) === "hello")
  }

  test("write→read round trip: gzip member per record, non-ASCII payloads, manifest, shard hygiene") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc-rt").toString
    val docs = (0 until 100).map(i =>
        (s"https://ex.test/$i", s"doc-$i 機械学習 データ ü é " + ("x" * (i % 37))))
      .toDF("uri", "text")
    val manifest = Warc.write(docs, col("uri"), col("text"), dir, shards = 3)
    assert(manifest.agg(sum("n_records")).head().getLong(0) === 100L)
    // shard files only, no tmp leftovers, no .crc sidecars
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === (0 until 3).map(i => f"part-$i%05d.warc.gz").toSet)
    val back = Warc.read(spark, dir)
    assert(back.where(!col("ok")).isEmpty)
    val got = back.select(col("target_uri"),
        col("payload").cast("string")).as[(String, String)].collect().toMap
    val want = docs.as[(String, String)].collect().toMap
    assert(got === want, "every payload must survive byte-exactly (UTF-8)")
    // derived headers present and deterministic
    val one = back.where(col("target_uri") === "https://ex.test/7").head()
    assert(one.getAs[String]("warc_type") === "resource")
    assert(one.getAs[String]("record_id").startsWith("<urn:graft:"))
    assert(one.getAs[String]("warc_date") === "2000-01-01T00:00:00Z")
    // gzip really compresses multi-member shards
    val plainDir = Files.createTempDirectory("warc-plain").toString
    Warc.write(docs, col("uri"), col("text"), plainDir, shards = 3, codec = "none")
    def dirBytes(d: String) =
      new java.io.File(d).listFiles().map(_.length()).sum
    assert(dirBytes(dir) < dirBytes(plainDir),
      "member-per-record gzip must still compress")
  }

  test("gzip member framing matches GZIPOutputStream except the project-pinned OS byte") {
    import spark.implicits._
    // the per-shard shared-Deflater writer hand-assembles the RFC 1952
    // member framing; this pins it to the JDK's own output so any future
    // framing drift (header bytes, trailer endianness, compression level)
    // fails loudly instead of silently changing shipped shards. Byte 9
    // (the header OS field) is the PROJECT'S constant 0xFF, not the
    // JDK's — GZIPOutputStream's own value changed 0x00 -> 0xFF at
    // JDK 16 (JDK-8244706), so comparing it would tie the spec to the
    // JDK version; decoders ignore it.
    val docs = Seq(("https://ex.test/pin", "framing pin 機械 ü " + ("z" * 500)))
      .toDF("uri", "text")
    val gzDir = Files.createTempDirectory("warc-gzpin").toString
    val rawDir = Files.createTempDirectory("warc-rawpin").toString
    Warc.write(docs, col("uri"), col("text"), gzDir, shards = 1)
    Warc.write(docs, col("uri"), col("text"), rawDir, shards = 1, codec = "none")
    def fileBytes(d: String) = Files.readAllBytes(
      new java.io.File(d).listFiles().head.toPath)
    val expected = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos, 1 << 16)
      g.write(fileBytes(rawDir)); g.close()
      bos.toByteArray
    }
    val got = fileBytes(gzDir)
    assert(got(9) === 0xff.toByte, "project-pinned OS byte")
    assert(got.zipWithIndex.filter(_._2 != 9).map(_._1).toSeq ===
      expected.zipWithIndex.filter(_._2 != 9).map(_._1).toSeq)
  }

  test("torn record quarantines at its index; earlier records survive; corrupt gzip is one failed row") {
    val dir = Files.createTempDirectory("warc-torn").toString
    // record 0 fine, record 1 claims more bytes than the file has
    val torn = foreignWarc ++ crlf(
      "WARC/1.0", "WARC-Type: resource", "Content-Length: 99999", "") ++
      "short".getBytes("UTF-8")
    Files.write(Paths.get(dir, "bad.warc"), torn)
    val rows = Warc.read(spark, dir).orderBy("rec_idx").collect()
    assert(rows.length === 3)
    assert(rows.take(2).forall(_.getAs[Boolean]("ok")))
    assert(!rows(2).getAs[Boolean]("ok"))
    assert(rows(2).getAs[Array[Byte]]("payload") === null)

    // corrupt gzip shard → exactly one observable quarantine row
    val gzDir = Files.createTempDirectory("warc-badgz").toString
    import spark.implicits._
    Warc.write(Seq(("u", "t")).toDF("uri", "text"),
      col("uri"), col("text"), gzDir, shards = 1)
    val f = new java.io.File(gzDir).listFiles().head
    val raw = Files.readAllBytes(f.toPath)
    raw(raw.length / 2) = (raw(raw.length / 2) ^ 0x7).toByte
    Files.write(f.toPath, raw)
    val after = Warc.read(spark, gzDir).collect()
    assert(after.count(!_.getAs[Boolean]("ok")) >= 1)
    assert(after.filter(!_.getAs[Boolean]("ok"))
      .forall(_.getAs[Array[Byte]]("payload") == null))
  }

  test("readStream absorbs landed crawl shards as micro-batches") {
    import spark.implicits._
    val land = Files.createTempDirectory("warc-land").toString
    def drop(tag: String, ids: Range): Unit = {
      val tmp = Files.createTempDirectory("warc-drop").toString
      Warc.write(ids.map(i => (s"https://ex.test/$i", s"doc-$i")).toDF("uri", "text"),
        col("uri"), col("text"), tmp, shards = 1)
      Files.move(Paths.get(tmp, "part-00000.warc.gz"),
        Paths.get(land, s"drop-$tag.warc.gz"))
    }
    drop("a", 0 until 8)
    val ckpt = Files.createTempDirectory("warc-ckpt").toString
    val got = scala.collection.mutable.Set[String]()
    def runOnce(): Unit = {
      val q = Warc.readStream(spark, land).writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.where(col("ok")).select("target_uri").collect()
            .foreach(r => got.synchronized { got += r.getString(0) })
          ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(got.toSet === (0 until 8).map(i => s"https://ex.test/$i").toSet)
    drop("b", 8 until 12)
    runOnce()
    assert(got.toSet === (0 until 12).map(i => s"https://ex.test/$i").toSet)
  }

  test("fuzz: arbitrary corruption never kills a read — a prefix parses, the rest quarantines") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc-fuzz").toString
    Warc.write((0 until 30).map(i => (s"https://ex.test/$i", s"payload body $i"))
        .toDF("uri", "text"),
      col("uri"), col("text"), dir, shards = 1, codec = "none")
    val clean = Files.readAllBytes(Paths.get(dir, "part-00000.warc"))
    val rnd = new scala.util.Random(42) // fixed seed: reproducible fuzz
    (0 until 60).foreach { trial =>
      val bytes = clean.clone()
      val mode = trial % 3
      if (mode == 0) { // flip 1-4 random bytes
        (0 to rnd.nextInt(4)).foreach { _ =>
          val p = rnd.nextInt(bytes.length)
          bytes(p) = (bytes(p) ^ (1 + rnd.nextInt(255))).toByte
        }
      }
      val cut = if (mode == 1) rnd.nextInt(bytes.length) else bytes.length
      val junk = if (mode == 2) {
        val j = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(j); j
      } else Array.emptyByteArray
      val fuzzDir = Files.createTempDirectory(s"warc-fuzz-$trial").toString
      Files.write(Paths.get(fuzzDir, "f.warc"), bytes.take(cut) ++ junk)
      // must not throw; every emitted row is either a parsed record or a
      // quarantine marker, and ok rows carry non-null payloads
      val rows = Warc.read(spark, fuzzDir).collect()
      assert(rows.forall(r =>
        !r.getAs[Boolean]("ok") || r.getAs[Array[Byte]]("payload") != null),
        s"trial $trial emitted an ok row without payload")
      assert(rows.count(!_.getAs[Boolean]("ok")) <= 1,
        s"trial $trial: parse stops at the FIRST bad record, one marker")
    }
  }

  test("streaming front door composed: landed crawl responses -> HTTP body -> stripHtml -> quality gauges") {
    import spark.implicits._
    import graft.llmops.TextAnalysis
    val land = Files.createTempDirectory("warc-front-land").toString
    def drop(tag: String, ids: Range): Unit = {
      val tmp = Files.createTempDirectory("warc-front-drop").toString
      val docs = ids.map { i =>
        val words = (0 until 10).map(k => s"w${(i + k) % 7}token$k").mkString(" ")
        (s"https://ex.test/$i",
          s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body><p>$words</p></body></html>")
      }.toDF("uri", "payload")
      Warc.write(docs, col("uri"), col("payload"), tmp, shards = 1,
        warcType = lit("response"),
        contentType = lit("application/http;msgtype=response"))
      Files.move(Paths.get(tmp, "part-00000.warc.gz"),
        Paths.get(land, s"drop-$tag.warc.gz"))
    }
    drop("a", 0 until 6)
    val ckpt = Files.createTempDirectory("warc-front-ckpt").toString
    val tokens = new java.util.concurrent.atomic.AtomicLong(0)
    val docsSeen = new java.util.concurrent.atomic.AtomicLong(0)
    def runOnce(): Unit = {
      val q = Warc.readStream(spark, land).writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val clean = batch.where(col("ok")).select(
            col("target_uri").as("doc"),
            TextAnalysis.stripHtml(Warc.httpBodyText(col("payload"))).as("text"))
          val agg = TextAnalysis.withQuality(clean, "text")
            .agg(count(lit(1)), sum("n_tokens")).head()
          docsSeen.addAndGet(agg.getLong(0))
          if (!agg.isNullAt(1)) tokens.addAndGet(agg.getLong(1))
          ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(docsSeen.get() === 6L && tokens.get() === 60L)
    drop("b", 6 until 10) // the next crawl batch lands
    runOnce()
    assert(docsSeen.get() === 10L && tokens.get() === 100L,
      "each landed shard contributes exactly its stripped-token mass once")
  }
}
