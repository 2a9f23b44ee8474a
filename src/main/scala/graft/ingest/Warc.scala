package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion and export — the interchange format the
  * crawl corpora this engine curates actually ship in (Common Crawl is
  * WARC: one gzip member per record in `.warc.gz`). The reference's
  * surface stops at spreadsheet ingest (`refresh-vmware.cypher:1-21`
  * loads xls-derived rows); a 100 TB training-data pipeline's front door
  * is the crawl archive, feeding
  * `stripHtml → canonicalUrl → quality/dedup/curation`.
  *
  * Dependency-free: the record grammar is a version line, `Name: value`
  * header lines, a blank line, `Content-Length` payload bytes and a
  * CRLF CRLF trailer — a page of cursor arithmetic (the
  * [[graft.llmops.Multimodal]] chunk-walk / [[TfRecords.parseFrames]]
  * precedent), not a library. Gzip members concatenate, and
  * `GZIPInputStream` reads concatenated members natively.
  *
  * Quarantine contract (the [[Jsonl]]/[[TfRecords]] shape): a torn or
  * malformed record stops that FILE's parse at the bad record and emits
  * one observable `ok = false` row; a corrupt gzip stream is one failed
  * row for the shard; nothing kills a task.
  */
object Warc {

  /** One parsed record: WARC headers of record-level interest plus the
    * raw payload block. Absent headers are null.
    */
  final case class Record(file: String, rec_idx: Long, warc_type: String,
      target_uri: String, record_id: String, warc_date: String,
      content_type: String, payload: Array[Byte], ok: Boolean)

  // ------------------------------------------------------------------
  // write
  // ------------------------------------------------------------------

  /** Write one WARC record per row under `dir` as `part-NNNNN.warc[.gz]`
    * shards — gzip = one member PER RECORD (the Common Crawl layout, so
    * any range-seeking consumer can inflate a single record). Headers
    * are deterministic: `WARC-Record-ID` is derived from the payload
    * hash, `WARC-Date` comes from the caller's column (data, never the
    * wall clock — the manifest/oracle discipline). Returns the
    * [[ShardSink]] manifest (file, n_records, n_bytes of raw record
    * framing).
    *
    * Scale: record assembly is one codegen'd concat projection; the
    * repartition is the single shuffle (round-robin, shards balance
    * regardless of upstream skew); the writer is the shared distributed
    * [[ShardSink]] (attempt-unique tmp + rename, broadcast conf, no
    * driver funnel).
    */
  def write(df: DataFrame, uri: Column, payload: Column, dir: String,
      shards: Int, codec: String = "gzip",
      warcType: Column = lit("resource"),
      contentType: Column = lit("text/plain"),
      date: Column = lit("2000-01-01T00:00:00Z")): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    ShardCodec.check(codec)
    val p = payload.cast("binary")
    val uriLine = when(uri.isNull, lit(""))
      .otherwise(concat(lit("WARC-Target-URI: "), uri, lit("\r\n")))
    val hdr = concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), warcType, lit("\r\n"),
      uriLine,
      lit("WARC-Record-ID: <urn:graft:"), md5(p), lit(">\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("Content-Type: "), contentType, lit("\r\n"),
      lit("Content-Length: "), length(p).cast("string"), lit("\r\n\r\n"))
    val rec = concat(hdr.cast("binary"), p, lit("\r\n\r\n").cast("binary"))
    val framed = df.select(rec.as("rec"))
      .where(col("rec").isNotNull)
      .repartition(shards)
    ShardSink.write(framed, dir, ".warc" + ShardCodec.ext(codec),
      identity,
      codec match {
        case "gzip" => new GzipMemberWriter
        case "zstd" => new ZstdMemberWriter
        case "none" => (os, b) => os.write(b)
      })
  }

  /** Per-record gzip member writer sharing ONE native Deflater per shard
    * task. A fresh `GZIPOutputStream` per record holds ~256 KB of native
    * zlib state (plus the heap buffer) that `finish()` does NOT release —
    * only `close()`/GC's cleaner does — so a shard of millions of records
    * churns/balloons native memory past container RSS limits. This writer
    * allocates the Deflater lazily on first record, `reset()`s it between
    * members, writes the RFC 1952 member framing itself (header with
    * MTIME=0 — deterministic shards, data never the wall clock — then the
    * raw-deflate body and the CRC32 + ISIZE trailer: identical to what
    * `GZIPOutputStream` emits for the same input EXCEPT the header OS
    * byte, which the project pins to 0xFF itself — the JDK's own value
    * changed 0x00 → 0xFF at JDK 16, see [[GzipMemberWriter.Header]]),
    * and `end()`s the
    * native state deterministically at task completion. Closures
    * deserialize per task, so each shard task owns exactly one Deflater.
    */
  private final class GzipMemberWriter
      extends ((java.io.OutputStream, Array[Byte]) => Unit) with Serializable {
    @transient private var deflater: java.util.zip.Deflater = _
    @transient private var crc: java.util.zip.CRC32 = _
    @transient private var buf: Array[Byte] = _
    private def intLE(os: java.io.OutputStream, v: Long): Unit = {
      os.write((v & 0xff).toInt); os.write(((v >> 8) & 0xff).toInt)
      os.write(((v >> 16) & 0xff).toInt); os.write(((v >> 24) & 0xff).toInt)
    }
    def apply(os: java.io.OutputStream, b: Array[Byte]): Unit = {
      if (deflater == null) {
        deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        crc = new java.util.zip.CRC32()
        buf = new Array[Byte](1 << 16)
        val d = deflater
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => d.end()))
      }
      deflater.reset(); crc.reset()
      os.write(GzipMemberWriter.Header)
      deflater.setInput(b); deflater.finish()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        if (n > 0) os.write(buf, 0, n)
      }
      crc.update(b)
      intLE(os, crc.getValue)
      intLE(os, b.length.toLong)
    }
  }

  private object GzipMemberWriter {
    // magic, CM=8 (deflate), FLG=0, MTIME=0, XFL=0, OS=0xFF (unknown).
    // This is the PROJECT'S canonical header, pinned as constants — NOT
    // a claim of GZIPOutputStream byte-identity: the JDK's OS byte moved
    // 0x00 → 0xFF in JDK 16 (JDK-8244706), so "what GZIPOutputStream
    // emits" is JDK-version-dependent while this header is not. Every
    // decoder ignores the OS byte; byte-pinned fixtures and replica
    // checksums are stable across JDKs because the constant is ours.
    val Header: Array[Byte] =
      Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)
  }

  /** One zstd FRAME per record (`.warc.zst` — the layout Common Crawl's
    * zstd experiments use, range-seekable the same way gzip members
    * are), sharing ONE native compression context per shard task (the
    * [[GzipMemberWriter]] discipline: lazy init, explicit close at task
    * completion — zstd contexts hold native window state too). Frames
    * concatenate; [[ShardCodec.decompress]]'s zstd stream walks them
    * back in one pass.
    */
  private final class ZstdMemberWriter
      extends ((java.io.OutputStream, Array[Byte]) => Unit) with Serializable {
    @transient private var ctx: com.github.luben.zstd.ZstdCompressCtx = _
    def apply(os: java.io.OutputStream, b: Array[Byte]): Unit = {
      if (ctx == null) {
        ctx = new com.github.luben.zstd.ZstdCompressCtx()
        ctx.setLevel(3)
        val c = ctx
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => c.close()))
      }
      os.write(ctx.compress(b))
    }
  }

  // ------------------------------------------------------------------
  // read
  // ------------------------------------------------------------------

  /** Read WARC shards (`*.warc` / `*.warc.gz`) as one row per record
    * with quarantine semantics. One whole shard materializes per task
    * (`binaryFile`) — bounded by producer shard size, the same memory
    * shape every WARC consumer assumes.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => fileRecords(path, bytes) }
      .toDF()
  }

  /** STREAMING WARC ingestion — crawl shards LAND in a directory and each
    * new file absorbs as a micro-batch (the [[Jsonl.readStream]] /
    * [[TfRecords.readStream]] contract), same row shape and quarantine
    * semantics as [[read]].
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => fileRecords(path, bytes) }
      .toDF()
  }

  /** The HTTP response body of a `response` record's payload: bytes after
    * the first CRLF CRLF when the payload opens with an HTTP status line
    * (headers-only responses yield ""); non-HTTP payloads (`resource`
    * records) pass through whole. Codegen'd locate/substr — scan speed.
    */
  def httpBodyText(payload: Column): Column = {
    val s = payload.cast("string")
    when(s.startsWith("HTTP/"),
      when(locate("\r\n\r\n", s) > 0,
        s.substr(locate("\r\n\r\n", s) + 4, length(s)))
        .otherwise(lit("")))
      .otherwise(s)
  }

  // whole-stream member decompress by extension (gzip members / zstd
  // frames concatenate identically); corrupt → one quarantine row (the
  // TfRecords symmetry), via the shared [[ShardCodec]].
  private def fileRecords(path: String, bytes: Array[Byte]): Iterator[Record] =
    ShardCodec.decompress(path, bytes) match {
      case Some(raw) => parseRecords(raw).map {
        case (idx, Some(p)) =>
          Record(path, idx, p.warcType, p.targetUri, p.recordId, p.date,
            p.contentType, p.payload, ok = true)
        case (idx, None) =>
          Record(path, idx, null, null, null, null, null, null, ok = false)
      }
      case None =>
        Iterator(Record(path, 0L, null, null, null, null, null, null, ok = false))
    }

  private final case class Parsed(warcType: String, targetUri: String,
      recordId: String, date: String, contentType: String,
      payload: Array[Byte])

  /** Parse a concatenation of WARC records; stops at the first torn or
    * malformed record, emitting `(idx, None)` for it.
    */
  private def parseRecords(bytes: Array[Byte])
      : Iterator[(Long, Option[Parsed])] =
    new Iterator[(Long, Option[Parsed])] {
      private var pos = skipNewlines(bytes, 0)
      private var idx = 0L
      private var dead = false
      override def hasNext: Boolean = !dead && pos < bytes.length
      override def next(): (Long, Option[Parsed]) = {
        val out = parseOne(bytes, pos) match {
          case Some((rec, nextPos)) =>
            pos = skipNewlines(bytes, nextPos)
            (idx, Some(rec))
          case None =>
            dead = true
            (idx, None)
        }
        idx += 1
        out
      }
    }

  private def skipNewlines(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p < b.length && (b(p) == '\r' || b(p) == '\n')) p += 1
    p
  }

  /** One header/version line: bytes up to the next LF, CR stripped.
    * None when no LF remains (a torn header).
    */
  private def line(b: Array[Byte], from: Int): Option[(String, Int)] = {
    var p = from
    while (p < b.length && b(p) != '\n') p += 1
    if (p >= b.length) None
    else {
      val end = if (p > from && b(p - 1) == '\r') p - 1 else p
      Some((new String(b, from, end - from, "UTF-8"), p + 1))
    }
  }

  private def parseOne(b: Array[Byte], pos0: Int): Option[(Parsed, Int)] = {
    var pos = pos0
    line(b, pos) match {
      case Some((v, p)) if v.startsWith("WARC/") => pos = p
      case _ => return None
    }
    // headers until the blank line; names are case-insensitive (spec),
    // values trim the optional space after the colon.
    val headers = scala.collection.mutable.Map.empty[String, String]
    var blank = false
    while (!blank) {
      line(b, pos) match {
        case Some(("", p)) => blank = true; pos = p
        case Some((h, p)) =>
          val i = h.indexOf(':')
          if (i > 0) headers(h.substring(0, i).trim.toLowerCase) =
            h.substring(i + 1).trim
          pos = p
        case None => return None
      }
    }
    val len = headers.get("content-length").flatMap(_.toLongOption)
      .getOrElse(return None)
    if (len < 0 || len > Int.MaxValue - 16 || pos + len > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
    Some((Parsed(
      headers.getOrElse("warc-type", null),
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-record-id", null),
      headers.getOrElse("warc-date", null),
      headers.getOrElse("content-type", null),
      payload), pos + len.toInt))
  }
}
