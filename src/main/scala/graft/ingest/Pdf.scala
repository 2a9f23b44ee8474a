package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text extraction — the EXTRACTABLE-SUBSET reader that closes the
  * crawl front door's last format gap (HTML/markdown/WARC exist; paper
  * and book corpora arrive as PDF). Scope is stated, not silent:
  *
  *   EXTRACTED — uncompressed and `/FlateDecode` (zlib — JDK Inflater)
  *   content streams; text-showing operators inside `BT…ET` blocks
  *   (`Tj`, `'`, `"`, and `TJ` arrays, whose string parts concatenate —
  *   kerning splits words mid-glyph, so no separator); literal strings
  *   with the full escape set (\n \r \t \b \f \( \) \\ \ddd octal,
  *   line continuations, nested parens) and hex strings; byte values
  *   map Latin-1 (the Standard/WinAnsi simple-font approximation —
  *   correct for the overwhelming Latin-text majority).
  *
  *   QUARANTINED, loudly — one `ok = false` row, never a throw, never
  *   silent: corrupt Flate data, any OTHER `/Filter` (DCT/CCITT/LZW…),
  *   files without a `%PDF-` header or any parseable stream.
  *
  *   CID/Type0 text (r15): hex-string text ops decode through the
  *   file's `/ToUnicode` CMap (bfchar + both bfrange forms, UTF-16BE
  *   destinations, code width from the codespacerange) — the path
  *   modern academic PDFs take. Stated scope: CMaps merge per FILE
  *   with first-mapping-wins (per-font Tf/resource resolution is out
  *   of scope — one CMap per file is the dominant shape); unmapped
  *   codes read U+FFFD; literal-string ops keep the Latin-1
  *   simple-font reading. Consumers still gate on
  *   [[graft.llmops.TextAnalysis]] langid / quality gauges downstream
  *   — the same degrade-then-gauge contract the image decoders use.
  *
  * The WRITER builds complete, viewer-valid multi-page PDFs (catalog →
  * page tree → per-page Flate content streams, correct xref offsets),
  * one file per shard — the fixture/round-trip half of the contract
  * (the Xlsx precedent: reader proven against self-written AND
  * hand-assembled foreign bytes). Text lines render as one `Tj` per
  * line; the reader joins text ops with `\n`, so write→read is
  * byte-exact for Latin-1 text (the interop oracle's identity).
  *
  * Scale: one whole file materializes per task (binaryFile — the WARC
  * contract, bounded by producer shard size); parsing is a single
  * forward scan per stream; the writer is a distributed per-partition
  * build through the [[ShardSink]] invariants (attempt-unique tmp,
  * broadcast conf, manifest-only collect).
  */
object Pdf {

  // ------------------------------------------------------------------
  // write
  // ------------------------------------------------------------------

  private def escapeLine(line: String): String = {
    val sb = new StringBuilder(line.length + 8)
    line.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case c if c < 0x20 => sb.append(f"\\${c.toInt}%03o")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Replace characters outside Latin-1 with '?' — the simple-font
    * writable subset (controls stay: the writer octal-escapes them);
    * mirror this in any cross-engine oracle.
    */
  def latin1Sanitize(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(text, "[^\\x00-\\xff]", "?")

  /** Write one multi-page PDF per shard: each input row becomes one
    * page whose content stream shows the row's text (one `Tj` per
    * line). Text must already be Latin-1 ([[latin1Sanitize]]); chars
    * outside it fail the write loudly rather than corrupt silently.
    * Returns the (file, n_pages, n_bytes) manifest.
    */
  def write(df: DataFrame, textCol: String, dir: String, shards: Int,
      flate: Boolean = true): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val spark = df.sparkSession
    val out = new Path(dir)
    out.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(out)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val texts = df.select(col(textCol).cast("string")).repartition(shards)
    val manifestRows = texts.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = confBc.value.value
      val finalPath = new Path(dir, f"part-$pid%05d.pdf")
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmpPath = new Path(dir, f".part-$pid%05d.pdf.tmp-a$attempt")
      val pages = it.map(r => Option(r.getString(0)).getOrElse("")).toArray
      // an empty partition writes NO file: a zero-page PDF has no
      // content stream and would read back as one quarantine row —
      // an absent shard is the honest representation of no pages.
      if (pages.isEmpty) Iterator.empty
      else {
        val bytes = buildPdf(pages, flate)
        val pfs = org.apache.hadoop.fs.FileSystem.newInstance(finalPath.toUri, conf)
        try {
          pfs.setWriteChecksum(false); pfs.setVerifyChecksum(false)
          val os = pfs.create(tmpPath, true)
          try os.write(bytes) finally os.close()
          pfs.delete(finalPath, false)
          require(pfs.rename(tmpPath, finalPath), s"rename failed: $finalPath")
          Iterator(Row(finalPath.toString, pages.length.toLong, bytes.length.toLong))
        } finally pfs.close()
      }
    }.collect()
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifestRows.toIndexedSeq, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("n_pages", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false))))
  }

  /** A complete PDF: catalog(1), pages(2), then per page i (0-based)
    * page object 3+2i and content object 4+2i; xref + trailer.
    */
  private[ingest] def buildPdf(pages: Array[String], flate: Boolean): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val buf = new java.io.ByteArrayOutputStream(1 << 16)
    val offsets = new scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = buf.write(s.getBytes(latin1))
    def obj(body: => Unit): Unit = { offsets += buf.size().toLong; body }
    w("%PDF-1.4\n")
    val n = pages.length
    obj { w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n") }
    obj {
      val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    }
    pages.zipWithIndex.foreach { case (text, i) =>
      require(text.forall(_ <= 0xff),
        "page text must be Latin-1 — latin1Sanitize before writing")
      val (pageId, contId) = (3 + 2 * i, 4 + 2 * i)
      obj {
        w(s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
          "/MediaBox [0 0 612 792] /Resources << /Font << /F1 " +
          "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> " +
          s"/Contents $contId 0 R >>\nendobj\n")
      }
      obj {
        val lines = text.split("\n", -1)
        val ops = lines.zipWithIndex.map { case (ln, j) =>
          val move = if (j == 0) "72 720 Td" else "0 -14 Td"
          s"$move (${escapeLine(ln)}) Tj"
        }.mkString(" ")
        val content = s"BT /F1 12 Tf $ops ET".getBytes(latin1)
        val (data, filter) =
          if (flate) (deflate(content), " /Filter /FlateDecode") else (content, "")
        w(s"$contId 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
        buf.write(data)
        w("\nendstream\nendobj\n")
      }
    }
    val xrefAt = buf.size()
    val total = 2 + 2 * n + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    buf.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length / 2 + 16)
      val tmp = new Array[Byte](1 << 14)
      while (!d.finished()) { val k = d.deflate(tmp); out.write(tmp, 0, k) }
      out.toByteArray
    } finally d.end()
  }

  // ------------------------------------------------------------------
  // read
  // ------------------------------------------------------------------

  final case class PdfText(path: String, stream_idx: Long, text: String,
      n_text_ops: Long, ok: Boolean)

  /** One row per CONTENT STREAM that shows text; corrupt/unsupported
    * streams and unparseable files quarantine as `ok = false` rows.
    * Streams with no `BT` block (fonts, images, metadata) are skipped
    * silently — they carry no text to lose.
    *
    * Recall limit, stated: when `/Length` is absent/indirect/
    * inconsistent, the stream extent comes from an `endstream` scan.
    * Flate streams validate candidates by inflating (a stream whose
    * compressed bytes contain the literal marker still parses whole);
    * an UNCOMPRESSED stream has no validity test, so raw data that
    * itself contains `endstream` truncates at the first marker — the
    * remainder may surface as a bogus extra row or quarantine.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => fileRows(path, bytes) }
      .toDF()
  }

  /** Parse one in-memory PDF payload — the route for PDFs that never
    * touch a filesystem (crawl payloads inside WARC records, media
    * tables with `kind = pdf`); [[read]] is this over binaryFile.
    */
  def parseBytes(path: String, bytes: Array[Byte]): Iterator[PdfText] =
    fileRows(path, bytes)

  private def fileRows(path: String, bytes: Array[Byte]): Iterator[PdfText] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val s = new String(bytes, latin1)
    if (!s.startsWith("%PDF-"))
      return Iterator(PdfText(path, 0L, null, 0L, ok = false))
    // TWO passes (r15): pass 1 scans stream extents and decodes them
    // (None = quarantine); pass 2 emits rows — so a /ToUnicode CMap
    // stream ANYWHERE in the file (they typically follow the content
    // streams) is in hand before any text op decodes.
    val collected = new scala.collection.mutable.ArrayBuffer[Option[String]]()
    var from = 0
    var sawStream = false
    while (from < s.length) {
      val at = s.indexOf("stream", from)
      if (at < 0) { from = s.length }
      else if (at + 6 < s.length && (s.charAt(at + 6) == '\n' ||
        s.charAt(at + 6) == '\r')) {
        sawStream = true
        val dataStart =
          if (s.startsWith("\r\n", at + 6)) at + 8 else at + 7
        val end = s.indexOf("endstream", dataStart)
        if (end < 0) {
          collected += None
          from = s.length
        } else {
          // THIS stream's dict: the LAST "<<" run in a bounded backward
          // window — without the cut, a previous object's "/Filter
          // /FlateDecode" within 1024 chars would reclassify a raw
          // stream (and vice versa).
          val window = s.substring(math.max(0, at - 1024), at)
          val dictAt = window.lastIndexOf("<<")
          val dict = if (dictAt >= 0) window.substring(dictAt) else window
          // data extent: trust a consistent DIRECT /Length first;
          // "/Length 8 0 R" (the indirect form most generators emit)
          // must NOT parse as length 8 — the digits may not be followed
          // by a generation number + R. Otherwise strip AT MOST ONE EOL
          // before "endstream" (the spec's one separator) — stripping
          // greedily would truncate compressed data that legitimately
          // ENDS in 0x0A/0x0D bytes (~1/128 of Flate streams — found
          // the hard way).
          // (?!\d|…) also stops backtracking from shaving digits off an
          // indirect ref ("/Length 1230 0 R" must not parse as 123).
          val lenRe = java.util.regex.Pattern.compile(
            "/Length\\s+(\\d+)(?!\\d|\\s+\\d+\\s+R)")
          val lm = lenRe.matcher(dict)
          var lenStr: String = null
          while (lm.find()) lenStr = lm.group(1)
          val byLength: Option[Int] = Option(lenStr)
            .flatMap(l => try Some(l.toInt) catch {
              case _: NumberFormatException => None })
            .filter(l => dataStart + l <= end)
          def eolTrim(marker: Int): Int = {
            var de = marker
            if (de > dataStart && s.charAt(de - 1) == '\n') {
              de -= 1
              if (de > dataStart && s.charAt(de - 1) == '\r') de -= 1
            } else if (de > dataStart && s.charAt(de - 1) == '\r') de -= 1
            de
          }
          val isFlate = dict.contains("/FlateDecode")
          // Without a usable /Length the extent falls back to an
          // "endstream" scan — but Flate data can legitimately CONTAIN
          // those nine bytes, so a first-match cut would truncate the
          // stream AND resume parsing inside its remaining data
          // (fabricating a bogus extra stream row). Flate gives us a
          // validity test: walk forward across candidate markers until
          // one inflates (bounded tries — a genuinely corrupt stream
          // must not scan to EOF). Raw streams have no such test; their
          // first-match recall limit stands, documented in [[read]].
          var endPos = end
          var raw = bytes.slice(dataStart, byLength.map(dataStart + _)
            .getOrElse(eolTrim(endPos)))
          var inflated: Option[Array[Byte]] = if (isFlate) inflate(raw) else None
          if (isFlate && byLength.isEmpty) {
            var tries = 0
            while (inflated.isEmpty && tries < 8) {
              val nxt = s.indexOf("endstream", endPos + 9)
              if (nxt < 0) tries = 8
              else {
                endPos = nxt
                raw = bytes.slice(dataStart, eolTrim(endPos))
                inflated = inflate(raw)
                tries += 1
              }
            }
          }
          val content: Option[String] =
            if (isFlate) inflated.map(new String(_, latin1))
            else if (dict.contains("/Filter")) None // unsupported codec
            else Some(new String(raw, latin1))
          collected += content
          from = endPos + 9
        }
      } else from = at + 6
    }
    // pass 2: CMaps first (they carry no text themselves), then rows.
    // Multiple fonts' CMaps MERGE with first-mapping-wins and the first
    // CMap's code width — per-font resolution through Tf/resource
    // chains is out of stated scope (one CMap per file is the dominant
    // CID-PDF shape; a conflicting multi-font file degrades to the
    // first font's view, observable through the downstream gauges).
    val cmaps = collected.flatMap {
      case Some(c) if isCMap(c) => Some(parseCMap(c))
      case _ => None
    }
    val cmap: Option[(Int, Map[Int, String])] =
      cmaps.headOption.map { case (w0, _) =>
        val merged = scala.collection.mutable.LinkedHashMap[Int, String]()
        cmaps.foreach { case (_, m) =>
          m.foreach { case (k, v) =>
            if (!merged.contains(k)) merged(k) = v
          }
        }
        (w0, merged.toMap)
      }
    val rows = new scala.collection.mutable.ArrayBuffer[PdfText]()
    var idx = 0L
    collected.foreach {
      case None =>
        rows += PdfText(path, idx, null, 0L, ok = false)
        idx += 1
      case Some(c) if isCMap(c) => () // consumed above, carries no text
      case Some(c) if c.contains("BT") =>
        val (text, nOps) = extractText(c, cmap)
        rows += PdfText(path, idx, text, nOps, ok = true)
        idx += 1
      case Some(_) => () // no text in this stream — nothing to lose
    }
    if (rows.isEmpty && !sawStream)
      rows += PdfText(path, 0L, null, 0L, ok = false)
    rows.iterator
  }

  private def isCMap(c: String): Boolean =
    c.contains("beginbfchar") || c.contains("beginbfrange")

  /** Parse a /ToUnicode CMap: (code byte-width from the first
    * codespacerange — 2 when absent, the Identity-H norm) plus the
    * code → Unicode map from every bfchar pair and bfrange (both the
    * incrementing `<lo> <hi> <dstStart>` form and the explicit
    * `<lo> <hi> [<d0> <d1> …]` array form). Destinations are UTF-16BE
    * per spec, so a single code can map to a multi-char string
    * (ligatures, surrogate pairs). Torn/odd tokens end that section's
    * parse — the degrade contract.
    */
  private[ingest] def parseCMap(c: String): (Int, Map[Int, String]) = {
    val hexTok = "<([0-9A-Fa-f]+)>".r
    var width = 2
    val cs = "(?s)begincodespacerange(.*?)endcodespacerange".r
    cs.findFirstMatchIn(c).foreach { m =>
      hexTok.findFirstMatchIn(m.group(1)).foreach(t =>
        width = math.max(1, math.min(2, t.group(1).length / 2)))
    }
    def utf16(hex: String): String = {
      val even = if (hex.length % 2 == 0) hex else hex + "0"
      val bs = even.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      new String(bs, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val map = scala.collection.mutable.LinkedHashMap[Int, String]()
    val bfchar = "(?s)beginbfchar(.*?)endbfchar".r
    bfchar.findAllMatchIn(c).foreach { m =>
      hexTok.findAllMatchIn(m.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) =>
          val k = java.lang.Long.parseLong(src, 16).toInt
          if (!map.contains(k)) map(k) = utf16(dst)
        case _ => // odd trailing token: torn section, ignore
      }
    }
    // bfrange needs a real token walk — the array form interleaves
    // brackets with the hex tokens
    val bfrange = "(?s)beginbfrange(.*?)endbfrange".r
    bfrange.findAllMatchIn(c).foreach { m =>
      val body = m.group(1)
      val tok = "<([0-9A-Fa-f]+)>|\\[|\\]".r
      val toks = tok.findAllMatchIn(body).toVector
      var i = 0
      while (i + 1 < toks.length) {
        (toks(i).group(1), toks(i + 1).group(1)) match {
          case (lo, hi) if lo != null && hi != null =>
            val loV = java.lang.Long.parseLong(lo, 16).toInt
            val hiV = java.lang.Long.parseLong(hi, 16).toInt
            if (i + 2 < toks.length && toks(i + 2).matched == "[") {
              // explicit array: one destination per code
              var j = i + 3
              var k = loV
              while (j < toks.length && toks(j).matched != "]") {
                if (toks(j).group(1) != null && k <= hiV) {
                  if (!map.contains(k)) map(k) = utf16(toks(j).group(1))
                  k += 1
                }
                j += 1
              }
              i = j + 1
            } else if (i + 2 < toks.length && toks(i + 2).group(1) != null) {
              // incrementing form: dst, dst+1, … (increment on the LAST
              // UTF-16 code unit per spec)
              val dst = toks(i + 2).group(1)
              val base = utf16(dst)
              var k = loV
              while (k <= hiV && hiV - loV <= 0xffff) {
                if (!map.contains(k)) {
                  val off = k - loV
                  val v =
                    if (base.isEmpty) ""
                    else base.dropRight(1) +
                      (base.last + off).toChar
                  map(k) = v
                }
                k += 1
              }
              i += 3
            } else i = toks.length
          case _ => i = toks.length // torn: stop this section
        }
      }
    }
    (width, map.toMap)
  }

  private def inflate(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(b)
        val out = new java.io.ByteArrayOutputStream(b.length * 4 + 64)
        val tmp = new Array[Byte](1 << 14)
        while (!inf.finished()) {
          val k = inf.inflate(tmp)
          if (k == 0 && inf.needsInput()) throw new java.io.EOFException("truncated")
          out.write(tmp, 0, k)
        }
        Some(out.toByteArray)
      } finally inf.end()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Text ops from every BT…ET block of one content stream: strings in
    * a TJ array concatenate into one op, each op joins with '\n'.
    * With a file-level /ToUnicode CMap (r15), HEX strings decode as
    * CID codes through it — the Type0/CID path modern academic PDFs
    * use (their text ops are virtually always hex; a literal-string op
    * keeps the Latin-1 simple-font reading, stated). Codes the CMap
    * doesn't cover read U+FFFD — observable, never silently dropped.
    */
  private[ingest] def extractText(content: String,
      cmap: Option[(Int, Map[Int, String])] = None): (String, Long) = {
    val ops = new scala.collection.mutable.ArrayBuffer[String]()
    var bt = content.indexOf("BT")
    while (bt >= 0) {
      val et = content.indexOf("ET", bt + 2)
      val block = if (et < 0) content.substring(bt + 2)
        else content.substring(bt + 2, et)
      scanBlock(block, ops, cmap)
      bt = if (et < 0) -1 else content.indexOf("BT", et + 2)
    }
    (ops.mkString("\n"), ops.length.toLong)
  }

  /** Map a hex-string's raw bytes (as Latin-1 chars) through the CMap:
    * width-byte big-endian codes, the trailing partial code
    * zero-padded per spec.
    */
  private def mapCodes(raw: String, width: Int,
      map: Map[Int, String]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      var code = 0
      var j = 0
      while (j < width) {
        code = (code << 8) | (if (i + j < raw.length) raw.charAt(i + j) & 0xff else 0)
        j += 1
      }
      sb.append(map.getOrElse(code, "�"))
      i += width
    }
    sb.toString
  }

  private def scanBlock(block: String,
      ops: scala.collection.mutable.ArrayBuffer[String],
      cmap: Option[(Int, Map[Int, String])] = None): Unit = {
    var i = 0
    var inArray = false
    val pending = new StringBuilder
    var pendingAny = false
    def flush(): Unit =
      if (pendingAny) { ops += pending.toString; pending.clear(); pendingAny = false }
    while (i < block.length) {
      block.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(block, i + 1)
          pending.append(str); pendingAny = true
          if (!inArray) flush()
          i = next
        case '<' if i + 1 < block.length && block.charAt(i + 1) == '<' =>
          i += 2 // inline dict (marked-content props, "/P << /MCID 0 >>")
          // — its second '<' must not open a hex string
        case '<' =>
          val (raw, next) = hexString(block, i + 1)
          val str = cmap match {
            case Some((w, m)) => mapCodes(raw, w, m)
            case None => raw
          }
          pending.append(str); pendingAny = true
          if (!inArray) flush()
          i = next
        case '[' => inArray = true; i += 1
        case ']' => inArray = false; flush(); i += 1
        case _ => i += 1
      }
    }
    flush()
  }

  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              var j = i + 1
              var v = 0
              while (j < s.length && j < i + 4 &&
                s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append((v & 0xff).toChar); i = j
            case c => sb.append(c); i += 2 // unknown escape: drop backslash
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  private def hexString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start
    var hi = -1
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar) // odd length pads 0
    (sb.toString, if (i < s.length) i + 1 else i)
  }
}
