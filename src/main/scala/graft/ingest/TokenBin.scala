package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Megatron-style binary token shards (`.bin` + `.idx`) — the
  * packed-token artifact the PyTorch GPU-trainer ecosystem
  * (Megatron-LM / GPT-NeoX and derivatives) memory-maps directly: the
  * non-TF half of the trainer hand-off, next to [[TfRecords]] (which
  * covers `tf.data`). [[graft.llmops.Corpus.packSequences]] /
  * [[graft.llmops.Corpus.packTokens]] already produce exactly the packed
  * coordinates; this is the binary writer those coordinates feed.
  *
  * Wire format per shard — the open-source Megatron-LM
  * `MMapIndexedDataset` layout (version 1), so existing trainers consume
  * the shards unchanged:
  *
  *   - `part-NNNNN.bin`: every sequence's token ids concatenated,
  *     each id a LITTLE-ENDIAN fixed-width integer — `uint16`
  *     (2 bytes/token, dtype code 8) for the usual ≤64k vocab, `int32`
  *     (dtype code 4) above it;
  *   - `part-NNNNN.idx`: magic `MMIDIDX\0\0` (9 bytes), u64 version = 1,
  *     u8 dtype code, u64 ENTRY count N, u64 document-index length D,
  *     then N i32 entry LENGTHS (token counts), N i64 byte POINTERS into
  *     the `.bin` (exclusive prefix sum of length·width), and D i64
  *     document indices — entry positions marking group starts
  *     (doc_idx(0) = 0, doc_idx(D−1) = N, non-decreasing).
  *
  * Without `fragsCol` each input row is ONE entry and the document index
  * is the degenerate 0..N (byte-identical to the historical writer).
  * WITH `fragsCol` — an `array<long>` of per-fragment token counts
  * summing to the row's token count, exactly what
  * [[graft.llmops.Corpus.packSequences]]' `n_seq_tokens` geometry
  * aggregates to — every FRAGMENT becomes its own entry and the document
  * index groups consecutive fragments back into the packed training
  * sequence, so intra-sequence document boundaries (the attention-reset
  * points at packed-document joins) survive the export in the format's
  * own grouping field instead of being erased. A mismatched fragment sum
  * or non-positive fragment length fails the write loudly.
  *
  * Sharding is DETERMINISTIC — shard = floorMod(seq, shards), ascending
  * seq order within a shard (an explicit `Partitioner`, not round-robin
  * `repartition`) — so two runs over the same frame produce
  * byte-identical shards and a replica can verify the manifest checksum
  * offline. Writing follows the [[ShardSink]] invariants: attempt-unique
  * dot-hidden tmp names (a speculative twin can never interleave, a
  * loser never lists), broadcast Hadoop conf, checksum sidecars off,
  * eager write with the shards-sized manifest collect as the only
  * action. Returns (file, n_sequences, n_tokens, n_bytes) per shard.
  *
  * A write FAILS LOUDLY on a token outside the dtype's range (a 70k id
  * silently truncated to uint16 would corrupt every downstream gradient);
  * quarantine is the READER's contract, for bytes we did not produce.
  */
object TokenBin {

  private[ingest] val Magic: Array[Byte] =
    "MMIDIDX".getBytes("US-ASCII") ++ Array[Byte](0, 0)

  private def widthOf(dtype: String): Int = dtype match {
    case "uint16" => 2
    case "int32" => 4
    case other => throw new IllegalArgumentException(
      s"unsupported dtype '$other' (uint16 | int32)")
  }

  private def codeOf(dtype: String): Byte =
    dtype match { case "uint16" => 8; case "int32" => 4 }

  /** Loud driver-side element-type check for an `array<integral>` column
    * — an `array<int>` would pass a bare select and then blow up mid-write
    * with an opaque executor ClassCastException at `getSeq[Long]`;
    * checking here gives the same descriptive error style as the seq-key
    * guard, and the lossless cast to `array<long>` makes int/short/byte
    * token columns just work.
    */
  private def requireIntegralArray(df: DataFrame, colName: String): Unit = {
    import org.apache.spark.sql.types._
    val ok = df.schema(colName).dataType match {
      case ArrayType(et, _) => et match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      case _ => false
    }
    require(ok, s"TokenBin.write: column '$colName' must be an array of " +
      s"integral token counts/ids (got ${df.schema(colName).dataType.simpleString})")
  }

  /** Write one `.bin` + `.idx` pair per shard under `dir`. `df` needs a
    * numeric sequence-order column and an integral-array token column
    * (cast losslessly to `array<long>`); empty/null token arrays are
    * dropped (a zero-token sequence has no trainable content and several
    * consumers reject zero sizes). `fragsCol`, when given, is the
    * per-row fragment geometry (see the object scaladoc) — a null/empty
    * fragment array means "one fragment", i.e. an unsplit sequence.
    */
  def write(df: DataFrame, seqCol: String, tokensCol: String, dir: String,
      shards: Int, dtype: String = "uint16",
      fragsCol: String = null): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    // a string seq column would cast to null and the null filter below
    // would silently drop EVERY row — an empty "successful" write (the
    // Corpus.requireNumericKey failure class).
    require(df.schema(seqCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"TokenBin.write: column '$seqCol' must be numeric " +
        s"(got ${df.schema(seqCol).dataType.simpleString})")
    requireIntegralArray(df, tokensCol)
    if (fragsCol != null) requireIntegralArray(df, fragsCol)
    val width = widthOf(dtype)
    val code = codeOf(dtype)
    val maxTok = if (dtype == "uint16") 65535L else Int.MaxValue.toLong
    val spark = df.sparkSession
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(out)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val fragsExpr =
      if (fragsCol == null) lit(null).cast("array<long>")
      else col(fragsCol).cast("array<long>")
    val keyed = df
      .select(col(seqCol).cast("long").as("seq"),
        col(tokensCol).cast("array<long>").as("toks"),
        fragsExpr.as("frags"))
      // a null order key belongs to no shard; empty/null token arrays
      // have no trainable content (several consumers reject 0 sizes)
      .where(col("seq").isNotNull && col("toks").isNotNull &&
        size(col("toks")) >= 1)
      .rdd.map { r =>
        ((java.lang.Math.floorMod(r.getLong(0), shards.toLong), r.getLong(0)),
          (r.getSeq[Long](1), if (r.isNullAt(2)) null else r.getSeq[Long](2)))
      }
      .repartitionAndSortWithinPartitions(new Partitioner {
        override def numPartitions: Int = shards
        override def getPartition(key: Any): Int =
          key.asInstanceOf[(Long, Long)]._1.toInt
      })
    val manifestRows = keyed.mapPartitionsWithIndex { (pid, it) =>
      val conf = confBc.value.value
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val binFinal = new Path(dir, f"part-$pid%05d.bin")
      val idxFinal = new Path(dir, f"part-$pid%05d.idx")
      val binTmp = new Path(dir, f".part-$pid%05d.bin.tmp-a$attempt")
      val idxTmp = new Path(dir, f".part-$pid%05d.idx.tmp-a$attempt")
      val pfs = org.apache.hadoop.fs.FileSystem.newInstance(binFinal.toUri, conf)
      try {
        pfs.setWriteChecksum(false)
        pfs.setVerifyChecksum(false)
        val sizes = new scala.collection.mutable.ArrayBuffer[Int]()
        // entry index at each input row's start — the document index
        // groups a row's fragments back into its packed sequence
        val docStarts = new scala.collection.mutable.ArrayBuffer[Long]()
        var nTokens = 0L
        var prevSeq = Long.MinValue
        var firstRow = true
        val bin = new java.io.BufferedOutputStream(pfs.create(binTmp, true), 1 << 16)
        try {
          val b = new Array[Byte](4)
          it.foreach { case ((_, seq), (toks, fragsOrNull)) =>
            // duplicate seq values would sort arrival-order-dependently
            // and break the byte-determinism contract silently — the
            // in-shard sort makes the check one comparison.
            require(firstRow || seq > prevSeq,
              s"duplicate sequence id $seq — the order key must be unique " +
                "for byte-deterministic shards")
            prevSeq = seq; firstRow = false
            val frags: Seq[Long] =
              if (fragsOrNull == null || fragsOrNull.isEmpty)
                Seq(toks.length.toLong)
              else fragsOrNull
            // a fragment table that does not tile the tokens would write
            // entry boundaries into the MIDDLE of documents — corrupting
            // every attention reset downstream, silently
            require(frags.forall(_ >= 1L) && frags.sum == toks.length.toLong,
              s"fragment geometry for sequence $seq does not tile its " +
                s"tokens (fragments sum ${frags.sum} over ${frags.length} " +
                s"entries vs ${toks.length} tokens)")
            docStarts += sizes.length.toLong
            toks.foreach { t =>
              require(t >= 0L && t <= maxTok,
                s"token id $t in sequence $seq outside $dtype range [0, $maxTok]")
              b(0) = (t & 0xff).toByte
              b(1) = ((t >> 8) & 0xff).toByte
              if (width == 4) { b(2) = ((t >> 16) & 0xff).toByte
                b(3) = ((t >> 24) & 0xff).toByte }
              bin.write(b, 0, width)
            }
            frags.foreach(f => sizes += f.toInt)
            nTokens += toks.length
          }
        } finally bin.close()
        val idx = new java.io.BufferedOutputStream(pfs.create(idxTmp, true), 1 << 16)
        try {
          val w = new java.io.DataOutputStream(idx)
          def u64(v: Long): Unit = { // little-endian
            var i = 0
            while (i < 8) { w.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
          }
          def i32(v: Int): Unit = {
            var i = 0
            while (i < 4) { w.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
          }
          w.write(Magic)
          u64(1L)
          w.write(code.toInt)
          u64(sizes.length.toLong)
          u64(docStarts.length.toLong + 1)
          sizes.foreach(i32)
          var ptr = 0L
          sizes.foreach { s => u64(ptr); ptr += s.toLong * width }
          docStarts.foreach(u64)
          u64(sizes.length.toLong)
          w.flush()
        } finally idx.close()
        pfs.delete(binFinal, false); pfs.delete(idxFinal, false)
        require(pfs.rename(binTmp, binFinal), s"rename failed: $binFinal")
        require(pfs.rename(idxTmp, idxFinal), s"rename failed: $idxFinal")
        Iterator(Row(binFinal.toString, sizes.length.toLong, nTokens,
          nTokens * width))
      } finally pfs.close()
    }.collect()
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifestRows.toIndexedSeq, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("n_sequences", LongType, nullable = false),
        StructField("n_tokens", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false))))
  }

  final case class TokenSeq(path: String, seq_idx: Long,
      tokens: Seq[Long], ok: Boolean, doc: Long = 0L)

  /** Read `.bin`/`.idx` shard pairs back with the quarantine contract: a
    * shard whose index is malformed (bad magic/version/dtype), whose
    * pointers disagree with its sizes, whose document index is not a
    * monotone 0→N entry grouping, or whose `.bin` length does not
    * equal the index's total — and a `.idx` missing its `.bin` or vice
    * versa — yields ONE `ok = false` row for the shard instead of
    * throwing or fabricating token ids; intact shards emit one row per
    * ENTRY with `tokens` widened to long and `doc` the document-index
    * group the entry belongs to (for degenerate 0..N indices, `doc` =
    * `seq_idx` — the historical one-doc-per-sequence reading). Both
    * halves of a shard materialize in one task (the [[Warc.read]]
    * whole-shard contract, bounded by producer shard size).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "part-*")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .filter(pc => pc._1.endsWith(".bin") || pc._1.endsWith(".idx"))
      .groupByKey(pc => pc._1.stripSuffix(".bin").stripSuffix(".idx"))
      .flatMapGroups { (stem, it) =>
        var idx: Array[Byte] = null
        var bin: Array[Byte] = null
        it.foreach { case (p, b) =>
          if (p.endsWith(".idx")) idx = b else bin = b
        }
        if (idx == null)
          Iterator(TokenSeq(stem, 0L, null, ok = false))
        else
          // binaryFile skips ZERO-BYTE files, so a valid empty shard
          // (0 sequences, 0-byte .bin) arrives idx-only — hand the
          // parser an empty payload instead of quarantining it; a
          // non-empty index with a genuinely missing .bin still fails
          // the total-bytes check inside.
          parseShard(stem, idx,
            if (bin == null) Array.emptyByteArray else bin)
      }
      .toDF()
  }

  private def parseShard(stem: String, idx: Array[Byte],
      bin: Array[Byte]): Iterator[TokenSeq] = {
    val quarantine = Iterator(TokenSeq(stem, 0L, null, ok = false))
    try {
      val buf = java.nio.ByteBuffer.wrap(idx)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](Magic.length)
      if (idx.length < Magic.length + 8 + 1 + 16) return quarantine
      buf.get(magic)
      if (!java.util.Arrays.equals(magic, Magic)) return quarantine
      if (buf.getLong() != 1L) return quarantine
      val code = buf.get()
      val width = code match { case 8 => 2; case 4 => 4; case _ => return quarantine }
      val n = buf.getLong()
      val nDoc = buf.getLong()
      if (n < 0 || n > Int.MaxValue || nDoc < 1 || nDoc > n + 1) return quarantine
      // the index must be exactly header + sizes + pointers + doc_idx
      if (idx.length.toLong != Magic.length + 8 + 1 + 16 +
        4L * n + 8L * n + 8L * nDoc) return quarantine
      val sizes = new Array[Int](n.toInt)
      var i = 0
      while (i < n) { sizes(i) = buf.getInt(); i += 1 }
      // pointers must be the exclusive prefix sum of size·width, and the
      // data file exactly the total — trust nothing, verify everything
      var expect = 0L
      i = 0
      while (i < n) {
        if (sizes(i) < 0 || buf.getLong() != expect) return quarantine
        expect += sizes(i).toLong * width
        i += 1
      }
      if (bin.length.toLong != expect) return quarantine
      // document index: monotone entry grouping from 0 to n — the
      // degenerate 0..n form AND the fragment-grouped form both pass;
      // anything else (out of range, decreasing, wrong endpoints) is a
      // lie about document boundaries and quarantines the shard
      val docIdx = new Array[Long](nDoc.toInt)
      i = 0
      while (i < nDoc) { docIdx(i.toInt) = buf.getLong(); i += 1 }
      if (docIdx(0) != 0L || docIdx(nDoc.toInt - 1) != n) return quarantine
      i = 1
      while (i < nDoc) {
        if (docIdx(i.toInt) < docIdx(i.toInt - 1)) return quarantine
        i += 1
      }
      val data = java.nio.ByteBuffer.wrap(bin)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var docCursor = 0
      Iterator.tabulate(n.toInt) { s =>
        val toks = new Array[Long](sizes(s))
        var j = 0
        while (j < sizes(s)) {
          toks(j) =
            if (width == 2) (data.getShort() & 0xffff).toLong
            else data.getInt().toLong
          j += 1
        }
        // advance past empty groups to the group containing entry s
        while (docCursor + 1 < nDoc.toInt && docIdx(docCursor + 1) <= s) docCursor += 1
        TokenSeq(stem, s.toLong, toks.toIndexedSeq, ok = true, doc = docCursor.toLong)
      }
    } catch { case scala.util.control.NonFatal(_) => quarantine }
  }
}
