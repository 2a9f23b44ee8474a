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
  *     u8 dtype code, u64 sequence count N, u64 document-index length
  *     N+1, then N i32 sequence LENGTHS (token counts), N i64 byte
  *     POINTERS into the `.bin` (exclusive prefix sum of length·width),
  *     and N+1 i64 document indices (0..N — one document per sequence;
  *     packed sequences ARE the documents at this layer).
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

  /** Write one `.bin` + `.idx` pair per shard under `dir`. `df` needs a
    * numeric sequence-order column and an `array<long>` token column;
    * empty/null token arrays are dropped (a zero-token sequence has no
    * trainable content and several consumers reject zero sizes).
    */
  def write(df: DataFrame, seqCol: String, tokensCol: String, dir: String,
      shards: Int, dtype: String = "uint16"): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    // a string seq column would cast to null and the null filter below
    // would silently drop EVERY row — an empty "successful" write (the
    // Corpus.requireNumericKey failure class).
    require(df.schema(seqCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"TokenBin.write: column '$seqCol' must be numeric " +
        s"(got ${df.schema(seqCol).dataType.simpleString})")
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
    val keyed = df
      .select(col(seqCol).cast("long").as("seq"), col(tokensCol).as("toks"))
      // a null order key belongs to no shard; empty/null token arrays
      // have no trainable content (several consumers reject 0 sizes)
      .where(col("seq").isNotNull && col("toks").isNotNull &&
        size(col("toks")) >= 1)
      .rdd.map { r =>
        ((java.lang.Math.floorMod(r.getLong(0), shards.toLong), r.getLong(0)),
          r.getSeq[Long](1))
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
        var nTokens = 0L
        var prevSeq = Long.MinValue
        var firstRow = true
        val bin = new java.io.BufferedOutputStream(pfs.create(binTmp, true), 1 << 16)
        try {
          val b = new Array[Byte](4)
          it.foreach { case ((_, seq), toks) =>
            // duplicate seq values would sort arrival-order-dependently
            // and break the byte-determinism contract silently — the
            // in-shard sort makes the check one comparison.
            require(firstRow || seq > prevSeq,
              s"duplicate sequence id $seq — the order key must be unique " +
                "for byte-deterministic shards")
            prevSeq = seq; firstRow = false
            toks.foreach { t =>
              require(t >= 0L && t <= maxTok,
                s"token id $t in sequence $seq outside $dtype range [0, $maxTok]")
              b(0) = (t & 0xff).toByte
              b(1) = ((t >> 8) & 0xff).toByte
              if (width == 4) { b(2) = ((t >> 16) & 0xff).toByte
                b(3) = ((t >> 24) & 0xff).toByte }
              bin.write(b, 0, width)
            }
            sizes += toks.length
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
          u64(sizes.length.toLong + 1)
          sizes.foreach(i32)
          var ptr = 0L
          sizes.foreach { s => u64(ptr); ptr += s.toLong * width }
          (0 to sizes.length).foreach(i => u64(i.toLong))
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
      tokens: Seq[Long], ok: Boolean)

  /** Read `.bin`/`.idx` shard pairs back with the quarantine contract: a
    * shard whose index is malformed (bad magic/version/dtype), whose
    * pointers disagree with its sizes, or whose `.bin` length does not
    * equal the index's total — and a `.idx` missing its `.bin` or vice
    * versa — yields ONE `ok = false` row for the shard instead of
    * throwing or fabricating token ids; intact shards emit one row per
    * sequence with `tokens` widened to long. Both halves of a shard
    * materialize in one task (the [[Warc.read]] whole-shard contract,
    * bounded by producer shard size).
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
      if (n < 0 || n > Int.MaxValue || nDoc != n + 1) return quarantine
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
      i = 0
      while (i <= n) { if (buf.getLong() != i.toLong) return quarantine; i += 1 }
      val data = java.nio.ByteBuffer.wrap(bin)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Iterator.tabulate(n.toInt) { s =>
        val toks = new Array[Long](sizes(s))
        var j = 0
        while (j < sizes(s)) {
          toks(j) =
            if (width == 2) (data.getShort() & 0xffff).toLong
            else data.getInt().toLong
          j += 1
        }
        TokenSeq(stem, s.toLong, toks.toIndexedSeq, ok = true)
      }
    } catch { case scala.util.control.NonFatal(_) => quarantine }
  }
}
