package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** `safetensors` shards — the HuggingFace tensor-serialization format
  * (public spec: github.com/huggingface/safetensors): 8-byte
  * little-endian u64 header length, a JSON header mapping tensor name →
  * `{dtype, shape, data_offsets}` (offsets relative to the byte buffer
  * that follows, which the tensors must tile exactly), then the raw
  * little-endian tensor bytes. This is the EMBEDDING hand-off next to
  * [[TokenBin]]'s token hand-off: exported vectors load into
  * torch/numpy/safetensors-js unchanged, and foreign safetensors files
  * (model weights, precomputed embeddings) ingest into the engine's
  * `array<float>` lane.
  *
  * Each shard `part-NNNNN.safetensors` carries two tensors: `ids`
  * (I64, shape `[n]`) and `vectors` (F32, shape `[n, dim]`), row i of
  * `vectors` belonging to `ids[i]`. Sharding is DETERMINISTIC — shard =
  * floorMod(id, shards), ascending id within the shard (explicit
  * `Partitioner`, the [[TokenBin.write]] discipline), duplicate ids fail
  * loudly — so replicas byte-verify against the manifest checksum. The
  * JSON header is serialized deterministically (`__metadata__`, `ids`,
  * `vectors`, in that fixed order; no padding). Floats ship their RAW
  * IEEE-754 bits (`floatToRawIntBits` — byte-faithful for every payload
  * including non-canonical NaNs).
  *
  * Writes fail loudly on bad input (ragged dimensions, duplicate ids);
  * null ids/vectors are dropped up front (no exportable content — the
  * [[TokenBin.write]] rule, stated here rather than silent). Quarantine
  * is the READER's contract, for bytes we did not produce:
  * a file whose header is torn/oversized/malformed JSON, whose dtype is
  * outside the supported set, whose offsets do not tile the buffer,
  * whose shape·width disagrees with its byte extent, or whose
  * `ids`/`vectors` rows disagree, yields ONE `ok = false` row instead of
  * throwing or fabricating values (the [[TokenBin.read]] 5-class
  * precedent). Header numbers parse via the shared MiniJson (doubles —
  * exact to 2^53, i.e. files up to 8 PB; stated, not silent).
  *
  * Scale: one whole shard per task on both sides, bounded by producer
  * shard size; the manifest collect is shards-sized (the [[ShardSink]]
  * bounded-action class).
  */
object SafeTensors {

  /** dtype → element width. The engine WRITES F32/I64; the reader also
    * accepts the other fixed-width numeric dtypes a foreign exporter
    * commonly ships, widened to the engine's long/double lanes by
    * [[readVectors]] only for F32/I64 (its two declared tensors).
    */
  private[ingest] val Widths: Map[String, Int] = Map(
    "F64" -> 8, "F32" -> 4, "F16" -> 2, "BF16" -> 2,
    "I64" -> 8, "I32" -> 4, "I16" -> 2, "I8" -> 1, "U8" -> 1, "BOOL" -> 1)

  private val HeaderCap = 100L << 20 // the spec's 100 MB header bound

  /** The engine's two-tensor header for an `[n, dim]` export — one
    * template for the write tasks AND the driver's empty-shard rewrite
    * (two renderings would drift byte-wise).
    */
  private def vectorHeaderBytes(n: Int, dim: Int): Array[Byte] = {
    val idsEnd = 8L * n
    val vecEnd = idsEnd + 4L * n * dim
    (s"""{"__metadata__":{"format":"graft.vectors.v1"},""" +
      s""""ids":{"dtype":"I64","shape":[$n],"data_offsets":[0,$idsEnd]},""" +
      s""""vectors":{"dtype":"F32","shape":[$n,$dim],"data_offsets":[$idsEnd,$vecEnd]}}""")
      .getBytes("UTF-8")
  }

  /** Write embedding shards: two tensors per shard (`ids` I64 `[n]`,
    * `vectors` F32 `[n, dim]`). All vectors must share one dimension ≥ 1
    * — a ragged export would corrupt the `[n, dim]` geometry silently,
    * so raggedness refuses loudly: within a shard during the write pass
    * itself, across shards on the shards-sized manifest (the written
    * part files are deleted before throwing). The dim check rides the
    * single write pass — no separate validation scan over the data.
    * Returns the per-shard manifest (file, n_rows, dim, n_bytes,
    * content_md5); empty shards declare `[0]`/`[0, dim]` with the
    * export's agreed dimension.
    */
  def writeVectors(df: DataFrame, idCol: String, vecCol: String,
      dir: String, shards: Int): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"SafeTensors.writeVectors: column '$idCol' must be numeric " +
        s"(got ${df.schema(idCol).dataType.simpleString})")
    val vecOk = df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    require(vecOk, s"SafeTensors.writeVectors: column '$vecCol' must be " +
      s"array<float|double> (got ${df.schema(vecCol).dataType.simpleString})")
    val spark = df.sparkSession
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(out)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val keyed = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .where(col("id").isNotNull && col("vec").isNotNull)
      .rdd.map(r => ((java.lang.Math.floorMod(r.getLong(0), shards.toLong),
        r.getLong(0)), r.getSeq[Float](1)))
      .repartitionAndSortWithinPartitions(new Partitioner {
        override def numPartitions: Int = shards
        override def getPartition(key: Any): Int =
          key.asInstanceOf[(Long, Long)]._1.toInt
      })
    val manifestRows = keyed.mapPartitionsWithIndex { (pid, it) =>
      val conf = confBc.value.value
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val fin = new Path(dir, f"part-$pid%05d.safetensors")
      val tmp = new Path(dir, f".part-$pid%05d.safetensors.tmp-a$attempt")
      val pfs = org.apache.hadoop.fs.FileSystem.newInstance(fin.toUri, conf)
      try {
        pfs.setWriteChecksum(false)
        pfs.setVerifyChecksum(false)
        val ids = new scala.collection.mutable.ArrayBuffer[Long]()
        val vecBytes = new java.io.ByteArrayOutputStream()
        var prev = Long.MinValue
        var first = true
        // one dimension per shard, derived from the shard's first row —
        // the write pass IS the dim check (no separate full-scan job);
        // cross-shard agreement is enforced on the manifest below.
        var dim = 0
        it.foreach { case ((_, id), vec) =>
          require(first || id > prev,
            s"duplicate id $id — the id column must be unique for " +
              "byte-deterministic shards")
          if (first) {
            dim = vec.length
            require(dim >= 1,
              s"vector for id $id has 0 elements — vectors must share " +
                "ONE dimension >= 1")
          }
          prev = id; first = false
          require(vec.length == dim,
            s"vector for id $id has ${vec.length} elements, expected " +
              s"$dim — vectors must share ONE dimension >= 1")
          ids += id
          val b = new Array[Byte](4)
          vec.foreach { f =>
            val bits = java.lang.Float.floatToRawIntBits(f)
            b(0) = (bits & 0xff).toByte
            b(1) = ((bits >> 8) & 0xff).toByte
            b(2) = ((bits >> 16) & 0xff).toByte
            b(3) = ((bits >> 24) & 0xff).toByte
            vecBytes.write(b, 0, 4)
          }
        }
        val n = ids.length
        val vecEnd = 8L * n + 4L * n * dim
        val header = vectorHeaderBytes(n, dim)
        val md = java.security.MessageDigest.getInstance("MD5")
        val outS = new java.io.BufferedOutputStream(pfs.create(tmp, true), 1 << 16)
        try {
          val w = new java.io.ByteArrayOutputStream()
          var i = 0
          while (i < 8) { // u64 LE header length
            w.write(((header.length.toLong >> (8 * i)) & 0xff).toInt); i += 1
          }
          w.write(header)
          ids.foreach { id =>
            var j = 0
            while (j < 8) { w.write(((id >> (8 * j)) & 0xff).toInt); j += 1 }
          }
          val pre = w.toByteArray
          outS.write(pre); md.update(pre)
          val vb = vecBytes.toByteArray
          outS.write(vb); md.update(vb)
        } finally outS.close()
        pfs.delete(fin, false)
        require(pfs.rename(tmp, fin), s"rename failed: $fin")
        val md5 = md.digest().map("%02x".format(_)).mkString
        Iterator(Row(fin.toString, n.toLong, dim.toLong,
          8L + header.length + vecEnd, md5))
      } finally pfs.close()
    }.collect()
    // cross-shard geometry on the SHARDS-SIZED manifest (no data job):
    // non-empty shards must agree on one dim; a ragged export deletes
    // everything it wrote before refusing, an all-empty input likewise.
    val fsOut = org.apache.hadoop.fs.FileSystem.newInstance(out.toUri,
      spark.sparkContext.hadoopConfiguration)
    fsOut.setWriteChecksum(false)
    fsOut.setVerifyChecksum(false)
    val finalRows = try {
    def cleanup(): Unit = manifestRows.foreach { r =>
      fsOut.delete(new Path(r.getString(0)), false) }
    val shardDims = manifestRows.filter(_.getLong(1) > 0L)
      .map(_.getLong(2)).distinct.sorted
    if (shardDims.isEmpty) {
      cleanup()
      throw new IllegalArgumentException(
        "SafeTensors.writeVectors: no rows to write")
    }
    if (shardDims.length > 1) {
      cleanup()
      throw new IllegalArgumentException(
        s"SafeTensors.writeVectors: vectors must share ONE dimension >= 1 " +
          s"(got ${shardDims.mkString(", ")})")
    }
    val dim = shardDims.head
    // empty shards declared [0, 0] in the task (their dim is unknowable
    // there); rewrite them header-only with the agreed dim so every
    // shard of the export carries one geometry — driver-side FS writes,
    // shards-bounded, never a Spark job.
    manifestRows.map { r =>
      if (r.getLong(1) == 0L && r.getLong(2) != dim) {
        val header = vectorHeaderBytes(0, dim.toInt)
        val bytes = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < 8) {
          bytes.write(((header.length.toLong >> (8 * i)) & 0xff).toInt)
          i += 1
        }
        bytes.write(header)
        val all = bytes.toByteArray
        val p = new Path(r.getString(0))
        // tmp + rename (the task-side write discipline): a crash
        // mid-rewrite must never leave a truncated final shard in
        // place. The tmp name is run-unique (the ShardSink
        // attempt-discriminator rule — this is driver code, so a UUID
        // stands in for taskAttemptId): two concurrent writeVectors
        // calls on one dir can never race on a shared tmp path and
        // fail each other's rename.
        val tmp = new Path(p.getParent,
          s".${p.getName}.rewrite-tmp-${java.util.UUID.randomUUID}")
        // unique names mean a crashed run's tmp is no longer overwritten
        // by the next one — reclaim stale leftovers explicitly
        val stale = fsOut.globStatus(
          new Path(p.getParent, s".${p.getName}.rewrite-tmp-*"))
        if (stale != null) stale.foreach(f => fsOut.delete(f.getPath, false))
        val o = fsOut.create(tmp, true)
        try o.write(all) finally o.close()
        fsOut.delete(p, false)
        require(fsOut.rename(tmp, p), s"rename failed: $p")
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(all).map("%02x".format(_)).mkString
        Row(r.getString(0), 0L, dim, all.length.toLong, md5)
      } else r
    }
    } finally fsOut.close()
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(finalRows.toIndexedSeq, 1),
      StructType(Seq(StructField("file", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("dim", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false),
        StructField("content_md5", StringType, nullable = false))))
  }

  final case class TensorInfo(path: String, tensor: String, dtype: String,
      shape: Seq[Long], n_bytes: Long, ok: Boolean)

  /** Tensor-level manifest of every `*.safetensors` under `dir` — one
    * row per declared tensor for intact files, one `ok = false` row for
    * files that fail any structural check (see the object scaladoc's
    * quarantine classes). This is the generic half; [[readVectors]]
    * materializes the engine's own two-tensor layout.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    binaryFiles(spark, dir).flatMap { case (path, bytes) =>
      parseHeader(bytes) match {
        case Left(_) => Iterator(TensorInfo(path, null, null, null, 0L, ok = false))
        case Right((tensors, _)) => tensors.iterator.map { t =>
          TensorInfo(path, t.name, t.dtype, t.shape,
            t.end - t.start, ok = true)
        }
      }
    }.toDF()
  }

  final case class VecRow(path: String, vec_id: Long,
      embedding: Seq[Float], ok: Boolean)

  /** Read the engine's vector shards back: one (path, vec_id, embedding)
    * row per vector for intact shards; a shard missing either declared
    * tensor, with mismatched row counts, a non-`[n]`/`[n,dim]` geometry,
    * or wrong dtypes quarantines whole (`ok = false`, one row).
    */
  def readVectors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    binaryFiles(spark, dir).flatMap { case (path, bytes) =>
      val quarantine = Iterator(VecRow(path, 0L, null, ok = false))
      parseHeader(bytes) match {
        case Left(_) => quarantine
        case Right((tensors, dataStart)) =>
          val byName = tensors.map(t => t.name -> t).toMap
          (byName.get("ids"), byName.get("vectors")) match {
            case (Some(idsT), Some(vecT))
              if idsT.dtype == "I64" && vecT.dtype == "F32" &&
                idsT.shape.length == 1 && vecT.shape.length == 2 &&
                idsT.shape.head == vecT.shape.head =>
              val n = idsT.shape.head.toInt
              val dim = vecT.shape(1).toInt
              val buf = java.nio.ByteBuffer.wrap(bytes)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              Iterator.tabulate(n) { i =>
                val id = buf.getLong((dataStart + idsT.start + 8L * i).toInt)
                val vec = new Array[Float](dim)
                var j = 0
                val base = (dataStart + vecT.start + 4L * i * dim).toInt
                while (j < dim) { vec(j) = buf.getFloat(base + 4 * j); j += 1 }
                VecRow(path, id, vec.toIndexedSeq, ok = true)
              }
            case _ => quarantine
          }
      }
    }.toDF()
  }

  private def binaryFiles(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.safetensors")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
  }

  private[ingest] final case class Parsed(name: String, dtype: String,
      shape: Seq[Long], start: Long, end: Long)

  /** Structural parse + verification of one file: returns the tensor
    * list (offset-sorted) and the buffer start, or Left(reason). Trust
    * nothing: header bounds, JSON shape, dtype table, shape·width =
    * extent, offsets tile [0, bufferLen] exactly.
    */
  private[ingest] def parseHeader(
      bytes: Array[Byte]): Either[String, (Seq[Parsed], Int)] = {
    try {
      if (bytes.length < 8) return Left("short file")
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val hlen = buf.getLong(0)
      if (hlen < 2 || hlen > HeaderCap || 8L + hlen > bytes.length)
        return Left("bad header length")
      val json = new String(bytes, 8, hlen.toInt, "UTF-8")
      val root = graft.llmops.VocabArtifact.MiniJson.parse(json) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => return Left("header is not a JSON object")
      }
      val dataStart = 8 + hlen.toInt
      val bufferLen = bytes.length.toLong - dataStart
      val tensors = root.toSeq.filter(_._1 != "__metadata__").map {
        case (name, spec0) =>
          val spec = spec0 match {
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            case _ => return Left(s"tensor '$name' spec is not an object")
          }
          val dtype = spec.get("dtype") match {
            case Some(s: String) if Widths.contains(s) => s
            case Some(s: String) => return Left(s"unsupported dtype '$s'")
            case _ => return Left(s"tensor '$name' missing dtype")
          }
          val shape = spec.get("shape") match {
            case Some(v: Vector[_]) if v.forall(_.isInstanceOf[Double]) =>
              v.map(_.asInstanceOf[Double].toLong)
            case _ => return Left(s"tensor '$name' missing shape")
          }
          if (shape.exists(_ < 0)) return Left(s"tensor '$name' negative dim")
          val (start, end) = spec.get("data_offsets") match {
            case Some(v: Vector[_]) if v.length == 2 &&
              v.forall(_.isInstanceOf[Double]) =>
              (v(0).asInstanceOf[Double].toLong, v(1).asInstanceOf[Double].toLong)
            case _ => return Left(s"tensor '$name' missing data_offsets")
          }
          if (start < 0 || end < start || end > bufferLen)
            return Left(s"tensor '$name' offsets out of range")
          val elems = shape.foldLeft(1L)((a, d) => a * d)
          if (end - start != elems * Widths(dtype))
            return Left(s"tensor '$name' extent != shape x width")
          Parsed(name, dtype, shape, start, end)
      }.sortBy(_.start)
      // the tensors must tile the buffer exactly (the spec's no-holes,
      // no-overlap rule) — a gap hides bytes, an overlap aliases them
      var cursor = 0L
      tensors.foreach { t =>
        if (t.start != cursor) return Left("offsets do not tile the buffer")
        cursor = t.end
      }
      if (cursor != bufferLen) return Left("trailing unclaimed bytes")
      Right((tensors, dataStart))
    } catch { case scala.util.control.NonFatal(e) => Left(e.getMessage) }
  }
}
