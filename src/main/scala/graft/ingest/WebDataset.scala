package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset `.tar` shard export/import — the shard convention the
  * multimodal trainer ecosystem consumes (image-text-pair corpora ship
  * as plain POSIX-ustar tar archives whose members group by sample key:
  * one `{key}.{ext}` member per part of the sample; the webdataset
  * loader, Python's `tarfile` and plain `tar` all read them).
  * Completes the trainer hand-off family next to [[TfRecords]],
  * [[TokenBin]] (Megatron .bin/.idx), [[SafeTensors]] and [[Jsonl]].
  *
  * Dependency-free: a USTAR header is 512 bytes of fixed-offset fields
  * (name 100, mode 8, uid 8, gid 8, size 12 octal, mtime 12 octal,
  * chksum 8, typeflag 1, linkname 100, magic "ustar"+NUL, version "00",
  * uname 32, gname 32, devmajor 8, devminor 8, prefix 155), member data
  * padded to 512, archive terminated by two zero blocks — header
  * assembly in the Xlsx/PDF discipline, spec-pinned byte for byte.
  * Exports are byte-deterministic: mode 0644, uid/gid 0, mtime 0 (data
  * over wall clock — the [[Warc.write]] date stance), samples
  * hash-partitioned by key and key-sorted within each shard so a
  * sample's members are adjacent (the WebDataset grouping rule).
  *
  * Quarantine contract ([[TfRecords]]/[[Jsonl]]): a torn header, a bad
  * header checksum or a truncated member stops THAT file's parse with
  * one `ok = false` row; nothing kills a task. Foreign-tar realities
  * the reader handles: USTAR `prefix` paths, directory/link members
  * (skipped, cursor advances), a missing final zero-block terminator
  * (tolerated at exact end-of-file, stated).
  */
object WebDataset {

  /** One USTAR member: 512-byte header + data padded to 512. */
  private[ingest] def tarMember(name: String, data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length >= 1 && nameB.length <= 100,
      s"tar member name must be 1..100 bytes: '$name'")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("ISO-8859-1")
      System.arraycopy(b, 0, h, off, b.length)
    }
    // NUL-terminated zero-padded octal, the POSIX numeric form
    def putOct(off: Int, width: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      require(s.length <= width - 1, s"octal field overflow: $v")
      put(off, "0" * (width - 1 - s.length) + s)
      h(off + width - 1) = 0
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    putOct(100, 8, 0x1a4L) // mode 0644
    putOct(108, 8, 0L) // uid
    putOct(116, 8, 0L) // gid
    putOct(124, 12, data.length.toLong)
    putOct(136, 12, 0L) // mtime 0 — deterministic by design
    h(156) = '0'.toByte // typeflag: regular file
    put(257, "ustar") // h(262) stays NUL
    put(263, "00")
    putOct(329, 8, 0L) // devmajor
    putOct(337, 8, 0L) // devminor
    // checksum: sum of the header with the chksum field read as spaces,
    // stored as 6 octal digits + NUL + space
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    put(148, "0" * (6 - cs.length) + cs)
    h(154) = 0
    h(155) = ' '.toByte
    val pad = (512 - data.length % 512) % 512
    h ++ data ++ new Array[Byte](pad)
  }

  /** Appends the two terminating zero blocks on close — the per-shard
    * footer [[ShardSink]]'s whole-file hook makes possible.
    */
  private final class TarTerminatingStream(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
    override def close(): Unit = {
      out.write(new Array[Byte](1024))
      super.close()
    }
  }

  /** Write one SAMPLE per row as consecutive `{key}.{ext}` members:
    * `parts` maps extension → column (binary or string; a null part is
    * skipped for that sample, the WebDataset optional-field rule).
    * Samples hash-partition by key into `shards` tars and sort by key
    * within each shard — a sample's members are adjacent and the export
    * is byte-deterministic. Keys should be unique per sample (stated:
    * duplicate keys write duplicate member names, which tar tools
    * accept but [[readSamples]] resolves first-wins). Returns the
    * [[ShardSink]] manifest (file, n_records = samples, n_bytes of tar
    * framing).
    *
    * Scale: member assembly is per-row CPU inside the write task; the
    * repartition is the one shuffle. `shards` ~ corpus_bytes / 256 MB,
    * the [[TfRecords.write]] sizing rule.
    */
  def write(df: DataFrame, keyCol: Column, parts: Seq[(String, Column)],
      dir: String, shards: Int): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    require(parts.nonEmpty, "at least one part extension is required")
    require(parts.map(_._1).distinct.size == parts.size,
      "duplicate part extensions")
    val spark = df.sparkSession
    import spark.implicits._
    val exts = parts.map(_._1)
    val keyed = df.select(keyCol.cast("string").as("__key") +:
        parts.map { case (ext, c) => c.cast("binary").as(s"__p_$ext") }: _*)
      .where(col("__key").isNotNull)
      .repartition(shards, col("__key"))
      .sortWithinPartitions("__key")
    val framed = keyed.map { row =>
      val key = row.getString(0)
      val bos = new java.io.ByteArrayOutputStream()
      exts.zipWithIndex.foreach { case (ext, i) =>
        if (!row.isNullAt(i + 1))
          bos.write(tarMember(s"$key.$ext", row.getAs[Array[Byte]](i + 1)))
      }
      bos.toByteArray
    }.toDF("frame").where(length(col("frame")) > 0)
    ShardSink.write(framed, dir, ".tar",
      os => new TarTerminatingStream(os),
      (os, b) => os.write(b))
  }

  /** NUL-terminated (or field-long) string field. */
  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    val max = off + len
    while (e < max && b(e) != 0) e += 1
    new String(b, off, e - off, "UTF-8")
  }

  /** POSIX octal numeric field: leading spaces tolerated, digits 0-7,
    * NUL/space terminated. −1 on anything else (quarantine signal).
    */
  private def oct(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val max = off + len
    while (i < max && b(i) == ' '.toByte) i += 1
    var v = 0L
    var any = false
    while (i < max && b(i) >= '0'.toByte && b(i) <= '7'.toByte) {
      v = v * 8 + (b(i) - '0'.toByte); any = true; i += 1
    }
    if (!any) return -1L
    if (i < max && b(i) != 0 && b(i) != ' '.toByte) -1L else v
  }

  /** Walk one tar archive: (member_idx, Some(name, data)) per REGULAR
    * file member; directory/link/other typeflags advance the cursor and
    * emit nothing; the first zero block (or exact end-of-file) ends the
    * walk cleanly; any malformed header, checksum mismatch or truncated
    * member emits one `(idx, None)` and stops.
    */
  private[ingest] def parseTar(bytes: Array[Byte])
      : Seq[(Long, Option[(String, Array[Byte])])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[(String, Array[Byte])])]
    def zeroBlock(p: Int): Boolean = {
      var i = p
      val e = p + 512
      while (i < e) { if (bytes(i) != 0) return false; i += 1 }
      true
    }
    var pos = 0L
    var idx = 0L
    var stop = false
    while (!stop) {
      if (pos + 512 > bytes.length) {
        // a proper archive ends in zero blocks; running out EXACTLY at
        // the end is a tolerated missing terminator, mid-header is torn
        if (pos != bytes.length) { out += ((idx, None)) }
        stop = true
      } else if (zeroBlock(pos.toInt)) stop = true
      else {
        val p = pos.toInt
        val stored = oct(bytes, p + 148, 8)
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toByte & 0xffL
                  else bytes(p + i) & 0xffL)
          i += 1
        }
        val size = oct(bytes, p + 124, 12)
        if (stored < 0 || size < 0 || stored != sum) {
          out += ((idx, None)); stop = true
        } else {
          val dataEnd = pos + 512 + size
          if (dataEnd > bytes.length) { out += ((idx, None)); stop = true }
          else {
            val tf = bytes(p + 156)
            if (tf == '0'.toByte || tf == 0.toByte) {
              val prefix = str(bytes, p + 345, 155)
              val base = str(bytes, p, 100)
              val name = if (prefix.isEmpty) base else s"$prefix/$base"
              out += ((idx, Some((name, java.util.Arrays.copyOfRange(
                bytes, p + 512, dataEnd.toInt)))))
              idx += 1
            }
            pos = (dataEnd + 511) / 512 * 512
          }
        }
      }
    }
    out.toSeq
  }

  /** Read tar shards back: one row per regular-file member —
    * (file, member_idx, key, ext, payload, ok). key/ext split at the
    * FIRST dot of the member's basename (the WebDataset rule:
    * `a/b.seg.png` → key `a/b`, ext `seg.png`). One whole shard
    * materializes per task (binaryFile semantics — bounded by the shard
    * size the writer chose).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseTar(bytes).map {
          case (idx, Some((name, data))) =>
            val slash = name.lastIndexOf('/')
            val dot = name.indexOf('.', slash + 1)
            val (k, e) =
              if (dot < 0) (name, "")
              else (name.substring(0, dot), name.substring(dot + 1))
            (path, idx, k, e, data, true)
          case (idx, None) =>
            (path, idx, null: String, null: String,
              null: Array[Byte], false)
        }
      }
      .toDF("file", "member_idx", "key", "ext", "payload", "ok")
  }

  /** Pivot [[read]] rows to one row per SAMPLE: (file, key, one binary
    * column per requested extension — null when that part is absent).
    * Quarantined rows are EXCLUDED here; audit them via [[read]]'s `ok`
    * before trusting a pivot (the readExamples stance).
    */
  def readSamples(spark: SparkSession, dir: String,
      exts: Seq[String]): DataFrame = {
    require(exts.nonEmpty, "at least one extension is required")
    val aggs = exts.map(e =>
      first(when(col("ext") === e, col("payload")), ignoreNulls = true).as(e))
    read(spark, dir).where(col("ok"))
      .groupBy(col("file"), col("key"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
