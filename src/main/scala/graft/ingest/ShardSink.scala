package graft.ingest

import java.io.OutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The shared distributed shard writer under [[TfRecords.write]] and
  * [[Warc.write]]: one file per partition through the Hadoop FileSystem
  * API (file://, HDFS, object stores), no driver funnel — only the
  * shards-sized manifest returns.
  *
  * Invariants every format sink gets for free here:
  *
  *   - the session's Hadoop conf rides a broadcast to executors, so
  *     per-job FS credentials reach the writer;
  *   - tmp names are ATTEMPT-unique (task attempt id), so a speculative
  *     twin or zombie retry can never interleave into the winner's file,
  *     and only the finishing attempt renames into place (tmp names are
  *     dot-hidden: no file index or glob ever lists a leftover loser);
  *   - client-side checksumming is off — shard dirs are release
  *     artifacts other tools list, no Hadoop `.crc` sidecars;
  *   - the write happens EAGERLY and exactly once (the manifest collect
  *     is the action), never re-run by later manifest consumption.
  */
private[ingest] object ShardSink {

  private val statsSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("n_records", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Write `framed` (a single binary column, already repartitioned to the
    * desired shard count) as `part-NNNNN$ext` files under `dir`.
    * `wholeFile` wraps the raw file stream once (whole-file gzip or
    * identity); `perRecord` appends one row's bytes (a per-record gzip
    * member wraps here). Returns the (file, n_records, n_bytes) manifest;
    * n_bytes counts the raw record bytes handed to `perRecord`.
    */
  def write(framed: DataFrame, dir: String, ext: String,
      wholeFile: OutputStream => OutputStream,
      perRecord: (OutputStream, Array[Byte]) => Unit): DataFrame = {
    val spark = framed.sparkSession
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(out)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val manifestRows = framed.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = confBc.value.value
      val finalPath = new Path(dir, f"part-$pid%05d$ext")
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmpPath = new Path(dir, f".part-$pid%05d$ext.tmp-a$attempt")
      val pfs = org.apache.hadoop.fs.FileSystem.newInstance(
        finalPath.toUri, conf)
      try {
        pfs.setWriteChecksum(false)
        pfs.setVerifyChecksum(false)
        val raw = pfs.create(tmpPath, true)
        val os = wholeFile(raw)
        var n = 0L
        var bytes = 0L
        try {
          it.foreach { row =>
            val b = row.getAs[Array[Byte]](0)
            perRecord(os, b)
            n += 1
            bytes += b.length
          }
        } finally os.close()
        pfs.delete(finalPath, false)
        require(pfs.rename(tmpPath, finalPath), s"rename failed: $finalPath")
        Iterator(Row(finalPath.toString, n, bytes))
      } finally pfs.close()
    }.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifestRows.toIndexedSeq, 1), statsSchema)
  }
}
