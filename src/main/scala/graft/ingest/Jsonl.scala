package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL corpus I/O — the interchange format LLM corpora actually ship in
  * (one JSON object per line, usually gzip parts). The reference's ingest
  * surface is spreadsheets ([[Workbook]]); a training-data engine also
  * has to EXCHANGE corpora with the outside world, and at 100 TB that
  * means: never die on a torn line (a crawler flush mid-object is
  * guaranteed somewhere in a billion lines), quarantine it with enough
  * context to debug, and write shard-partitioned compressed parts any
  * other engine can read (the interop oracle reads our parts back with
  * DuckDB's JSON reader and hash-matches).
  */
object Jsonl {

  /** The reserved corrupt-capture column. */
  private val CorruptCol = "__corrupt"

  /** Read a JSONL file/directory with corrupt-line quarantine: returns
    * (good, quarantine) where `good` carries the parsed columns and
    * `quarantine` one `raw_line` string column. PERMISSIVE parse — a
    * torn/invalid line lands in the quarantine, it never kills the job.
    *
    * `schema`: pass the expected schema for production reads (one pass,
    * no inference job, missing fields null — the schema-on-read
    * contract); None infers from the data (a second pass over the
    * files — fine interactively, not on 100 TB). Inference with any
    * malformed line present appends Spark's SESSION default
    * corrupt-record column (`spark.sql.columnNameOfCorruptRecord`,
    * normally `_corrupt_record`) to the inferred schema; it is dropped
    * here — otherwise it rides along as a mostly-null data column in
    * `good`, duplicating the quarantine — and both it and `__corrupt`
    * are reserved names an explicit schema must not use.
    *
    * The parsed frame is materialized ONCE (eager localCheckpoint)
    * before the good/quarantine split: Spark refuses a filter on only
    * the corrupt-capture column of a streaming-parsed relation
    * (internal-column pushdown limitation), and the two consumers would
    * otherwise re-parse the files twice anyway. localCheckpoint, not
    * cache: no pinned storage entry to leak across repeated corpus
    * reads in one session — the blocks are released by the
    * ContextCleaner as soon as the returned frames become unreachable,
    * with no unpersist bookkeeping for the caller. The materialization
    * is corpus-sized: at the 100 TB end, read shard directories
    * individually (the release layout [[write]] produces) rather than
    * the whole corpus in one call.
    *
    * FAULT-TOLERANCE TRADE (explicit): localCheckpoint truncates lineage
    * WITHOUT replication — lose an executor holding checkpoint blocks
    * and the read fails (cache() would transparently recompute; a
    * reliable `sparkContext.setCheckpointDir` checkpoint would survive).
    * That is the right default for the shard-at-a-time ingest cadence
    * above (a failed shard read re-runs one bounded call); for a
    * long-lived multi-stage job over one giant read, either re-read per
    * stage or copy the parse to a reliable store first.
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): (DataFrame, DataFrame) = {
    val sessionCorrupt =
      spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    val dataSchema = schema.getOrElse(StructType(
      spark.read.json(path).schema.fields.filterNot(_.name == sessionCorrupt)))
    Seq(CorruptCol, sessionCorrupt).foreach(reserved =>
      require(!dataSchema.fieldNames.contains(reserved),
        s"schema must not contain reserved column $reserved"))
    val full = StructType(dataSchema.fields :+ StructField(CorruptCol, StringType))
    val parsed = spark.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .localCheckpoint(true)
    val good = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantine)
  }

  /** STREAMING JSONL ingestion — files LAND in a directory (the crawler /
    * vendor-drop reality) and the pipeline absorbs each new file as a
    * micro-batch: feed the result straight into
    * [[graft.streaming.EventStream.indexStream]] /
    * `curationStream` / `dedupStream`. A schema is mandatory (streams
    * cannot infer), and the corrupt-capture column comes back AS A
    * COLUMN (`corrupt_line`, null for clean rows): a stream cannot be
    * split into two cached branches the way [[read]] splits, so the
    * caller routes inside its foreachBatch —
    * `batch.filter('corrupt_line.isNull)` onward,
    * `batch.filter('corrupt_line.isNotNull)` to the quarantine table.
    * Torn lines still never kill the job.
    */
  def readStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain reserved column $CorruptCol")
    val full = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    spark.readStream
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .withColumnRenamed(CorruptCol, "corrupt_line")
  }

  /** Write a frame as compressed JSONL parts, optionally partitioned by
    * `shardCol` (one directory per shard — the release layout
    * [[graft.llmops.Corpus.tokenShards]] + `shardManifest` describe).
    * Gzip by default: splittable-read doesn't matter for line-sized
    * objects consumed part-per-task, and every downstream tool speaks it.
    */
  def write(df: DataFrame, path: String, shardCol: Option[String] = None,
      compression: String = "gzip"): Unit = {
    val w = df.write.mode("overwrite")
      .option("compression", compression)
    shardCol.fold(w)(c => w.partitionBy(c)).json(path)
  }
}
