package graft.ingest

import org.apache.spark.sql.DataFrame

/** Physical parquet layout for POINT-LOOKUP-heavy state tables — the
  * storage-level sibling of the Z-order key ([[graft.functions]]
  * BitInterleave serves min-max RANGE skipping; this serves EQUALITY
  * skipping): per-row-group split-block bloom filters written into the
  * parquet footers, so a scan with `key = x` / `key IN (...)` predicates
  * skips row groups whose filter rules the key out — without sorting,
  * without bucketing, composable with both.
  *
  * Where it matters at 100 TB: the incremental-dedup and CDC probes
  * (yesterday's corpus probed by today's batch on content hashes), the
  * frontier/seen-set tables keyed by url, and any ledger keyed by doc id
  * — point probes against tables that are written once and probed many
  * times, where reading every row group to find one key is the dominant
  * I/O. Min-max stats are useless on hash-distributed keys (every row
  * group spans the whole range); bloom filters are built for exactly
  * that shape.
  *
  * `ndv` sizes the filter (parquet's split-block bloom: bits ≈ ndv ·
  * 10.7 for ~1% fp) — size it to the PER-ROW-GROUP distinct count, not
  * the table's. Reading back requires nothing special: Spark's parquet
  * reader consults the filters automatically when
  * `spark.sql.parquet.filterPushdown` is on (default).
  *
  * This is a WRITE-SIDE knob on the engine's own parquet writer (no
  * custom format): the spec verifies the filters are REALLY in the
  * footers (offset present for bloom columns, absent otherwise) and
  * that they adjudicate membership correctly via parquet's own reader.
  */
object Layout {

  /** Write `df` as parquet at `dir` with bloom filters on `bloomCols`. */
  def writeWithBloomFilters(df: DataFrame, dir: String,
      bloomCols: Seq[String], ndv: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty, "pass at least one bloom column")
    val missing = bloomCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"bloom columns absent from the frame: ${missing.mkString(", ")}")
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(dir)
  }
}
