package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The RVTools-style workbook input contract (SURVEY.md §1.1, FIXTURES.md §A).
  *
  * One DataFrame per sheet; every physical column is a nullable string
  * (`apoc.load.xls(..., {header:true})` yields string-keyed maps,
  * refresh-vmware.cypher:26 et al.). Numeric semantics enter only through
  * explicit casts at use sites (the reference's `toInt`, :146,:184-186).
  *
  * Each sheet additionally carries `_rowno`: the source row order. Cypher
  * streams rows in file order and its eager per-row writes make later rows
  * win on conflicting SET; `_rowno` is the deterministic stand-in that lets
  * the batch engine reproduce that tie-break (SURVEY §2.9 M4, §7.3).
  */
object Workbook {
  val SheetNames: Seq[String] = Seq(
    "vCluster", "vInfo", "vRP", "vHost", "vSwitch", "vPort",
    "vNIC", "vNetwork", "vDatastore", "vDisk", "vPartition", "vSnapshot")

  /** Canonical column sets per sheet (FIXTURES.md §A, verbatim RVTools
    * headers). Used to schema empty frames for missing sheets and to
    * validate on load; extra columns in real exports pass through harmless
    * (the statements select by name).
    */
  val SheetColumns: Map[String, Seq[String]] = Map(
    "vCluster" -> Seq("VI SDK UUID", "VI SDK Server", "Name", "OverallStatus", "TotalCpu",
      "NumCpuCores", "TotalMemory", "HA enabled", "DRS enabled"),
    "vInfo" -> Seq("VI SDK Server", "VI SDK Server type", "VI SDK UUID", "VM UUID", "VM",
      "VM ID", "DNS Name", "PowerOn", "Change Version", "Annotation", "Consolidation Needed",
      "CPUs", "Memory", "NICs", "Disks", "CBT", "HW version", "HW upgrade status",
      "Connection state", "Config status", "Powerstate", "Guest state", "Heartbeat",
      "Resource pool", "Folder", "OS according to the VMware Tools",
      "OS according to the configuration file", "Network #1", "Network #2", "Network #3",
      "Network #4"),
    "vRP" -> Seq("Resource pool", "VI SDK Server", "VI SDK UUID", "# VMs", "# vCPUs",
      "Mem Configured"),
    "vHost" -> Seq("VI SDK Server", "VI SDK UUID", "Cluster", "Object ID", "Host", "NumHosts",
      "# CPU", "# Cores", "# Memory", "Memory usage %", "# VMs", "Assigned License(s)",
      "Max EVC", "Boot time", "Service tag", "Config status",
      "Current CPU power man. policy", "Host Power Policy", "CPU Model", "ESX Version",
      "Vendor", "Model", "BIOS Version", "BIOS Date", "Domain", "NTP Server(s)",
      "DNS Servers"),
    "vSwitch" -> Seq("Host", "Cluster", "VI SDK UUID", "Switch", "# Ports", "Free Ports",
      "Promiscuous Mode", "Mac Changes", "Forged Transmits", "Traffic Shaping",
      "Notify Switch", "MTU", "Offload", "Policy"),
    "vPort" -> Seq("Host", "Cluster", "VI SDK UUID", "Switch", "Port Group", "Policy", "VLAN",
      "Promiscuous Mode", "Mac Changes", "Forged Transmits", "Traffic Shaping"),
    "vNIC" -> Seq("Host", "Cluster", "VI SDK UUID", "Switch", "Network Device", "Driver",
      "Speed", "MAC", "WakeOn", "PCI"),
    "vNetwork" -> Seq("VI SDK Server", "VI SDK UUID", "VM UUID", "Mac Address", "Adapter",
      "Starts Connected", "IP Address", "Network", "Host"),
    "vDatastore" -> Seq("VI SDK UUID", "VI SDK Server", "URL", "Name", "Accessible",
      "Capacity MB", "In Use MB", "Free MB", "# Hosts", "Version", "SIOC enabled", "# VMs",
      "Address", "Config status", "Type", "Hosts"),
    "vDisk" -> Seq("VI SDK UUID", "VI SDK Server", "VM UUID", "Path", "Disk", "Capacity MB",
      "Thin", "Controller", "Disk Mode", "Eagerly Scrub", "Template", "Host"),
    "vPartition" -> Seq("VI SDK Server", "VI SDK UUID", "VM UUID", "Disk", "Capacity MB",
      "Consumed MB", "Free %"),
    "vSnapshot" -> Seq("VI SDK Server", "VI SDK UUID", "VM UUID", "Name", "Description",
      "Date / time", "Size MB (total)"))

  type Sheets = Map[String, DataFrame]

  /** Attach `_rowno` preserving input order — fixture/in-memory path.
    *
    * This is the RDD fallback: `zipWithIndex` forces an extra job and drops
    * the frame out of WholeStageCodegen, so it is reserved for in-memory
    * fixture frames and formats without a native row index (CSV). File-based
    * parquet ingest goes through [[withFileRowNo]] instead, which stays
    * entirely inside codegen.
    */
  def withRowNo(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("_rowno", LongType, nullable = false))
    stripAliases(df.queryExecution.analyzed) match {
      // In-memory fixture frames (LocalRelation): index driver-side and
      // REMAIN a LocalRelation. The rows are already on the driver, so
      // zipWithIndex would only launder them through an opaque RDD scan —
      // which hides emptiness from Catalyst's PropagateEmptyRelation and
      // costs plan analysis + empty-shuffle scheduling on every dead
      // statement subtree (measured ~2x on the 14-statement ingest when
      // 13 sheets are empty fixtures).
      case l: LocalRelation if l.data.isEmpty =>
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      case _: LocalRelation =>
        val indexed = df.collect().zipWithIndex
          .map { case (r, i) => Row.fromSeq(r.toSeq :+ i.toLong) }
        spark.createDataFrame(java.util.Arrays.asList(indexed: _*), schema)
      case _ =>
        val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
        spark.createDataFrame(rdd, schema)
    }
  }

  @annotation.tailrec
  private def stripAliases(p: LogicalPlan): LogicalPlan = p match {
    case s: SubqueryAlias => stripAliases(s.child)
    case other => other
  }

  /** Attach `_rowno` to a parquet file-source frame without leaving codegen.
    *
    * Uses the Spark 4 `_metadata.row_index` metadata column (parquet-only;
    * generated by the scan itself, zero extra I/O) keyed by
    * `_metadata.file_path` for the cross-file order. Per-file base offsets
    * are computed by one lightweight aggregate job that prunes every data
    * column (it touches only constant file metadata), then broadcast back —
    * so the main pass is a single codegen'd scan + BroadcastHashJoin, no RDD
    * round-trip, no lost column pruning downstream. Cross-file order is
    * lexicographic `file_path` + in-file `row_index`; note the old
    * `zipWithIndex` order was scan-split order (files sorted by size desc),
    * so this is strictly *more* deterministic, and identical for the
    * single-file-per-sheet layout the refresh uses.
    *
    * `_rowno` stays dense 0-based like the RDD path, so `Ingest.ord`'s
    * 40-bit packing budget is unchanged.
    */
  def withFileRowNo(df: DataFrame): DataFrame = {
    val meta = df.select(col("*"),
      col("_metadata.file_path").as("_graft_file"),
      col("_metadata.row_index").as("_graft_fidx"))
    // #files rows — the unpartitioned window is a deliberate tiny
    // single-partition pass over file names, never over data.
    val offsets = meta.groupBy("_graft_file").agg(count(lit(1)).as("_graft_cnt"))
      .withColumn("_graft_base",
        coalesce(sum("_graft_cnt").over(
          Window.orderBy("_graft_file").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_graft_file"), col("_graft_base"))
    meta.join(broadcast(offsets), "_graft_file")
      .withColumn("_rowno", col("_graft_base") + col("_graft_fidx"))
      .drop("_graft_file", "_graft_fidx", "_graft_base")
  }

  /** Load a workbook from a directory of one parquet file per sheet
    * (production ingest path). Missing sheets load as empty frames so
    * partial exports don't crash the refresh — matching Cypher's
    * empty-stream behavior. The reference's `apoc.load.xls` becomes this
    * pluggable reader step (SURVEY §2.1 S1): any DataFrameReader that
    * yields all-string sheet frames slots in (CSV below; a real .xlsx
    * reader would too).
    */
  def loadParquetDir(spark: SparkSession, dir: String): Sheets =
    loadDir(spark, dir, "parquet", p => spark.read.parquet(p), codegenRowNo = true)

  /** CSV variant — `{header:true}` exactly like the reference's loader;
    * all columns arrive as nullable strings (inferSchema off by design:
    * the reference's typing is schema-on-read with explicit toInt casts).
    *
    * COMPAT-ONLY, not the production refresh path (PlanSpec pins both
    * sides of this contract). CSVFileFormat does not expose
    * `_metadata.row_index` in Spark 4.1 (only parquet overrides
    * metadataSchemaFields with ROW_INDEX_FIELD), and no codegen
    * replacement exists for a SPLITTABLE format: a split's starting row
    * number cannot be derived declaratively (it needs the row counts of
    * every earlier split of the same file — exactly what row_index
    * provides for parquet and what zipWithIndex's extra job computes
    * here). So this path keeps the RDD fallback: deterministic for the
    * one-file-per-sheet workbook layout (splits of a single CSV file
    * enumerate in offset order), but it forces an extra job and drops
    * the scan out of WholeStageCodegen. A 100 TB ingest must land
    * parquet — or any row-index-bearing format — and take
    * [[loadParquetDir]]; a CSV-sourced bulk ingest would regress to the
    * r3 zipWithIndex bottleneck by construction.
    */
  def loadCsvDir(spark: SparkSession, dir: String): Sheets =
    loadDir(spark, dir, "csv",
      p => spark.read.option("header", "true").option("inferSchema", "false").csv(p),
      codegenRowNo = false)

  /** Real `.xlsx` workbook — the reference's ACTUAL input (`apoc.load.xls`
    * over an RVTools export, refresh-vmware.cypher:26). One file, one tab
    * per sheet; tabs missing from a partial export load as empty frames,
    * extra tabs are ignored, values arrive as nullable strings with the
    * same header-row semantics as the CSV path. See [[Xlsx]] for the
    * parser and its scale position (small driver-side config input).
    */
  def loadXlsx(spark: SparkSession, path: String): Sheets = {
    val parsed: Map[String, (Seq[String], Seq[Seq[String]])] =
      if (new java.io.File(path).exists) Xlsx.readWorkbook(path) else Map.empty
    SheetNames.map { s =>
      val df = parsed.get(s) match {
        case Some((header, rows)) if header.nonEmpty => sheet(spark, header, rows)
        case _ => withRowNo(empty(spark, SheetColumns(s)))
      }
      s -> df
    }.toMap
  }

  private def loadDir(spark: SparkSession, dir: String, ext: String,
      read: String => DataFrame, codegenRowNo: Boolean): Sheets =
    SheetNames.map { s =>
      val path = s"$dir/$s.$ext"
      val df =
        if (new java.io.File(path).exists) {
          if (codegenRowNo) withFileRowNo(read(path)) else withRowNo(read(path))
        } else withRowNo(empty(spark, SheetColumns(s)))
      s -> df
    }.toMap

  def empty(spark: SparkSession, cols: Seq[String]): DataFrame = {
    // a local empty list, NOT emptyRDD: LocalRelation(Nil) lets Catalyst
    // prune every statement subtree fed by a missing sheet.
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)
  }

  /** Build a sheet from in-memory rows (fixtures/tests). */
  def sheet(spark: SparkSession, cols: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    // rows are already driver-local — build a LocalRelation (codegen- and
    // constant-folding-friendly), never a parallelize round-trip.
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    withRowNo(spark.createDataFrame(
      java.util.Arrays.asList(rows.map(Row.fromSeq): _*), schema))
  }
}
