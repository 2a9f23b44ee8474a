package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  /** Attach `_rowno` preserving input order (file order for on-disk sources). */
  def withRowNo(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("_rowno", LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
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
    loadDir(spark, dir, "parquet", p => spark.read.parquet(p))

  /** CSV variant — `{header:true}` exactly like the reference's loader;
    * all columns arrive as nullable strings (inferSchema off by design:
    * the reference's typing is schema-on-read with explicit toInt casts).
    */
  def loadCsvDir(spark: SparkSession, dir: String): Sheets =
    loadDir(spark, dir, "csv",
      p => spark.read.option("header", "true").option("inferSchema", "false").csv(p))

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
      read: String => DataFrame): Sheets =
    SheetNames.map { s =>
      val path = s"$dir/$s.$ext"
      val df =
        if (new java.io.File(path).exists) read(path)
        else empty(spark, SheetColumns(s))
      s -> withRowNo(df)
    }.toMap

  def empty(spark: SparkSession, cols: Seq[String]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Build a sheet from in-memory rows (fixtures/tests). */
  def sheet(spark: SparkSession, cols: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq), 1)
    withRowNo(spark.createDataFrame(rdd, schema))
  }
}
