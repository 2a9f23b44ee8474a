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

  type Sheets = Map[String, DataFrame]

  /** Attach `_rowno` preserving input order (file order for on-disk sources). */
  def withRowNo(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("_rowno", LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Load a workbook from a directory of one parquet file per sheet
    * (production ingest path; CSV works the same via spark.read.csv).
    * Missing sheets load as empty frames so partial exports don't crash
    * the refresh — matching Cypher's empty-stream behavior.
    */
  def loadParquetDir(spark: SparkSession, dir: String, columnsOf: String => Seq[String]): Sheets =
    SheetNames.map { s =>
      val path = s"$dir/$s.parquet"
      val df =
        if (new java.io.File(path).exists) spark.read.parquet(path)
        else empty(spark, columnsOf(s))
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
