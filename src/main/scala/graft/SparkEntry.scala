package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has a `queries` entry here; each
  * SQL-expressible one also has an `oracleSql` entry the driver runs in
  * DuckDB over the same parquet tables (hash-compared, column names must
  * match — all queries alias identically on both sides).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    ScalarFuncQueries,
    MutationQueries,
    StreamingQueries,
    AdvancedQueries,
    LlmOpsQueries,
    ModelPrepQueries,
    MediaPrepQueries,
    GraphQueries,
    TemporalQueries)

  lazy val all: Seq[OracleQuery] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship: full mark→load→sweep refresh of the synthetic RVTools
    * workbook through the graph engine (SURVEY §3.1), then the §7.2 query —
    * clusters per vCenter with HA enabled, with CPU/memory totals — over
    * the resulting graph. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.fixtures.SyntheticWorkbook
    import graft.ingest.Refresh
    import org.apache.spark.sql.functions._
    val store = Refresh.refresh(
      SyntheticWorkbook.seededStore(spark), SyntheticWorkbook.golden(spark))
    val vc = store.nodes.filter(col("label") === "Vcenterserver")
      .select(col("id").as("vcid"), col("props")("name").as("vcenter"))
    val cc = store.nodes.filter(col("label") === "Vcentercluster")
      .select(col("id").as("ccid"), col("props")("name").as("cluster"),
        col("props")("ha").as("ha"), col("props")("cpu").cast("long").as("cpu"),
        col("props")("memory").cast("long").as("memory"))
    val ctl = store.edges.filter(col("relType") === "CONTROLLED_BY_VC")
    // undirected edge: match either endpoint order (J4).
    val pairs = ctl.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(ctl.select(col("dst").as("a"), col("src").as("b")))
    cc.join(pairs, col("ccid") === col("a"))
      .join(vc, col("b") === col("vcid"))
      .filter(col("ha") === "True")
      .groupBy("vcenter")
      .agg(count(lit(1)).as("ha_clusters"), sum("cpu").as("total_cpu"),
        sum("memory").as("total_memory"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
