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
    StreamingQueries)

  lazy val all: Seq[OracleQuery] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
