package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish parquet test tables (TESTDATA.md).
  *
  * One parquet file per table; filters/projections push down to the scan
  * (verify with `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects; `nanosAsLong` reads it as raw nanos. We expose
    * both `ts_sec` (epoch seconds, exact integer — used by the oracle
    * shapes so DuckDB and Spark agree bit-for-bit) and `ts` as a proper
    * TimestampType (µs truncation) for Structured Streaming operators.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_nanos")
      .withColumn("ts_sec", org.apache.spark.sql.functions.expr("ts_nanos div 1000000000"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_nanos div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** One verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `sql = None` → the driver records a weaker rows-only check.
  */
final case class OracleQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    sql: Option[String])

trait QueryModule {
  def queries: Seq[OracleQuery]
}
