package graft

import graft.llmops.PortableHash
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions SQL surface (GraftExtensions): custom
  * expressions reachable from pure SQL, matching their Column-API twins.
  */
class ExtensionsSpec extends SparkTestBase {

  test("graft_fdot from SQL equals the Column-API FloatVectorDot") {
    val d = spark.sql(
      "SELECT graft_fdot(array(cast(1.5 as float), cast(2.0 as float)), " +
        "array(cast(4.0 as float), cast(0.25 as float))) AS d")
      .collect().head.getDouble(0)
    assert(d == 1.5 * 4.0 + 2.0 * 0.25)
  }

  test("graft_fdot null semantics and length mismatch match the expression") {
    val r = spark.sql(
      "SELECT graft_fdot(cast(null as array<float>), array(cast(1.0 as float))) AS a, " +
        "graft_fdot(array(cast(2.0 as float), cast(9.0 as float)), array(cast(3.0 as float))) AS b")
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 6.0) // common prefix only
  }

  test("graft_hash52 from SQL equals PortableHash on both engines' contract") {
    val rows = spark.sql(
      "SELECT graft_hash52('abc') AS h1, graft_hash52('') AS h2")
      .collect().head
    assert(rows.getLong(0) == PortableHash.hash52Jvm("abc"))
    assert(rows.getLong(1) == PortableHash.hash52Jvm(""))
    // and equals the Column-API builder over a real column.
    import spark.implicits._
    val df = Seq("x", "spark graft", "42").toDF("s")
    df.createOrReplaceTempView("t_hash52")
    val a = spark.sql("SELECT s, graft_hash52(s) AS h FROM t_hash52")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = df.select(col("s"), PortableHash.hash52(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
