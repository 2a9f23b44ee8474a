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

  test("optimizer rewrites the double-form HOF dot product to FloatVectorDot") {
    // a file-backed frame: a LocalRelation would be constant-evaluated by
    // ConvertToLocalRelation before the rule could show its work.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val hof = emb.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (s, x) -> s + x) AS d")
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_fdot"),
      s"HOF dot not rewritten to FloatVectorDot:\n$optimized")
    // and the rewrite is bit-identical to the Column-API expression.
    val direct = emb.select(
      org.apache.spark.sql.graftfn.FloatVectorDot.fdot(col("a"), col("b")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ==
      direct.collect().map(_.getDouble(0)).toSeq)
    // the all-float form rounds products to float32 — semantics differ, so
    // the rule must NOT touch it.
    val floatForm = emb.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x) AS d")
    assert(!floatForm.queryExecution.optimizedPlan.toString.contains("graft_fdot"),
      "float-form HOF must not be rewritten (different rounding semantics)")
  }

  test("levenshtein filters gain the length-difference prefilter, results unchanged") {
    import spark.implicits._
    // range-based (NOT a local Seq — ConvertToLocalRelation would fold the
    // whole plan away before the rule could be observed).
    val df = spark.range(5).selectExpr("id",
      "concat('str', id) AS a",
      "CASE WHEN id = 1 THEN concat('str', id) " +         // dist 0
        "WHEN id = 2 THEN concat('str', id, 'q') " +        // dist 1
        "WHEN id = 4 THEN CAST(NULL AS STRING) " +          // null → drops
        "ELSE repeat('z', 20) END AS b")                    // far (guard kills)
    val filtered = df.filter(levenshtein(col("a"), col("b")).cast("long") <= 2L)
    val opt = filtered.queryExecution.optimizedPlan.toString
    // the guard is present, before the expensive call, exactly once
    // (aliases inline under collapsed projections — match on shape).
    assert(opt.contains("abs((length(") || opt.contains("abs((length("),
      s"length prefilter not injected:\n$opt")
    assert("levenshtein".r.findAllIn(opt).size == 1,
      s"the original predicate must survive once:\n$opt")
    assert("abs\\(".r.findAllIn(opt).size == 1,
      s"rule must be idempotent (one guard):\n$opt")
    // results are exactly the unguarded semantics: ids 1 (dist 0) and 2
    // (dist 1) pass; 0 and 3 are far; the null row drops.
    assert(filtered.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the strict form rewrites too.
    val strict = df.filter(levenshtein(col("a"), col("b")) < 1)
    assert(strict.queryExecution.optimizedPlan.toString.contains("abs("))
    assert(strict.select("id").as[Long].collect().toSeq == Seq(1L))
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
