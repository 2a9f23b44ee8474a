package graft

import org.apache.spark.sql.graftfn.FloatVectorDot
import org.apache.spark.sql.functions._

/** The custom codegen'd expression must agree with (a) a Scala-side exact
  * computation and (b) its own interpreted eval path (codegen off).
  */
class FloatVectorDotSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.5f), Array(2.0f, 2.0f)),
    (3L, Array.empty[Float], Array.empty[Float]),
    (4L, Array(1.5f), Array(2.0f, 99.0f))) // length mismatch → common prefix

  test("matches a driver-side exact computation") {
    val df = vecs.toDF("id", "a", "b")
      .withColumn("d", FloatVectorDot.fdot(col("a"), col("b")))
    val got = df.select("id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = vecs.map { case (id, a, b) =>
      id -> a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    }.toMap
    assert(got == want)
  }

  test("null input yields null") {
    val df = Seq((1L, Option(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
      .withColumn("d", FloatVectorDot.fdot(col("a"), col("b")))
    assert(df.select("d").collect().head.isNullAt(0))
  }

  test("interpreted eval equals codegen result") {
    val df = vecs.toDF("id", "a", "b")
    def run(): Map[Long, Double] = df
      .withColumn("d", FloatVectorDot.fdot(col("a"), col("b")))
      .select("id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
