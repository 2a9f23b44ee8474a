package graft

import org.apache.spark.sql.graftfn.ByteVectorDot
import org.apache.spark.sql.functions._

/** Same contract battery as FloatVectorDotSpec, for the int8 dot.
  * (Array[Byte] encodes as BinaryType, so fixtures build int arrays and
  * cast to array<tinyint> — the type Quantize.int8 produces.)
  */
class ByteVectorDotSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1, 2, 3), Array(4, 5, 6)),
    (2L, Array(127, -127), Array(127, 127)), // extremes: 127²−127²
    (3L, Array.empty[Int], Array.empty[Int]),
    (4L, Array(5), Array(2, 99))) // length mismatch → common prefix

  private def frame() = vecs.toDF("id", "a0", "b0")
    .select(col("id"), col("a0").cast("array<tinyint>").as("a"),
      col("b0").cast("array<tinyint>").as("b"))

  test("matches a driver-side exact computation (incl. ±127 extremes)") {
    val df = frame().withColumn("d", ByteVectorDot.bdot(col("a"), col("b")))
    val got = df.select("id", "d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = vecs.map { case (id, a, b) =>
      id -> a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    }.toMap
    assert(got == want)
  }

  test("null input yields null") {
    val df = Seq((1L, Option(Array(1)), Option.empty[Array[Int]]))
      .toDF("id", "a0", "b0")
      .withColumn("d", ByteVectorDot.bdot(
        col("a0").cast("array<tinyint>"), col("b0").cast("array<tinyint>")))
    assert(df.select("d").collect().head.isNullAt(0))
  }

  test("interpreted eval equals codegen result") {
    val df = frame()
    def run(): Map[Long, Long] = df
      .withColumn("d", ByteVectorDot.bdot(col("a"), col("b")))
      .select("id", "d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
