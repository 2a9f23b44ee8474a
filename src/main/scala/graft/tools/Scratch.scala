package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling scratch main — currently: time the primitive
  * tokenize/explode/aggregate passes that the arpa family's broadcast
  * subqueries re-derive, to size the per-pass cost at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $tag run$i n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    time("tokenize+count") {
      docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .groupBy("w").agg(count(lit(1))).count()
    }
    time("bigrams posexplode transform") {
      docs.select(split(trim(lower(col("text"))), "\\s+").as("__toks"))
        .filter(size(col("__toks")) >= 2)
        .select(posexplode(expr(
          "transform(sequence(0, size(__toks) - 2), " +
            "i -> struct(__toks[i] as w1, __toks[i + 1] as w2))"))
          .as(Seq("__p", "__g")))
        .groupBy("__g.w1", "__g.w2").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
