package graft.tools
import graft.llmops.Dedup
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    t("docs count")(docs.count())
    val sh = docs.select(col("doc_id").as("doc"), split(trim(col("text")), "\\s+").as("_toks"))
      .select(col("doc"), Dedup.shinglesFromTokens(col("_toks"), 3).as("sh"))
    t("shingle explode count") {
      sh.select(explode(col("sh"))).count()
    }
    t("full pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    t("full pairs again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
