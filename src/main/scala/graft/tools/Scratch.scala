package graft.tools

import graft.Tables
import graft.llmops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val docsR = docs.repartition(32, col("doc_id"))
    (1 to 2).foreach { r =>
      println(s"--- round $r ---")
      t("minhash as-is")(Dedup.minHashPairs(docs, "doc_id", "text", 0.3).count())
      t("minhash repart32")(Dedup.minHashPairs(docsR, "doc_id", "text", 0.3).count())
      t("weighted as-is")(Dedup.weightedMinHashPairs(docs, "doc_id", "text", 0.3).count())
      t("weighted repart32")(Dedup.weightedMinHashPairs(docsR, "doc_id", "text", 0.3).count())
    }
    spark.stop()
  }
}
