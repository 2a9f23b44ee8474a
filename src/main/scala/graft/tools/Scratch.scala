package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val v = graft.llmops.Unigram.unigramVocab(docs, "doc_id", "text",
      vocabSize = 120, rounds = 2, maxPieceLen = 3, maxWordLen = 12)
    val rows = v.collect()
    println(f"[scratch] trained in ${(System.nanoTime() - t0) / 1e9}%.1fs, vocab = ${rows.length}")
    rows.take(25).foreach(r => println(s"[scratch] ${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getLong(3)}"))
    println("[scratch] singles = " + rows.count(_.getLong(1) == 1L) +
      ", multis = " + rows.count(_.getLong(1) > 1L))
    spark.stop()
  }
}
