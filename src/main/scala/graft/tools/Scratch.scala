package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling scratch main — currently: dump the generated
  * code of the q_x_image_dims plan to find what exceeds the JVM 64 KB
  * method limit.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.Tables
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"))
      .write.mode("overwrite").parquet("/tmp/scratch_media")
    val media = spark.read.parquet("/tmp/scratch_media")
    val parsed = media.select(col("media_id"),
      graft.llmops.Multimodal.imageDimsCol(col("payload")).as("d"))
    parsed.write.mode("overwrite").parquet("/tmp/scratch_parsed")
    val n = spark.read.parquet("/tmp/scratch_parsed")
      .filter(col("d").isNotNull).count()
    println(s"[scratch] parsed non-null dims = " + n)
    spark.stop()
  }
}
