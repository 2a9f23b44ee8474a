package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling scratch main — currently: A/B the shuffle scratch
  * directory and the bypass-merge writer threshold on a shuffle-heavy
  * query (q_x_curation_stream), isolating the shuffle-file-creation cost
  * found in the task thread dumps.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "base"
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val b2 = which match {
      case "shm" => b.config("spark.local.dir", "/dev/shm/graft_scratch")
      case "sort" => b.config("spark.shuffle.sort.bypassMergeThreshold", "0")
      case "both" => b.config("spark.local.dir", "/dev/shm/graft_scratch")
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q_x_curation_stream", "q_x_dedup_stream", "q_x_mmr_rerank")
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
        println(f"[scratch] $which $n run$i n=$c ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
