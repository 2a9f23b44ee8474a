package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_m5_edge_props"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      var t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = df.count()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[prof] run$i $name rows=$n build=$tBuild%.2fs plan=$tPlan%.2fs exec=$tExec%.2fs")
    }
    spark.stop()
  }
}
