package graft.tools

import graft.fixtures.{ScaledWorkbook, SyntheticWorkbook}
import graft.ingest.{Ingest, Refresh}
import org.apache.spark.sql.SparkSession

object IngestProf {
  def main(args: Array[String]): Unit = {
    val parts = if (args.length > 0) args(0) else "8"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[iprof] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val wb = ScaledWorkbook.build(spark, 500, 20000)
    t("materialize sheets")(wb.values.map(_.count()).sum)
    val seed = SyntheticWorkbook.seededStore(spark)
    val batch = t("ingest batch nodes") {
      val b = Ingest.run(wb, seed.nodes, seed.edges)
      b.nodes.count(); b
    }
    t("ingest batch edges")(batch.edges.count())
    t("full refresh diff") {
      val store = Refresh.refresh(seed, wb)
      store.nodes.count(); store.edges.count()
    }
    spark.stop()
  }
}
