package graft.tools

import graft.ingest.{Ingest, Refresh, Workbook}
import graft.Tables
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level profile of the q_m5 refresh chain: workbook build vs
  * Ingest.run plan construction vs execution. Throwaway diagnostics.
  */
object IngestPhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.analyzer.singlePassResolver.enabled", sys.env.getOrElse("SP_RESOLVER", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      var t0 = System.nanoTime()
      val c = Tables.customer(spark, sfDir).filter(col("c_custkey") < 200)
      val base: Map[String, org.apache.spark.sql.Column] = Map(
        "VI SDK Server" -> lit("vc1"), "VI SDK UUID" -> lit("uid-graft"),
        "VM UUID" -> concat(lit("u"), col("c_custkey")),
        "VM" -> col("c_name"),
        "HW version" -> (col("c_custkey") % 3 + 17).cast("string"),
        "HW upgrade status" -> col("c_mktsegment"))
      val vInfo = c.select(Workbook.SheetColumns("vInfo")
        .map(cn => base.getOrElse(cn, lit(null).cast("string")).as(cn)) :+
        col("c_custkey").cast("long").as("_rowno"): _*)
      val wb: Workbook.Sheets = Workbook.SheetNames.map { n =>
        n -> (if (n == "vInfo") vInfo
              else Workbook.withRowNo(Workbook.empty(spark, Workbook.SheetColumns(n))))
      }.toMap
      val tWb = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      def emptyOf(schema: org.apache.spark.sql.types.StructType) =
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      val batch = Ingest.run(wb, emptyOf(Refresh.nodeSchema), emptyOf(Refresh.edgeSchema))
      val tRun = (System.nanoTime() - t0) / 1e9 // statements+assemble
      t0 = System.nanoTime()
      batch.nodes.queryExecution.executedPlan
      val tPlanN = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nn = batch.nodes.count()
      val tN = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val ne = batch.edges.count()
      val tE = (System.nanoTime() - t0) / 1e9
      println(f"[iprof] run$i wb=$tWb%.2f ingestBuild=$tRun%.2f planNodes=$tPlanN%.2f " +
        f"execNodes=$tN%.2f execEdges=$tE%.2f (rows n=$nn e=$ne)")
    }
    spark.stop()
  }
}
