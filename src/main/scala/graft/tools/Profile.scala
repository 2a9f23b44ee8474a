package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query stage/job profiler — the §1 "measure first" harness.
  *
  * Runs named SparkEntry queries under the same session shape as Bench
  * (extensions, local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE)
  * and prints, per query: wall seconds, job count, stage count, and the
  * top stages by duration with their shuffle read/write volumes — the
  * numbers that decide WHICH operator inside a multi-job pipeline is the
  * one to optimize. Second arg "warm" runs each query twice and profiles
  * the second run (isolates plan shape from codegen/JIT).
  */
object Profile {
  private case class StageRow(id: Int, name: String, ms: Long,
      taskMs: Long, cpuMs: Long, gcMs: Long, shRead: Long, shWrite: Long,
      records: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = args.contains("warm")
    val names = args.filterNot(_ == "warm").toSeq
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
        val m = si.taskMetrics
        val graftFrame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.tools"))
          .getOrElse(si.name.takeWhile(_ != '\n')).trim
        stages.add(StageRow(si.stageId, graftFrame, ms,
          m.executorRunTime, m.executorCpuTime / 1000000, m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // same inter-query hygiene as Bench: drop finished queries'
      // persisted RDDs so a multi-query profile batch doesn't charge
      // later queries for earlier queries' dead checkpoint blocks.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (warm) {
        fn(spark, sfDir).count()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      stages.clear(); jobs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_.ms)
      println(f"%n========== $n%s  wall=$wall%.2fs jobs=${jobs.get}%d stages=${rows.size}%d stageMsSum=${rows.map(_.ms).sum}%d")
      rows.take(14).foreach { r =>
        println(f"  stage ${r.id}%4d ${r.ms}%6dms task=${r.taskMs}%6dms cpu=${r.cpuMs}%6dms gc=${r.gcMs}%5dms shR=${r.shRead}%9d shW=${r.shWrite}%9d rec=${r.records}%9d  ${r.name.take(80)}%s")
      }
    }
    spark.stop()
  }
}
