package graft

import graft.fixtures.SyntheticWorkbook
import graft.ingest.{Refresh, Workbook}
import graft.views.GraphViews
import org.apache.spark.sql.functions._

/** Per-label views + operational reports over the fixture graph, and the
  * pluggable workbook source round-trip (CSV and parquet from disk must
  * produce the same graph as the in-memory sheets).
  */
class ViewsAndSourcesSpec extends SparkTestBase {

  private lazy val store = Refresh.refresh(
    SyntheticWorkbook.seededStore(spark), SyntheticWorkbook.golden(spark))

  test("typed views lift props to columns") {
    val v = GraphViews.vms(store).collect()
    assert(v.length == 3)
    val web = v.find(r => r.getAs[String]("name") == "web01").get
    assert(web.getAs[String]("fqdn") == "web01.acme.local")
    assert(GraphViews.hosts(store).count() == 2)
    assert(GraphViews.clusters(store).filter(col("ha") === "True").count() == 1)
  }

  test("snapshot report joins snapshots to their VMs") {
    val rep = GraphViews.snapshotReport(store).collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[String]("vm_name") == "db01")
    assert(rep.head.getAs[Long]("size_mb") == 8192L)
  }

  test("datastore report computes utilization and host fanout") {
    val rep = GraphViews.datastoreReport(store).orderBy("name").collect()
    assert(rep.map(_.getAs[String]("name")).toSeq == Seq("ds-local-01", "ds-shared-01"))
    val shared = rep(1)
    assert(shared.getAs[Long]("n_hosts_connected") == 2)
    assert(shared.getAs[Double]("utilization") == 0.5)
  }

  test("vm placement resolves direct and via-pool cluster membership") {
    val p = GraphViews.vmPlacement(store)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // vm1/vm2 sit in pools members of Cluster1; vm3 wired directly to Cluster2.
    assert(p == Set(("web01", "Cluster1"), ("db01", "Cluster1"), ("tmpl01", "Cluster2")))
  }

  test("workbook round-trips through CSV and parquet sources identically") {
    val golden = SyntheticWorkbook.golden(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_wb").toString
    Workbook.SheetNames.foreach { s =>
      val df = golden(s).drop("_rowno").coalesce(1)
      df.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv_$s")
      df.write.mode("overwrite").parquet(s"$tmp/pq_$s")
      // the loaders expect <dir>/<sheet>.<ext> as a file or directory
      new java.io.File(s"$tmp/csv_$s").renameTo(new java.io.File(s"$tmp/$s.csv"))
      new java.io.File(s"$tmp/pq_$s").renameTo(new java.io.File(s"$tmp/$s.parquet"))
    }
    val fromCsv = Refresh.refresh(SyntheticWorkbook.seededStore(spark),
      Workbook.loadCsvDir(spark, tmp))
    val fromPq = Refresh.refresh(SyntheticWorkbook.seededStore(spark),
      Workbook.loadParquetDir(spark, tmp))
    // same node/edge sets as the in-memory fixture graph.
    def nodeKeys(s: Refresh.GraphStore) =
      s.nodes.select("label", "key").collect().map(r => (r.getString(0), r.getString(1))).toSet
    def edgeCount(s: Refresh.GraphStore) = s.edges.count()
    assert(nodeKeys(fromCsv) == nodeKeys(store))
    assert(nodeKeys(fromPq) == nodeKeys(store))
    assert(edgeCount(fromCsv) == edgeCount(store))
    assert(edgeCount(fromPq) == edgeCount(store))
  }

  test("store persists partitioned and reloads identically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_store").toString
    Refresh.write(store, tmp)
    val back = Refresh.load(spark, tmp)
    assert(back.nodes.count() == store.nodes.count())
    assert(back.edges.count() == store.edges.count())
    // label partitioning on disk → per-label reads prune directories.
    val labelDirs = new java.io.File(s"$tmp/nodes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("label=")).toSet
    assert(labelDirs.contains("label=Virtualmachine"))
    assert(back.nodes.filter(col("label") === "Vspherehost").count() == 2)
  }
}
