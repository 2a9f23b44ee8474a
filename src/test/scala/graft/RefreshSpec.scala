package graft

import graft.fixtures.SyntheticWorkbook
import graft.ingest.Refresh
import graft.model.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end refresh over the synthetic RVTools workbook
  * (SURVEY.md §5.3-5.2): structural assertions for every statement family,
  * MERGE idempotence, and the mark-and-sweep delete cycle.
  */
class RefreshSpec extends SparkTestBase {

  // materialized: every test re-derives from store1, and chained refreshes
  // need the lineage barrier (see Refresh.materialize).
  private lazy val store1 = Refresh.materialize(Refresh.refresh(
    SyntheticWorkbook.seededStore(spark), SyntheticWorkbook.golden(spark)))
  private lazy val nodes1 = store1.nodes.cache()
  private lazy val edges1 = store1.edges.cache()

  private def labelCount(nodes: DataFrame): Map[String, Long] =
    nodes.groupBy("label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def relCount(edges: DataFrame): Map[String, Long] =
    edges.groupBy("relType").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Edges of a type with both endpoints resolved to (label, key). */
  private def rel(rt: String): Set[(String, String, String, String)] = {
    val n = nodes1.select(col("id"), col("label"), col("key"))
    edges1.filter(col("relType") === rt)
      .join(n.select(col("id").as("src"), col("label").as("sl"), col("key").as("sk")), Seq("src"))
      .join(n.select(col("id").as("dst"), col("label").as("dl"), col("key").as("dk")), Seq("dst"))
      .select("sl", "sk", "dl", "dk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
  }

  test("golden refresh produces the expected node populations") {
    val lc = labelCount(nodes1)
    assert(lc("Vcenterserver") == 1)
    assert(lc("Vcentercluster") == 2)
    assert(lc("Vspheredatacenter") == 1)
    assert(lc("Vspherehost") == 2)
    assert(lc("Virtualmachine") == 3)
    assert(lc("Vdatastore") == 2)
    // pools: 'None Configured' placeholder + prod + web + frontend
    // (root '/…/Resources' filtered by pool <> '', VM pool paths resolve to
    // the vRP-created identities).
    assert(lc("Vresourcepool") == 4)
    assert(lc("Ntpserver") == 2, s"ntp: $lc")   // one IP, one FQDN
    assert(lc("Dnsserver") == 2)
    assert(lc("Vswitch") == 2)
    assert(lc("Vhostportgroup") == 3)
    assert(lc("Vportgroup") == 5)               // PG-App/DB/Backup/Mgmt + Not Configured
    assert(lc("Vmportgroup") == 1)              // the :37 None Provided placeholder
    assert(lc("Vmnic") == 2)
    assert(lc("Virtualdisk") == 3)
    assert(lc("Vmadapter") == 1)
    assert(lc("Vpartition") == 1)
    assert(lc("Vsnapshot") == 1)
    assert(lc("Vfolder") == 2)                  // /DC1/vm/apps/web and /DC1/vm/apps
    assert(lc("Vmos") == 3)
    assert(lc("Vcenterversion") == 1 && lc("Vcenterbuild") == 1)
    assert(lc("Vsphereesxversion") == 1 && lc("Vsphereesxbuild") == 1)
  }

  test("IPv4 vs FQDN partition (P3/P4 anchored regex) is exact") {
    val ntp = nodes1.filter(col("label") === "Ntpserver")
      .select(col("props")("ipaddress"), col("props")("fqdn"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(ntp == Set((Some("10.0.0.10"), None), (None, Some("ntp1.acme.local"))))
  }

  test("external-CMDB gating (D3): host1 linked to domain+company, host2 skipped but present") {
    val ofDomain = rel("OF_DOMAIN")
    assert(ofDomain.map(_._2) == Set("host-001" + Graph.KeySep + SyntheticWorkbook.Uid))
    assert(rel("ESX_HOST_FOR").size == 1)
    // host-002 exists despite the unmatched domain — earlier writes stand.
    assert(nodes1.filter(col("label") === "Vspherehost").count() == 2)
  }

  test("jumbo frames edge only for the MTU>=9000 switch") {
    val jumbo = rel("HAS_JUMBO_FRAMES")
    assert(jumbo.size == 1 && jumbo.head._2 == "vSwitch0" + Graph.KeySep + "esx01.acme.local")
  }

  test("resource-pool tree: CHILD_RESOURCE_POOL chain from vRP hierarchy") {
    val child = rel("CHILD_RESOURCE_POOL").map(t => (t._2, t._4))
    val vc = SyntheticWorkbook.Server
    assert(child == Set(
      (vc + Graph.KeySep + "/DC1/Cluster1/Resources/prod/web", vc + Graph.KeySep + "/DC1/Cluster1/Resources/prod"),
      (vc + Graph.KeySep + "/DC1/Cluster1/Resources/prod/web/frontend", vc + Graph.KeySep + "/DC1/Cluster1/Resources/prod/web")))
  }

  test("VM wiring guards (:218-223)") {
    // VM1 deep pool → IN_RESOURCE_POOL; VM3 shallow pool → LOCATED_IN_CLUSTER.
    val inPool = rel("IN_RESOURCE_POOL")
    assert(inPool.map(_._2).map(_.take(7)) == Set("vm-uuid"))
    assert(inPool.size == 2) // vm1, vm2
    val vmCluster = rel("LOCATED_IN_CLUSTER").filter(_._1 == "Virtualmachine")
    assert(vmCluster.size == 1) // vm3 → Cluster2
    assert(vmCluster.head._4.startsWith("Cluster2"))
    // folder chain: web folder → apps folder (parent exists), apps folder → DC.
    val ff = rel("IN_FOLDER").filter(t => t._1 == "Vfolder")
    assert(ff == Set(("Vfolder", "/DC1/vm/apps/web", "Vfolder", "/DC1/vm/apps")))
    val fDc = rel("LOCATED_IN_DC").filter(_._1 == "Vfolder")
    assert(fDc.map(_._2) == Set("/DC1/vm/apps"))
    // VM3 folder depth 2 → no folder → VM straight to DC.
    val vmDc = rel("LOCATED_IN_DC").filter(_._1 == "Virtualmachine")
    assert(vmDc.map(_._2) == Set("vm-uuid-03" + Graph.KeySep + SyntheticWorkbook.Uid))
  }

  test("datastore host links and disk placement") {
    assert(rel("CONNECTED_DATASTORE").size == 3) // shared ds: 2 hosts; local: 1
    val onDs = rel("ON_DATASTORE")
    assert(onDs.size == 3)
    // undirected canonicalization: each disk-datastore pair appears once.
    assert(onDs.map(t => Set(t._2, t._4)).size == 3)
  }

  test("edge property: HW_VERSION carries upgradestatus (M5)") {
    val hv = edges1.filter(col("relType") === "HW_VERSION")
      .select(col("props")("upgradestatus")).collect().map(_.getString(0)).toSet
    assert(hv == Set("Up-to-date", "Upgrade available"))
  }

  // Spark can't run set ops over MapType — canonicalize props to a sorted
  // entries array first.
  private def canon(df: DataFrame): DataFrame =
    df.withColumn("props", array_sort(map_entries(col("props"))))

  test("refresh is idempotent (MERGE law, §5.2a)") {
    val store2 = Refresh.refresh(store1, SyntheticWorkbook.golden(spark))
    assert(store2.nodes.count() == nodes1.count())
    assert(store2.edges.count() == edges1.count())
    assert(canon(store2.nodes).exceptAll(canon(nodes1)).count() == 0)
    assert(canon(nodes1).exceptAll(canon(store2.nodes)).count() == 0)
    assert(canon(store2.edges).exceptAll(canon(edges1)).count() == 0)
    assert(canon(edges1).exceptAll(canon(store2.edges)).count() == 0)
  }

  test("multi-tenant isolation: refreshing one vCenter never touches another") {
    // Second tenant = the golden workbook under a different vCenter
    // identity; load both, then age only tenant 1.
    val wb2 = SyntheticWorkbook.golden(spark).map { case (name, df) =>
      val retargeted = Seq(
        "VI SDK UUID" -> "vc-uuid-0002",
        "VI SDK Server" -> "vcenter02.acme.local")
        .foldLeft(df) { case (d, (c, v)) =>
          if (d.columns.contains(c)) d.withColumn(c, when(col(c).isNotNull, v)) else d
        }
      name -> retargeted
    }
    val both = Refresh.materialize(Refresh.refresh(store1, wb2))
    val t2Count = both.nodes.filter(col("tenant") === "vc-uuid-0002").count()
    assert(t2Count > 0)
    val aged = Refresh.refresh(both, SyntheticWorkbook.aged(spark))
    // tenant 1 shrank (host/vm swept)…
    assert(aged.nodes.filter(col("tenant") === SyntheticWorkbook.Uid).count() <
      both.nodes.filter(col("tenant") === SyntheticWorkbook.Uid).count())
    // …tenant 2 is bit-for-bit untouched.
    assert(aged.nodes.filter(col("tenant") === "vc-uuid-0002").count() == t2Count)
  }

  test("mark-and-sweep: aged workbook deletes the dropped host and VM (M7/M8)") {
    val aged = Refresh.refresh(store1, SyntheticWorkbook.aged(spark))
    val lc = labelCount(aged.nodes)
    assert(lc("Vspherehost") == 1)
    assert(lc("Virtualmachine") == 2)
    // host-002 and vm-uuid-03 are gone; their edges too.
    val keys = aged.nodes.select("key").collect().map(_.getString(0)).toSet
    assert(!keys.contains("host-002" + Graph.KeySep + SyntheticWorkbook.Uid))
    assert(!keys.contains("vm-uuid-03" + Graph.KeySep + SyntheticWorkbook.Uid))
    val deadIds = nodes1
      .filter(col("key").isin("host-002" + Graph.KeySep + SyntheticWorkbook.Uid, "vm-uuid-03" + Graph.KeySep + SyntheticWorkbook.Uid))
      .select("id").collect().map(_.getLong(0)).toSet
    val dangling = aged.edges
      .filter(col("src").isin(deadIds.toSeq: _*) || col("dst").isin(deadIds.toSeq: _*))
    assert(dangling.count() == 0)
    // non-sweep-scoped nodes persist (reference semantics: no managedby prop
    // → never marked): esx02's Vmnic survives as an orphan.
    assert(labelCount(aged.nodes)("Vmnic") == 2)
    // snapshot for the surviving VM2 still present.
    assert(labelCount(aged.nodes)("Vsnapshot") == 1)
  }

  test("inconsistent workbook (tenant absent from vCluster sheet) stays idempotent") {
    // A workbook whose vCluster sheet is empty but whose other sheets still
    // carry the VI SDK UUID: the marked-tenant set must include the batch's
    // own tenants, or a second refresh duplicates every tenant node id.
    val wb = SyntheticWorkbook.golden(spark)
    val noCluster = wb.updated("vCluster", wb("vCluster").limit(0))
    val s1 = Refresh.materialize(Refresh.refresh(SyntheticWorkbook.seededStore(spark), noCluster))
    val s2 = Refresh.materialize(Refresh.refresh(s1, noCluster))
    assert(s2.nodes.count() == s2.nodes.select("id").distinct().count(),
      "duplicate node ids after second refresh")
    assert(s2.nodes.count() == s1.nodes.count())
    assert(canon(s2.nodes).exceptAll(canon(s1.nodes)).count() == 0)
    assert(canon(s1.nodes).exceptAll(canon(s2.nodes)).count() == 0)
  }
}
