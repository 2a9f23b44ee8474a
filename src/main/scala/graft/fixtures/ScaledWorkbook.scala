package graft.fixtures

import graft.ingest.Workbook
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-generated synthetic RVTools workbook at parameterized scale —
  * the ingest-throughput benchmark input (BASELINE.md "graph ingest
  * throughput"). Distributed generation (spark.range, no driver rows), so
  * the same generator exercises the refresh at any scale.
  */
object ScaledWorkbook {
  import SyntheticWorkbook.{Uid, Server}

  private def str(c: org.apache.spark.sql.Column) = c.cast("string")

  def build(spark: SparkSession, nHosts: Int, nVms: Int,
      nClusters: Int = 4): Workbook.Sheets = {
    val dsPerHosts = math.max(nHosts / 10, 1)

    val vCluster = spark.range(nClusters).select(
      lit(Uid).as("VI SDK UUID"), lit(Server).as("VI SDK Server"),
      str(concat(lit("Cluster"), col("id"))).as("Name"), lit("green").as("OverallStatus"),
      lit("88000").as("TotalCpu"), lit("32").as("NumCpuCores"),
      lit("524288").as("TotalMemory"), lit("True").as("HA enabled"),
      lit("True").as("DRS enabled"))

    val vHost = spark.range(nHosts).select(
      lit(Server).as("VI SDK Server"), lit(Uid).as("VI SDK UUID"),
      str(concat(lit("Cluster"), col("id") % nClusters)).as("Cluster"),
      str(concat(lit("host-"), col("id"))).as("Object ID"),
      str(concat(lit("esx"), col("id"), lit(".acme.local"))).as("Host"),
      lit("1").as("NumHosts"), lit("2").as("# CPU"), lit("32").as("# Cores"),
      lit("262144").as("# Memory"), lit("61 %").as("Memory usage %"),
      str(col("id") % 40).as("# VMs"), lit("vmware-lic-ent").as("Assigned License(s)"),
      lit("intel-broadwell").as("Max EVC"), lit("2024/01/05 08:00:00").as("Boot time"),
      str(concat(lit("SVC"), col("id"))).as("Service tag"), lit("green").as("Config status"),
      lit("Balanced").as("Current CPU power man. policy"),
      lit("High performance").as("Host Power Policy"),
      str(concat(lit("Intel Xeon Gold "), col("id") % 7)).as("CPU Model"),
      lit("7.0.3 build-20842708").as("ESX Version"), lit("Dell Inc.").as("Vendor"),
      lit("PowerEdge R740").as("Model"), lit("2.15.0").as("BIOS Version"),
      lit("2023/10/10").as("BIOS Date"), lit("acme.local").as("Domain"),
      lit("10.0.0.10, ntp1.acme.local").as("NTP Server(s)"),
      lit("10.0.0.53, dns1.acme.local").as("DNS Servers"))

    val vRP = spark.range(nClusters * 2).select(
      str(concat(lit("/DC1/Cluster"), col("id") % nClusters, lit("/Resources"),
        when(col("id") >= nClusters, "/prod").otherwise(""))).as("Resource pool"),
      lit(Server).as("VI SDK Server"), lit(Uid).as("VI SDK UUID"),
      lit("3").as("# VMs"), lit("8").as("# vCPUs"), lit("65536").as("Mem Configured"))

    val vInfo = spark.range(nVms).select(
      lit(Server).as("VI SDK Server"),
      lit("VMware vCenter Server 7.0.3 build-20845200").as("VI SDK Server type"),
      lit(Uid).as("VI SDK UUID"),
      str(concat(lit("vm-uuid-"), col("id"))).as("VM UUID"),
      str(concat(lit("vm"), col("id"))).as("VM"),
      str(concat(lit("vm-"), col("id"))).as("VM ID"),
      str(concat(lit("vm"), col("id"), lit(".acme.local"))).as("DNS Name"),
      lit("2024/03/01 10:00:00").as("PowerOn"), lit("12").as("Change Version"),
      lit("generated").as("Annotation"), lit("False").as("Consolidation Needed"),
      str(col("id") % 8 + 1).as("CPUs"), lit("4096").as("Memory"), lit("1").as("NICs"),
      lit("1").as("Disks"), lit("True").as("CBT"), str(col("id") % 5 + 15).as("HW version"),
      lit("Up-to-date").as("HW upgrade status"), lit("connected").as("Connection state"),
      lit("green").as("Config status"), lit("poweredOn").as("Powerstate"),
      lit("running").as("Guest state"), lit("green").as("Heartbeat"),
      str(concat(lit("/DC1/Cluster"), col("id") % nClusters, lit("/Resources/prod")))
        .as("Resource pool"),
      lit("/DC1/vm/apps").as("Folder"),
      lit("Ubuntu Linux (64-bit)").as("OS according to the VMware Tools"),
      lit("Ubuntu Linux (64-bit)").as("OS according to the configuration file"),
      lit("PG-App").as("Network #1"), lit(null).cast("string").as("Network #2"),
      lit(null).cast("string").as("Network #3"), lit(null).cast("string").as("Network #4"))

    val vSwitch = spark.range(nHosts).select(
      str(concat(lit("esx"), col("id"), lit(".acme.local"))).as("Host"),
      str(concat(lit("Cluster"), col("id") % nClusters)).as("Cluster"),
      lit(Uid).as("VI SDK UUID"), lit("vSwitch0").as("Switch"),
      lit("128").as("# Ports"), lit("100").as("Free Ports"),
      lit("Reject").as("Promiscuous Mode"), lit("Accept").as("Mac Changes"),
      lit("Accept").as("Forged Transmits"), lit("False").as("Traffic Shaping"),
      lit("True").as("Notify Switch"), str(when(col("id") % 2 === 0, 9000).otherwise(1500)).as("MTU"),
      lit("True").as("Offload"), lit("loadbalance_srcid").as("Policy"))

    val vPort = spark.range(nHosts).select(
      str(concat(lit("esx"), col("id"), lit(".acme.local"))).as("Host"),
      str(concat(lit("Cluster"), col("id") % nClusters)).as("Cluster"),
      lit(Uid).as("VI SDK UUID"), lit("vSwitch0").as("Switch"),
      lit("PG-App").as("Port Group"), lit("loadbalance_srcid").as("Policy"),
      lit("100").as("VLAN"), lit("Reject").as("Promiscuous Mode"),
      lit("Accept").as("Mac Changes"), lit("Accept").as("Forged Transmits"),
      lit("False").as("Traffic Shaping"))

    val vNIC = spark.range(nHosts).select(
      str(concat(lit("esx"), col("id"), lit(".acme.local"))).as("Host"),
      str(concat(lit("Cluster"), col("id") % nClusters)).as("Cluster"),
      lit(Uid).as("VI SDK UUID"), lit("vSwitch0").as("Switch"),
      lit("vmnic0").as("Network Device"), lit("ixgbe").as("Driver"),
      lit("10000 Mb").as("Speed"),
      str(concat(lit("aa:bb:cc:"), col("id"))).as("MAC"),
      lit("True").as("WakeOn"), lit("0000:3b:00.0").as("PCI"))

    val vNetwork = spark.range(nVms).select(
      lit(Server).as("VI SDK Server"), lit(Uid).as("VI SDK UUID"),
      str(concat(lit("vm-uuid-"), col("id"))).as("VM UUID"),
      str(concat(lit("00:50:56:"), col("id"))).as("Mac Address"),
      lit("VMXNET 3").as("Adapter"), lit("True").as("Starts Connected"),
      str(concat(lit("10.0."), col("id") % 250, lit("."), col("id") % 200)).as("IP Address"),
      lit("PG-App").as("Network"),
      str(concat(lit("esx"), col("id") % nHosts, lit(".acme.local"))).as("Host"))

    val vDatastore = spark.range(dsPerHosts).select(
      lit(Uid).as("VI SDK UUID"), lit(Server).as("VI SDK Server"),
      str(concat(lit("ds:///vmfs/volumes/ds-"), col("id"), lit("/"))).as("URL"),
      str(concat(lit("ds-"), col("id"))).as("Name"), lit("True").as("Accessible"),
      lit("1048576").as("Capacity MB"), lit("524288").as("In Use MB"),
      lit("524288").as("Free MB"), lit("10").as("# Hosts"), lit("6.82").as("Version"),
      lit("False").as("SIOC enabled"), lit("100").as("# VMs"), lit("10.0.2.10").as("Address"),
      lit("green").as("Config status"), lit("VMFS").as("Type"),
      str(concat(lit("esx"), col("id") * 10 % nHosts, lit(".acme.local, esx"),
        (col("id") * 10 + 1) % nHosts, lit(".acme.local"))).as("Hosts"))

    val vDisk = spark.range(nVms).select(
      lit(Uid).as("VI SDK UUID"), lit(Server).as("VI SDK Server"),
      str(concat(lit("vm-uuid-"), col("id"))).as("VM UUID"),
      str(concat(lit("[ds-"), col("id") % dsPerHosts, lit("] vm"), col("id"),
        lit("/disk.vmdk"))).as("Path"),
      lit("Hard disk 1").as("Disk"), lit("40960").as("Capacity MB"), lit("True").as("Thin"),
      lit("SCSI controller 0").as("Controller"), lit("persistent").as("Disk Mode"),
      lit("False").as("Eagerly Scrub"), lit("False").as("Template"),
      str(concat(lit("esx"), (col("id") % dsPerHosts) * 10 % nHosts, lit(".acme.local")))
        .as("Host"))

    val vPartition = spark.range(nVms).select(
      lit(Server).as("VI SDK Server"), lit(Uid).as("VI SDK UUID"),
      str(concat(lit("vm-uuid-"), col("id"))).as("VM UUID"),
      lit("/dev/sda1").as("Disk"), lit("40960").as("Capacity MB"),
      lit("20480").as("Consumed MB"), lit("50").as("Free %"))

    val vSnapshot = spark.range(nVms / 10 max 1).select(
      lit(Server).as("VI SDK Server"), lit(Uid).as("VI SDK UUID"),
      str(concat(lit("vm-uuid-"), col("id"))).as("VM UUID"),
      str(concat(lit("snap-"), col("id"))).as("Name"), lit("generated").as("Description"),
      lit("2024/03/05 22:00:00").as("Date / time"), lit("8192").as("Size MB (total)"))

    Seq("vCluster" -> vCluster, "vInfo" -> vInfo, "vRP" -> vRP, "vHost" -> vHost,
      "vSwitch" -> vSwitch, "vPort" -> vPort, "vNIC" -> vNIC, "vNetwork" -> vNetwork,
      "vDatastore" -> vDatastore, "vDisk" -> vDisk, "vPartition" -> vPartition,
      "vSnapshot" -> vSnapshot)
      .map { case (name, df) => name -> Workbook.withRowNo(df) }.toMap
  }
}
