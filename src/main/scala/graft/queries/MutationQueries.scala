package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import graft.ingest.{Ingest, Refresh, Workbook}
import graft.operators.{SnapshotDiff, Upsert}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 mutation shapes (M1–M8), exercised through the REAL
  * engine kernel (graft.operators.Upsert) and checked against plain-SQL
  * statements of the same final state. These are the queries that prove
  * the MERGE / mark-and-sweep recast is faithful.
  */
object MutationQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  /** existing = customers [0, 700); incoming = customers [500, 1200) with a
    * fresh tag. Shared window [500,700) exercises the update branch.
    */
  private def existingNodes(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") < 700)
      .select(col("c_custkey").as("k"), col("c_name").as("name"), lit("old").as("tag"))

  private def incomingNodes(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_custkey") >= 500 && col("c_custkey") < 1200)
      .select(col("c_custkey").as("k"), col("c_name").as("name"), lit("new").as("tag"))

  val queries: Seq[OracleQuery] = Seq(
    // M1: MERGE upsert — applying the kernel twice must equal applying once
    // (idempotence is MERGE's defining law, SURVEY §5.2a). The oracle states
    // the once-applied result; the Spark side applies it twice.
    q("q_m1_upsert_idempotent",
      "SELECT c_custkey AS k, c_name AS name, CASE WHEN c_custkey >= 500 THEN 'new' ELSE 'old' END AS tag FROM customer WHERE c_custkey < 1200 ORDER BY k") { (s, d) =>
      val once = Upsert.upsertNodes(existingNodes(s, d), incomingNodes(s, d), Seq("k"))
      Upsert.upsertNodes(once, incomingNodes(s, d), Seq("k")).orderBy("k")
    },
    // A4/M1: ON CREATE SET — matched keys keep the existing value, inserts
    // get the incoming value.
    q("q_m1b_on_create_set",
      "SELECT c_custkey AS k, c_name AS name, CASE WHEN c_custkey < 700 THEN 'old' ELSE 'new' END AS tag FROM customer WHERE c_custkey < 1200 ORDER BY k") { (s, d) =>
      Upsert.upsertNodes(existingNodes(s, d), incomingNodes(s, d), Seq("k"),
        onCreateOnly = Seq("tag")).orderBy("k")
    },
    // M2: null merge keys defaulted via coalesce (the reference's
    // 'None Provided' idiom, refresh-vmware.cypher:93-97), then key dedup.
    q("q_m2_coalesce_key",
      "SELECT coalesce(nullif(o_orderpriority, '5-LOW'), 'None Provided') AS k, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.orders(s, d)
        .select(coalesce(nullif(col("o_orderpriority"), lit("5-LOW")), lit("None Provided")).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    },
    // M3: undirected edge upsert — both orders collapse to one canonical key.
    // Spark side feeds the kernel (src,dst) AND (dst,src) duplicates; the
    // canonicalized store must equal the distinct (least,greatest) set.
    q("q_m3_edge_dedup_sym",
      "SELECT CAST(count(*) AS BIGINT) AS n_edges FROM (SELECT DISTINCT least(l_partkey, l_suppkey) AS a, greatest(l_partkey, l_suppkey) AS b FROM lineitem)") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val fwd = li.select(col("l_partkey").as("src"), col("l_suppkey").as("dst"),
        lit("LINKED").as("relType"), lit("t1").as("tenant"),
        map().cast("map<string,string>").as("props"))
      val rev = fwd.select(col("dst").as("src"), col("src").as("dst"),
        col("relType"), col("tenant"), col("props"))
      val empty = fwd.limit(0)
      Upsert.upsertEdges(empty, fwd.unionAll(rev), undirectedRelTypes = Set("LINKED"))
        .agg(count(lit(1)).as("n_edges"))
    },
    // M4: last-writer-wins inside a batch, deterministic order column.
    // NB (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // the order key must be a total order for determinism, so quantity
    // breaks ties (remaining ties then carry equal payloads).
    q("q_m4_last_writer_wins",
      "SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS last_qty FROM (SELECT l_orderkey, l_quantity, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_quantity DESC) AS rn FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey") { (s, d) =>
      Upsert.dedupeLastWriter(
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_linenumber"),
        keys = Seq("l_orderkey"), orderCols = Seq("l_linenumber", "l_quantity"))
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("last_qty"))
        .orderBy("l_orderkey")
    },
    // M7/M8: full mark-and-sweep cycle for one tenant. Old snapshot =
    // [0,1000) tagged stale; batch = [300,1500). Final state must be exactly
    // the batch: [0,300) swept (deleted), [1000,1500) inserted, overlap
    // updated. A second untouched tenant must pass through.
    q("q_m7_mark_sweep",
      "SELECT c_custkey AS k, c_name AS name, tenant FROM (SELECT c_custkey, c_name, 't1' AS tenant FROM customer WHERE c_custkey >= 300 AND c_custkey < 1500 UNION ALL SELECT c_custkey, c_name, 't2' AS tenant FROM customer WHERE c_custkey < 50) ORDER BY tenant, k") { (s, d) =>
      val c = Tables.customer(s, d)
      val oldT1 = c.filter(col("c_custkey") < 1000)
        .select(col("c_custkey").as("k"), lit("stale").as("name"), lit("t1").as("tenant"))
      val otherTenant = c.filter(col("c_custkey") < 50)
        .select(col("c_custkey").as("k"), col("c_name").as("name"), lit("t2").as("tenant"))
      val store = oldT1.unionAll(otherTenant)
      val batch = c.filter(col("c_custkey") >= 300 && col("c_custkey") < 1500)
        .select(col("c_custkey").as("k"), col("c_name").as("name"), lit("t1").as("tenant"))
      Upsert.markSweepNodes(store, batch, keys = Seq("k"), tenantCol = "tenant", tenant = "t1")
        .select(col("k"), col("name"), col("tenant"))
        .orderBy("tenant", "k")
    },
    // M5: edge properties through the REAL refresh path — a vInfo sheet
    // derived from the customer table flows through Ingest.run (all 14
    // statements), and the HW_VERSION edge (refresh-vmware.cypher:187,212)
    // must carry its `upgradestatus` prop, readable back via the edge's
    // endpoint nodes. The oracle states the same (vm, hwver, status)
    // mapping directly over customer.
    q("q_m5_edge_props",
      "SELECT c_name AS vm, CAST(c_custkey % 3 + 17 AS BIGINT) AS hwver, c_mktsegment AS upgradestatus FROM customer WHERE c_custkey < 200 ORDER BY vm") { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_custkey") < 200)
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
              else Workbook.withRowNo(Workbook.empty(s, Workbook.SheetColumns(n))))
      }.toMap
      def emptyOf(schema: org.apache.spark.sql.types.StructType) =
        s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
      val batch = Ingest.run(wb, emptyOf(Refresh.nodeSchema), emptyOf(Refresh.edgeSchema))
      val vms = batch.nodes.filter(col("label") === "Virtualmachine")
        .select(col("id").as("_vmid"), col("props")("name").as("vm"))
      val hw = batch.nodes.filter(col("label") === "Vhwver")
        .select(col("id").as("_hwid"), col("props")("name").cast("long").as("hwver"))
      batch.edges.filter(col("relType") === "HW_VERSION")
        .select(col("src"), col("dst"), col("props")("upgradestatus").as("upgradestatus"))
        .join(vms, col("src") === col("_vmid"))
        .join(hw, col("dst") === col("_hwid"))
        .select("vm", "hwver", "upgradestatus")
        .orderBy("vm")
    },
    // M8 extension: snapshot diff (CDC between two refreshes) — per-customer
    // order aggregates over two overlapping one-year-shifted windows, so all
    // three change types occur AND overlap-only customers exercise the
    // unchanged-row suppression. Dates compared at day granularity (the
    // testdata timestamps are whole days; TIMESTAMP↔DATE is exact here).
    q("q_m8_snapshot_diff",
      "WITH o1 AS (SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders, max(CAST(o_orderdate AS DATE)) AS last_date FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1), " +
        "o2 AS (SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders, max(CAST(o_orderdate AS DATE)) AS last_date FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1), " +
        "j AS (SELECT coalesce(o1.custkey, o2.custkey) AS custkey, " +
        "CASE WHEN o1.custkey IS NULL THEN 'added' WHEN o2.custkey IS NULL THEN 'removed' " +
        "WHEN o1.n_orders IS DISTINCT FROM o2.n_orders OR o1.last_date IS DISTINCT FROM o2.last_date THEN 'changed' END AS change_type, " +
        "o1.n_orders AS old_n_orders, o2.n_orders AS new_n_orders, o1.last_date AS old_last_date, o2.last_date AS new_last_date " +
        "FROM o1 FULL JOIN o2 ON o1.custkey = o2.custkey) " +
        "SELECT * FROM j WHERE change_type IS NOT NULL ORDER BY custkey") { (s, d) =>
      def snap(lo: String, hi: String): DataFrame =
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
            col("o_orderdate") < lit(hi).cast("timestamp"))
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            max(to_date(col("o_orderdate"))).as("last_date"))
      SnapshotDiff.diff(
          snap("1996-01-01", "1998-01-01"), snap("1997-01-01", "1999-01-01"),
          keys = Seq("custkey"), compareCols = Seq("n_orders", "last_date"))
        .orderBy("custkey")
    }
  )
}
