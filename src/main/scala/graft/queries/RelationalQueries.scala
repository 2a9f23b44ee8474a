package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1–§2.6 query shapes: scans, predicates, joins, aggregations,
  * window, set ops — each with its DuckDB oracle SQL.
  *
  * Parity rules used throughout (see also ScalarFuncQueries):
  *  - every result is deterministically ordered and column-aliased
  *    identically in Spark and SQL (the driver hashes by column name);
  *  - counts are BIGINT on both sides (DuckDB SUM(int) returns HUGEINT →
  *    always CAST in the SQL);
  *  - fractional-double aggregates go through DECIMAL so partial-aggregation
  *    order cannot change low bits (sum of doubles is order-sensitive;
  *    sum of decimals is exact), then CAST back to DOUBLE.
  */
object RelationalQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  val queries: Seq[OracleQuery] = Seq(
    // ---- S: scans / sources / sinks (SURVEY §2.1) ----
    q("q_s1_scan_count",
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem") { (s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))
    },
    q("q_s2_roundtrip",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, d) =>
      // Sink S2: write the canonical frame, read it back — the parquet
      // round-trip is the store's write path in miniature.
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip"
      Tables.region(s, d).select("r_regionkey", "r_name")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp).orderBy("r_regionkey")
    },
    q("q_s4_unique_check",
      "SELECT CAST(count(*) AS BIGINT) AS dup_keys FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)") { (s, d) =>
      // S4: the uniqueness constraint as a post-write assertion.
      Tables.customer(s, d).groupBy("c_custkey").count()
        .filter(col("count") > 1)
        .agg(count(lit(1)).as("dup_keys"))
    },

    // ---- P: projections / filters (SURVEY §2.2) ----
    q("q_p1_project",
      "SELECT c_custkey AS id, upper(c_mktsegment) AS segment, c_acctbal AS bal FROM customer ORDER BY id") { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey").as("id"),
          upper(col("c_mktsegment")).as("segment"),
          col("c_acctbal").as("bal"))
        .orderBy("id")
    },
    q("q_p3_regex_anchored",
      "SELECT c_custkey, c_name FROM customer WHERE regexp_full_match(c_name, 'Customer#0*1[0-9]{2}') ORDER BY c_custkey") { (s, d) =>
      // Cypher `=~` is a FULL match (refresh-vmware.cypher:110); Spark rlike
      // is substring — anchor explicitly.
      Tables.customer(s, d)
        .filter(col("c_name").rlike("^(?:Customer#0*1[0-9]{2})$"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    q("q_p4_regex_negated",
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM customer WHERE NOT regexp_full_match(c_name, 'Customer#0*1[0-9]{2}')") { (s, d) =>
      Tables.customer(s, d)
        .filter(!col("c_name").rlike("^(?:Customer#0*1[0-9]{2})$"))
        .agg(count(lit(1)).as("cnt"))
    },
    q("q_p5_neq_filter",
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM orders WHERE o_orderstatus <> 'F'") { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderstatus") =!= "F").agg(count(lit(1)).as("cnt"))
    },
    q("q_p6_range_filter",
      "SELECT CAST(count(*) AS BIGINT) AS cnt, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem WHERE l_quantity >= 30") { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_quantity") >= 30)
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("sum_qty"))
    },
    q("q_p7_null_checks",
      "SELECT CAST(sum(CASE WHEN nullif(o_orderstatus,'F') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(sum(CASE WHEN nullif(o_orderstatus,'F') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_notnull FROM orders") { (s, d) =>
      val st = nullif(col("o_orderstatus"), lit("F"))
      Tables.orders(s, d).agg(
        sum(when(st.isNull, 1).otherwise(0)).as("n_null"),
        sum(when(st.isNotNull, 1).otherwise(0)).as("n_notnull"))
    },

    // ---- J: joins (SURVEY §2.3) ----
    q("q_j1_inner_join",
      "SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("segment")
    },
    q("q_j2_threeway_join",
      "SELECT c_mktsegment AS segment, o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_items, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2 ORDER BY 1, 2") { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("segment", "status")
    },
    q("q_j3_left_join",
      "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    q("q_j4_symmetric_pair",
      "SELECT least(l_partkey, l_suppkey) AS a, greatest(l_partkey, l_suppkey) AS b, CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2") { (s, d) =>
      // Undirected-edge join key (SURVEY J4/M3): canonicalized (min,max) pair.
      Tables.lineitem(s, d)
        .select(least(col("l_partkey"), col("l_suppkey")).as("a"),
          greatest(col("l_partkey"), col("l_suppkey")).as("b"),
          col("l_quantity"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("a", "b")
    },
    q("q_j5_dim_hop",
      "SELECT r_name AS region, CAST(count(*) AS BIGINT) AS n_customers FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY 1 ORDER BY 1") { (s, d) =>
      // node ⋈ edge ⋈ node two-hop: dims are tiny → broadcast them, the fact
      // side never shuffles.
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("region")
    },
    q("q_j6_self_join",
      "SELECT a.n_name AS nation_a, b.n_name AS nation_b FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey ORDER BY 1, 2") { (s, d) =>
      // Parent/child hierarchy resolution (refresh-vmware.cypher:69-71) is a
      // self-join on a derived key — same shape here.
      val n = Tables.nation(s, d)
      val a = n.select(col("n_nationkey").as("ak"), col("n_regionkey").as("ar"), col("n_name").as("nation_a"))
      val b = n.select(col("n_nationkey").as("bk"), col("n_regionkey").as("br"), col("n_name").as("nation_b"))
      a.join(b, col("ar") === col("br") && col("ak") < col("bk"))
        .select("nation_a", "nation_b")
        .orderBy("nation_a", "nation_b")
    },
    // MERGE match-phase anti-join against a BATCH SLICE (orders with
    // orderkey ≡ 0 mod 4): the unfiltered version is vacuously empty on
    // this data (every customer has orders — a 0 = 0 oracle match proves
    // nothing), the slice leaves real survivors at every SF.
    q("q_j7a_anti_join",
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderkey % 4 = 0) ORDER BY c_custkey") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderkey") % 4 === 0),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    q("q_j7b_semi_join",
      "SELECT CAST(count(*) AS BIGINT) AS n FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    },
    q("q_j8_sweep_anti",
      "SELECT p_partkey, p_name FROM part WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49) ORDER BY p_partkey") { (s, d) =>
      // The sweep (M8) is exactly this anti-join: rows of the store no
      // batch row touched. The batch is the high-quantity lineitem slice —
      // suppliers are densely covered by ANY slice on this data (a plain
      // supplier sweep is vacuously empty, proving nothing), parts are
      // not: ~11k survive at sf0.1.
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") > 49),
          col("l_partkey") === col("p_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },
    // J9: skew-salted inner join through the real operator — result must be
    // row-for-row the plain join (the oracle states the plain join; salting
    // is a physical rewrite only).
    q("q_j9_salted_join",
      "SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n_items, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1 ORDER BY 1") { (s, d) =>
      val right = Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      val left = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
      // hotThreshold 600 ≈ the per-supplier lineitem mean at every TPC-H
      // SF, so roughly half the keys go through the salted hot branch and
      // half through the plain cold branch — both paths oracled.
      graft.operators.SkewJoin.saltedInnerJoin(left, right, Seq("suppkey"),
        salts = 8, hotThreshold = 600L)
        .groupBy("suppkey")
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("suppkey")
    },

    // ---- A: aggregations (SURVEY §2.4) ----
    q("q_a1_distinct",
      "SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority FROM orders ORDER BY 1, 2") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
        .distinct()
        .orderBy("status", "priority")
    },
    q("q_a2_group_count",
      "SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy("status")
    },
    q("q_a3_dedup_first",
      "SELECT c_nationkey AS nationkey, min(c_name) AS first_name FROM customer GROUP BY 1 ORDER BY 1") { (s, d) =>
      // MERGE-as-aggregation (A3): collapse N rows per business key to one —
      // deterministic `min` stands in for Cypher's first-writer.
      Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(min(col("c_name")).as("first_name"))
        .orderBy("nationkey")
    },
    q("q_a4_coalesce_merge",
      "SELECT c_custkey, CAST(coalesce(oc.cnt, 0) AS BIGINT) AS n_orders FROM customer LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) oc ON c_custkey = o_custkey ORDER BY c_custkey") { (s, d) =>
      // ON CREATE SET lowers to a coalesce-merge of keyed frames (A4).
      val oc = Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d)
        .join(oc, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey")
    },

    // ---- W: window functions (SURVEY §2.5 — capability pin) ----
    q("q_w1_row_number",
      "SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    },
    q("q_w2_running_sum",
      "SELECT o_custkey, o_orderkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total FROM orders ORDER BY o_custkey, o_orderkey") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- U: set operations (SURVEY §2.6) ----
    q("q_u1_union_all",
      "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT c_custkey FROM customer WHERE c_acctbal >= 0 UNION ALL SELECT c_custkey FROM customer WHERE c_acctbal < 0)") { (s, d) =>
      val c = Tables.customer(s, d)
      c.filter(col("c_acctbal") >= 0).select("c_custkey")
        .unionAll(c.filter(col("c_acctbal") < 0).select("c_custkey"))
        .agg(count(lit(1)).as("n"))
    },
    q("q_u2_except_empty",
      "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT c_custkey FROM customer EXCEPT SELECT c_custkey FROM customer)") { (s, d) =>
      val keys = Tables.customer(s, d).select("c_custkey")
      keys.except(keys).agg(count(lit(1)).as("n"))
    },
    q("q_u3_intersect",
      "SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)") { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .agg(count(lit(1)).as("n"))
    }
  )
}
