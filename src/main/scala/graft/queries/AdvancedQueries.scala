package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation/window capabilities beyond the reference's own surface that
  * SURVEY §2.4–§2.5 names as natively covered: rollup/cube/grouping sets,
  * distinct aggregates, lag/rank windows, date-part extraction. Group-by
  * columns in super-aggregate rows are coalesced to 'ALL' on both sides so
  * NULL-ordering differences between engines can't bite.
  */
object AdvancedQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  val queries: Seq[OracleQuery] = Seq(
    q("q_a5_rollup",
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ORDER BY 1, 2") { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
        .orderBy("status", "priority")
    },
    q("q_a6_cube",
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY CUBE(o_orderstatus, year(o_orderdate)) ORDER BY 1, 2") { (s, d) =>
      Tables.orders(s, d)
        .withColumn("yr0", year(col("o_orderdate")).cast("string"))
        .cube("o_orderstatus", "yr0")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("yr0"), lit("ALL")).as("yr"), col("n"))
        .orderBy("status", "yr")
    },
    q("q_a7_grouping_sets",
      "SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) ORDER BY 1, 2") { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("SELECT coalesce(o_orderstatus, 'ALL') AS status, " +
        "coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n " +
        "FROM orders_gs GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) " +
        "ORDER BY 1, 2")
    },
    q("q_a8_distinct_agg",
      "SELECT l_returnflag AS flag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part FROM lineitem GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct("l_suppkey").as("n_supp"), countDistinct("l_partkey").as("n_part"))
        .orderBy("flag")
    },
    q("q_w3_lag_lead",
      "SELECT o_custkey, o_orderkey, CAST(coalesce(lag(o_orderkey) OVER w, -1) AS BIGINT) AS prev_order, CAST(coalesce(lead(o_orderkey) OVER w, -1) AS BIGINT) AS next_order FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey) ORDER BY o_custkey, o_orderkey") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(lag("o_orderkey", 1).over(w), lit(-1L)).as("prev_order"),
          coalesce(lead("o_orderkey", 1).over(w), lit(-1L)).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    },
    q("q_w4_rank",
      "SELECT o_custkey, o_orderkey, CAST(rank() OVER w AS BIGINT) AS rnk, CAST(dense_rank() OVER w AS BIGINT) AS drnk FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) ORDER BY o_custkey, o_orderkey") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy("o_custkey", "o_orderkey")
    },
    // RANGE frame (value-based, not row-based): per-user sum over the
    // trailing 60 seconds of event time — peers at equal ts are all in
    // frame, so the result is order-independent; values scaled to exact
    // integers so no float accumulation order can bite.
    q("q_w5_range_frame",
      "SELECT event_id, user_id, ts_sec, CAST(sum(vc) OVER (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_60s " +
        "FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, CAST(round(value * 100) AS BIGINT) AS vc FROM events) ORDER BY event_id") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-59, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          round(col("value") * 100).cast("long").as("vc"))
        .withColumn("sum_60s", sum("vc").over(w))
        .select("event_id", "user_id", "ts_sec", "sum_60s")
        .orderBy("event_id")
    },
    q("q_f13_date_parts",
      "SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1, 2 ORDER BY 1, 2") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"))
        .orderBy("yr", "mo")
    },
    q("q_a9_minmax_avg",
      "SELECT l_returnflag AS flag, CAST(min(l_quantity) AS BIGINT) AS min_qty, CAST(max(l_quantity) AS BIGINT) AS max_qty, CAST(avg(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS avg_qty FROM lineitem GROUP BY 1 ORDER BY 1") { (s, d) =>
      // avg of integral values: sum exact in long → single division, both
      // engines compute sum/count in one step — identical double.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(min(col("l_quantity")).cast("long").as("min_qty"),
          max(col("l_quantity")).cast("long").as("max_qty"),
          avg(col("l_quantity").cast("long")).as("avg_qty"))
        .orderBy("flag")
    },
    // incremental aggregate maintenance: history folded as per-key partial
    // aggregates, delta batch merged WITHOUT re-reading history — must
    // equal the from-scratch aggregate (the oracle). Prices scaled to
    // cents so every sum is exact integer arithmetic.
    q("q_a10_incremental_agg",
      "SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents, CAST(min(cents) AS BIGINT) AS min_cents, CAST(max(cents) AS BIGINT) AS max_cents FROM (SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) GROUP BY 1 ORDER BY 1") { (s, d) =>
      import graft.operators.IncrementalAgg
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      val history = o.filter(col("o_orderkey") % 3 =!= 0)
      val delta = o.filter(col("o_orderkey") % 3 === 0)
      IncrementalAgg.merge(
          IncrementalAgg.partials(history, Seq("o_custkey"), "cents"),
          IncrementalAgg.partials(delta, Seq("o_custkey"), "cents"),
          Seq("o_custkey"))
        .select(col("o_custkey"), col("cnt"), col("sum").as("sum_cents"),
          col("min").as("min_cents"), col("max").as("max_cents"))
        .orderBy("o_custkey")
    },
    // incremental SKETCH state: KMV (distinct) and per-key CMS (frequency)
    // ride the same delta-fold path as the scalar partials — the fold is
    // provably ≡ from-scratch (IncrementalAggSpec merge law), so the
    // oracle states the from-scratch definition with the portable hash.
    q("q_a12_sketch_state", {
      import graft.llmops.PortableHash
      val (p, w, k) = (PortableHash.P, 64, 64)
      val hp = PortableHash.duckHash52("CAST(l_partkey AS VARCHAR)")
      val probeH = PortableHash.duckHash52("CAST(1 AS VARCHAR)")
      val perms = (0 until 4)
        .map(j => s"($j, ${PortableHash.MinHashA(j)}, ${PortableHash.MinHashB(j)})")
        .mkString(", ")
      s"WITH h AS (SELECT l_returnflag AS flag, $hp AS h FROM lineitem), " +
        "hs AS (SELECT DISTINCT flag, h FROM h), " +
        "r AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM hs), " +
        s"agg AS (SELECT flag, count(CASE WHEN rn <= $k THEN 1 END) AS nk, max(CASE WHEN rn = $k THEN h END) AS kth FROM r GROUP BY 1), " +
        s"perm(j, a, b) AS (SELECT * FROM (VALUES $perms)), " +
        s"cells AS (SELECT flag, j, (a * (h % $p) + b) % $p % $w AS bucket, count(*) AS cnt FROM h CROSS JOIN perm GROUP BY 1, 2, 3), " +
        s"probe AS (SELECT j, (a * ($probeH % $p) + b) % $p % $w AS bucket FROM perm), " +
        "est AS (SELECT f.flag, min(coalesce(c2.cnt, 0)) AS ef FROM (SELECT DISTINCT flag FROM cells) f CROSS JOIN probe pr LEFT JOIN cells c2 ON c2.flag = f.flag AND c2.j = pr.j AND c2.bucket = pr.bucket GROUP BY 1), " +
        "cnts AS (SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1) " +
        s"SELECT cnts.flag, cnts.cnt, round(CASE WHEN nk < $k THEN CAST(nk AS DOUBLE) ELSE CAST(${k - 1} AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) / kth END, 4) AS est_distinct, " +
        "CAST(est.ef AS BIGINT) AS est_freq_p1 " +
        "FROM cnts JOIN agg ON agg.flag = cnts.flag JOIN est ON est.flag = cnts.flag ORDER BY 1"
    }) { (s, d) =>
      import graft.operators.IncrementalAgg
      import graft.functions.{CountMin, KMinValues}
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"), col("l_partkey"), col("l_orderkey"))
      val hist = li.filter(col("l_orderkey") % 3 =!= 0)
      val delta = li.filter(col("l_orderkey") % 3 === 0)
      IncrementalAgg.mergeWithSketches(
          IncrementalAgg.partialsWithSketches(hist, Seq("flag"), "l_partkey", 64, 4, 64),
          IncrementalAgg.partialsWithSketches(delta, Seq("flag"), "l_partkey", 64, 4, 64),
          Seq("flag"), 64, 4, 64)
        .select(col("flag"), col("cnt"),
          round(KMinValues.estimate(col("kmv"), 64), 4).as("est_distinct"),
          CountMin.estimateArray(col("cms"), lit(1L), 4, 64).as("est_freq_p1"))
        .orderBy("flag")
    },
    // distinct-value quantiles from the bottom-k-by-hash sample state
    // (the third mergeable sketch; > k distinct partkeys per flag at
    // sf0.01+ so the SAMPLED branch is exercised). The oracle replays the
    // sample as ORDER BY hash LIMIT k, then the same lower-rank rule.
    q("q_a13_quantile_sketch", {
      import graft.llmops.PortableHash
      val k = 64
      val hp = PortableHash.duckHash52("CAST(l_partkey AS VARCHAR)")
      s"WITH h AS (SELECT l_returnflag AS flag, $hp AS h, l_partkey AS v FROM lineitem), " +
        "d AS (SELECT flag, h, min(v) AS v FROM h GROUP BY 1, 2), " +
        "r AS (SELECT flag, h, v, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM d), " +
        s"s AS (SELECT flag, v FROM r WHERE rn <= $k), " +
        "q AS (SELECT flag, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1), " +
        "ranked AS (SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY v) AS vr FROM s) " +
        "SELECT q.flag, CAST(max(CASE WHEN vr = (n - 1) * 50 // 100 + 1 THEN v END) AS BIGINT) AS p50_distinct, " +
        "CAST(max(CASE WHEN vr = (n - 1) * 90 // 100 + 1 THEN v END) AS BIGINT) AS p90_distinct " +
        "FROM ranked JOIN q ON q.flag = ranked.flag GROUP BY 1 ORDER BY 1"
    }) { (s, d) =>
      import graft.operators.IncrementalAgg
      import graft.functions.BottomKSample
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"), col("l_partkey"), col("l_orderkey"))
      val hist = li.filter(col("l_orderkey") % 3 =!= 0)
      val delta = li.filter(col("l_orderkey") % 3 === 0)
      IncrementalAgg.mergeWithSketches(
          IncrementalAgg.partialsWithSketches(hist, Seq("flag"), "l_partkey", 64, 4, 64),
          IncrementalAgg.partialsWithSketches(delta, Seq("flag"), "l_partkey", 64, 4, 64),
          Seq("flag"), 64, 4, 64)
        .select(col("flag"),
          BottomKSample.distinctQuantile(col("qs"), 50).as("p50_distinct"),
          BottomKSample.distinctQuantile(col("qs"), 90).as("p90_distinct"))
        .orderBy("flag")
    },
    // exact per-group MODE (most frequent value, ties → smallest): a
    // two-stage aggregation — count per (group, value) with map-side
    // combine, then a combining max_by argmax — never a per-group window
    // over raw rows; the scalable form of the "typical value" report.
    q("q_a14_group_mode",
      "WITH c AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1, 2) " +
        "SELECT flag, qty AS mode_qty, cnt AS mode_count FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY flag ORDER BY cnt DESC, qty) AS rn FROM c) r WHERE rn = 1 ORDER BY flag") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("flag")
        .agg(max_by(struct(col("qty"), col("cnt")),
          struct(col("cnt"), -col("qty"))).as("m"))
        .select(col("flag"), col("m.qty").as("mode_qty"),
          col("m.cnt").as("mode_count"))
        .orderBy("flag")
    },
    // global top-k by value with deterministic ties (Q-W7): Spark plans
    // ORDER BY + LIMIT as TakeOrderedAndProject — per-partition top-k then
    // a k-row merge on the driver, never a global sort.
    q("q_w7_global_topk",
      "SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders ORDER BY cents DESC, o_orderkey LIMIT 50") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy(col("cents").desc, col("o_orderkey"))
        .limit(50)
    },
    // batch gap-sessionization (Q-W6): session boundaries where the
    // per-user event gap exceeds 10 minutes, session ids by running sum of
    // boundary flags — the batch twin of the streaming session window
    // (q_st4), deterministic ties on (ts, event_id).
    q("q_w6_session_assign",
      "WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events), " +
        "d AS (SELECT user_id, event_id, ts_sec, CASE WHEN ts_sec - lag(ts_sec) OVER w > 600 OR lag(ts_sec) OVER w IS NULL THEN 1 ELSE 0 END AS brk FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)) " +
        "SELECT user_id, event_id, ts_sec, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no " +
        "FROM d ORDER BY user_id, ts_sec, event_id") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_sec"))
        .withColumn("brk",
          when(col("ts_sec") - lag("ts_sec", 1).over(w) > 600
            || lag("ts_sec", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session_no",
          sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select("user_id", "event_id", "ts_sec", "session_no")
        .orderBy("user_id", "ts_sec", "event_id")
    },
    // Z-order (Morton) layout key: interleave two dimensions into one
    // sort key so range-partitioned/sorted files serve min-max skipping
    // on BOTH columns. The oracle states the same interleave as a 64-term
    // shift/or (the composable form the custom expression replaces).
    q("q_x_zorder_key", {
      val zTerms = (0 until 32).flatMap(i => Seq(
        s"(((o_custkey >> $i) & 1) << ${2 * i})",
        s"(((o_orderkey >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"SELECT o_orderkey, o_custkey, CAST($zTerms AS BIGINT) AS z FROM orders ORDER BY o_orderkey"
    }) { (s, d) =>
      import org.apache.spark.sql.graftfn.BitInterleave
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          BitInterleave.zorder(col("o_custkey"), col("o_orderkey")).as("z"))
        .orderBy("o_orderkey")
    },
    // exact per-group quantiles by rank selection (lower quantile, no
    // interpolation — always an actual data value, engine-portable):
    // rank = floor((n-1)*p/100)+1 in ascending order, one shuffle.
    q("q_a11_group_quantiles",
      "WITH c AS (SELECT o_orderstatus AS status, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "r AS (SELECT status, cents, row_number() OVER (PARTITION BY status ORDER BY cents) AS rn, count(*) OVER (PARTITION BY status) AS cnt FROM c) " +
        "SELECT status, CAST(max(CASE WHEN rn = (cnt - 1) * 50 // 100 + 1 THEN cents END) AS BIGINT) AS p50, " +
        "CAST(max(CASE WHEN rn = (cnt - 1) * 90 // 100 + 1 THEN cents END) AS BIGINT) AS p90, " +
        "CAST(max(CASE WHEN rn = (cnt - 1) * 99 // 100 + 1 THEN cents END) AS BIGINT) AS p99 " +
        "FROM r GROUP BY status ORDER BY status") { (s, d) =>
      import graft.operators.Quantiles
      val c = Tables.orders(s, d)
        .select(col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      Quantiles.perGroup(c, Seq("status"), "cents", Seq(50, 90, 99))
        .orderBy("status")
    }
  )
}
