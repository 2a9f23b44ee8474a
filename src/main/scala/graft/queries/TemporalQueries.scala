package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import graft.operators.{TemporalJoins, Upsert}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal join operators over the events stream, oracled against
  * DuckDB's NATIVE temporal joins (ASOF JOIN; inequality range join) —
  * the engine computes them with shuffle-friendly compositions
  * (union+window; binned equi-join), the oracle states the textbook
  * definition, results must match row for row.
  *
  * Timestamps: the as-of query runs at microsecond precision
  * (`ts_nanos div 1000` ≡ DuckDB `epoch_us(ts)`) — the generated nanos
  * carry sub-µs residue DuckDB's TIMESTAMP cannot represent, so µs is the
  * finest precision BOTH engines see identically (ordering is unaffected:
  * truncation is monotone and no two events share a µs). The range query
  * uses the established integer-second `ts_sec` ≡ `floor(epoch(ts))`
  * convention.
  */
object TemporalQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  val queries: Seq[OracleQuery] = Seq(
    // attach the latest prior click of the same user to every purchase.
    // Same-(user, ts) clicks dedup to the highest event_id first — an
    // exact-tie match would otherwise be ambiguous in BOTH engines.
    q("q_t_asof_join",
      "WITH clicks AS (SELECT * FROM (SELECT user_id, ts, event_id, value, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn FROM events WHERE event_type = 'click') WHERE rn = 1), " +
        "purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') " +
        "SELECT p.event_id AS event_id, p.user_id AS user_id, epoch_us(p.ts) AS ts_us, " +
        "c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us, c.value AS click_value " +
        "FROM purchases p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts " +
        "ORDER BY event_id") { (s, d) =>
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_nanos div 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = Upsert.dedupeLastWriter(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"),
            col("event_id").as("click_event_id"), col("value").as("click_value")),
        Seq("user_id", "ts_us"), Seq("click_event_id"))
      TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("click_event_id"), col("ts_us_right").as("click_ts_us"), col("click_value"))
        .orderBy("event_id")
    },
    // forward as-of: the NEXT click at-or-after each purchase — DuckDB's
    // native ASOF with the inequality flipped; same dedup discipline for
    // deterministic ties.
    q("q_t_asof_forward",
      "WITH clicks AS (SELECT * FROM (SELECT user_id, ts, event_id, value, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn FROM events WHERE event_type = 'click') WHERE rn = 1), " +
        "purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') " +
        "SELECT p.event_id AS event_id, p.user_id AS user_id, epoch_us(p.ts) AS ts_us, " +
        "c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us, c.value AS click_value " +
        "FROM purchases p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts >= p.ts " +
        "ORDER BY event_id") { (s, d) =>
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_nanos div 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = Upsert.dedupeLastWriter(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"),
            col("event_id").as("click_event_id"), col("value").as("click_value")),
        Seq("user_id", "ts_us"), Seq("click_event_id"))
      TemporalJoins.asofJoinForward(purchases, clicks, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("click_event_id"), col("ts_us_right").as("click_ts_us"), col("click_value"))
        .orderBy("event_id")
    },
    // purchases inside the 10-minute window opened by each error of the
    // same user (half-open [err, err+600)). The engine bins the time axis
    // and equi-joins; the oracle is the plain inequality join.
    q("q_t_range_join",
      "SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id AS user_id, " +
        "CAST(floor(epoch(p.ts)) AS BIGINT) AS p_ts, CAST(floor(epoch(e.ts)) AS BIGINT) AS err_start " +
        "FROM events p JOIN events e ON p.user_id = e.user_id " +
        "AND p.event_type = 'purchase' AND e.event_type = 'error' " +
        "AND CAST(floor(epoch(p.ts)) AS BIGINT) >= CAST(floor(epoch(e.ts)) AS BIGINT) " +
        "AND CAST(floor(epoch(p.ts)) AS BIGINT) < CAST(floor(epoch(e.ts)) AS BIGINT) + 600 " +
        "ORDER BY 1, 2") { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_sec").as("p_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"),
          col("ts_sec").as("err_start"), (col("ts_sec") + 600).as("err_end"))
      TemporalJoins.rangeJoin(purchases, "p_ts", errors, "err_start", "err_end",
          binWidth = 600, keys = Seq("user_id"))
        .select(col("purchase_id"), col("error_id"), col("user_id"),
          col("p_ts"), col("err_start"))
        .orderBy("purchase_id", "error_id")
    },
    // interval×interval: each error opens a 10-minute incident window,
    // each click a 5-minute activity window; pair the windows of the SAME
    // user that overlap. The engine bins both axes and equi-joins with
    // the emit-once first-overlap-bin rule; the oracle is the plain
    // inequality overlap join.
    q("q_t_interval_join",
      "SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id AS user_id, " +
        "CAST(floor(epoch(e.ts)) AS BIGINT) AS err_start, CAST(floor(epoch(c.ts)) AS BIGINT) AS click_start " +
        "FROM events e JOIN events c ON e.user_id = c.user_id " +
        "AND e.event_type = 'error' AND c.event_type = 'click' " +
        "AND CAST(floor(epoch(e.ts)) AS BIGINT) < CAST(floor(epoch(c.ts)) AS BIGINT) + 300 " +
        "AND CAST(floor(epoch(c.ts)) AS BIGINT) < CAST(floor(epoch(e.ts)) AS BIGINT) + 600 " +
        "ORDER BY 1, 2") { (s, d) =>
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"),
          col("ts_sec").as("err_start"), (col("ts_sec") + 600).as("err_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_sec").as("click_start"), (col("ts_sec") + 300).as("click_end"))
      TemporalJoins.intervalJoin(errors, "err_start", "err_end",
          clicks, "click_start", "click_end", binWidth = 600, keys = Seq("user_id"))
        .select(col("error_id"), col("click_id"), col("user_id"),
          col("err_start"), col("click_start"))
        .orderBy("error_id", "click_id")
    }
  )
}
