package graft.queries

import graft.{OracleQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 scalar functions (F1–F12) and §2.8 dataflow/multiplicity
  * operators (D1–D3), each pinned against the DuckDB oracle.
  *
  * Traps encoded here (SURVEY §7.3):
  *  - Cypher list index is 0-based, Spark `element_at` and DuckDB `[i]` are
  *    1-based — all query shapes use 1-based consistently;
  *  - Cypher `split` takes a literal, Spark `split` a regex → escape where
  *    the delimiter is a metacharacter;
  *  - Cypher `last(list)` = `element_at(col, -1)` = DuckDB `[-1]`.
  */
object ScalarFuncQueries extends QueryModule {

  private def q(name: String, sql: String)(run: (SparkSession, String) => DataFrame) =
    OracleQuery(name, run, Some(sql))

  val queries: Seq[OracleQuery] = Seq(
    // F1/F2: split + index
    q("q_f1_split_index",
      "SELECT c_custkey, CAST(string_split(c_name, '#')[2] AS INTEGER) AS custno FROM customer ORDER BY c_custkey") { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          element_at(split(col("c_name"), "#"), 2).cast("int").as("custno"))
        .orderBy("c_custkey")
    },
    // F3: last(list)
    q("q_f3_last_segment",
      "SELECT p_partkey, string_split(p_name, ' ')[-1] AS last_word FROM part ORDER BY p_partkey") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          element_at(split(col("p_name"), " "), -1).as("last_word"))
        .orderBy("p_partkey")
    },
    // F4: literal replace
    q("q_f4_replace",
      "SELECT p_partkey, replace(p_type, 'ECONOMY', 'ECO') AS ptype FROM part ORDER BY p_partkey") { (s, d) =>
      // Cypher replace() is literal, not regex → SQL `replace`, not
      // regexp_replace (SURVEY F4).
      Tables.part(s, d)
        .select(col("p_partkey"),
          expr("replace(p_type, 'ECONOMY', 'ECO')").as("ptype"))
        .orderBy("p_partkey")
    },
    // F5: trim
    q("q_f5_trim",
      "SELECT p_partkey, trim(concat('  ', p_brand, '  ')) AS brand FROM part ORDER BY p_partkey") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand"))
        .orderBy("p_partkey")
    },
    // F6: coalesce over nulls
    q("q_f6_coalesce",
      "SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'F'), 'FINISHED') AS status FROM orders ORDER BY o_orderkey") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("F")), lit("FINISHED")).as("status"))
        .orderBy("o_orderkey")
    },
    // F7: toInt cast + aggregate
    q("q_f7_cast_agg",
      "SELECT CAST(sum(CAST(string_split(c_name, '#')[2] AS BIGINT)) AS BIGINT) AS total FROM customer") { (s, d) =>
      Tables.customer(s, d)
        .agg(sum(element_at(split(col("c_name"), "#"), 2).cast("long")).as("total"))
    },
    // F8: string concat (null-propagating on both sides)
    q("q_f8_concat",
      "SELECT s_suppkey, s_name || ' [' || CAST(s_nationkey AS VARCHAR) || ']' AS tag FROM supplier ORDER BY s_suppkey") { (s, d) =>
      Tables.supplier(s, d)
        .select(col("s_suppkey"),
          concat(col("s_name"), lit(" ["), col("s_nationkey").cast("string"), lit("]")).as("tag"))
        .orderBy("s_suppkey")
    },
    // F10: length(list) = size(split(...))
    q("q_f10_size_split",
      "SELECT p_partkey, CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words FROM part ORDER BY p_partkey") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey")
    },
    // F12: CASE WHEN projection
    q("q_f12_case_when",
      "SELECT o_orderkey, CASE WHEN o_totalprice >= 100000 THEN 'big' WHEN o_totalprice >= 10000 THEN 'mid' ELSE 'small' END AS bucket FROM orders ORDER BY o_orderkey") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") >= 100000, "big")
            .when(col("o_totalprice") >= 10000, "mid")
            .otherwise("small").as("bucket"))
        .orderBy("o_orderkey")
    },

    // D1: UNWIND = explode(split(...))
    q("q_d1_explode",
      "SELECT word, CAST(count(*) AS BIGINT) AS n FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy("word")
    },
    // D2: FOREACH-CASE conditional write ≡ filtered branch — equivalence pin
    q("q_d2_conditional_write",
      "SELECT (SELECT CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) FROM lineitem) AS via_case, (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_discount > 0.05) AS via_filter") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val viaCase = li.agg(count(when(col("l_discount") > 0.05, 1)).as("via_case"))
      val viaFilter = li.filter(col("l_discount") > 0.05).agg(count(lit(1)).as("via_filter"))
      viaCase.crossJoin(viaFilter)
    },
    // D3: staged writes — stage-1 superset, stage-2 after the extra match
    q("q_d3_staged_writes",
      "SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders JOIN customer ON o_custkey = c_custkey) AS stage1, (SELECT CAST(count(*) AS BIGINT) FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0) AS stage2") { (s, d) =>
      val st1 = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      val stage1 = st1.agg(count(lit(1)).as("stage1"))
      val stage2 = st1
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 0)
        .agg(count(lit(1)).as("stage2"))
      stage1.crossJoin(stage2)
    }
  )
}
