package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational coverage (SURVEY.md §2.2–§2.4, §2.6–§2.7): projections,
  * filters, equi/broadcast/semi/anti joins, aggregations, conditional
  * distinct counts, CASE pivots, distinct, set ops, top-k.
  *
  * Scale notes:
  *  - Aggregations get Catalyst partial (map-side) aggregation for free.
  *  - All dimension joins (`customer`→`nation`→`region`, `part`) use
  *    `broadcast()` — at 100 TB the fact side never shuffles for them.
  *  - Filters/projections are plain column predicates so they push into
  *    the parquet scan (verify `PushedFilters` in .explain).
  *  - Double aggregates are `round(…, 2)` on BOTH engine and oracle side:
  *    parallel summation order differs, so raw bits can't hash-match.
  */
object RelationalQueries {

  val qs: Seq[Q] = Seq(

    // ---- A1/A3: multi-aggregate rollup (reference: mart_mrr_waterfall_month.sql:29-51)
    Q.sql(
      "q_agg_rollup",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)                          AS sum_qty,
        |       round(sum(l_extendedprice), 2)                     AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
        |       count(*)                                           AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // ---- P1/P4/P14: filter + projection, pushed to the parquet scan
    Q.sql(
      "q_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.07""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_discount") > 0.07)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ---- P11: BETWEEN predicate
    Q.sql(
      "q_between",
      """SELECT l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
        |GROUP BY l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(10, 20))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
    },

    // ---- J-equi chain: orders⋈customer⋈nation⋈region, dims broadcast
    Q.sql(
      "q_join_equi_chain",
      """SELECT r_name, n_name,
        |       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
    },

    // ---- broadcast fact⋈dim join
    Q.sql(
      "q_join_broadcast_dim",
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          round(sum(col("l_quantity")), 2).as("qty"))
    },

    // ---- J6/J8: left equi join + COALESCE densify (reference: mart_mrr_waterfall_month.sql:74-76)
    Q.sql(
      "q_join_left_coalesce",
      """SELECT c_custkey, c_mktsegment,
        |       coalesce(n_orders, 0) AS n_orders,
        |       coalesce(total_spent, 0.0) AS total_spent
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders,
        |                  round(sum(o_totalprice), 2) AS total_spent
        |           FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin
    ) { (s, dir) =>
      val agg = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_spent"))
      Tables.customer(s, dir)
        .join(agg, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
    },

    // ---- semi join (EXISTS)
    Q.sql(
      "q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // ---- full outer join (completes the join-shape surface; nulls
    // survive on both sides and coalesce picks the present key)
    Q.sql(
      "q_join_full_outer",
      """SELECT coalesce(a.k, b.k) AS custkey, a.n_orders, b.seg
        |FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1) a
        |FULL OUTER JOIN (SELECT c_custkey AS k, c_mktsegment AS seg
        |                 FROM customer WHERE c_mktsegment = 'BUILDING') b
        |  ON a.k = b.k""".stripMargin
    ) { (s, dir) =>
      val a = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("ak")).agg(count(lit(1)).as("n_orders"))
      val b = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("bk"), col("c_mktsegment").as("seg"))
      a.join(b, col("ak") === col("bk"), "full_outer")
        .select(coalesce(col("ak"), col("bk")).as("custkey"), col("n_orders"), col("seg"))
    },

    // ---- array/list function surface over tokenized documents
    Q.sql(
      "q_array_funcs",
      """SELECT doc_id,
        |       CAST(len(list_distinct(t)) AS INT) AS n_unique,
        |       list_min(t) AS min_tok,
        |       array_to_string(t[1:3], ' ') AS head3,
        |       list_contains(t, 'the') AS has_the,
        |       CAST(len(list_filter(t, x -> len(x) > 5)) AS INT) AS n_long
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""".stripMargin
    ) { (s, dir) =>
      val t = split(col("text"), " ")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(array_distinct(t)).as("n_unique"),
        array_min(t).as("min_tok"),
        concat_ws(" ", slice(t, 1, 3)).as("head3"),
        array_contains(t, "the").as("has_the"),
        size(filter(t, x => length(x) > 5)).as("n_long"))
    },

    // ---- anti join (NOT EXISTS; reference: relationships tests J10)
    Q.sql(
      "q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // ---- P8: scalar subquery in predicate, kept IN-PLAN as a broadcast
    // 1-row agg (crossJoin(broadcast(agg))): one job, no driver
    // pre-collect — the repo's measured ~35% win over .first() scalars
    // (BASELINE.md r17 notes)
    Q.sql(
      "q_scalar_subquery",
      """SELECT l_returnflag, count(*) AS n_above_avg
        |FROM lineitem
        |WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      li.crossJoin(broadcast(li.agg(avg(col("l_quantity")).as("_avg_qty"))))
        .filter(col("l_quantity") > col("_avg_qty"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_above_avg"))
    },

    // ---- P9: DISTINCT
    Q.sql(
      "q_distinct",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"
    ) { (s, dir) =>
      Tables.orders(s, dir).select("o_orderstatus", "o_orderpriority").distinct()
    },

    // ---- P10: multi-arm searched CASE (reference: fct_account_month.sql:111-119)
    Q.sql(
      "q_case_multi_arm",
      """SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            WHEN o_totalprice < 300000 THEN 'large'
        |            ELSE 'jumbo' END AS band,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("band",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "mid")
            .when(col("o_totalprice") < 300000, "large")
            .otherwise("jumbo"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    },

    // ---- A6: conditional sum pivot (reference: fct_account_month.sql:149-153)
    Q.sql(
      "q_cond_sum_pivot",
      """SELECT o_orderpriority,
        |       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f_total,
        |       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS o_total,
        |       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS p_total,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      def condTotal(st: String) =
        round(sum(when(col("o_orderstatus") === st, col("o_totalprice")).otherwise(0)), 2)
      Tables.orders(s, dir).groupBy(col("o_orderpriority"))
        .agg(condTotal("F").as("f_total"), condTotal("O").as("o_total"),
          condTotal("P").as("p_total"), count(lit(1)).as("n"))
    },

    // ---- A4: conditional distinct count (reference: mart_mrr_waterfall_month.sql:44-47)
    Q.sql(
      "q_cond_count_distinct",
      """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
        |       count(DISTINCT CASE WHEN o_totalprice > 300000 THEN o_custkey END) AS big_buyers,
        |       count(DISTINCT o_custkey) AS buyers
        |FROM orders GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          countDistinct(when(col("o_totalprice") > 300000, col("o_custkey"))).as("big_buyers"),
          countDistinct(col("o_custkey")).as("buyers"))
    },

    // ---- A2/A5: global (ungrouped) min/max/avg aggregate
    Q.sql(
      "q_global_minmax",
      """SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        |       count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir).agg(
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"),
        count(lit(1)).as("n"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
    },

    // ---- O1: top-k with deterministic tiebreak
    Q.sql(
      "q_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // ---- set ops (§2.7 — absent in reference, part of the complete surface)
    Q.sql(
      "q_set_union",
      """SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS id FROM orders WHERE o_totalprice > 400000""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("id"))
        .union(Tables.orders(s, dir).filter(col("o_totalprice") > 400000).select(col("o_custkey").as("id")))
        .distinct()
    },

    Q.sql(
      "q_set_intersect",
      """SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS id FROM orders WHERE o_totalprice > 300000""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("id"))
        .intersect(Tables.orders(s, dir).filter(col("o_totalprice") > 300000).select(col("o_custkey").as("id")))
    },

    Q.sql(
      "q_set_except",
      """SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS id FROM orders""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("id"))
        .except(Tables.orders(s, dir).select(col("o_custkey").as("id")))
    },

    // ---- bag-semantics set ops (multiplicities preserved)
    Q.sql(
      "q_set_except_all",
      """SELECT o_custkey AS id FROM orders
        |EXCEPT ALL
        |SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'F'""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_custkey").as("id"))
        .exceptAll(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("id")))
    },

    Q.sql(
      "q_set_intersect_all",
      """SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey AS id FROM orders WHERE o_totalprice > 100000""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderstatus") === "O").select(col("o_custkey").as("id"))
        .intersectAll(Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("id")))
    },

    // ---- lateral unnest with ordinality (posexplode)
    Q.sql(
      "q_posexplode_ordinal",
      """SELECT c_custkey,
        |       CAST(unnest(generate_series(1, len(parts))) - 1 AS INT) AS pos,
        |       unnest(parts) AS token
        |FROM (SELECT c_custkey, string_split(c_name, '#') AS parts FROM customer) t""".stripMargin
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), split(col("c_name"), "#").as("parts"))
        .select(col("c_custkey"), posexplode(col("parts")).as(Seq("pos", "token")))
    }
  )
}
