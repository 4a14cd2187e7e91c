package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational coverage (SURVEY.md §2.2–§2.4, §2.6): projections,
  * filters, equi/broadcast joins, aggregations, distinct, top-k.
  *
  * Scale notes: aggregations rely on Catalyst partial (map-side) agg;
  * dimension joins (`nation`, `region`, `part`, `supplier`) are
  * broadcast — at 100 TB the fact side never shuffles for those.
  */
object RelationalQueries {

  val qs: Seq[Q] = Seq(

    // A1/A3 multi-aggregate rollup over the biggest table (TPC-H Q1 shape;
    // reference analogue: mart_mrr_waterfall_month.sql:29-51 rollup).
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
    }
  )
}
