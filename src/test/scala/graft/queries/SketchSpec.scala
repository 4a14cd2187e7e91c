package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch rollup (q_approx_count_distinct):
  * HLL++ at rsd=0.02 must land within 5% of the exact distinct count. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val exact = graft.Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("exact"))
    val rows = graft.SparkEntry.queries("q_approx_count_distinct")(spark, dir)
      .join(exact, "o_orderpriority")
      .select($"approx_buyers", $"exact").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"approx=$approx exact=$exact")
    }
  }

  test("approx_percentile within 2% of exact per quartile at sf0.001") {
    // exact side exploded to the same scalar (flag, pct, value) shape the
    // query now emits (array cells are unsortable by the rows-only harness)
    val exact = graft.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("exact_p"))
      .select($"l_returnflag", posexplode($"exact_p").as(Seq("pct_idx", "exact_v")))
      .withColumn("pct", element_at(array(lit(0.25), lit(0.5), lit(0.75)), $"pct_idx" + 1))
    val rows = graft.SparkEntry.queries("q_approx_percentile")(spark, dir)
      .join(exact, Seq("l_returnflag", "pct"))
      .select($"approx_value", $"exact_v").as[(Double, Double)].collect()
    assert(rows.length == 9) // 3 flags × 3 quartiles
    rows.foreach { case (a, e) =>
      assert(math.abs(a - e) / e <= 0.02, s"approx=$a exact=$e")
    }
  }
}
