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

  test("incremental HLL UV: unioned per-batch sketches ≡ one-shot sketch, within 5% of exact") {
    // the mergeable-sketch materialization's two contracts: (1) HLL
    // merge is register-max, so the union of per-batch sketches gives
    // EXACTLY the one-shot sketch's estimate — incremental accumulation
    // loses nothing vs a full rescan; (2) the estimate is within the
    // sketch's error bound of the exact distinct count
    val got = graft.SparkEntry.queries("q_uv_sketch_incremental")(spark, dir)
      .select($"day".cast("string"), $"uv").as[(String, Long)].collect().toMap
    assert(got.nonEmpty)
    val ev = graft.Tables.events(spark, dir)
      .select(to_date($"ts").as("day"), $"user_id")
    val oneShot = ev.groupBy($"day")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("uv"))
      .select($"day".cast("string"), $"uv").as[(String, Long)].collect().toMap
    assert(got == oneShot, s"unioned=$got oneShot=$oneShot")
    val exact = ev.groupBy($"day")
      .agg(countDistinct($"user_id").as("exact"))
      .select($"day".cast("string"), $"exact").as[(String, Long)].collect().toMap
    got.foreach { case (day, uv) =>
      val e = exact(day)
      assert(math.abs(uv - e).toDouble / e <= 0.05, s"$day uv=$uv exact=$e")
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
