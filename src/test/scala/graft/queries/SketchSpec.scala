package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch rollup (q_approx_count_distinct):
  * HLL++ at rsd=0.02 must land within 5% of the exact distinct count. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val rows = graft.SparkEntry.queries("q_approx_count_distinct")(spark, "/root/testdata/sf0.001")
      .select($"approx_buyers", $"exact_buyers").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"approx=$approx exact=$exact")
    }
  }

  test("approx_percentile within 2% of exact per quartile at sf0.001") {
    val rows = graft.SparkEntry.queries("q_approx_percentile")(spark, "/root/testdata/sf0.001")
      .select($"approx_p", $"exact_p").as[(Seq[Double], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.02, s"approx=$a exact=$e")
      }
    }
  }
}
