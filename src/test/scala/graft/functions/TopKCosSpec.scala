package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the native bounded top-k aggregate: must equal the
  * row_number-window form it replaces, bit-for-bit, including the
  * (cos DESC, vec_id ASC) tie order — under any partitioning (the
  * merge path must be order-insensitive). */
class TopKCosSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val cos = $"dot" / sqrt($"nq".cast("double") * $"nc".cast("double"))
    val w = Window.partitionBy($"query_id").orderBy(cos.desc, $"vec_id")
    df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"vec_id", $"rnk", cos.as("cos"))
      .as[(Long, Long, Int, Double)].collect().toSet
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    graft.functions.GraftFunctions.register(spark)
    df.groupBy($"query_id")
      .agg(expr(s"topk_cos(struct(vec_id, dot, nq, nc), $k)").as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.vec_id", ($"pos" + 1).cast("int"), $"col.cos")
      .as[(Long, Long, Int, Double)].collect().toSet
  }

  test("topk_cos ≡ row_number window, ties to lowest vec_id, any partitioning") {
    // two queries; query 1 has an exact cosine TIE (identical dot/nq/nc
    // on vec 30 and 31) that must break to the lower vec_id; more rows
    // than k so the bound actually trims
    val rows = Seq(
      (1L, 10L, 50L, 4L, 25L), (1L, 30L, 30L, 4L, 9L), (1L, 31L, 30L, 4L, 9L),
      (1L, 12L, 10L, 4L, 100L), (1L, 13L, -5L, 4L, 25L),
      (2L, 20L, 7L, 9L, 49L), (2L, 21L, 8L, 9L, 64L), (2L, 22L, 6L, 9L, 36L))
      .toDF("query_id", "vec_id", "dot", "nq", "nc")
    for (parts <- Seq(1, 3, 7); k <- Seq(1, 2, 3, 10)) {
      val df = rows.repartition(parts)
      assert(viaAgg(df, k) == viaWindow(df, k), s"parts=$parts k=$k")
    }
  }

  test("topk_cos degenerate zero-norm input: deterministic NaN-first (where ANSI division errors)") {
    // a zero-norm candidate (nc = 0) has cos = 0/0 = NaN. Under Spark 4's
    // default ANSI mode the DECLARATIVE forms cannot even express this —
    // the division throws DIVIDE_BY_ZERO (pinned below) — so the
    // aggregate defines the engine's degenerate-input contract by
    // itself: Double.compare ordering, i.e. NaN ranks FIRST, matching
    // Spark's and DuckDB's sort order for NaN (largest double).
    val rows = Seq(
      (1L, 10L, 50L, 4L, 25L), (1L, 11L, 40L, 4L, 25L),
      (1L, 99L, 0L, 4L, 0L)) // NaN cosine
      .toDF("query_id", "vec_id", "dot", "nq", "nc")
    for (parts <- Seq(1, 3)) {
      val agg = viaAgg(rows.repartition(parts), 2).map(r => (r._1, r._2, r._3))
      assert(agg == Set((1L, 99L, 1), (1L, 10L, 2)), s"parts=$parts agg=$agg")
    }
    // the intercepted task failure would still stack-trace at ERROR in
    // the CI log — silence executor logging for the deliberate failure
    spark.sparkContext.setLogLevel("FATAL")
    try {
      val ansiErr = intercept[Exception](viaWindow(rows, 2))
      assert(ansiErr.getMessage.contains("DIVIDE_BY_ZERO"), ansiErr.getMessage)
    } finally spark.sparkContext.setLogLevel("WARN")
  }

  test("property: topk_cos ≡ window on seeded random inputs with forced ties") {
    // the SessionizePropertySpec idiom: seeded random trials instead of
    // hand-picked fixtures. Small value domains force frequent EXACT
    // cosine ties (same dot/nq/nc), exercising the (cos DESC, vec_id)
    // tie path and the bounded merge under random partitionings.
    val rnd = new scala.util.Random(20260813)
    for (trial <- 1 to 12) {
      val nQ = 1 + rnd.nextInt(3)
      val rows = (0 until 40 + rnd.nextInt(80)).map { i =>
        (rnd.nextInt(nQ).toLong, i.toLong,
          (rnd.nextInt(7) - 3).toLong, // dot in [-3, 3]: ties guaranteed
          (1 + rnd.nextInt(3)).toLong, (1 + rnd.nextInt(3)).toLong)
      }.toDF("query_id", "vec_id", "dot", "nq", "nc")
        .repartition(1 + rnd.nextInt(6))
      val k = 1 + rnd.nextInt(6)
      assert(viaAgg(rows, k) == viaWindow(rows, k), s"trial=$trial k=$k")
    }
  }

  test("topk_cos partial aggregation collapses map-side (plan + skew shape)") {
    graft.functions.GraftFunctions.register(spark)
    val big = spark.range(10000).select(
      (col("id") % 2).as("query_id"), col("id").as("vec_id"),
      (col("id") % 97).as("dot"), lit(4L).as("nq"), lit(25L).as("nc"))
    val top = big.groupBy($"query_id")
      .agg(expr("topk_cos(struct(vec_id, dot, nq, nc), 5)").as("top"))
    assert(top.count() == 2)
    val plan = top.queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial phase: per-partition buffers of
    // ≤k rows cross the exchange, never the 10k candidates
    assert(plan.contains("topk_cos"), plan)
    assert(plan.toLowerCase.contains("partial_topk_cos"), plan)
  }
}
