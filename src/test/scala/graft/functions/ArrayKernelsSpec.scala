package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r21 native scan kernels must be BIT-IDENTICAL to the interpreted
  * higher-order-function chains they replaced — every consumer is an
  * oracle-hash-checked board query, so "close" is a regression. Each
  * test replays the ORIGINAL HOF expression next to the native one on
  * adversarial inputs (ties at .5, negatives, NaN/Inf, nulls, empty
  * arrays, overflow-sized docs) and requires zero differing rows. */
class ArrayKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def withFn[T](f: => T): T = { GraftFunctions.register(spark); f }

  test("quantize_i64 ≡ transform(x -> cast(round(x * 100, 0) as bigint)) on in-contract inputs incl. ties, nulls") {
    withFn {
      val rnd = new scala.util.Random(42)
      // in-contract: finite, |x·100| < 2^63 (the quantization bound the
      // scaladoc requires — every consumer feeds ±O(1) embeddings)
      val adversarial: Seq[Seq[java.lang.Double]] = Seq(
        Seq(0.005, -0.005, 0.015, -0.015, 0.025), // .5 ties both signs
        Seq(2.675, 1.005, -1.005, 0.1 + 0.2),     // classic repr edge cases
        Seq(1e15, -1e15, 9.22e15),                // large but in-range
        Seq(null, 0.0, -0.0, null),
        Seq.empty)
      val random = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(8))(
        java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8)))))
      val df = (adversarial ++ random).toDF("a")
        .withColumn("native", expr("quantize_i64(a)"))
        .withColumn("hof", transform(col("a"), x => round(x * 100, 0).cast("long")))
      assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }

  test("quantize_i64 ≡ the HOF on array<float> — the parquet embedding type (float multiply, float round)") {
    withFn {
      val rnd = new scala.util.Random(43)
      // float-specific adversarial values: float×100 results that differ
      // from the double path (0.1f widens to 0.10000000149…), .5 ties
      // reached only after FLOAT multiplication, negative ties, nulls
      val adversarial: Seq[Seq[java.lang.Float]] = Seq(
        Seq(0.005f, -0.005f, 0.015f, -0.015f, 0.025f),
        Seq(0.1f, 0.2f, 0.3f, 2.675f, 1.005f, -1.005f),
        Seq(0.115f, -0.115f, 0.135f, 8.3886075e5f), // 8.3886075e5f*100f lands on a .5 in float
        Seq(null, 0.0f, -0.0f, null),
        Seq.empty)
      val random = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(8))(
        java.lang.Float.valueOf(((rnd.nextFloat() - 0.5f) *
          math.pow(10, rnd.nextInt(6)).toFloat))))
      val df = (adversarial ++ random).toDF("a")
        .withColumn("native", expr("quantize_i64(a)"))
        .withColumn("hof", transform(col("a"), x => round(x * 100, 0).cast("long")))
      assert(df.schema("a").dataType ==
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
      assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }

  test("roundHalfUp ≡ BigDecimal.setScale(0, HALF_UP) — million-value sweep incl. exact .5 ties, tie neighbors, ≥2^52") {
    // the r21 BigDecimal-free fast path must agree with the EXACT Spark
    // round-double semantics (BigDecimal.valueOf(y).setScale(0, HALF_UP))
    // on every finite double — this sweep hammers the only decision
    // boundary (the n + 0.5 tie) from both sides at full precision, plus
    // magnitudes where doubles are integral (≥ 2^52), subnormals and
    // signed zeros, against BigDecimal itself
    def oracle(y: Double): Double = java.math.BigDecimal.valueOf(y)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    def check(y: Double): Unit = {
      val got = QuantizeI64.roundHalfUp(y)
      val want = oracle(y)
      assert(java.lang.Double.compare(got, want) == 0 ||
        got == want, // -0.0 vs 0.0: toLong downstream agrees; accept ==
        s"roundHalfUp($y) = $got, BigDecimal says $want")
    }
    val rnd = new scala.util.Random(1618)
    // exact ties and their nearest neighbors across magnitudes
    for (e <- 0 to 51; s <- Seq(1.0, -1.0)) {
      val tie = s * (math.pow(2, e) + 0.5)
      Seq(tie, Math.nextUp(tie), Math.nextDown(tie)).foreach(check)
    }
    for (n <- -1000 to 1000; d <- Seq(0.5, 0.25, 0.75)) {
      val y = n + d
      Seq(y, Math.nextUp(y), Math.nextDown(y)).foreach(check)
    }
    // the classic Math.round trap and signed zeros / subnormals
    Seq(0.49999999999999994, -0.49999999999999994, 0.0, -0.0,
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      4.503599627370496e15, 9.007199254740992e15, -9.007199254740993e15,
      1e300, -1e300).foreach(check)
    // random sweep across magnitudes
    var i = 0
    while (i < 1000000) {
      check((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(19)))
      i += 1
    }
  }

  test("quantize_i64 out-of-contract values saturate/zero (documented; the ANSI HOF raises)") {
    assert(QuantizeI64.quantizeOne(Double.NaN) == 0L)
    assert(QuantizeI64.quantizeOne(Double.PositiveInfinity) == Long.MaxValue)
    assert(QuantizeI64.quantizeOne(Double.NegativeInfinity) == Long.MinValue)
    assert(QuantizeI64.quantizeOne(1e18) == Long.MaxValue)
    assert(QuantizeI64.quantizeOne(-1e18) == Long.MinValue)
  }

  test("neg_prefix_i64 ≡ transform((x, i) -> if(i < k, -x, x)) incl. k=0, k>len, nulls") {
    withFn {
      val rnd = new scala.util.Random(7)
      val rows: Seq[(Seq[java.lang.Long], Long)] =
        Seq(
          (Seq[java.lang.Long](1L, -2L, 3L), 0L),
          (Seq[java.lang.Long](1L, -2L, 3L), 5L),
          (Seq[java.lang.Long](null, 2L, null), 2L),
          (Seq.empty[java.lang.Long], 3L),
          (Seq[java.lang.Long](Long.MaxValue, Long.MaxValue - 1), 2L)) ++
        Seq.fill(200)((Seq.fill(rnd.nextInt(10))(
          java.lang.Long.valueOf(rnd.nextLong() % 1000)), rnd.nextInt(12).toLong))
      val df = rows.toDF("a", "k")
        .withColumn("native", expr("neg_prefix_i64(a, k)"))
        .withColumn("hof", expr("transform(a, (x, i) -> if(i < k, -x, x))"))
      assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }

  test("neg_prefix_i64 wraps on Long.MinValue (documented; the ANSI HOF raises)") {
    val out = NegPrefixI64.negPrefix(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(Long.MinValue)), 1L)
    assert(out.getLong(0) == Long.MinValue) // two's-complement wrap
  }

  test("ffd_pack ≡ the interpreted aggregate() FFD fold, bin-for-bin, incl. overflow docs") {
    withFn {
      val capacity = 128
      val fold =
        s"""aggregate(
           |  ds,
           |  named_struct(
           |    'loads', cast(array() as array<bigint>),
           |    'asg', cast(array() as array<struct<doc_id:bigint,n:bigint,bin:bigint>>)),
           |  (acc, x) -> named_struct(
           |    'loads',
           |    if(array_position(transform(acc.loads, l -> l + x.n <= $capacity), true) = 0,
           |       concat(acc.loads, array(x.n)),
           |       transform(acc.loads, (l, i) ->
           |         if(cast(i as bigint) =
           |            array_position(transform(acc.loads, l2 -> l2 + x.n <= $capacity), true) - 1,
           |            l + x.n, l))),
           |    'asg',
           |    concat(acc.asg, array(named_struct(
           |      'doc_id', x.k2, 'n', x.n,
           |      'bin', coalesce(
           |        nullif(array_position(transform(acc.loads, l -> l + x.n <= $capacity), true), 0L),
           |        cast(size(acc.loads) + 1 as bigint)))))))""".stripMargin
      val rnd = new scala.util.Random(314)
      // groups with the real shape: (n DESC, doc_id) pre-sorted, sizes
      // spanning tiny → over-capacity (dedicated overflow bins)
      val groups = Seq.tabulate(40) { g =>
        val docs = Seq.fill(1 + rnd.nextInt(60))(
          (rnd.nextInt(2000).toLong, (1 + rnd.nextInt(180)).toLong))
        docs.map { case (id, n) => (-n, id, n) }.sorted.map {
          case (k1, k2, n) => (k1, k2, n)
        }
      }
      val df = groups.toDF("ds0")
        .withColumn("ds", expr(
          "transform(ds0, x -> named_struct('k1', x._1, 'k2', x._2, 'n', x._3))"))
        .withColumn("native", expr(s"ffd_pack(ds, $capacity)"))
        .withColumn("hof", expr(fold).getField("asg"))
      assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }
}
