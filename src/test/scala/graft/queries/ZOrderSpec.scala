package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (bit-interleaved) clustering
  * makes parquet min/max stats selective on EVERY interleaved dimension,
  * so a conjunctive range predicate skips row groups that a single-key
  * sort layout must read. At 100 TB this is the difference between
  * reading the files under a (user, time) rectangle and reading every
  * file that matches one of the two keys.
  *
  * The spec measures the effect, not just the plan: the same rectangle
  * query over the same rows in two layouts, compared by the scan's
  * `numOutputRows` metric — rows actually materialized after row-group
  * stat skipping (record-level parquet filtering is off by default, so
  * surviving groups are read whole; fewer rows == more groups skipped).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val Bits = 10 // dims in [0, 1024)

  /** Bit-interleave two `Bits`-bit ints: z = … y1 x1 y0 x0. */
  private def zOrder(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)

  /** Rows the scan materialized (post row-group skip) for `df`'s action. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    p.collectLeaves().flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
  }

  test("z-ordered layout skips row groups a linear sort cannot") {
    val n = 1 << 18 // 256k rows, 64 files => ~4k-row row groups
    val data = spark.range(n).select(
      pmod(hash($"id"), lit(1024)).as("x"),
      pmod(hash($"id" * 7 + 13), lit(1024)).as("y"),
      $"id".as("payload"))

    val base = tmpDir("zorder")
    data.repartitionByRange(64, $"x").sortWithinPartitions($"x")
      .write.parquet(s"$base/linear")
    // EXACT file boundaries at z-multiples of 2^14 (hive-partitioned by
    // z-file id — the OPTIMIZE-ZORDER table layout), not sampled range
    // boundaries: parquet min/max stats are per-column, so a file whose
    // z-range straddles a 2^14 boundary has x-min < 64 via one row and
    // y-min < 64 via another while containing no rectangle row at all —
    // un-prunable, and whether sampling produces such a straddler is
    // machine-dependent jitter (it did on a 32-core host)
    data.withColumn("z", zOrder($"x", $"y"))
      .withColumn("zfile", ($"z" / (1 << 14)).cast("int"))
      .repartition($"zfile").sortWithinPartitions($"z")
      .write.partitionBy("zfile").parquet(s"$base/zorder")

    // rectangle [0,64) x [0,64): 1/256 of the space. Under z-order it is
    // exactly the z-range [0, 4096) — compact, few files; under the
    // linear layout only the x bound prunes (1/16 of files), and every
    // y survives inside them.
    def rect(dir: String): DataFrame =
      spark.read.parquet(dir).filter($"x" < 64 && $"y" < 64).select($"x", $"y", $"payload")
    val linRows = scanRows(rect(s"$base/linear"))
    val zRows = scanRows(rect(s"$base/zorder"))

    // same answer from both layouts, and it is the true rectangle
    val want = data.filter($"x" < 64 && $"y" < 64).count()
    assert(rect(s"$base/linear").count() == want)
    assert(rect(s"$base/zorder").count() == want)
    assert(want > 0)

    // the measurable layout effect, with wide margin: expected ~16k
    // materialized rows linear (4 of 64 files) vs ~4k z-ordered (1 file)
    assert(zRows * 2 < linRows, s"z-order scanned $zRows vs linear $linRows")
  }

  test("the z-value expression is scan-local (no exchange, codegen'd)") {
    val df = spark.range(1000).select(
      pmod($"id", lit(1024)).cast("int").as("x"),
      pmod($"id" * 3, lit(1024)).cast("int").as("y"))
      .withColumn("z", zOrder(col("x"), col("y")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    // codegen stages render as a `*(n)` prefix in the executed plan
    assert(p.contains("*("), p)
    // closed form: (x=3, y=5) interleaves to 100111b = 39
    val z35 = spark.range(1).select(zOrder(lit(3), lit(5)).as("z")).as[Long].first()
    assert(z35 == 39L, s"z(3,5) = $z35")
  }
}
