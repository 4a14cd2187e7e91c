package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closes the loop on the q_agg_salted_skew claim (SURVEY §7.4 risk 6)
  * with a 16×-skewed dataset: 90% of rows share ONE key, so an unsalted
  * aggregation funnels 90% of the table through a single reduce
  * partition, while salting splits the hot key into 16 even shards
  * before the final (tiny) merge. Correctness is asserted exactly; the
  * skew-splitting is asserted STRUCTURALLY (max first-stage group size),
  * which is deterministic where wall-clock assertions would flake —
  * timings are printed as evidence, not asserted.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val Salt = 16

  private def salted(df: DataFrame): DataFrame =
    df.withColumn("salt", pmod(hash(col("id")), lit(Salt)))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("pt"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("pt")).as("total"))

  private def direct(df: DataFrame): DataFrame =
    df.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("total"))

  test("salted two-phase aggregation on a 90%-skewed table: exact equality, 16x hot-key split") {
    // 1.6M rows, 90% on key "hot" — integer values so sums are exact
    // regardless of partial-aggregation order
    val n = 1600000L
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("cold_"), col("id") % 7)).as("k"),
      (col("id") % 1000).as("v"))
      .localCheckpoint() // pin the input so both formulations read identical data

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (d, tDirect) = time(direct(df).orderBy("k").as[(String, Long, Long)].collect().toSeq)
    val (s, tSalted) = time(salted(df).orderBy("k").as[(String, Long, Long)].collect().toSeq)

    // exact equality of the two formulations
    assert(d == s)
    // the hot key really is skewed: 90% of rows
    assert(d.find(_._1 == "hot").get._2 == n * 9 / 10)
    // structural skew-split proof: after salting, the largest first-stage
    // group carries ~1/16 of the hot key (hash salt is uneven only within
    // a few percent), so no single reducer sees the 90% spike
    val firstStageMax = df
      .withColumn("salt", pmod(hash(col("id")), lit(Salt)))
      .groupBy(col("k"), col("salt")).count()
      .agg(max(col("count"))).as[Long].head()
    val hotRows = n * 9 / 10
    assert(firstStageMax < hotRows / (Salt / 2),
      s"salting failed to split the hot key: max group $firstStageMax of $hotRows hot rows")
    info(f"direct=$tDirect%.2fs salted=$tSalted%.2fs (local[4]; the win grows with executor count)")
  }

  test("AQE skew-join splits the hot partition — no manual salting needed for joins") {
    // Salting is the fix for skewed AGGREGATION; for skewed JOINS Spark's
    // adaptive skew-join already splits the hot partition at runtime and
    // replicates the matching build side, so manual salting is
    // unnecessary. Proof: a 90%-skewed fact joined to a dim, broadcast
    // disabled (forcing the shuffle join AQE rewrites), skew thresholds
    // scaled to sandbox bytes, and the FINAL adaptive plan asserted to
    // carry the skew=true join marker.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")

      val n = 400000L
      val fact = spark.range(n).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 100 + 1).as("k"),
        col("id").as("v"))
      val dim = spark.range(101).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      val j = fact.join(dim, "k")
      // correctness: every fact row matches exactly one dim row
      assert(j.count() == n)
      // execute THIS dataframe's own QueryExecution (count() plans a
      // separate one) so its adaptive plan finalizes, then read it back
      assert(j.queryExecution.toRdd.count() == n)
      val finalPlan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("skew=true"),
        s"expected a skew=true join in the final adaptive plan:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
