package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Month/key-partitioned storage is the engine's scale story for facts
  * (Materialization.DeleteInsert) — this spec proves the read side: a
  * filter on the partition column must prune directories at planning
  * time (PartitionFilters on the scan), not filter rows after a full
  * scan. At 100 TB this is the difference between reading one month and
  * reading the table.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet: partition filter prunes directories, not rows") {
    val dir = tmpDir("part") + "/events"
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val all = spark.read.parquet(dir)
    val one = all.filter($"event_type" === "click")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString

    // the predicate is a PartitionFilter on the scan (planning-time
    // directory pruning), and it does NOT appear as a data filter
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("event_type"), plan)
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("isnotnull(event_type") || scanLine.contains("event_type = click")
      || plan.contains("(event_type = click)"), scanLine)

    // correctness: pruned read equals a row-filtered full read
    val full = graft.Tables.events(spark, "/root/testdata/sf0.001")
    assert(one.count() == full.filter($"event_type" === "click").count())
    assert(one.count() > 0)
  }
}
