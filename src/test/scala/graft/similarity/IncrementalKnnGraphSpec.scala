package graft.similarity

import graft.SparkSpec
import graft.engine.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental kNN graph ≡ one-shot batch graph, with the restatement
  * actually confined to the clusters that received arrivals — the
  * DeleteInsert window claim checked on the FILES, not just the rows. */
class IncrementalKnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(rows: Seq[(Long, Int, Seq[Long])]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    rows.toDF("vec_id", "label", "q")
      .withColumn("q", $"q".cast("array<long>"))
      .withColumn("nsq", expr("dot_i64(q, q)"))
  }

  // two well-separated clusters; vec 5 (batch 2) lands in cluster 1 and
  // is CLOSER to vec 2 than vec 3 is — it must displace 3's rank
  private val batch1 = Seq(
    (0L, 0, Seq(10L, 0L, 0L, 0L)),
    (1L, 0, Seq(9L, 1L, 0L, 0L)),
    (2L, 1, Seq(0L, 10L, 0L, 0L)),
    (3L, 1, Seq(1L, 8L, 0L, 0L)))
  private val arrival = (5L, 1, Seq(0L, 9L, 1L, 0L))

  private def engineFor(dir: String, batch: DataFrame): Engine = new Engine(
    spark, dir, Map("vectors" -> batch),
    IncrementalKnnGraph.models("vectors", k = 2))

  private def edgesOf(dir: String): Set[(Long, Long, Int)] =
    spark.read.parquet(s"$dir/knn_edges")
      .select($"src_id", $"nbr_id", $"rnk").as[(Long, Long, Int)].collect().toSet

  private def partFiles(dir: String, cluster: Int): Set[String] =
    Option(new java.io.File(s"$dir/knn_edges/cluster=$cluster").listFiles())
      .fold(Set.empty[String])(_.map(_.getName).filter(_.startsWith("part-")).toSet)

  test("two-batch build ≡ one-shot; only the touched cluster's partition is rewritten") {
    val dir = tmpDir("incknn")
    assert(engineFor(dir, vecsDf(batch1)).build().ok)
    val cluster0Before = partFiles(dir, 0)
    assert(cluster0Before.nonEmpty)

    // batch 2: one arrival, confined to cluster 1
    assert(engineFor(dir, vecsDf(batch1 :+ arrival)).build().ok)
    // cluster 0's partition FILES are untouched — the restatement
    // window was cluster 1 only
    assert(partFiles(dir, 0) == cluster0Before)
    assert(partFiles(dir, 1).nonEmpty)

    // the final edge set equals the one-shot graph on the full corpus
    val oneShot = tmpDir("incknn1s")
    assert(engineFor(oneShot, vecsDf(batch1 :+ arrival)).build().ok)
    assert(edgesOf(dir) == edgesOf(oneShot))
    // and the displacement actually happened: 5 is now 2's top neighbor
    assert(edgesOf(dir).contains((2L, 5L, 1)))

    // idempotent re-build with no arrivals: nothing recomputed anywhere
    val c0 = partFiles(dir, 0); val c1 = partFiles(dir, 1)
    assert(engineFor(dir, vecsDf(batch1 :+ arrival)).build().ok)
    assert(partFiles(dir, 0) == c0 && partFiles(dir, 1) == c1)
  }

  test("singleton-cluster arrival: no edges, harmless repeated recompute, graph intact") {
    val dir = tmpDir("incknns")
    assert(engineFor(dir, vecsDf(batch1)).build().ok)
    val before = edgesOf(dir)
    // arrival in a brand-new cluster with no second member: zero edges
    val lone = (6L, 7, Seq(0L, 0L, 10L, 0L))
    assert(engineFor(dir, vecsDf(batch1 :+ lone)).build().ok)
    assert(edgesOf(dir) == before)
    // its cluster stays past the frontier (it emitted no edge row), so
    // the next build recomputes ONLY that still-empty cluster — the
    // established clusters' files are untouched
    val c0 = partFiles(dir, 0); val c1 = partFiles(dir, 1)
    assert(engineFor(dir, vecsDf(batch1 :+ lone)).build().ok)
    assert(edgesOf(dir) == before)
    assert(partFiles(dir, 0) == c0 && partFiles(dir, 1) == c1)
    // a second member arrives: the cluster materializes its edges
    val mate = (7L, 7, Seq(0L, 0L, 9L, 1L))
    assert(engineFor(dir, vecsDf(batch1 :+ lone :+ mate)).build().ok)
    assert(edgesOf(dir) == before ++ Set((6L, 7L, 1), (7L, 6L, 1)))
  }
}
