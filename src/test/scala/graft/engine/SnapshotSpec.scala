package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
  private def src(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("account_id", "record_hash")

  private def mergeAll(batches: Seq[Seq[(String, String)]]): DataFrame =
    batches.zipWithIndex.foldLeft(Option.empty[DataFrame]) { case (snap, (rows, i)) =>
      Some(Snapshot.merge(spark, snap, src(rows: _*), "account_id",
        Seq("record_hash"), ts(i + 1)))
    }.get

  test("dbt check-strategy semantics across three batches") {
    val snap = mergeAll(Seq(
      Seq("a" -> "h1", "b" -> "h1"),            // day 1: both open
      Seq("a" -> "h2", "c" -> "h1"),            // day 2: a changes, b hard-deleted, c born
      Seq("a" -> "h2", "c" -> "h1")             // day 3: no changes
    )).cache()

    val rows = snap.orderBy($"account_id", $"dbt_valid_from")
      .select($"account_id", $"record_hash",
        date_format($"dbt_valid_from", "dd").cast("int"),
        date_format($"dbt_valid_to", "dd").cast("int"))
      .as[(String, String, Int, Option[Int])].collect().toSeq

    assert(rows == Seq(
      ("a", "h1", 1, Some(2)), // closed when hash changed
      ("a", "h2", 2, None),    // current version
      ("b", "h1", 1, Some(2)), // hard-delete closed
      ("c", "h1", 2, None)))   // born day 2, still open
  }

  test("invalidate_hard_deletes=false keeps vanished keys open") {
    val b1 = Snapshot.merge(spark, None, src("a" -> "h1"), "account_id", Seq("record_hash"), ts(1))
    val b2 = Snapshot.merge(spark, Some(b1), src("b" -> "h1"), "account_id",
      Seq("record_hash"), ts(2), invalidateHardDeletes = false)
    val open = Snapshot.current(b2).select($"account_id").as[String].collect().toSet
    assert(open == Set("a", "b"))
  }

  test("null check-col values compare with null-safe equality") {
    val withNull = Seq(("a", null.asInstanceOf[String])).toDF("account_id", "record_hash")
    val b1 = Snapshot.merge(spark, None, withNull, "account_id", Seq("record_hash"), ts(1))
    val b2 = Snapshot.merge(spark, Some(b1), withNull, "account_id", Seq("record_hash"), ts(2))
    assert(b2.count() == 1) // null == null → unchanged, no new version
  }

  test("SCD2 invariants hold for random batch sequences (fixed seed)") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("k1", "k2", "k3")
    val hashes = Seq("h1", "h2", "h3")
    for (_ <- 1 to 10) {
      val batches: Seq[Seq[(String, String)]] = Seq.fill(4) {
        keys.filter(_ => rnd.nextBoolean())
          .map(k => k -> hashes(rnd.nextInt(hashes.size)))
      }.filter(_.nonEmpty)
      if (batches.nonEmpty) {
        val snap = mergeAll(batches).cache()
        // ≤1 open row per key
        val openPerKey = Snapshot.current(snap).groupBy($"account_id").count()
          .filter($"count" > 1).count()
        assert(openPerKey == 0)
        // validity intervals never overlap per key
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"account_id").orderBy($"dbt_valid_from")
        val bad = snap
          .withColumn("next_from", lead($"dbt_valid_from", 1).over(w))
          .filter($"next_from".isNotNull &&
            ($"dbt_valid_to".isNull || $"dbt_valid_to" > $"next_from"))
          .count()
        assert(bad == 0)
        // final open state == last batch state (hard deletes invalidated)
        val expected = batches.last.toMap
        val got = Snapshot.current(snap)
          .select($"account_id", $"record_hash").as[(String, String)]
          .collect().toMap
        assert(got == expected)
        snap.unpersist()
      }
    }
  }
}
