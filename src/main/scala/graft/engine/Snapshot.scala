package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** SCD2 snapshot, dbt `strategy='check'` semantics rebuilt as one Spark
  * plan. Reference: `/root/reference/snapshots/snap_accounts.sql:3-11`
  * (`unique_key='account_id'`, `check_cols=['record_hash']`,
  * `invalidate_hard_deletes=true`); algorithm is dbt-core's snapshot
  * materialization, re-derived from its documented behavior:
  *
  *  - first run: every source row opens with `valid_from = batchTs`,
  *    `valid_to = null`;
  *  - changed row (any `checkCols` differs): close the open version at
  *    `batchTs`, insert a new open version;
  *  - new key: insert an open version;
  *  - vanished key (hard delete): close the open version iff
  *    `invalidateHardDeletes`;
  *  - unchanged / already-closed rows: pass through untouched.
  *
  * Determinism: dbt stamps validity with wall-clock "now"; we take
  * `batchTs` as a parameter instead (SURVEY.md §7.4 risk 2) so replays
  * are bit-identical.
  *
  * Scale: one full-outer equi join per batch between the open-row set and
  * the (deduplicated) source — both shuffle-partitioned by `key`, no
  * driver-side state. Closed history is untouched passthrough; with the
  * snapshot table partitioned by open/closed the closed partition is not
  * even rewritten. Source should be pre-deduplicated to one row per key
  * (the reference dedups via `int_*_current`, W1).
  */
object Snapshot {
  val ValidFrom = "dbt_valid_from"
  val ValidTo = "dbt_valid_to"

  /** One snapshot batch: returns the full new snapshot table.
    *
    * Convenience form over [[mergeDelta]] — use the delta form where the
    * closed history is stored append-only (the Engine does): this form
    * re-emits the entire closed set every call, which at 100 TB SCD2
    * means rewriting immutable history per batch.
    *
    * @param snapshot  prior snapshot state, or None on first run
    * @param source    current truth, exactly one row per `key`
    * @param checkCols columns whose change opens a new version
    */
  def merge(
      spark: SparkSession,
      snapshot: Option[DataFrame],
      source: DataFrame,
      key: String,
      checkCols: Seq[String],
      batchTs: Timestamp,
      invalidateHardDeletes: Boolean = true): DataFrame =
    snapshot match {
      case None =>
        mergeDelta(spark, None, source, key, checkCols, batchTs, invalidateHardDeletes)._1
      case Some(snap) =>
        val closed = snap.filter(col(ValidTo).isNotNull)
        val open = snap.filter(col(ValidTo).isNull)
        val (openOut, newlyClosed) = mergeDelta(
          spark, Some(open), source, key, checkCols, batchTs, invalidateHardDeletes)
        openOut.unionByName(newlyClosed).unionByName(closed)
    }

  /** One snapshot batch against the OPEN slice only, returning what the
    * batch actually changes: `(new open set, newly-closed rows)`. The
    * immutable closed history is never read or rewritten — the caller
    * appends `newlyClosed` to it and swaps only the open slice, so a
    * batch's write cost is O(open + changed), not O(history).
    *
    * @param open      prior OPEN rows (one per live key), or None on first run
    * @param source    current truth, exactly one row per `key`
    * @param checkCols columns whose change opens a new version
    */
  def mergeDelta(
      spark: SparkSession,
      openPrior: Option[DataFrame],
      source: DataFrame,
      key: String,
      checkCols: Seq[String],
      batchTs: Timestamp,
      invalidateHardDeletes: Boolean = true): (DataFrame, DataFrame) = {
    val ts = lit(batchTs).cast("timestamp")
    val opened = source
      .withColumn(ValidFrom, ts)
      .withColumn(ValidTo, lit(null).cast("timestamp"))

    openPrior match {
      case None => (opened, opened.limit(0))
      case Some(open) =>
        val srcCols =
          Seq(col(key).as("_src_key")) ++
            checkCols.map(c => col(c).as(s"_src_$c")) ++
            source.columns.toSeq.map(c => col(c).as(s"_s_$c"))
        val src = source.select(srcCols: _*)
        val j = open.join(src, col(key) === col("_src_key"), "full_outer")

        val changed = checkCols
          .map(c => !(col(c) <=> col(s"_src_$c")))
          .reduce(_ || _)

        val openCols = open.columns // == snap.columns
        val srcSide = source.columns // business cols of source

        // 1. keys present in both, unchanged → keep open row as-is
        val unchanged = j.filter(col(key).isNotNull && col("_src_key").isNotNull && !changed)
          .select(openCols.map(col): _*)
        // 2. keys present in both, changed → close old version at batchTs
        val closedNow = j.filter(col(key).isNotNull && col("_src_key").isNotNull && changed)
          .select(openCols.map(c => if (c == ValidTo) ts.as(ValidTo) else col(c)): _*)
        // 2b. … and open the new version from source values
        val reopened = j.filter(col(key).isNotNull && col("_src_key").isNotNull && changed)
          .select(srcSide.map(c => col(s"_s_$c").as(c)): _*)
          .withColumn(ValidFrom, ts)
          .withColumn(ValidTo, lit(null).cast("timestamp"))
        // 3. new keys → open
        val born = j.filter(col(key).isNull)
          .select(srcSide.map(c => col(s"_s_$c").as(c)): _*)
          .withColumn(ValidFrom, ts)
          .withColumn(ValidTo, lit(null).cast("timestamp"))
        // 4. vanished keys → close (or keep open) per invalidateHardDeletes
        val gone = j.filter(col(key).isNotNull && col("_src_key").isNull)
        val goneClosed =
          gone.select(openCols.map(c => if (c == ValidTo) ts.as(ValidTo) else col(c)): _*)
        val goneStillOpen = gone.select(openCols.map(col): _*)

        val newOpen = Seq(
          unchanged, reopened, born,
          if (invalidateHardDeletes) goneStillOpen.limit(0) else goneStillOpen
        ).reduce(_.unionByName(_))
        val newlyClosed =
          if (invalidateHardDeletes) closedNow.unionByName(goneClosed)
          else closedNow
        (newOpen, newlyClosed)
    }
  }

  /** The open (current) version per key. */
  def current(snapshot: DataFrame): DataFrame = snapshot.filter(col(ValidTo).isNull)
}
