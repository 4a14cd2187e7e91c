package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Path-keyed parquet SCHEMA memo for warehouse model dirs: a fresh
  * `spark.read.parquet(dir)` pays one Spark job at resolution time
  * (footer schema inference), and one bench rep resolves the same
  * just-written model dir from several consumers — the engine's refs,
  * the probe readers, the maintenance tools. Supplying the schema
  * (`spark.read.schema(s).parquet(dir)`) skips that job entirely while
  * the FILE LISTING stays fresh per read, so appends between reads are
  * always visible; only the schema is reused, and a model's schema is
  * stable within a committed generation by the engine's own
  * on_schema_change contract.
  *
  * Invalidation: every write path drops the entry — [[Engine]]'s
  * materialize (all strategies, incl. failed/partial writes),
  * [[DirSwap.replace]] / [[DirSwap.deleteRecursively]] /
  * [[DirSwap.recover]] (the swap-managed rewrite/maintenance paths —
  * compaction, retention, retrain, streaming index maintenance), so a
  * schema-evolving rewrite is re-inferred on the next read. EVOLVING
  * reads (mergeSchema=true) never come through here — their schema is
  * generation-dependent by definition.
  *
  * At 100 TB the same economics hold: footer inference over a large
  * file set is a real job; the schema is engine-known state.
  */
object ParquetReadCache {

  private val schemas = new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Bound on memo entries: a long-lived driver (the bench) churns
    * through thousands of temp-warehouse dirs; past the cap the memo
    * resets rather than grows — a pure re-inference cost, never a
    * correctness one. */
  private val MaxEntries = 8192

  /** Per-path WRITE EPOCHS, bumped by [[invalidate]]: a monotone token
    * an instance-level frame cache (the Engine's readCache) checks so an
    * EXTERNAL writer's swap (retrain, streaming maintenance — paths that
    * bypass a given Engine instance but go through [[DirSwap]]) retires
    * its pinned frames too. Values never repeat (global counter), so a
    * matching epoch proves no invalidation happened since the frame was
    * pinned. One Long per distinct dir ever invalidated in this JVM —
    * bounded by dirs touched, not by reads. */
  private val epochs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val nextEpoch = new java.util.concurrent.atomic.AtomicLong(0L)

  private def key(dir: String): String =
    new java.io.File(dir).getAbsoluteFile.toPath.normalize.toString

  /** Current write epoch of `dir` (0 = never invalidated this JVM). */
  def epoch(dir: String): Long = {
    val e = epochs.get(key(dir))
    if (e == null) 0L else e.longValue()
  }

  /** Drop the memoized schema for `dir` and bump its write epoch — call
    * after ANY write/rename that could have changed the dir's contents. */
  def invalidate(dir: String): Unit = {
    val k = key(dir)
    schemas.remove(k)
    epochs.put(k, nextEpoch.incrementAndGet())
    ()
  }

  /** Read `dir` as parquet, supplying the memoized schema when one is
    * known (skips the footer-inference job); infers and memoizes
    * otherwise. The file listing is fresh either way. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val k = key(dir)
    val known = schemas.get(k)
    if (known != null) spark.read.schema(known).parquet(dir)
    else {
      val df = spark.read.parquet(dir)
      if (schemas.size >= MaxEntries) schemas.clear()
      schemas.put(k, df.schema)
      df
    }
  }
}
