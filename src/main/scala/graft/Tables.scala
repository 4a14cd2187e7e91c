package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * Scale posture: each table is a plain parquet directory read; Catalyst
  * pushes filters/projections into the scan, so every query in
  * [[SparkEntry.queries]] should show `PushedFilters`/pruned `ReadSchema`
  * in its physical plan. At cluster scale these reads parallelize per
  * parquet row-group with no driver involvement.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The testdata dirs are immutable inputs, so the parquet SCHEMA is
    * process-stable: route reads through the schema memo
    * ([[graft.engine.ParquetReadCache]]) and the per-query footer
    * inference job is paid once per table per JVM instead of once per
    * query construction per bench rep. The DATA is still scanned by
    * every action — only resolution metadata is reused, the same thing
    * a catalog/table format hands the planner for free. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.engine.ParquetReadCache.read(spark, s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  /** events.parquet has shipped `ts` as TIMESTAMP(NANOS) in some driver
    * generations (Spark's parquet reader rejects it — read nanos as long
    * via the legacy conf, then integer-divide to micros; doing this in
    * double would lose precision past 2^53) and as a plain micros
    * TIMESTAMP in others. Branch on the read schema so both load.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // normalize TIMESTAMP_NTZ → TimestampType (session TZ is pinned
        // to UTC everywhere, so the instant is unchanged) — downstream
        // watermarks/windows were built against TimestampType
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
