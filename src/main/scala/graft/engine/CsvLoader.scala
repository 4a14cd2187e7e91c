package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Raw-layer ingestion: CSV batches → lineage-stamped tables (SURVEY.md
  * §2.1 S1–S5). Reference: `/root/reference/scripts/load_csvs_to_duckdb.py`
  * — `read_csv_auto(header=true)` type inference (`:51,62,75`), one batch
  * timestamp per run (`:36`), `ingested_at`/`source_file` lineage columns
  * (`:46-51`), replace vs append modes (`:44-77`).
  *
  * Scale: the CSV scan and parquet write are fully distributed;
  * `inferSchema` costs one extra pass over the file — for a 100 TB raw
  * feed pass an explicit schema instead (supported via `schema`).
  */
object CsvLoader {

  /** Read one CSV with header + type inference and stamp lineage. */
  def readCsv(
      spark: SparkSession,
      path: String,
      batchTs: Timestamp,
      sourceFile: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    val parsed = schema match {
      case Some(s) => base.schema(s).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
    parsed
      .withColumn("ingested_at", lit(batchTs).cast("timestamp"))
      .withColumn("source_file", lit(sourceFile))
  }

  /** S2 replace / S3+S4 append-with-bootstrap, onto a parquet dir.
    * Returns the rows THIS batch wrote (the loader's "rows affected",
    * reference `load_csvs_to_duckdb.py:79-80`), harvested from an
    * observed metric riding the write plan — a post-write `count()`
    * re-scan would pay a parquet footer pass over the whole accumulated
    * target per ingested CSV, and under `append` it would report the
    * table's total instead of the batch's contribution. */
  def load(
      spark: SparkSession,
      csvPath: String,
      targetDir: String,
      batchTs: Timestamp,
      mode: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Long = {
    val name = csvPath.split('/').last
    val df = readCsv(spark, csvPath, batchTs, name, schema)
    val writeMode = mode match {
      case "replace" => "overwrite"
      case "append" =>
        // S3 schema bootstrap is implicit: parquet append to a missing
        // directory creates it with df's schema (the LIMIT 0 trick is a
        // DuckDB-ism we don't need).
        "append"
      case other => throw new IllegalArgumentException(s"mode $other")
    }
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows")).write.mode(writeMode).parquet(targetDir)
    obs.get("rows").asInstanceOf[Long]
  }
}
