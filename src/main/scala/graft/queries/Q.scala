package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark query over the testdata tables
  * plus (when SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against. Column names/aliases MUST match between
  * the two — the driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  /** No DuckDB-expressible oracle → driver records a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
