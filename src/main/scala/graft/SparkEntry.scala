package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets one entry in
  * [[queries]]; SQL-expressible ones get a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** All registered operator demos, grouped by area. */
  def allQs: Seq[Q] =
    RelationalQueries.qs ++ WindowQueries.qs ++ DateQueries.qs ++
      TextQueries.qs ++ FinanceQueries.qs ++ DedupQueries.qs ++
      SimilarityQueries.qs ++ MultimodalQueries.qs ++ StreamingQueries.qs ++
      SqlSurfaceQueries.qs ++ OlapExtrasQueries.qs ++ PipelineQueries.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The MRR waterfall is the reference's headline mart — it
    * exercises the whole pipeline (spine fan-out, EOM semantics, window
    * movement classification, conditional distinct rollup). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_mrr_waterfall")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
