package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt's generic test library as violation-returning DataFrame builders
  * (test protocol: pass ⇔ empty result, SURVEY.md §2.11). Reference:
  * `/root/reference/models/staging/schema.yml:4-27`,
  * `models/reporting/facts/schema.yml:1-44`.
  *
  * Scale: `notNull`/`acceptedValues` are scan-local filters (pushed to
  * parquet). `unique` is one hash-aggregate shuffle on the key.
  * `relationships` is a left-anti join — broadcast when the parent is a
  * dim, shuffled otherwise; for a 100 TB child a bloom-filter pre-pass
  * would cut the shuffle, noted as the scale-out variant.
  */
object Checks {

  def notNull(cols: String*): Check =
    Check(s"not_null(${cols.mkString(",")})",
      df => df.filter(cols.map(c => col(c).isNull).reduce(_ || _)))

  /** dbt's generic single-column `unique` test, which excludes NULL keys
    * before grouping (`where column is not null`): several NULL-keyed
    * rows are not a uniqueness violation — pair with `notNull` when nulls
    * themselves should fail. */
  def unique(col0: String): Check =
    Check(s"unique($col0)",
      df => df.filter(col(col0).isNotNull)
        .groupBy(col(col0)).count().filter(col("count") > 1))

  /** dbt_utils.unique_combination_of_columns
    * (`models/reporting/schema.yml:44-46`). Unlike the single-column
    * `unique` test, dbt_utils applies NO null filter — its `group by` +
    * `having count(*) > 1` treats NULLs as equal, so duplicate NULL-keyed
    * combinations ARE violations here, matching the macro exactly. */
  def uniqueCombination(cols: String*): Check =
    Check(s"unique(${cols.mkString(",")})",
      df => df.groupBy(cols.map(col): _*).count().filter(col("count") > 1))

  /** relationships: child FK values ⊆ parent key values. */
  def relationships(childCol: String, parent: DataFrame, parentCol: String): Check =
    Check(s"relationships($childCol -> $parentCol)",
      df => df.filter(col(childCol).isNotNull)
        .join(parent.select(col(parentCol).as(childCol)), Seq(childCol), "left_anti"))

  /** relationships against another MODEL of the DAG, resolved at check
    * time (dbt `relationships: to: ref('dim_x')`, `facts/schema.yml:10-26`).
    * The anti-join broadcasts when the parent is dim-sized; a bloom-filter
    * pre-pass is the 100 TB-child variant. */
  def relationshipsTo(childCol: String, parentModel: String, parentCol: String): Check =
    Check(s"relationships($childCol -> $parentModel.$parentCol)",
      (df: DataFrame, r: String => DataFrame) => df.filter(col(childCol).isNotNull)
        .join(r(parentModel).select(col(parentCol).as(childCol)), Seq(childCol), "left_anti"))

  /** Singular test that reads other models through the resolver
    * (`tests/test_account_month_ties_subscription_month.sql`). */
  def singularWithRefs(name: String)(
      q: (DataFrame, String => DataFrame) => DataFrame): Check = Check(name, q)

  def acceptedValues(col0: String, values: Seq[Any]): Check =
    Check(s"accepted_values($col0)",
      df => df.filter(col(col0).isNotNull && !col(col0).isin(values: _*)))

  /** Singular test: arbitrary violation query over the model. */
  def singular(name: String)(q: DataFrame => DataFrame): Check = Check(name, q)

  /** dbt source-freshness (`dbt source freshness`, `loaded_at_field` +
    * `error_after`) as a check: fails when the newest `tsCol` value is
    * older than `maxAgeSeconds` before `asOf` — attach it to the staging
    * model that reads the source (this engine's checks run on models;
    * dbt's run on the source table — same predicate either way). An
    * EMPTY frame is also a violation: a source that has never loaded is
    * the stalest possible source, which dbt reports as an error too.
    *
    * Scale: one max-aggregate over the timestamp column — parquet footer
    * stats make it metadata-only in practice, like the incremental HWM.
    */
  def freshness(tsCol: String, maxAgeSeconds: Long,
      asOf: java.sql.Timestamp): Check =
    Check(s"freshness($tsCol < ${maxAgeSeconds}s before $asOf)",
      df => df.agg(max(col(tsCol)).as("newest"))
        .filter(col("newest").isNull ||
          col("newest") < lit(asOf) - expr(s"INTERVAL $maxAgeSeconds SECONDS")))

  /** Numeric reconciliation helper used by the reference's singular tests
    * (`tests/test_waterfall_ties_out.sql:20-22`): |a-b| > tol rows. */
  def tiesOut(a: Column, b: Column, tol: Double = 1e-4): Column = abs(a - b) > tol
}
