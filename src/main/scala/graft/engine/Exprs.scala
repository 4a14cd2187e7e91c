package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared `Column` builders — the Spark analogue of the reference's Jinja
  * macros (compile-time templating → plain Scala functions that assemble
  * expressions; SURVEY.md §2.10). All are built-in-function compositions,
  * so they stay inside whole-stage codegen.
  */
object Exprs {

  /** Content hash for change detection: MD5 over null-canonicalized
    * business columns. Reference: `stg_accounts.sql:33-46`
    * (`md5(concat_ws('|', coalesce(x,''), …))`). Dates/timestamps must be
    * pre-formatted by the caller ([[asHashText]]) — raw cast-to-string
    * formatting differs between engines (SURVEY.md §7.4 risk 3).
    */
  def recordHash(cols: Column*): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Engine-portable text form of a column for hashing. */
  def asHashText(c: Column, dataType: String): Column = dataType match {
    case "date" => date_format(c, "yyyy-MM-dd")
    case "timestamp" => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** SCD2 surrogate key: md5(key|valid_from). Reference:
    * `dim_account.sql:26`, `dim_subscription.sql:53`. */
  def surrogateKey(naturalKey: Column, validFrom: Column): Column =
    md5(concat_ws("|", naturalKey.cast("string"),
      date_format(validFrom, "yyyy-MM-dd HH:mm:ss")))

  /** First day of the month, DateType. Reference `date_trunc('month', d)`
    * (`dim_date.sql:22`, `fct_subscription_month.sql:47-49`). */
  def monthStart(c: Column): Column = date_trunc("month", c).cast("date")

  /** `NULLIF(TRIM(x),'')` defensive cast. Reference `stg_accounts.sql:17-24`. */
  def cleanString(c: Column): Column = nullif(trim(c), lit(""))

  /** EOM-activity predicate: a [start,end] interval is active at the end
    * of the month starting `monthStartCol`. Reference:
    * `fct_subscription_month.sql:75-79` (`start_date < next_month_start
    * and (end_date is null or end_date >= next_month_start - 1 day)`). */
  def activeAtEom(startDate: Column, endDate: Column, monthStartCol: Column): Column = {
    val nextMonth = add_months(monthStartCol, 1)
    (startDate < nextMonth) && (endDate.isNull || endDate >= date_sub(nextMonth, 1))
  }
}
