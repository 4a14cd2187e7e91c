package graft.tools
import org.apache.spark.sql.SparkSession

/** Same-session Spark side of the BASELINE.md anchor protocol: the
  * binding "within 2× of DuckDB" rule needs BOTH sides measured on the
  * same machine in the same session (cross-session denominators drift
  * with host contention — the r12→r13 creep was unattributable for
  * exactly that reason). Run this back-to-back with
  * `scripts/anchor.py` (the DuckDB side, same oracle SQL, same
  * median-of-3 discipline) and paste both columns into BASELINE.md.
  *
  * Timing discipline is Bench's: warm once at sf0.001 (JIT + codegen),
  * then median-of-3 noop-sink writes at sf0.1, with the build/query
  * phase split so the PQ probe family's codebook training doesn't ride
  * on the probe number. Args = query names (default: the anchor set).
  */
object AnchorProbe {
  val DefaultSet: Seq[String] = Seq(
    "q_mrr_waterfall", "q_mrr_waterfall_delta", "q_fct_account_month",
    "q_fct_subscription_month", "q_dedup_minhash_lsh", "q_dedup_semantic",
    "q_pipeline_curation_funnel", "q_pipeline_split_leakage",
    "q_ts_resample_locf", "q_ann_ivf_pq", "q_ann_ivf_pq_incremental_multiprobe",
    "q_ann_ivf_pq_multiprobe_kernel", "q_ann_ivf_pq_residual_multiprobe_kernel")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else DefaultSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm pass (untimed, sf0.001)
    names.foreach { n =>
      try consume(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // JSON numbers must be locale-independent (the f interpolator uses
    // the default locale — a comma decimal separator breaks the parser)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    try names.foreach { n =>
      // one failing query (typo'd name, an sf0.1-only analysis error)
      // must not discard every other query's measurements — record the
      // error and keep timing the rest. NonFatal ONLY: after an OOM (or
      // any VirtualMachineError) this JVM's subsequent timings are
      // garbage, so a fatal error aborts the probe — the partial JSON
      // below is printed tainted, never as normal measurements.
      try {
        val runs = Seq.fill(3) {
          val t0 = System.nanoTime()
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          val t1 = System.nanoTime()
          consume(df)
          ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
        }
        val med = runs.sortBy { case (b, q) => b + q }.apply(1)
        out += f""""$n":{"total":${med._1 + med._2}%.3f,"build_s":${med._1}%.3f,"query_s":${med._2}%.3f}"""
      } catch {
        case scala.util.control.NonFatal(e) =>
          out += s""""$n":{"error":"${e.getClass.getSimpleName}"}"""
      }
    } catch {
      case fatal: Throwable =>
        out += s""""_fatal":"${fatal.getClass.getSimpleName}""""
        println(out.mkString("{", ",", "}"))
        throw fatal
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
