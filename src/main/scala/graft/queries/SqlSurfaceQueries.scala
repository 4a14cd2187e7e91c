package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The `spark.sql` BI surface (SURVEY §3.3: "expose the marts as catalog
  * tables; spark.sql is the BI surface") plus scale-pattern demos the
  * brief calls for explicitly: salting for skewed aggregation and sketch
  * (approximate-distinct) rollups.
  */
object SqlSurfaceQueries {

  /** Dialect-neutral SQL — the SAME text runs on Spark and DuckDB (and,
    * via ConnectSmokeSpec, over the out-of-process Spark Connect client). */
  val biSql =
    """SELECT r_name,
      |       CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, CAST(extract(year FROM o_orderdate) AS INT)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- ad-hoc SQL over cataloged tables: register the warehouse as
    // temp views, hand the BI tool's SQL text straight to spark.sql
    Q.sql("q_sql_bi_surface", biSql) { (s, dir) =>
      for (t <- Seq("orders", "customer", "nation", "region"))
        Tables.load(s, dir, t).createOrReplaceTempView(t)
      s.sql(biSql)
    },

    // ---- salting for skew: two-phase aggregate — partials on
    // (key, salt) spread a hot key over N reducers, finals on key.
    // Result is identical to the direct aggregate (the oracle); only the
    // shuffle layout differs. At 100 TB this is the standard fix when one
    // group key holds a double-digit share of rows.
    Q.sql(
      "q_agg_salted_skew",
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin
    ) { (s, dir) =>
      val salted = Tables.orders(s, dir)
        .withColumn("salt", pmod(hash(col("o_orderkey")), lit(16)))
      salted
        .groupBy(col("o_orderstatus"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("o_totalprice")).as("pt"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("pn")).as("n"), round(sum(col("pt")), 2).as("total"))
    },

    // ---- sketch rollup: HLL approximate distinct (rows-only — sketch
    // estimates are engine-specific by construction; accuracy vs the
    // exact count is asserted in SketchSpec)
    // sketch queries emit ONLY the sketch (the exact counterpart is a
    // full distinct-expand / sort that defeats the sketch's purpose at
    // bench scale); SketchSpec computes the exact side and bounds error
    Q.rowsOnly("q_approx_count_distinct") { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_buyers"))
    },

    // ---- MERGEABLE sketch materialization — the incremental-analytics
    // pattern exact distinct counts cannot follow at 100 TB: a
    // distinct-over-history must rescan history every build, while a
    // stored Datasketches HLL sketch per (day, batch) is appended
    // delta-only (the engine's high-water-mark idiom) and unioned at
    // query time — register-max merge, so the union of per-batch
    // sketches is BIT-IDENTICAL to a one-shot sketch over the full
    // data (pinned in SketchSpec, alongside the ≤5% error bound vs the
    // exact count). Rows-only: sketch estimates are engine-specific by
    // construction, like the other two sketch entries.
    Q.rowsOnly("q_uv_sketch_incremental") { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), to_date(col("ts")).as("day"), col("user_id"))
      val b = ev.agg(min(col("event_id")), max(col("event_id"))).first()
      val mid = (b.getLong(0) + b.getLong(1)) / 2
      val wh = graft.engine.Scratch.dir("graft_uvsketch")
      def build(batch: org.apache.spark.sql.DataFrame): Unit = {
        val rpt = new graft.engine.Engine(s, wh,
          Map("events_src" -> batch), Seq(
            graft.engine.Model.incremental(
              "uv_sketch", Seq("events_src"),
              graft.engine.Materialization.IncrementalAppend("hwm_event_id")) {
              (_, r, prior) =>
                val hwm = graft.engine.Incremental.hwm(prior, "hwm_event_id")
                r("events_src").filter(col("event_id") > hwm)
                  .groupBy(col("day"))
                  .agg(hll_sketch_agg(col("user_id")).as("sketch"),
                    max(col("event_id")).as("hwm_event_id"))
            })).build()
        require(rpt.ok, rpt.results.mkString("; "))
      }
      build(ev.filter(col("event_id") <= mid))
      build(ev)
      graft.engine.ParquetReadCache.read(s, s"$wh/uv_sketch")
        .groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("uv"))
    },

    // ---- incremental MERGE materialization (dbt
    // incremental_strategy='merge' + unique_key — the one incremental
    // strategy the engine lacked: append can't restate a key,
    // delete+insert restates a partition window; merge upserts
    // individual KEYS anywhere in history). Two engine builds: batch 1
    // = every order (create-table-as), batch 2 = updates (orders with
    // key % 7 = 0: status 'U', cents doubled) + inserts (key % 11 = 0
    // re-keyed STRICTLY past max(o_orderkey) — the +1 matters when the
    // key range starts at 0: status 'N'). The oracle replays
    // ANSI MERGE semantics as delta ∪ (base anti-join delta). Money as
    // integer cents so the doubled amounts are integer-exact on both
    // engines. Scale shape: the target is hive-partitioned on
    // pmod(hash(key), 32); batch 2 rewrites only the buckets containing
    // delta keys via dynamic partition overwrite (partition-pruned
    // read-back of exactly those buckets, file-level untouched-bucket
    // pin in EngineSpec) — cost is touched-buckets × bucket size, not
    // table size, the restatement economics a table format's MERGE
    // gets from file skipping.
    Q.sql(
      "q_engine_merge_upsert",
      """WITH b1 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b2 AS (
        |  SELECT o_orderkey AS k, 'U' AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS cents
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders) AS k,
        |         'N' AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 11 = 0)
        |SELECT k, status, cents FROM b2
        |UNION ALL
        |SELECT k, status, cents FROM b1
        |WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.k = b1.k)""".stripMargin
    ) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val maxKey = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val base = orders.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"), cents.as("cents"))
      val delta = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("status"),
          (cents * 2).as("cents"))
        .unionByName(orders.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + maxKey + 1).as("k"), lit("N").as("status"),
            cents.as("cents")))
      val wh = graft.engine.Scratch.dir("graft_mrg")
      var batch = base
      val e = new graft.engine.Engine(s, wh, Map.empty, Seq(
        graft.engine.Model("merged", Seq(),
          graft.engine.Materialization.MergeUpsert("k", 32))((_, _) => batch)))
      val r0 = e.build(); require(r0.ok, r0.results.mkString("; "))
      batch = delta
      val r1 = e.build(); require(r1.ok, r1.results.mkString("; "))
      e.ref("merged")
    },

    // ---- merge_update_columns (dbt's partial-update merge): the CDC
    // feed carries ONLY (key, changed measure); matched rows take the
    // delta's cents and KEEP the stored status, unmatched keys are
    // untouched. The oracle is the plain left-join-coalesce restatement
    // of that contract. Same bucket-restatement economics as the full
    // merge — the delta column set changes nothing about the layout.
    Q.sql(
      "q_engine_merge_update_columns",
      """SELECT b1.k, b1.status,
        |       coalesce(b2.cents, b1.cents) AS cents
        |FROM (SELECT o_orderkey AS k, o_orderstatus AS status,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders) b1
        |LEFT JOIN (SELECT o_orderkey AS k,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS cents
        |           FROM orders WHERE o_orderkey % 7 = 0) b2
        |ON b1.k = b2.k""".stripMargin
    ) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val base = orders.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"), cents.as("cents"))
      val upd = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), (cents * 2).as("cents"))
      val wh = graft.engine.Scratch.dir("graft_mrgu")
      var batch = base
      val e = new graft.engine.Engine(s, wh, Map.empty, Seq(
        graft.engine.Model("merged", Seq(),
          graft.engine.Materialization.MergeUpsert("k", 32,
            updateColumns = Seq("cents")))((_, _) => batch)))
      val r0 = e.build(); require(r0.ok, r0.results.mkString("; "))
      batch = upd.select(col("k"), col("cents"))
      val r1 = e.build(); require(r1.ok, r1.results.mkString("; "))
      e.ref("merged")
    },

    // ---- incremental MICROBATCH materialization (dbt 1.9
    // incremental_strategy='microbatch': event_time + batch_size +
    // lookback). The table lives in day-grain event-time batches; an
    // incremental build restates every batch from frontier − lookback
    // forward, so late rows inside the lookback window are captured by
    // their day's restatement and later-than-that rows are dropped —
    // the batch analogue of a streaming watermark. Build 1 loads the
    // even-event_id half (every day populated); build 2 presents the
    // full source: odd rows land ONLY in days ≥ frontier − 1, which is
    // exactly what the oracle states in one predicate. Scale shape:
    // per-build cost = (lookback + new batches) × batch size — days,
    // not years, at any table size; each batch is its own idempotent
    // dynamic-overwrite job (independently retryable, dbt's microbatch
    // unit), reading its partition of the once-staged window.
    Q.sql(
      "q_engine_microbatch",
      """SELECT event_id, ts, user_id, event_type FROM events
        |WHERE date_trunc('day', ts) >=
        |      date_trunc('day', (SELECT max(ts) FROM events
        |                         WHERE event_id % 2 = 0)) - INTERVAL 1 DAY
        |   OR event_id % 2 = 0""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val wh = graft.engine.Scratch.dir("graft_mb")
      var src = ev.filter(col("event_id") % 2 === 0)
      val e = new graft.engine.Engine(s, wh, Map.empty, Seq(
        graft.engine.Model("mb", Seq(),
          graft.engine.Materialization.Microbatch("ts", "day", 1))(
          (_, _) => src)))
      val r2 = e.build(); require(r2.ok, r2.results.mkString("; "))
      src = ev
      val r3 = e.build(); require(r3.ok, r3.results.mkString("; "))
      e.ref("mb")
    },

    // ---- quantile sketch (rows-only — sketch estimates are
    // engine-specific by construction). At 100 TB the exact percentile
    // is a full sort per group; the sketch is one mergeable pass.
    // Emitted as scalar (flag, pct, value) rows — array-typed cells are
    // unsortable by the rows-only harness; posexplode keeps the sketch
    // while giving the check a comparable shape. SketchSpec bounds the
    // estimate error against the exact percentile.
    Q.rowsOnly("q_approx_percentile") { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
          .as("approx_p"))
        .select(
          col("l_returnflag"),
          posexplode(col("approx_p")).as(Seq("pct_idx", "approx_value")))
        .select(
          col("l_returnflag"),
          element_at(lit(Array(0.25, 0.5, 0.75)), col("pct_idx") + 1).as("pct"),
          col("approx_value"))
    }
  )
}
