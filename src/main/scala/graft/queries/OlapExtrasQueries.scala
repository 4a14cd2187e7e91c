package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** OLAP operators beyond the reference's own surface (SURVEY §2 marks
  * these categories absent; a "complete" engine a reference user could
  * switch to still needs them): multi-dimensional grouping sets, HAVING,
  * exact quantiles, and the remaining window shapes.
  *
  * Scale notes: rollup/cube expand inside the partial aggregate
  * (Expand operator before the shuffle — one pass over data); exact
  * percentiles sort within groups only; ntile/first/last ride the same
  * single window shuffle as the other window ops.
  */
object OlapExtrasQueries {

  val qs: Seq[Q] = Seq(

    // ---- ROLLUP: hierarchical subtotals + grand total
    Q.sql(
      "q_agg_rollup_sets",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS INT) AS g_status,
        |       count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "qty")
    },

    // ---- CUBE: all grouping combinations
    Q.sql(
      "q_agg_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS INT) AS g_st,
        |       CAST(grouping(o_orderpriority) AS INT) AS g_pr,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select("o_orderstatus", "o_orderpriority", "g_st", "g_pr", "n", "total")
    },

    // ---- HAVING: post-aggregation predicate
    Q.sql(
      "q_agg_having",
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 12 AND sum(o_totalprice) > 1000000""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("raw_total"))
        .filter(col("n") >= 12 && col("raw_total") > 1000000)
        .select(col("o_custkey"), col("n"), round(col("raw_total"), 2).as("total"))
    },

    // ---- exact interpolated quantiles + median per group
    Q.sql(
      "q_agg_percentiles",
      """SELECT l_returnflag,
        |       round(median(l_quantity), 4) AS med_qty,
        |       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      // ONE exact-percentile buffer for both price quantiles: Spark's
      // Percentile is an ObjectAggregate that materializes a per-group
      // value-count map and ships it through the exchange — two scalar
      // percentile calls over the same column build and serialize that
      // map twice; the array form computes both quantiles from one
      // buffer (identical interpolation arithmetic, same values).
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(median(col("l_quantity")), 4).as("med_qty"),
          percentile(col("l_extendedprice"),
            array(lit(0.25), lit(0.75))).as("pcts"))
        .select(col("l_returnflag"), col("med_qty"),
          round(element_at(col("pcts"), 1), 4).as("p25_price"),
          round(element_at(col("pcts"), 2), 4).as("p75_price"))
    },

    // ---- PIVOT: long → wide on a fixed value set (Spark .pivot;
    // oracle spells it as conditional aggregation, which is also what
    // Catalyst rewrites pivot into)
    Q.sql(
      "q_pivot_status",
      """SELECT o_orderpriority,
        |       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
        |       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
        |       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      val p = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice")))
      p.select(col("o_orderpriority"),
        round(col("F"), 2).as("F"), round(col("O"), 2).as("O"), round(col("P"), 2).as("P"))
    },

    // ---- UNPIVOT (wide → long): the inverse of the pivot above; Spark
    // `stack` generator, oracle spelled as UNION ALL (also what the
    // relational UNPIVOT desugars to). Scan-local row generation.
    Q.sql(
      "q_unpivot_measures",
      """SELECT o_orderkey, measure, round(val, 2) AS val FROM (
        |  SELECT o_orderkey, 'price' AS measure, o_totalprice AS val FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders)
        |WHERE val IS NOT NULL""".stripMargin
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("stack(2, 'price', o_totalprice, 'custkey', CAST(o_custkey AS DOUBLE)) AS (measure, val)"))
        .filter(col("val").isNotNull)
        .select(col("o_orderkey"), col("measure"), round(col("val"), 2).as("val"))
    },

    // ---- RANGE window frame: trailing-3-month rolling revenue per
    // customer over a numeric month index (value-based frame, not
    // row-based — gaps in activity shrink the window)
    Q.sql(
      "q_win_range_frame",
      """WITH m AS (
        |  SELECT o_custkey,
        |         CAST(datediff('month', DATE '1970-01-01',
        |              CAST(date_trunc('month', o_orderdate) AS DATE)) AS INT) AS month_idx,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, month_idx, rev,
        |       round(sum(rev) OVER (PARTITION BY o_custkey ORDER BY month_idx
        |             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rev_3mo
        |FROM m""".stripMargin
    ) { (s, dir) =>
      val monthIdx = months_between(
        date_trunc("month", col("o_orderdate")).cast("date"),
        lit("1970-01-01").cast("date")).cast("int")
      val m = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), monthIdx.as("month_idx"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("month_idx"))
        .rangeBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
      m.withColumn("rev_3mo", round(sum(col("rev")).over(w), 2))
    },

    // ---- time-series resample + LOCF gap fill: hourly grid per user,
    // value = last observation at-or-before each grid instant (training
    // pipelines align irregular series to a grid this way). Same
    // union+last(ignoreNulls) single-shuffle shape as the as-of join —
    // grid rows sort after same-instant observations (is_grid tiebreak),
    // and LOCF copies ONE observed double (no summation), so values are
    // bit-identical cross-engine with no quantization.
    Q.sql(
      "q_ts_resample_locf",
      """WITH obs AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
        |bounds AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
        |  FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
        |  FROM bounds),
        |u AS (
        |  SELECT user_id, ts, 0 AS is_grid, event_id, value FROM obs
        |  UNION ALL
        |  SELECT user_id, ts, 1, NULL, NULL FROM grid),
        |f AS (
        |  SELECT user_id, ts, is_grid,
        |         last_value(value IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, is_grid, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
        |  FROM u)
        |SELECT user_id, ts AS hour_ts, locf_value FROM f WHERE is_grid = 1""".stripMargin
    ) { (s, dir) =>
      val obs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val grid = obs.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"),
          date_trunc("hour", max(col("ts"))).as("t1"))
        .select(col("user_id"),
          explode(expr("sequence(t0, t1, interval 1 hour)")).as("ts"))
      val unioned = obs
        .withColumn("is_grid", lit(0))
        .unionByName(grid
          .withColumn("is_grid", lit(1))
          .withColumn("event_id", lit(null).cast("long"))
          .withColumn("value", lit(null).cast("double")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_grid"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("locf_value", last(col("value"), ignoreNulls = true).over(w))
        .filter(col("is_grid") === 1)
        .select(col("user_id"), col("ts").as("hour_ts"), col("locf_value"))
    },

    // ---- time-series resample + LINEAR interpolation: the gap-fill
    // sibling of LOCF for continuous signals — each hourly grid instant
    // takes v0 + (v1−v0)·(t−t0)/(t1−t0) between its bracketing
    // observations (null outside the observed range: interpolation
    // never extrapolates). Same union+window single-shuffle shape as
    // LOCF, with a mirrored forward window for the next observation.
    // Determinism: values quantized to integer cents, instants to
    // integer epoch-micros, so both engines feed IDENTICAL integer
    // operand bits through the IDENTICAL IEEE expression shape
    // (cast, subtract, divide, multiply, add — same grouping) — the
    // doubles bit-match without any summation-order hazard.
    Q.sql(
      "q_ts_interpolate_linear",
      """WITH obs AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |bounds AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
        |  FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
        |  FROM bounds),
        |u AS (
        |  SELECT user_id, ts, 0 AS is_grid, event_id, v FROM obs
        |  UNION ALL
        |  SELECT user_id, ts, 1, NULL, NULL FROM grid),
        |f AS (
        |  SELECT user_id, ts, is_grid,
        |         last_value(v IGNORE NULLS) OVER wp AS v0,
        |         last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
        |           OVER wp AS t0e,
        |         first_value(v IGNORE NULLS) OVER wn AS v1,
        |         first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
        |           OVER wn AS t1e
        |  FROM u
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, ts AS hour_ts,
        |       round(CASE WHEN v0 IS NULL OR v1 IS NULL THEN NULL
        |                  ELSE CAST(v0 AS DOUBLE)
        |                       + CAST(v1 - v0 AS DOUBLE)
        |                         * (CAST(epoch_us(ts) - t0e AS DOUBLE)
        |                            / CAST(t1e - t0e AS DOUBLE))
        |             END, 4) AS interp_cents
        |FROM f WHERE is_grid = 1""".stripMargin
    ) { (s, dir) =>
      val obs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      val grid = obs.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"),
          date_trunc("hour", max(col("ts"))).as("t1"))
        .select(col("user_id"),
          explode(expr("sequence(t0, t1, interval 1 hour)")).as("ts"))
      val unioned = obs
        .withColumn("is_grid", lit(0))
        .unionByName(grid
          .withColumn("is_grid", lit(1))
          .withColumn("event_id", lit(null).cast("long"))
          .withColumn("v", lit(null).cast("long")))
      // BOTH neighbor lookups run as O(n) RUNNING frames: the oracle's
      // `CURRENT ROW AND UNBOUNDED FOLLOWING` frame is, in Spark,
      // recomputed from scratch per row (UnboundedFollowing frames are
      // O(n²) per partition — measured 4× the LOCF query's cost before
      // this rewrite), so the NEXT-observation columns are computed
      // over the EXACT REVERSE sort with an unbounded-preceding frame
      // instead: `last ignoreNulls` over the reversed running frame ≡
      // `first ignoreNulls` over the forward following frame (the
      // order is total — grid rows are unique per (user, ts), obs rows
      // per event_id — so the reversal is exact). One exchange, two
      // sorts, both frames streaming.
      val wp = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_grid"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wr = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("is_grid").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tMicros = expr("unix_micros(ts)")
      val obsMicros = when(col("v").isNotNull, tMicros)
      val interp = col("v0").cast("double") +
        (col("v1") - col("v0")).cast("double") *
          ((tMicros - col("t0e")).cast("double") /
            (col("t1e") - col("t0e")).cast("double"))
      unioned
        .withColumn("v0", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("t0e", last(obsMicros, ignoreNulls = true).over(wp))
        .withColumn("v1", last(col("v"), ignoreNulls = true).over(wr))
        .withColumn("t1e", last(obsMicros, ignoreNulls = true).over(wr))
        .filter(col("is_grid") === 1)
        .select(col("user_id"), col("ts").as("hour_ts"),
          round(when(col("v0").isNull || col("v1").isNull, lit(null))
            .otherwise(interp), 4).as("interp_cents"))
    },

    // ---- time-series anomaly signal: rolling mean/std over a trailing
    // row frame per user. Rolling DOUBLE sums cannot hash-match across
    // engines (DuckDB evaluates sliding frames with segment trees, so
    // even the summation order differs) — values are quantized to
    // integer cents first, making frame sums exact; mean and sample
    // variance then derive from identical integer operands on both
    // sides.
    Q.sql(
      "q_ts_rolling_zscore",
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events)
        |SELECT user_id, event_id, v,
        |       CAST(floor(CAST(sum(v) OVER w AS DOUBLE) * 10 / count(v) OVER w + 0.5) AS BIGINT) AS mean_milli,
        |       CAST(floor(CASE WHEN count(v) OVER w > 1 THEN
        |               sqrt(greatest(
        |                 (CAST(sum(v * v) OVER w AS DOUBLE)
        |                  - CAST(sum(v) OVER w AS DOUBLE) * CAST(sum(v) OVER w AS DOUBLE) / count(v) OVER w)
        |                 / (count(v) OVER w - 1), 0.0)) * 10
        |             ELSE 0.0 END + 0.5) AS BIGINT) AS std_milli
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin
    ) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, org.apache.spark.sql.expressions.Window.currentRow)
      val e = Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("v"))
      val n = count(col("v")).over(w)
      val sv = sum(col("v")).over(w)
      val svv = sum(col("v") * col("v")).over(w)
      // explicit floor(x+0.5) half-up: round() modes differ across
      // engines (DuckDB ties-to-even vs Spark HALF_UP) and cent-means
      // land on exact ties constantly; integer milli-unit outputs avoid
      // float compare entirely
      e.select(
        col("user_id"), col("event_id"), col("v"),
        floor(sv.cast("double") * 10 / n + 0.5).cast("long").as("mean_milli"),
        floor(when(n > 1,
          sqrt(greatest((svv.cast("double") - sv.cast("double") * sv.cast("double") / n) / (n - 1),
            lit(0.0))) * 10)
          .otherwise(0.0) + 0.5).cast("long").as("std_milli"))
    },

    // ---- JSON column extraction (semi-structured props on the events
    // log): scalar path extraction + typed aggregation over it. In
    // Spark, from_json/get_json_object evaluate scan-local; at 100 TB
    // prefer parsing ONCE into a struct column at ingestion over
    // repeated per-query path extraction.
    Q.sql(
      "q_json_extract",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin
    ) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          max(k).cast("int").as("max_k"))
    },

    // ---- VARIANT semi-structured access (Spark 4's typed answer to
    // string JSON paths): `parse_json` decodes the document ONCE into
    // the binary VARIANT encoding, and every later `variant_get` is a
    // typed field access on that encoding — at 100 TB the difference
    // between re-parsing text per extracted path (q_json_extract's
    // shape) and one parse feeding N typed reads + predicates. Oracle:
    // the same aggregates via DuckDB's JSON extraction — the VALUES
    // must agree even though the engines' encodings differ.
    Q.sql(
      "q_variant_extract",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS INT) > 50
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
        |FROM events GROUP BY event_type""".stripMargin
    ) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_hot"))
    },

    // ---- remaining window shapes: ntile quartiles, first/last value
    Q.sql(
      "q_win_ntile_first_last",
      """SELECT o_orderkey, o_orderpriority,
        |       ntile(4) OVER w AS quartile,
        |       first_value(o_orderkey) OVER w AS biggest_order,
        |       last_value(o_orderkey) OVER
        |         (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS smallest_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        first(col("o_orderkey")).over(w).as("biggest_order"),
        last(col("o_orderkey")).over(wFull).as("smallest_order"))
    },

    // ---- Z-order clustering key: bit-interleave (user, minute-of-day)
    // so one sort key clusters BOTH dimensions — written with
    // repartitionByRange(z) + sortWithinPartitions(z), a (user, time)
    // rectangle predicate skips row groups by parquet min/max stats on
    // either column (ZOrderSpec measures the skip; this query pins the
    // key expression itself cross-engine). The interleave is pure
    // per-row bit arithmetic — scan-local, zero shuffles, codegen'd.
    Q.sql(
      "q_layout_zorder", {
        val bits = (0 until 10).map(i =>
          s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        s"""SELECT event_id, x, y, ${bits.mkString(" + ")} AS z
           |FROM (SELECT event_id,
           |             user_id % 1024 AS x,
           |             CAST(extract(hour FROM ts) * 60 + extract(minute FROM ts)
           |                  AS BIGINT) % 1024 AS y
           |      FROM events)""".stripMargin
      }
    ) { (s, dir) =>
      val z = (0 until 10).map { i =>
        shiftleft(shiftright(col("x"), i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright(col("y"), i).bitwiseAND(1), 2 * i + 1)
      }.reduce(_ + _)
      Tables.events(s, dir).select(
        col("event_id"),
        (col("user_id") % 1024).as("x"),
        ((hour(col("ts")) * 60 + minute(col("ts"))).cast("long") % 1024).as("y"))
        .withColumn("z", z)
    }
  )
}
