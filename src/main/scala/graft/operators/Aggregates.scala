package graft.operators

import graft.{C, GQ, Tables}
import org.apache.spark.sql.functions._

/** Aggregation operators: hash agg (partial+final), distinct agg,
  * rollup / cube (expand-based), and the HLL approximate-distinct sketch.
  *
  * The reference has no aggregations at all (SURVEY.md §2.4); this is the
  * engine surface a relational user needs. All group-bys here run as
  * `HashAggregateExec` with map-side partial aggregation, so the shuffle
  * carries one row per (partition, group) — at 100 TB the exchanged data is
  * proportional to group cardinality (tiny here), not input rows.
  */
object Aggregates {

  val queries: Seq[GQ] = Seq(
    // TPC-H Q1 shape — the flagship (SparkEntry.entry).
    GQ(
      "q_agg_hash",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            C.sumDec2(col("l_quantity")).as("sum_qty"),
            C.sumDec2(col("l_extendedprice")).as("sum_base_price"),
            C.sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |${C.sqlSumDec2("l_quantity")} AS sum_qty,
              |${C.sqlSumDec2("l_extendedprice")} AS sum_base_price,
              |CAST(SUM(${C.sqlRevenue}) AS DOUBLE) AS sum_disc_price,
              |COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),
    GQ(
      "q_agg_distinct",
      (s, d) =>
        Tables.t(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    // Boolean + bitwise aggregates — all associative/commutative integer or
    // boolean lattice ops, exactly deterministic under any merge order.
    GQ(
      "q_agg_bool_bit",
      (s, d) =>
        Tables.t(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            expr("bool_and(o_totalprice > 0)").as("all_positive"),
            expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
            expr("bit_and(o_orderkey)").as("key_and"),
            expr("bit_or(o_orderkey)").as("key_or"),
            expr("bit_xor(o_orderkey)").as("key_xor"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |bool_and(o_totalprice > 0) AS all_positive,
             |bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
             |bit_and(o_orderkey) AS key_and,
             |bit_or(o_orderkey) AS key_or,
             |bit_xor(o_orderkey) AS key_xor
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    // Ordered string aggregation (collect_list → sort → join): sorting
    // before joining makes the output independent of row arrival order —
    // collect_list alone is nondeterministic under shuffling (R3).
    GQ(
      "q_string_agg",
      (s, d) =>
        Tables.t(s, d, "nation")
          .groupBy(col("n_regionkey"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    ),
    // Pivot (wide aggregation): returnflag counts spread across columns.
    // Values are pinned (`Seq("A","N","R")`) — a two-pass value discovery
    // would be an extra full scan at 100 TB. Absent combinations count 0
    // (coalesce), matching SQL FILTER semantics.
    GQ(
      "q_pivot",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(count(lit(1)))
          .select(
            col("l_linestatus"),
            coalesce(col("A"), lit(0L)).as("n_a"),
            coalesce(col("N"), lit(0L)).as("n_n"),
            coalesce(col("R"), lit(0L)).as("n_r"))
          .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
             |COUNT(*) FILTER (WHERE l_returnflag = 'A') AS n_a,
             |COUNT(*) FILTER (WHERE l_returnflag = 'N') AS n_n,
             |COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_r
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    ),
    // Discrete percentiles: percentile_disc picks an actual data value (no
    // interpolation), so doubles compare bit-stable cross-engine (R7).
    GQ(
      "q_agg_percentile",
      (s, d) => {
        Tables.t(s, d, "orders").createOrReplaceTempView("graft_orders_pct")
        s.sql("""SELECT o_orderstatus,
                |percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
                |percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
                |MIN(o_totalprice) AS min_price,
                |MAX(o_totalprice) AS max_price
                |FROM graft_orders_pct
                |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
             |percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
             |MIN(o_totalprice) AS min_price,
             |MAX(o_totalprice) AS max_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    GQ(
      "q_agg_rollup",
      (s, d) =>
        Tables.t(s, d, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),
    GQ(
      "q_agg_cube",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), C.sumDec2(col("l_quantity")).as("sum_qty"))
          .orderBy(
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
              |${C.sqlSumDec2("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    ),
    // Conditional (FILTER-clause) aggregation (round 2): per status, total
    // count beside predicated count/sum in one grouped pass. Spark's
    // `when`-guarded aggregates compile to the same partial/final
    // HashAggregate as SQL FILTER; a status with no urgent orders yields
    // NULL in both engines (sum over empty).
    GQ(
      "q_agg_filter",
      (s, d) =>
        Tables.t(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_orders"),
            count(when(col("o_totalprice") > 1000, lit(1))).as("n_big"),
            sum(when(col("o_orderpriority") === "1-URGENT",
              C.dec2(col("o_totalprice")))).cast("double").as("urgent_rev"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
             |COUNT(*) FILTER (WHERE o_totalprice > 1000) AS n_big,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |  FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_rev
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    // Unpivot/melt (round 2) — the inverse reshape of q_pivot: three wide
    // measure columns become (metric, value) rows. Spark's native
    // `unpivot` (Dataset API) = ANSI UNPIVOT; the oracle uses the portable
    // UNION ALL form. Values pass through as raw doubles (R7).
    GQ(
      "q_unpivot",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "metric", "value")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
             |         l_quantity AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
             |    FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |    FROM lineitem)
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)
    ),
    // Bivariate statistics (corr / covar_samp / stddev_samp) per group —
    // NOT via the built-in double-accumulating aggregates, whose merge
    // order makes the low bits partitioning-dependent (and whose Welford /
    // naive formulations differ cross-engine). Instead: the five moment
    // sums accumulate as EXACT decimals (merge-order-free), and the
    // statistics are one fixed tree of IEEE ops over their double casts.
    // The operand pair (l_quantity, l_discount) keeps every unscaled sum
    // below 2^53 at bench SFs, so the decimal→double cast is exact in both
    // engines and every later op is bit-determined. (At unbounded SF the
    // casts round — then emit the exact decimal moments and let the reader
    // finish; the contract note lives in SURVEY §2.5 R2.)
    GQ(
      "q_agg_stats",
      (s, d) => {
        val x = C.dec2(col("l_quantity"))
        val y = C.dec2(col("l_discount"))
        def dbl(c: String) = col(c).cast("double")
        val (nd, sx, sy, sxx, sxy, syy) =
          (dbl("n"), dbl("sx"), dbl("sy"), dbl("sxx"), dbl("sxy"), dbl("syy"))
        val dxx = nd * sxx - sx * sx
        val dyy = nd * syy - sy * sy
        val dxy = nd * sxy - sx * sy
        Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
          .select(
            col("l_returnflag"), col("n"),
            (dxy / sqrt(dxx * dyy)).as("corr_qty_disc"),
            (dxy / (nd * (nd - 1))).as("covar_qty_disc"),
            sqrt(dxx / (nd * (nd - 1))).as("stddev_qty"),
            sqrt(dyy / (nd * (nd - 1))).as("stddev_disc"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH a AS (SELECT l_returnflag, COUNT(*) AS n,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             |    SUM(CAST(l_discount AS DECIMAL(18,2))) AS sy,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS sxy,
             |    SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS syy
             |  FROM lineitem GROUP BY 1),
             |b AS (SELECT l_returnflag, n,
             |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
             |    CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
             |  FROM a)
             |SELECT l_returnflag, n,
             |  (nd * sxyd - sxd * syd) / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
             |    AS corr_qty_disc,
             |  (nd * sxyd - sxd * syd) / (nd * (nd - 1)) AS covar_qty_disc,
             |  sqrt((nd * sxxd - sxd * sxd) / (nd * (nd - 1))) AS stddev_qty,
             |  sqrt((nd * syyd - syd * syd) / (nd * (nd - 1))) AS stddev_disc
             |FROM b ORDER BY l_returnflag""".stripMargin)
    ),
    // Mode + exact median per group. Mode is NOT the built-in `mode()`
    // (tie-breaking is engine-unspecified): most-frequent value with
    // lowest-value tie-break via a count agg + one row_number window over
    // the tiny (group × distinct-value) relation. Median is exact linear
    // interpolation (both engines: a + (b-a)/2 over the two middle values
    // — exact for the .0/.5 halves integer-valued quantities produce).
    // Plan at scale: the value-count agg carries |groups × values| rows,
    // the window runs over that bounded relation, never the corpus.
    GQ(
      "q_agg_median_mode",
      (s, d) => {
        val li = Tables.t(s, d, "lineitem")
        val wM = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("cnt").desc, col("l_quantity"))
        val mode = li.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(wM))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
        val med = li.groupBy(col("l_returnflag"))
          .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"))
        mode.join(med, "l_returnflag").orderBy(col("l_returnflag"))
      },
      Some("""WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |m AS (SELECT l_returnflag, l_quantity AS mode_qty FROM (
             |    SELECT l_returnflag, l_quantity,
             |      row_number() OVER (PARTITION BY l_returnflag
             |        ORDER BY cnt DESC, l_quantity) AS rn
             |    FROM c) WHERE rn = 1),
             |md AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
             |  FROM lineitem GROUP BY 1)
             |SELECT m.l_returnflag, m.mode_qty, md.median_qty
             |FROM m JOIN md USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)
    ),
    // Mergeable-histogram quantiles (round 4, batch 9) — the SCALE path
    // for percentiles: q_agg_percentile's exact form needs a per-group
    // sort of the corpus, this one needs only ONE hash agg into a
    // fixed-width histogram (bucket = price DIV $100 — counts merge by
    // addition under any partitioning, the same mergeability argument as
    // the CMS/HLL sketches) and reads p50/p90/p99 off the cumulative
    // counts. The estimate is the true quantile's bucket lower bound —
    // error ≤ one bucket width by construction, corpus-size-independent.
    //
    // Determinism: NO floating point anywhere — bucketing is exact cents
    // integer division (DECIMAL(18,2)·100 is integer-exact, R2), the rank
    // threshold test `cum ≥ ceil(n·p/100)` runs as the integer cross-
    // multiplication `cum·100 ≥ n·p`, and outputs are BIGINT cents.
    //
    // Plan shape (100 TB): ONE corpus hash agg (map-side combine; output
    // |groups × buckets|-bounded — price-range/100-sized, never
    // corpus-sized), then cumulative + total window sums and the three
    // conditional-min aggs all run on that bounded relation.
    GQ(
      "q_quantile_hist",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("flag")).orderBy(col("bucket"))
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy(col("flag"))
        def lo(p: Int) =
          (min(when(col("cum") * 100 >= col("n") * p, col("bucket"))) * 10000L)
            .as(s"p${p}_lo_cents")
        Tables.t(s, d, "lineitem")
          .select(col("l_returnflag").as("flag"),
            expr("CAST(l_extendedprice * 100 AS BIGINT) DIV 10000").as("bucket"))
          .groupBy(col("flag"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("n", sum(col("cnt")).over(wAll))
          .groupBy(col("flag"))
          .agg(max(col("n")).as("n"), lo(50), lo(90), lo(99))
          .orderBy(col("flag"))
      },
      Some("""WITH b AS (SELECT l_returnflag AS flag,
             |    CAST(l_extendedprice * 100 AS BIGINT) // 10000 AS bucket,
             |    COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |c AS (SELECT flag, bucket, cnt,
             |    SUM(cnt) OVER (PARTITION BY flag ORDER BY bucket) AS cum,
             |    SUM(cnt) OVER (PARTITION BY flag) AS n
             |  FROM b)
             |SELECT flag, CAST(MAX(n) AS BIGINT) AS n,
             |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN bucket END) * 10000
             |    AS BIGINT) AS p50_lo_cents,
             |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN bucket END) * 10000
             |    AS BIGINT) AS p90_lo_cents,
             |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN bucket END) * 10000
             |    AS BIGINT) AS p99_lo_cents
             |FROM c GROUP BY flag ORDER BY flag""".stripMargin)
    )
  )
}
