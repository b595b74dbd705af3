package graft.operators

import graft.{C, GQ, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan / filter / projection / scalar-expression operators.
  *
  * Generalizes the reference's record-shredding projections and null filters
  * (/root/reference/spotify-etl.py:76-84, :100-106, :167) and its terminal
  * cast-all-to-string (:211) onto the driver's TPC-H-ish tables. All plans are
  * single-stage scans: Catalyst pushes the filters and the column selection
  * into the parquet reader, so at 100 TB these are pure scan-bandwidth ops
  * with no shuffle (the final ORDER BY exists only for the determinism
  * contract R1 and is dropped by `.count()`-style actions).
  */
object Relational {

  val queries: Seq[GQ] = Seq(
    GQ(
      "q_scan_projection",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    GQ(
      "q_filter_predicate",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
          .select(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity > 30
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    GQ(
      "q_project_expr",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            C.revenue(col("l_extendedprice"), col("l_discount")).cast(DoubleType).as("revenue"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some(s"""SELECT l_orderkey, l_linenumber, CAST(${C.sqlRevenue} AS DOUBLE) AS revenue
              |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    GQ(
      "q_string_funcs",
      (s, d) =>
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("name_upper"),
            substring(col("c_name"), 1, 8).as("name_pre8"),
            length(col("c_name")).cast(LongType).as("name_len"),
            concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, upper(c_name) AS name_upper,
             |substring(c_name, 1, 8) AS name_pre8,
             |length(c_name) AS name_len,
             |concat(c_mktsegment, '#', c_name) AS tagged
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    GQ(
      "q_date_funcs",
      (s, d) =>
        Tables.t(s, d, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("o_year"),
            month(col("o_orderdate")).cast(LongType).as("o_month"),
            dayofmonth(col("o_orderdate")).cast(LongType).as("o_day"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, year(o_orderdate) AS o_year,
             |month(o_orderdate) AS o_month, day(o_orderdate) AS o_day
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    GQ(
      "q_math_funcs",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(C.dec2(col("l_extendedprice")), 1).cast(DoubleType).as("price_r1"),
            abs(C.dec2(col("l_discount")) - lit(0.05).cast(C.Dec2)).cast(DoubleType).as("disc_dev"),
            floor(col("l_quantity")).cast(LongType).as("qty_floor"),
            ceil(col("l_quantity")).cast(LongType).as("qty_ceil"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
             |CAST(abs(CAST(l_discount AS DECIMAL(18,2)) - CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE) AS disc_dev,
             |CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
             |CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    GQ(
      "q_array_ops",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_words"),
            array_join(slice(split(col("text"), " "), 1, 3), " ").as("first3"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |len(string_split(text, ' ')) AS n_words,
             |array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // Map-type scalar family (round 5) — the MapType third of the nested
    // type system (§1.3): arrays (q_array_ops) and structs (the source
    // shredding P1/P2) are covered; this exercises map CONSTRUCTION
    // (map_from_entries), introspection (map_keys/map_values/size),
    // point lookup (element_at with a missing-key default), a lambda
    // fold over values (aggregate), and a lambda filter (map_filter) —
    // the functions a feature-store or per-entity-stats pipeline uses
    // when a group's sub-histogram travels as one column.
    //
    // Determinism: map entry order IS collect order, so the entries are
    // sort_array'd BEFORE map_from_entries — every downstream function
    // sees one canonical key order (map_keys emits it verbatim). All
    // counts are exact BIGINTs; the output is scalar columns only (map
    // values cross the oracle boundary as derived scalars, never as a
    // serialized map — key order would be engine-defined there).
    //
    // Plan shape (100 TB): two hash aggs on one scan (status sub-counts,
    // then per-flag maps over ≤ |statuses| entries); everything after
    // the first agg is a |flags × statuses|-row model relation. The map
    // column never shuffles wider than the grouped counts themselves.
    GQ(
      "q_map_ops",
      (s, d) => {
        val cnt = Tables.t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("c"))
        cnt.groupBy(col("l_returnflag"))
          .agg(map_from_entries(sort_array(collect_list(
            struct(col("l_linestatus"), col("c"))))).as("m"))
          .withColumn("total",
            aggregate(map_values(col("m")), lit(0L), (a, x) => a + x))
          .select(col("l_returnflag"),
            size(col("m")).cast(LongType).as("n_keys"),
            concat_ws(",", map_keys(col("m"))).as("keys_csv"),
            coalesce(element_at(col("m"), lit("O")), lit(0L)).as("cnt_o"),
            col("total"),
            size(map_filter(col("m"), (_, v) => v * lit(3L) > col("total")))
              .cast(LongType).as("n_major"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH c AS (SELECT l_returnflag, l_linestatus AS st,
             |    COUNT(*) AS c FROM lineitem GROUP BY 1, 2),
             |t AS (SELECT *, SUM(c) OVER (PARTITION BY l_returnflag)
             |    AS tot FROM c)
             |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_keys,
             |  string_agg(st, ',' ORDER BY st) AS keys_csv,
             |  CAST(COALESCE(SUM(CASE WHEN st = 'O' THEN c END), 0)
             |    AS BIGINT) AS cnt_o,
             |  CAST(SUM(c) AS BIGINT) AS total,
             |  CAST(SUM(CASE WHEN c * 3 > tot THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_major
             |FROM t GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),
    GQ(
      "q_cast_all_string",
      (s, d) =>
        graft.sources.JdbcReplaceSink.castAllToString(Tables.t(s, d, "nation"))
          .orderBy(col("n_nationkey").cast(IntegerType)),
      Some("""SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
             |CAST(n_name AS VARCHAR) AS n_name,
             |CAST(n_regionkey AS VARCHAR) AS n_regionkey
             |FROM nation ORDER BY CAST(n_nationkey AS INTEGER)""".stripMargin)
    ),
    // Regex scalar family (extract / replace / match) — the pattern-shredding
    // counterpart of the reference's structural JSON shredding.
    GQ(
      "q_regex_funcs",
      (s, d) =>
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
            regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("seg_masked"),
            col("c_name").rlike("00$").as("ends_00"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             |regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked,
             |regexp_matches(c_name, '00$') AS ends_00
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    // NULL-handling scalars: nullif / coalesce / greatest — raw-double
    // passthrough, no arithmetic, bit-stable (R7).
    GQ(
      "q_null_funcs",
      (s, d) =>
        Tables.t(s, d, "customer")
          .select(
            col("c_custkey"),
            nullif(col("c_acctbal"), lit(0.0)).as("bal_nullable"),
            coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(-999.0)).as("bal_or_default"),
            greatest(col("c_acctbal"), lit(0.0)).as("pos_part"),
            (col("c_acctbal") < 0).as("is_neg"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |nullif(c_acctbal, 0.0) AS bal_nullable,
             |coalesce(nullif(c_acctbal, 0.0), -999.0) AS bal_or_default,
             |greatest(c_acctbal, 0.0) AS pos_part,
             |c_acctbal < 0 AS is_neg
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    // Date arithmetic: truncation + interval add + day diff, emitted as
    // formatted strings / integers (R4 — no timestamp columns in outputs).
    GQ(
      "q_date_arith",
      (s, d) =>
        Tables.t(s, d, "orders")
          .select(
            col("o_orderkey"),
            date_format(date_trunc("MONTH", col("o_orderdate")), "yyyy-MM-dd")
              .as("month_start"),
            date_format(add_months(date_trunc("MONTH", col("o_orderdate")), 1),
              "yyyy-MM-dd").as("next_month"),
            datediff(col("o_orderdate"), lit("1995-01-01")).cast(LongType)
              .as("days_since"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH, '%Y-%m-%d')
             |  AS next_month,
             |datediff('day', DATE '1995-01-01', o_orderdate) AS days_since
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    // Correlated scalar subquery: per-customer order count compared inline.
    // Catalyst decorrelates this into a left outer aggregate join — the
    // subquery never executes per row, so the plan is one shuffle at any
    // scale (verify with tools.Explain: no nested-loop anywhere).
    GQ(
      "q_correlated_subquery",
      (s, d) => {
        Tables.t(s, d, "customer").createOrReplaceTempView("graft_customer_cs")
        Tables.t(s, d, "orders").createOrReplaceTempView("graft_orders_cs")
        s.sql("""SELECT c_custkey,
                |  (SELECT COUNT(*) FROM graft_orders_cs WHERE o_custkey = c_custkey)
                |    AS n_orders
                |FROM graft_customer_cs
                |WHERE (SELECT COUNT(*) FROM graft_orders_cs
                |       WHERE o_custkey = c_custkey) >= 15
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
             |FROM customer
             |WHERE (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) >= 15
             |ORDER BY c_custkey""".stripMargin)
    ),
    // Uncorrelated scalar subquery: customers richer than every supplier.
    // The subquery is a one-row broadcast — at 100 TB the inner MAX is a
    // partial/final agg whose single value feeds the scan filter; raw-double
    // comparison, no arithmetic, so bit-stable (R7).
    GQ(
      "q_scalar_subquery",
      (s, d) => {
        Tables.t(s, d, "customer").createOrReplaceTempView("graft_customer_ss")
        Tables.t(s, d, "supplier").createOrReplaceTempView("graft_supplier_ss")
        s.sql("""SELECT c_custkey FROM graft_customer_ss
                |WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM graft_supplier_ss)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM supplier)
             |ORDER BY c_custkey""".stripMargin)
    )
  )
}
