package graft.operators

import graft.{C, GQ, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function operators: ranking, running frames, top-k per group.
  *
  * Scale posture: each window is one shuffle on its PARTITION BY key followed
  * by an in-partition sort; the top-k queries filter on row_number immediately
  * so only k rows per group survive past the window. Window order keys always
  * include a unique tie-breaker (R1) so rank == row_number deterministically.
  */
object Windows {

  val queries: Seq[GQ] = Seq(
    GQ(
      "q_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 5)
          .select(col("o_orderpriority"), col("o_orderkey"), col("rn"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, rn FROM (
             |  SELECT o_orderpriority, o_orderkey,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin)
    ),
    GQ(
      "q_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(s, d, "orders")
          .withColumn("running", sum(C.dec2(col("o_totalprice"))).over(w).cast(DoubleType))
          .select(col("o_custkey"), col("o_orderkey"), col("running"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),
    // RANGE frame over event time: 30-day rolling revenue per customer. The
    // frame is value-defined (all orders within 30 days by o_orderdate), so
    // rows sharing an order date share a frame — deterministic without a
    // tie-break inside the frame clause; the decimal sum keeps it exact (R2).
    GQ(
      "q_window_range",
      (s, d) => {
        Tables.t(s, d, "orders").createOrReplaceTempView("graft_orders_range")
        s.sql("""SELECT o_custkey, o_orderkey,
                |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                |  PARTITION BY o_custkey ORDER BY o_orderdate
                |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                |  AS DOUBLE) AS rolling_30d
                |FROM graft_orders_range
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderdate
             |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
             |  AS DOUBLE) AS rolling_30d
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),
    // Distribution window functions. The window order key is unique
    // (totalprice, orderkey), so ntile buckets and the percent_rank /
    // cume_dist int-ratio divisions are deterministic and bit-stable.
    GQ(
      "q_window_dist",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.t(s, d, "orders")
          .select(
            col("o_orderstatus"), col("o_orderkey"),
            ntile(4).over(w).cast(LongType).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy(col("o_orderstatus"), col("o_orderkey"))
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |ntile(4) OVER w AS quartile,
             |percent_rank() OVER w AS pct_rank,
             |cume_dist() OVER w AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin)
    ),
    // Value-positional window functions over an explicit two-sided frame.
    GQ(
      "q_window_firstlast",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.t(s, d, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            last(col("o_orderkey")).over(w).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |first_value(o_orderkey) OVER w AS first_ok,
             |last_value(o_orderkey) OVER w AS last_ok,
             |nth_value(o_orderkey, 2) OVER w AS second_ok
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),
    GQ(
      "q_topk_per_group",
      (s, d) => {
        val joined = Tables.t(s, d, "customer")
          .join(Tables.t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        joined
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("o_orderkey"), col("rn"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""SELECT c_mktsegment, o_orderkey, rn FROM (
             |  SELECT c_mktsegment, o_orderkey,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM customer JOIN orders ON c_custkey = o_custkey)
             |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin)
    ),
    // SCD Type-2 effective dating (round 4): build a slowly-changing-
    // dimension history from a change stream — each customer's orders,
    // taken in date order, are successive versions of their "latest total
    // price" attribute; every version gets [valid_from, valid_to) epoch-
    // second bounds (R4) and the open-ended newest row is flagged current.
    // This is the warehouse-standard effective-dating build (the write
    // side of what q_merge_upsert applies): ONE window shuffle keyed on
    // the dimension key, lead() closes each interval, no self-join — the
    // naive "join each version to the next" doubles the shuffle for the
    // same answer. Order key carries o_orderkey (R1): (custkey, orderdate)
    // is NOT unique in the data, so lead() without the tie-break would be
    // nondeterministic. At 100 TB: dimension keys partition the exchange;
    // history build is embarrassingly parallel per key.
    GQ(
      "q_scd2_history",
      (s, d) => {
        // window orders on valid_from (the epoch-second cast is monotonic in
        // o_orderdate, so the order is identical) + o_orderkey (R1 tie)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("valid_from"), col("o_orderkey"))
        Tables.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice"),
            // driver parquet reads o_orderdate as TIMESTAMP_NTZ, which has
            // no direct BIGINT cast; the timestamp hop interprets the wall
            // clock in the session zone (pinned UTC) — exactly DuckDB's
            // epoch_ms of a naive timestamp
            col("o_orderdate").cast("timestamp").cast(LongType).as("valid_from"))
          .withColumn("version", row_number().over(w).cast(LongType))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w) - 1L)
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy(col("o_custkey"), col("version"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(epoch_ms(o_orderdate) // 1000 AS BIGINT) AS valid_from,
             |  CAST(row_number() OVER w AS BIGINT) AS version,
             |  CAST(epoch_ms(lead(o_orderdate, 1) OVER w) // 1000 - 1 AS BIGINT)
             |    AS valid_to,
             |  lead(o_orderdate, 1) OVER w IS NULL AS is_current
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, version""".stripMargin)
    )
  )
}
