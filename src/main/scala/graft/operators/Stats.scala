package graft.operators

import graft.{C, GQ, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical-modeling operators (round 5): closed-form regression and
  * seasonal forecasting — the "fit a line / project a baseline" layer a
  * metrics pipeline runs on top of the aggregation surface. The reference
  * has no statistics at all (SURVEY §2.4); these extend its P1-class
  * column math the same way q_agg_stats extends its counts.
  *
  * Both queries follow the moments pattern: the corpus is reduced to a
  * handful of EXACT sums (decimal or integer — aggregation-order-free in
  * both engines), and the model coefficients are a fixed IEEE expression
  * tree over those exact moments (the q_text_outliers determinism scheme).
  */
object Stats {

  val queries: Seq[GQ] = Seq(
    // Per-group ordinary least squares: l_extendedprice ~ l_quantity
    // within each l_returnflag — the closed-form simple regression every
    // metrics stack exposes (REGR_SLOPE/REGR_INTERCEPT/REGR_R2 in
    // ANSI SQL). Slope/intercept/R² from the five moment sums:
    //   slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    //   intercept = (Sy − slope·Sx) / n
    //   r2 = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²)·(n·Syy − Sy²))
    //
    // Determinism (R2/R7): the moments are sums of DECIMAL products —
    // exact and order-independent (price/qty carry ≤ 2 decimals; products
    // at scale 4; decimal(38,4) headroom: Σ qty·price < 10^12 at sf0.1,
    // ×10⁶ margin) — NOT the float sums ANSI REGR_* aggregates run on,
    // whose accumulation order is engine-dependent. Each moment then
    // casts once to DOUBLE (correctly-rounded in both engines) and the
    // coefficient arithmetic is ONE fixed IEEE tree — bit-stable, with
    // roundz(6) + signed-zero normalization (R8) for display. Built-in
    // regr_slope exists in both engines and is REJECTED for exactly the
    // accumulation-order reason.
    //
    // Plan shape (100 TB): ONE scan → 3-row hash agg (map-side partials
    // carry five decimals per group); coefficient math runs on the 3-row
    // relation. Nothing else moves — linear at any corpus size.
    GQ(
      "q_stats_linreg",
      (s, d) => {
        val li = Tables.t(s, d, "lineitem")
        val x = C.dec2(col("l_quantity"))
        val y = C.dec2(col("l_extendedprice"))
        val m = li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(x).cast(DoubleType).as("sx"),
            sum(y).cast(DoubleType).as("sy"),
            sum(x * x).cast(DoubleType).as("sxx"),
            sum(x * y).cast(DoubleType).as("sxy"),
            sum(y * y).cast(DoubleType).as("syy"))
        val nD = col("n").cast(DoubleType)
        val covN = nD * col("sxy") - col("sx") * col("sy")
        val varX = nD * col("sxx") - col("sx") * col("sx")
        val varY = nD * col("syy") - col("sy") * col("sy")
        val slope = covN / varX
        m.select(col("l_returnflag"), col("n"),
            graft.functions.vec.roundz(slope, 6).as("slope"),
            graft.functions.vec.roundz((col("sy") - slope * col("sx")) / nD, 6)
              .as("intercept"),
            graft.functions.vec.roundz(covN * covN / (varX * varY), 6).as("r2"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY l_returnflag),
             |c AS (SELECT l_returnflag, n,
             |    CAST(n AS DOUBLE) * sxy - sx * sy AS covn,
             |    CAST(n AS DOUBLE) * sxx - sx * sx AS varx,
             |    CAST(n AS DOUBLE) * syy - sy * sy AS vary,
             |    sx, sy FROM m)
             |SELECT l_returnflag, n,
             |  (ROUND(covn / varx, 6) + 0.0) AS slope,
             |  (ROUND((sy - (covn / varx) * sx) / CAST(n AS DOUBLE), 6) + 0.0)
             |    AS intercept,
             |  (ROUND(covn * covn / (varx * vary), 6) + 0.0) AS r2
             |FROM c ORDER BY l_returnflag""".stripMargin)
    ),
    // Seasonal-naive forecast + error backtest over the daily event
    // series: forecast(day) = actual(day − 7) — the baseline every
    // forecasting system is benchmarked against (the "snaive" model;
    // Hyndman & Athanasopoulos §5.2), and the per-day absolute error IS
    // the backtest a monitoring pipeline alerts on. Calendar join, not
    // row-lag: lag(7) over ROWS silently misaligns across gaps in the
    // day series; joining on day−7 forecasts the true calendar week.
    //
    // Determinism: day index = exact integer epoch-nanos div (R5);
    // counts + absolute differences are BIGINTs end to end — no FP.
    //
    // Plan shape (100 TB): ONE corpus scan → day-keyed hash agg
    // (map-side combine; |days| rows out), then a self-join on the
    // |days|-sized series — broadcast-able forever. Linear at any scale.
    GQ(
      "q_time_seasonal",
      (s, d) => {
        val NanosPerDay = 86400L * 1000 * 1000 * 1000
        val daily = Tables.events(s, d)
          .withColumn("day", expr(s"ts DIV $NanosPerDay"))
          .groupBy(col("day")).agg(count(lit(1)).as("actual"))
        daily.as("c")
          .join(daily.as("p"), col("c.day") === col("p.day") + 7)
          .select(col("c.day").as("day"), col("c.actual").as("actual"),
            col("p.actual").as("forecast"),
            abs(col("c.actual") - col("p.actual")).as("abs_err"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    COUNT(*) AS actual
             |  FROM events GROUP BY 1)
             |SELECT c.day AS day, c.actual AS actual, p.actual AS forecast,
             |  abs(c.actual - p.actual) AS abs_err
             |FROM daily c JOIN daily p ON c.day = p.day + 7
             |ORDER BY day""".stripMargin)
    ),
    // CUSUM change-point scan over the daily event series (Page 1954) —
    // the monitoring primitive that finds WHERE a level shift happened,
    // complementing q_time_anomaly (which spike is abnormal) and
    // q_time_seasonal (how wrong the baseline is). Classic centered
    // cumulative sum, scaled INTEGER-EXACT: instead of Σ(c_i − S/N) in
    // floats, accumulate N·c_i − S — the same series ×N — so every
    // partial sum is an exact BIGINT (|days|·N·max_cnt ≪ 2^63) and the
    // argmax |cusum| (the estimated change point, flagged per row) is
    // bit-free of FP. Emits the full diagnostic series: day, count,
    // scaled cusum, is_change flag.
    //
    // Determinism: integers end to end; the argmax flag breaks ties by
    // flagging EVERY day attaining max |cusum| (no hidden tie-break);
    // ORDER BY the unique day (R1).
    //
    // Plan shape (100 TB): ONE corpus scan → day-keyed hash agg; the
    // cumulative window and the max-abs window both run on the
    // |days|-sized series (single-partition window over a model-sized
    // relation — the bounded-driver-pattern analog for windows), with
    // the (N, S) totals broadcast from a 1-row agg.
    GQ(
      "q_time_cusum",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val NanosPerDay = 86400L * 1000 * 1000 * 1000
        val daily = Tables.events(s, d)
          .withColumn("day", expr(s"ts DIV $NanosPerDay"))
          .groupBy(col("day")).agg(count(lit(1)).as("actual"))
        val tot = daily.agg(count(lit(1)).as("nd"), sum(col("actual")).as("st"))
        val cum = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(tot))
          .withColumn("cusum",
            sum(col("actual") * col("nd") - col("st")).over(cum))
          .withColumn("is_change",
            abs(col("cusum")) === max(abs(col("cusum"))).over(
              Window.partitionBy()))
          .select(col("day"), col("actual"), col("cusum"), col("is_change"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    COUNT(*) AS actual FROM events GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS nd, SUM(actual) AS st FROM daily),
             |cs AS (SELECT day, actual,
             |    SUM(actual * nd - st) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS cusum
             |  FROM daily, tot)
             |SELECT day, actual, CAST(cusum AS BIGINT) AS cusum,
             |  abs(cusum) = MAX(abs(cusum)) OVER () AS is_change
             |FROM cs ORDER BY day""".stripMargin)
    ),
    // DAU / rolling 28-day MAU / stickiness (round 5) — the engagement
    // triple every product-analytics stack reports. The rolling distinct
    // is computed EXACTLY by joining the (day, user) activity relation
    // onto each report day's trailing window (distinct-over-window has
    // no streaming-aggregate form — sliding distinct sets don't merge),
    // with DAU folded into the same pass as a conditional distinct.
    // Stickiness = DAU·1000 div MAU in exact integer thousandths
    // (identical floor division on positives, R7-free).
    //
    // Determinism: exact distinct counts + integer division; ORDER BY
    // the unique day (R1). Partial leading windows (< 28 days of
    // history) report what exists — the standard convention.
    //
    // Plan shape (100 TB): ONE corpus scan → (day, user) distinct (the
    // only corpus-sized exchange); the |days|-sized calendar BROADCASTS
    // into a nested-loop range join — ≤ 28 output rows per activity row,
    // a fixed fan-out like q_time_sliding's explode — then one day-keyed
    // distinct agg. At petabyte user counts the exact path gives way to
    // the mergeable per-day HLL tiles of q_sketch_rollup (union 28
    // sketches per report day); this query IS the exact oracle that
    // validates that sketch rollup.
    GQ(
      "q_events_dau_mau",
      (s, d) => {
        val NanosPerDay = 86400L * 1000 * 1000 * 1000
        val du = Tables.events(s, d)
          .select(expr(s"ts DIV $NanosPerDay").as("day"), col("user_id"))
          .distinct()
        val days = du.select(col("day").as("d")).distinct()
        broadcast(days)
          .join(du, col("day").between(col("d") - 27, col("d")))
          .groupBy(col("d"))
          .agg(
            countDistinct(when(col("day") === col("d"), col("user_id")))
              .as("dau"),
            countDistinct(col("user_id")).as("mau"))
          .select(col("d").as("day"), col("dau"), col("mau"),
            expr("dau * 1000 div mau").as("stickiness_milli"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (SELECT DISTINCT
             |    epoch_ns(ts) // 86400000000000 AS day, user_id FROM events),
             |days AS (SELECT DISTINCT day AS d FROM du)
             |SELECT d AS day,
             |  COUNT(DISTINCT CASE WHEN du.day = d THEN du.user_id END) AS dau,
             |  COUNT(DISTINCT du.user_id) AS mau,
             |  (COUNT(DISTINCT CASE WHEN du.day = d THEN du.user_id END) * 1000)
             |    // COUNT(DISTINCT du.user_id) AS stickiness_milli
             |FROM days JOIN du ON du.day BETWEEN d - 27 AND d
             |GROUP BY d ORDER BY day""".stripMargin)
    )
  )
}
