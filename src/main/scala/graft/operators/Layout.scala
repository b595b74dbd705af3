package graft.operators

import graft.{GQ, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators (round 4): Z-order (Morton) interleaving — the
  * multi-dimensional clustering key behind file-level min/max pruning on
  * MORE THAN ONE column at warehouse scale. Sorting 100 TB by `l_partkey`
  * makes partkey predicates prune files but leaves `l_suppkey` scattered
  * across every file; sorting by the interleaved z-value gives BOTH
  * dimensions tight per-file ranges (each z-range is a small rectangle in
  * (x, y) space), so either predicate skips most files. The z-value is
  * plain integer bit arithmetic — engine-portable and cheap enough to
  * compute at write time (`repartitionByRange(zvalue) + sortWithinPartitions`
  * is the full production write path; `graft.sources.Warehouse` holds the
  * layout writers).
  */
object Layout {

  /** Bits taken from each dimension (20-bit z-value). */
  private[graft] val ZBits = 10

  /** Z-bucket = z >> ZShift: 256 buckets over the 20-bit z-space. */
  private[graft] val ZShift = 12

  /** Morton-interleave the low `bits` of `x` (even positions) and `y` (odd
    * positions): Σᵢ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). Pure +/&/shift on
    * non-negative longs — identical semantics in Spark and DuckDB.
    */
  private[graft] def zvalue(x: Column, y: Column, bits: Int = ZBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as a DuckDB SQL fragment, generated from the same
    * loop so engine and oracle cannot drift (pattern of `XHash.sqlH60`). */
  private[graft] def zvalueSql(x: String, y: String, bits: Int = ZBits): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  val queries: Seq[GQ] = Seq(
    // Z-order locality audit: bucket lineitem by the top 8 bits of the
    // 20-bit z-value over (l_partkey mod 1024, l_suppkey mod 1024) and
    // emit each bucket's row count + per-dimension min/max envelope. The
    // envelopes are the min/max statistics a parquet writer would put in
    // each file's footer under a z-ordered write — tight on BOTH x and y
    // (a z-bucket is a ≤64×64 rectangle of the 1024×1024 key grid), which
    // is the claim that makes two-column file skipping work. One scan-side
    // projection + one 256-group hash agg; at 100 TB the identical plan
    // audits a table's actual layout before a rewrite decision.
    GQ(
      "q_layout_zorder",
      (s, d) => {
        val x = pmod(col("l_partkey"), lit(1024L))
        val y = pmod(col("l_suppkey"), lit(1024L))
        Tables.t(s, d, "lineitem")
          .select(shiftright(zvalue(x, y), ZShift).as("bucket"),
            x.as("x"), y.as("y"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH b AS (SELECT (l_partkey % 1024) AS x, (l_suppkey % 1024) AS y
              |  FROM lineitem),
              |z AS (SELECT x, y, (${zvalueSql("x", "y")}) AS zv FROM b)
              |SELECT zv >> $ZShift AS bucket, COUNT(*) AS cnt,
              |  MIN(x) AS min_x, MAX(x) AS max_x,
              |  MIN(y) AS min_y, MAX(y) AS max_y
              |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin)
    ),
    // Hilbert-curve locality audit (round 5) — the layout key Delta/Hudi
    // and Amazon Redshift moved to AFTER Z-order, because the Hilbert
    // curve never takes Morton's long diagonal jumps: every curve
    // segment is a CONNECTED region of the key grid, so equal-width
    // hd-ranges (files) get envelopes with strictly better worst-case
    // area than z-ranges. Same audit shape as q_layout_zorder — bucket
    // by the top 8 bits of the 20-bit Hilbert index over
    // (l_partkey mod 1024, l_suppkey mod 1024), emit per-bucket count +
    // min/max envelope per dimension — so the two layouts' file-skipping
    // quality can be compared row for row.
    //
    // The index is the standard iterative xy2d walk (rx/ry quadrant
    // bits, d += s²·((3rx)^ry), conditional flip + swap per level —
    // Hamilton's formulation). Spark and DuckDB both evaluate the SAME
    // 10-level unrolled integer recurrence, GENERATED FROM ONE Scala
    // loop (withHilbert / hilbertSqlCtes — the zvalue/zvalueSql anti-
    // drift pattern, per-level named columns so neither engine inlines
    // the recurrence into an exponential expression tree).
    //
    // Determinism: pure +/−/&/^/shift on non-negative longs (R3/R7-free);
    // ORDER BY the unique bucket (R1).
    //
    // Plan shape (100 TB): scan-side integer projection (10 chained
    // narrow Projects, whole-stage-codegen'd) → one 256-group hash agg.
    // The production write path is repartitionByRange(hd) +
    // sortWithinPartitions, identical to the Z-order writer.
    GQ(
      "q_layout_hilbert",
      (s, d) => {
        val df = Tables.t(s, d, "lineitem")
          .select(pmod(col("l_partkey"), lit(1024L)).as("x"),
            pmod(col("l_suppkey"), lit(1024L)).as("y"))
        withHilbert(df, col("x"), col("y"), ZBits)
          .select(shiftright(col("hd"), ZShift).as("bucket"),
            col("x"), col("y"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH b AS (SELECT (l_partkey % 1024) AS x, (l_suppkey % 1024) AS y,
              |    (l_partkey % 1024) AS hx, (l_suppkey % 1024) AS hy,
              |    CAST(0 AS BIGINT) AS hd
              |  FROM lineitem),
              |${hilbertSqlCtes("b", ZBits)}
              |SELECT hd // ${1L << ZShift} AS bucket, COUNT(*) AS cnt,
              |  MIN(x) AS min_x, MAX(x) AS max_x,
              |  MIN(y) AS min_y, MAX(y) AS max_y
              |FROM h0 GROUP BY bucket ORDER BY bucket""".stripMargin)
    ),
    // Run-length (RLE) compressibility audit (round 5) — the measurement
    // that closes the layout loop: q_layout_zorder/_hilbert choose a sort
    // key, THIS reports what that choice buys per column. Under the
    // table's physical key order (l_orderkey, l_linenumber), each audited
    // column's run count (maximal stretches of equal values) bounds its
    // RLE-encoded size; rows/runs is the mean run length a columnar
    // writer's RLE_DICTIONARY encoder would see. Emits one row per
    // audited column {l_returnflag, l_linestatus, l_quantity}.
    //
    // Runs are counted SHARD-LOCALLY — a run boundary is a row whose
    // value differs from its predecessor WITHIN the same l_orderkey
    // (each order's first row starts a run) — exactly how a columnar
    // format counts them: runs never span row groups, and the order key
    // is the row-group-aligned unit here. This keeps the window
    // partitioned (no global-sort single-partition window, the banned
    // shape) while measuring the same quantity a writer sees.
    //
    // Determinism: boundary flags are exact compares (the doubles in
    // l_quantity compare bit-equal cross-engine — no arithmetic touches
    // them); counts are BIGINTs; mean run length is ONE IEEE division,
    // ROUND(6) (positive, no R8 clause). ORDER BY column name (R1).
    // The window order is (l_linenumber, then the three audited columns):
    // (l_orderkey, l_linenumber) is NOT unique in this data, and an
    // under-specified LAG order lets each engine break ties its own way —
    // appending the compared columns to the sort key makes any two
    // tie-equivalent rows equal IN EVERY COMPARED VALUE, so the flag sums
    // are permutation-invariant (R1 applied to window order, the lesson
    // sf0.01 taught: sf0.001 agreed by luck).
    //
    // Plan shape (100 TB): ONE scan → ONE orderkey-keyed window exchange
    // computing all three lag-flags in a single Window node (one sort,
    // three projections) → a 1-row global agg (map-side partial) →
    // 3-row unpivot. Nothing but the corpus scan and one keyed exchange.
    GQ(
      "q_compress_rle_audit",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("l_orderkey")).orderBy(
          col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"))
        def bnd(c: String) =
          when(lag(col(c), 1).over(w).isNull ||
            col(c) =!= lag(col(c), 1).over(w), 1L).otherwise(0L)
        Tables.t(s, d, "lineitem")
          .select(bnd("l_returnflag").as("rf"), bnd("l_linestatus").as("ls"),
            bnd("l_quantity").as("qt"))
          .agg(count(lit(1)).as("n_rows"), sum(col("rf")).as("rf_runs"),
            sum(col("ls")).as("ls_runs"), sum(col("qt")).as("qt_runs"))
          .selectExpr("n_rows",
            """stack(3, 'l_linestatus', ls_runs, 'l_quantity', qt_runs,
              |  'l_returnflag', rf_runs) AS (column_name, runs)""".stripMargin)
          .select(col("column_name"), col("n_rows"), col("runs"),
            round(col("n_rows").cast(DoubleType) / col("runs").cast(DoubleType),
              6).as("mean_run_len"))
          .orderBy(col("column_name"))
      },
      Some("""WITH f AS (SELECT
             |    CASE WHEN LAG(l_returnflag) OVER w IS NULL
             |      OR l_returnflag <> LAG(l_returnflag) OVER w
             |      THEN 1 ELSE 0 END AS rf,
             |    CASE WHEN LAG(l_linestatus) OVER w IS NULL
             |      OR l_linestatus <> LAG(l_linestatus) OVER w
             |      THEN 1 ELSE 0 END AS ls,
             |    CASE WHEN LAG(l_quantity) OVER w IS NULL
             |      OR l_quantity <> LAG(l_quantity) OVER w
             |      THEN 1 ELSE 0 END AS qt
             |  FROM lineitem
             |  WINDOW w AS (PARTITION BY l_orderkey
             |    ORDER BY l_linenumber, l_returnflag, l_linestatus,
             |      l_quantity)),
             |a AS (SELECT COUNT(*) AS n_rows,
             |    CAST(SUM(rf) AS BIGINT) AS rf_runs,
             |    CAST(SUM(ls) AS BIGINT) AS ls_runs,
             |    CAST(SUM(qt) AS BIGINT) AS qt_runs
             |  FROM f),
             |u AS (SELECT 'l_linestatus' AS column_name, n_rows,
             |      ls_runs AS runs FROM a
             |  UNION ALL SELECT 'l_quantity', n_rows, qt_runs FROM a
             |  UNION ALL SELECT 'l_returnflag', n_rows, rf_runs FROM a)
             |SELECT column_name, n_rows, runs,
             |  ROUND(CAST(n_rows AS DOUBLE) / CAST(runs AS DOUBLE), 6)
             |    AS mean_run_len
             |FROM u ORDER BY column_name""".stripMargin)
    )
  )

  /** Append column `hd` = the Hilbert index of (`x`, `y`) on the
    * 2^bits × 2^bits grid — the iterative xy2d walk, one narrow Project
    * per level (named intermediates keep Catalyst from inlining the
    * recurrence into an exponential tree; CollapseProject leaves complex
    * aliases referenced twice alone). Inputs must be non-negative and
    * < 2^bits. */
  private[graft] def withHilbert(
      df: org.apache.spark.sql.DataFrame, x: Column, y: Column, bits: Int)
      : org.apache.spark.sql.DataFrame = {
    var cur = df.withColumn("hx", x).withColumn("hy", y)
      .withColumn("hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("rx",
          when(col("hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("ry",
          when(col("hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("hd", col("hd") +
          lit(s * s) * (col("rx") * 3).bitwiseXOR(col("ry")))
        .withColumn("nhx",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(s - 1) - col("hy")).otherwise(col("hy")))
            .otherwise(col("hx")))
        .withColumn("nhy",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(s - 1) - col("hx")).otherwise(col("hx")))
            .otherwise(col("hy")))
        .withColumn("hx", col("nhx")).withColumn("hy", col("nhy"))
        .drop("rx", "ry", "nhx", "nhy")
    }
    cur.drop("hx", "hy")
  }

  /** The identical per-level recurrence as chained DuckDB CTEs ending in
    * `h0` (level index counts down with `s`), generated from the same
    * loop bounds as [[withHilbert]] so engine and oracle cannot drift. */
  private[graft] def hilbertSqlCtes(src: String, bits: Int): String =
    ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == bits - 1) src else s"h${i + 1}"
      s"""h${i}a AS (SELECT *,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM $prev),
         |h$i AS (SELECT * EXCLUDE (rx, ry) REPLACE (
         |    hd + ${s * s} * xor(3 * rx, ry) AS hd,
         |    CASE WHEN ry = 0 THEN
         |      (CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END)
         |    ELSE hx END AS hx,
         |    CASE WHEN ry = 0 THEN
         |      (CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END)
         |    ELSE hy END AS hy)
         |  FROM h${i}a)""".stripMargin
    }.mkString(",\n")
}
