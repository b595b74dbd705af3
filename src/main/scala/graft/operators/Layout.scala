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
    )
  )
}
