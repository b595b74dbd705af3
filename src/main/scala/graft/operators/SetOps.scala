package graft.operators

import graft.{GQ, Tables}
import org.apache.spark.sql.functions._

/** Set operators + global sort/limit.
  *
  * `q_union_distinct` is the direct descendant of the reference's only set
  * operation: the union-distinct of playlist-track ids and saved-track ids,
  * done explicitly to avoid duplicate downstream fetches
  * (/root/reference/spotify-etl.py:247-250).
  *
  * Scale posture: union is partition-concatenation (no shuffle); the
  * `.distinct()` / `intersect` / `except` dedup is one hash shuffle on the
  * key. `q_sort_limit` compiles to `TakeOrderedAndProject` — per-partition
  * top-k then a k-row driver merge, never a global sort of 100 TB.
  */
object SetOps {

  val queries: Seq[GQ] = Seq(
    GQ(
      "q_union_distinct",
      (s, d) =>
        Tables.t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .union(Tables.t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)
    ),
    GQ(
      "q_intersect",
      (s, d) =>
        Tables.t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(Tables.t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)
    ),
    GQ(
      "q_except",
      (s, d) =>
        Tables.t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .except(Tables.t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)
    ),
    // Bag-semantics set difference (round 2): EXCEPT ALL keeps surviving
    // multiplicities (a nationkey held by 40 customers and 2 suppliers
    // survives 38 times) — the multiset twin of q_except, a distinct
    // physical operator (count-propagating aggregate, not dedup).
    GQ(
      "q_except_all",
      (s, d) =>
        Tables.t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .exceptAll(Tables.t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .groupBy(col("nationkey"))
          .agg(count(lit(1)).as("survivors"))
          .orderBy(col("nationkey")),
      Some("""SELECT nationkey, COUNT(*) AS survivors FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  EXCEPT ALL
             |  SELECT s_nationkey AS nationkey FROM supplier)
             |GROUP BY nationkey ORDER BY nationkey""".stripMargin)
    ),
    // Bag-semantics intersection (round 5): INTERSECT ALL keeps
    // min(multiplicity) per key (a nationkey held by 40 customers and 2
    // suppliers intersects 2 times) — completes the set-ops family's
    // multiset column next to q_except_all; like EXCEPT ALL it is a
    // count-propagating aggregate, not a dedup, and the min-of-counts
    // semantics cannot be composed from the distinct variants.
    GQ(
      "q_intersect_all",
      (s, d) =>
        Tables.t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .intersectAll(
            Tables.t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .groupBy(col("nationkey"))
          .agg(count(lit(1)).as("matched"))
          .orderBy(col("nationkey")),
      Some("""SELECT nationkey, COUNT(*) AS matched FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  INTERSECT ALL
             |  SELECT s_nationkey AS nationkey FROM supplier)
             |GROUP BY nationkey ORDER BY nationkey""".stripMargin)
    ),
    GQ(
      "q_sort_limit",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(10),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 10""".stripMargin)
    )
  )
}
