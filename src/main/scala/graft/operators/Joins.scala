package graft.operators

import graft.{C, GQ, Tables}
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators.
  *
  * The reference's only join-like constructs are the denormalized
  * `playlist_id` key it emits for downstream SQL joins
  * (/root/reference/spotify-etl.py:105) and the remote keyed lookup
  * (:134-173); this family is the full relational-join surface a user of the
  * engine needs over the same data model.
  *
  * Scale posture: small dimensions (region, nation, and customer/part at
  * low SF) broadcast — `q_join_broadcast` forces it, the rest leave strategy
  * choice to Catalyst/AQE, which picks BHJ under the autoBroadcast threshold
  * and SMJ/SHJ (plus runtime skew splitting) above it. Fact-fact joins
  * shuffle on the join key only after filters/projections are pushed below
  * the exchange.
  */
object Joins {

  val queries: Seq[GQ] = Seq(
    GQ(
      "q_join_inner",
      (s, d) =>
        Tables.t(s, d, "orders")
          .join(Tables.t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"), C.sumDec2(col("o_totalprice")).as("sum_price"))
          .orderBy(col("c_mktsegment")),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS cnt, ${C.sqlSumDec2("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),
    GQ(
      "q_join_broadcast",
      (s, d) =>
        Tables.t(s, d, "nation")
          .join(broadcast(Tables.t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_nations"))
          .orderBy(col("r_name")),
      Some("""SELECT r_name, COUNT(*) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)
    ),
    GQ(
      "q_join_left_outer",
      (s, d) =>
        Tables.t(s, d, "customer")
          .join(Tables.t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)
    ),
    GQ(
      "q_join_semi",
      (s, d) =>
        Tables.t(s, d, "customer")
          .join(
            Tables.t(s, d, "orders").filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)
    ),
    GQ(
      "q_join_anti",
      (s, d) =>
        Tables.t(s, d, "customer")
          .join(Tables.t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)
    ),
    // NOT IN anti join (round 5) — the THIRD negation shape beside
    // left_anti/NOT EXISTS: `x NOT IN (subquery)` carries three-valued
    // logic that NOT EXISTS does not — one NULL in the subquery makes
    // every non-matching row UNKNOWN and the result EMPTY, so Spark
    // plans a NULL-AWARE anti join (single-key broadcast hash NAAJ,
    // SPARK-32290) instead of a plain anti join; an engine that rewrites
    // NOT IN to anti-join blindly is WRONG on nullable inputs. Query:
    // parts never shipped in quantity ≥ 48 ("slow movers"). The driver
    // columns carry no NULLs, so the output is non-empty at every SF
    // (21/357/3297 rows); the planted-NULL → empty-result semantics are
    // pinned in PropertySpec where the fixture can plant one.
    //
    // Determinism: pure key set logic, no arithmetic; ORDER BY the
    // unique p_partkey (R1).
    //
    // Plan shape (100 TB): the filtered subquery side (qty ≥ 48
    // pushdown-filtered at the scan) builds one broadcast hash relation
    // with a null flag; the probe is scan-local — no shuffle of either
    // corpus. NAAJ requires the build side to broadcast; a too-big build
    // side is the signal to pre-aggregate it (DISTINCT l_partkey) first,
    // which this query's oracle shape already implies.
    GQ(
      "q_join_not_in",
      (s, d) => {
        Tables.t(s, d, "part").createOrReplaceTempView("graft_part_ni")
        Tables.t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem_ni")
        s.sql("""SELECT p_partkey, p_name FROM graft_part_ni
                |WHERE p_partkey NOT IN (SELECT l_partkey FROM graft_lineitem_ni
                |                        WHERE l_quantity >= 48)
                |ORDER BY p_partkey""".stripMargin)
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
             |                        WHERE l_quantity >= 48)
             |ORDER BY p_partkey""".stripMargin)
    ),
    GQ(
      "q_join_theta",
      (s, d) =>
        Tables.t(s, d, "lineitem")
          .join(
            Tables.t(s, d, "part"),
            col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("p_brand")),
      Some("""SELECT p_brand, COUNT(*) AS cnt
             |FROM lineitem JOIN part
             |  ON l_partkey = p_partkey AND l_quantity > p_size
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    ),
    // As-of join (time-series point-in-time lookup — an operator Spark has
    // no built-in for, composed per SURVEY.md preference (a): for each
    // purchase, the latest click by the same user at-or-before it. Instead
    // of a per-row range probe this is ONE pass: tag both sides, sort within
    // user by (ts, side) — clicks first at equal ts, matching ASOF's `<=` —
    // and carry the last click ts forward with an ignore-nulls running
    // `last`. At 100 TB that is a single shuffle+sort on user_id, the same
    // cost as any windowed query, vs. a quadratic range join. Output ts is
    // epoch-MICROS BIGINT: DuckDB reads the nanos parquet column at µs
    // resolution (its epoch_ns is µs-truncated), and µs also stays inside
    // pandas' float64-exact int range (R4). Null when the user never
    // clicked before; nanos keep full resolution inside the window order.
    GQ(
      "q_join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(
            col("event_id"), col("user_id"), col("ts"),
            (col("event_type") === "click").as("is_click"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_click").desc, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("click_ts",
            last(when(col("is_click"), col("ts")), ignoreNulls = true).over(w))
          .filter(!col("is_click"))
          .select(col("event_id"), col("user_id"),
            expr("click_ts DIV 1000").as("click_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
             |            WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, epoch_us(c.ts) AS click_ts_us
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
             |ORDER BY event_id""".stripMargin)
    ),
    // Null-safe equality join (round 5) — the `<=>` / IS NOT DISTINCT
    // FROM join variant the equi family lacked: under plain `=` a NULL
    // key matches NOTHING (three-valued logic silently drops the whole
    // NULL group from an inner join); under null-safe equality NULL
    // matches NULL exactly once. Every CDC/merge pipeline meets this the
    // first time a nullable business key arrives. The NULL group is
    // synthesized deterministically (NULLIF on the purchase type — the
    // driver events carry no natural NULL keys) on BOTH halves of an
    // even/odd event split, so the NULL⋈NULL row must appear — the
    // fixture pins exactly the row a plain `=` join would lose.
    //
    // Determinism: exact BIGINT counts; ORDER BY the key ASC NULLS FIRST
    // (R1 — spelled out because DuckDB defaults NULLS LAST).
    //
    // Plan shape (100 TB): two scans of the same corpus → two
    // type-bounded aggs (≤ |event types| rows each) → one null-safe
    // hash join over the tiny keyed relations. Spark plans `<=>` as a
    // normal equi-join key (EqualNullSafe is a valid hash key), NOT a
    // nested loop — the reason this variant deserves first-class use.
    GQ(
      "q_join_null_safe",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), nullif(col("event_type"), lit("purchase"))
            .as("k"))
        val a = ev.filter(col("event_id") % 2 === 0)
          .groupBy(col("k").as("ka")).agg(count(lit(1)).as("cnt_even"))
        val b = ev.filter(col("event_id") % 2 === 1)
          .groupBy(col("k").as("kb")).agg(count(lit(1)).as("cnt_odd"))
        a.join(b, col("ka") <=> col("kb"))
          .select(col("ka").as("k"), col("cnt_even"), col("cnt_odd"))
          .orderBy(col("k").asc_nulls_first)
      },
      Some("""WITH ev AS (SELECT event_id,
             |    NULLIF(event_type, 'purchase') AS k FROM events),
             |a AS (SELECT k AS ka, COUNT(*) AS cnt_even FROM ev
             |  WHERE event_id % 2 = 0 GROUP BY 1),
             |b AS (SELECT k AS kb, COUNT(*) AS cnt_odd FROM ev
             |  WHERE event_id % 2 = 1 GROUP BY 1)
             |SELECT a.ka AS k, a.cnt_even, b.cnt_odd
             |FROM a JOIN b ON a.ka IS NOT DISTINCT FROM b.kb
             |ORDER BY k ASC NULLS FIRST""".stripMargin)
    ),
    GQ(
      "q_join_multiway",
      (s, d) =>
        Tables.t(s, d, "region")
          .join(Tables.t(s, d, "nation"), col("r_regionkey") === col("n_regionkey"))
          .join(Tables.t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
          .join(Tables.t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .join(Tables.t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("r_name"))
          .agg(
            count(lit(1)).as("cnt"),
            C.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
          .orderBy(col("r_name")),
      Some(s"""SELECT r_name, COUNT(*) AS cnt, CAST(SUM(${C.sqlRevenue}) AS DOUBLE) AS revenue
              |FROM region
              |JOIN nation ON r_regionkey = n_regionkey
              |JOIN customer ON n_nationkey = c_nationkey
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |GROUP BY r_name ORDER BY r_name""".stripMargin)
    ),
    // Full outer join (round 2): nations without suppliers surface with a
    // null supplier side — the one outer-join flavor the surface lacked.
    // R1: the ORDER BY spells out ASC NULLS FIRST in the oracle (Spark's
    // default; DuckDB defaults to NULLS LAST).
    GQ(
      "q_join_full_outer",
      (s, d) =>
        Tables.t(s, d, "nation")
          .join(Tables.t(s, d, "supplier"),
            col("n_nationkey") === col("s_nationkey"), "full_outer")
          .select(
            col("n_nationkey"), col("n_name"), col("s_suppkey"),
            col("s_name"))
          .orderBy(col("n_nationkey"), col("s_suppkey")),
      Some("""SELECT n_nationkey, n_name, s_suppkey, s_name
             |FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
             |ORDER BY n_nationkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST"""
        .stripMargin)
    ),
    // LATERAL correlated join (round 2): per customer, their top-2 orders by
    // price — the correlated-subquery-in-FROM operator class. Catalyst
    // decorrelates the LATERAL into a ranked window join (no nested loop);
    // DuckDB runs the same ANSI LATERAL form. Unique (price, orderkey)
    // tie-break keeps the LIMIT deterministic (R1).
    GQ(
      "q_join_lateral",
      (s, d) =>
        s.sql(s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
                 |FROM parquet.`$d/customer.parquet` c,
                 |LATERAL (
                 |  SELECT o_orderkey, o_totalprice
                 |  FROM parquet.`$d/orders.parquet` o
                 |  WHERE o.o_custkey = c.c_custkey
                 |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
                 |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin),
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)
    ),
    // MERGE / upsert (the CDC-apply shape: `MERGE INTO base USING changes
    // ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`), composed as a
    // full-outer join + per-column coalesce — the engine-agnostic batch
    // form that a lakehouse MERGE compiles to. The change set here derives
    // deterministically from the base (every 7th key re-prices +10% and
    // flags status 'X'; every 97th key inserts a fresh key above the base
    // range), so the op is self-contained on the driver tables. Money math
    // stays exact: DECIMAL(18,2) × DECIMAL(2,1) is exact in both engines,
    // cast to DOUBLE once on output (R2). Plan at scale: one shuffle of
    // each side on the merge key (changes are typically ≪ base and
    // broadcast; AQE decides here), coalesce is a projection.
    GQ(
      "q_merge_upsert",
      (s, d) => {
        val base = Tables.t(s, d, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("b_status"),
            C.dec2(col("o_totalprice")).as("b_price"))
        val orders = Tables.t(s, d, "orders")
        val updates = orders.filter(pmod(col("o_orderkey"), lit(7L)) === 0)
          .select(col("o_orderkey").as("k"), lit("X").as("c_status"),
            (C.dec2(col("o_totalprice")) * lit(BigDecimal("1.1")).cast("decimal(2,1)"))
              .as("c_price"))
        val inserts = orders.filter(pmod(col("o_orderkey"), lit(97L)) === 0)
          .select((col("o_orderkey") + 10000000L).as("k"), lit("I").as("c_status"),
            C.dec2(col("o_totalprice")).cast("decimal(21,3)").as("c_price"))
        base.join(updates.unionByName(inserts), Seq("k"), "full_outer")
          .select(col("k").as("o_orderkey"),
            coalesce(col("c_status"), col("b_status")).as("status"),
            coalesce(col("c_price"), col("b_price").cast("decimal(21,3)"))
              .cast("double").as("totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS b_status,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS b_price FROM orders),
             |ch AS (
             |  SELECT o_orderkey AS k, 'X' AS c_status,
             |      CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))
             |        AS c_price
             |    FROM orders WHERE o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, 'I',
             |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(21,3))
             |    FROM orders WHERE o_orderkey % 97 = 0)
             |SELECT COALESCE(base.k, ch.k) AS o_orderkey,
             |  COALESCE(ch.c_status, base.b_status) AS status,
             |  CAST(COALESCE(ch.c_price, CAST(base.b_price AS DECIMAL(21,3)))
             |    AS DOUBLE) AS totalprice
             |FROM base FULL OUTER JOIN ch ON base.k = ch.k
             |ORDER BY o_orderkey""".stripMargin)
    ),
    // Declared end-to-end run of Skew.saltedJoin (round 4, the join-side
    // twin of q_agg_skew_salted): fact lineitem joins dim part on
    // (l_partkey, salt) with the part side replicated once per salt value,
    // so a hot part key spreads over 16 reducers instead of one. The shape
    // matters when the dim is too big to BROADCAST but cheap to REPLICATE
    // ×16 — the gap between AQE's two automatic answers (BHJ below the
    // threshold, runtime skew-split for sort-merge above it) where explicit
    // salting is the standard fix. Salting is INVISIBLE to results by
    // construction (deterministic salt from l_orderkey, R3; exact decimal
    // revenue, R2), so the oracle is the plain join + GROUP BY.
    GQ(
      "q_join_skew_salted",
      (s, d) => {
        val li = Tables.t(s, d, "lineitem")
          .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
            C.revenue(col("l_extendedprice"), col("l_discount")).as("rev"))
        val part = Tables.t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))
        Skew.saltedJoin(li, part, "p_partkey", col("l_orderkey"), 16)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("rev")).cast("double").as("revenue"))
          .orderBy(col("p_brand"))
      },
      Some(s"""SELECT p_brand, COUNT(*) AS n_lines,
             |  CAST(SUM(${C.sqlRevenue}) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    ),
    // Blocked fuzzy join / entity resolution (round 4, batch 13) — the
    // record-linkage primitive equality joins can't express: product names
    // within edit distance 4 of each other ("cold anvil" ↔ "old anvil"),
    // the catalog-merge / near-duplicate-entity detector. Standard
    // two-stage shape: a cheap BLOCKING key (last name token = product
    // type) bounds the candidate space, then exact Levenshtein — an
    // integer DP with one universal definition, bit-identical across
    // engines — verifies inside each block.
    //
    // Determinism: edit distance and lengths are exact integers; the
    // p_name < p_name canonicalization kills mirror pairs; order
    // (dist, name_a, name_b) (R1). Spark's levenshtein returns INT —
    // cast to BIGINT to match DuckDB's.
    //
    // Plan shape (100 TB): names DEDUPLICATE first (the distinct
    // dimension is ≪ the fact table — compare once per name pair, not per
    // row pair), then the self-join keys on the block so candidate volume
    // is Σ|block|², never N²; the |len_a − len_b| ≤ 4 band is a cheap
    // residual predicate evaluated before the O(len²) DP (lev ≤ 4 implies
    // the band, so it drops nothing). A hot block (one dominant product
    // type) is the q_join_skew_salted shape: salt the block key or
    // sub-block on a second feature (length band) — noted, not needed at
    // these block sizes.
    GQ(
      "q_join_fuzzy",
      (s, d) => {
        val bl = Tables.t(s, d, "part").select(col("p_name")).distinct()
          .select(col("p_name"),
            expr("element_at(split(p_name, ' '), -1)").as("blk"))
        bl.as("x").join(bl.as("y"),
            col("x.blk") === col("y.blk") &&
              col("x.p_name") < col("y.p_name") &&
              abs(length(col("x.p_name")) - length(col("y.p_name"))) <= 4)
          .select(col("x.p_name").as("name_a"), col("y.p_name").as("name_b"),
            levenshtein(col("x.p_name"), col("y.p_name")).cast("long").as("dist"))
          .filter(col("dist") <= 4)
          .orderBy(col("dist"), col("name_a"), col("name_b"))
      },
      Some("""WITH nm AS (SELECT DISTINCT p_name FROM part),
             |bl AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM nm)
             |SELECT x.p_name AS name_a, y.p_name AS name_b,
             |  levenshtein(x.p_name, y.p_name) AS dist
             |FROM bl x JOIN bl y ON x.blk = y.blk AND x.p_name < y.p_name
             |  AND abs(length(x.p_name) - length(y.p_name)) <= 4
             |WHERE levenshtein(x.p_name, y.p_name) <= 4
             |ORDER BY dist, name_a, name_b""".stripMargin)
    ),
    // Entity resolution end-to-end (round 4): q_join_fuzzy finds the
    // PAIRWISE links; this resolves them into ENTITIES — transitive
    // closure over the fuzzy-match graph ("cold anvil" ↔ "old anvil" ↔
    // "bold anvil" are ONE catalog entry even when the first and last
    // exceed the pairwise distance bound), each cluster named by a
    // canonical id. This is the master-data/record-linkage shape: blocked
    // candidate join → exact verify → connected components → golden
    // record, and it reuses the SAME iterative min-label propagation as
    // q_dedup_components (one shuffle per round, O(1) driver convergence,
    // rounds ≤ component diameter) on a different edge relation — the
    // operator is corpus-agnostic by construction.
    //
    // Determinism: node ids are MIN(p_partkey) per distinct name — exact;
    // the component label is the MIN node id reachable (propagation's
    // fixpoint is order-free); cluster size is an exact count; order
    // (entity_id, p_name) (R1). Only non-singleton clusters emit (a
    // singleton "cluster" is just the name itself — no resolution
    // happened), matching the closure oracle's edge-derived domain.
    //
    // Plan shape (100 TB): identical bounds to q_join_fuzzy for the edge
    // build (names deduplicate first, Σ|block|² candidates); propagation
    // touches only nodes incident to an edge — the resolved minority,
    // never the full catalog; the final name join keys on the node id.
    GQ(
      "q_entity_resolution",
      (s, d) => {
        val nm = Tables.t(s, d, "part")
          .groupBy(col("p_name")).agg(min(col("p_partkey")).as("nid"))
        val bl = nm.select(col("p_name"), col("nid"),
          expr("element_at(split(p_name, ' '), -1)").as("blk"))
        val edges = bl.as("x").join(bl.as("y"),
            col("x.blk") === col("y.blk") &&
              col("x.p_name") < col("y.p_name") &&
              abs(length(col("x.p_name")) - length(col("y.p_name"))) <= 4)
          .filter(levenshtein(col("x.p_name"), col("y.p_name")) <= 4)
          .select(col("x.nid").as("a_id"), col("y.nid").as("b_id"))
        val labels = Dedup.componentLabels(edges) // (doc_id = nid, comp)
        labels
          .withColumn("n_names",
            count(lit(1)).over(Window.partitionBy(col("comp"))))
          .join(nm.withColumnRenamed("nid", "doc_id"), "doc_id")
          .select(col("comp").as("entity_id"), col("p_name"), col("n_names"))
          .orderBy(col("entity_id"), col("p_name"))
      },
      Some("""WITH RECURSIVE
             |nm AS (SELECT p_name, MIN(p_partkey) AS nid
             |  FROM part GROUP BY p_name),
             |bl AS (SELECT p_name, nid,
             |  string_split(p_name, ' ')[-1] AS blk FROM nm),
             |edges AS (SELECT x.nid AS a_id, y.nid AS b_id
             |  FROM bl x JOIN bl y ON x.blk = y.blk AND x.p_name < y.p_name
             |    AND abs(length(x.p_name) - length(y.p_name)) <= 4
             |  WHERE levenshtein(x.p_name, y.p_name) <= 4),
             |sym AS (SELECT a_id AS src, b_id AS dst FROM edges
             |  UNION ALL SELECT b_id, a_id FROM edges),
             |reach(src, dst) AS (
             |  SELECT DISTINCT src, src FROM sym
             |  UNION
             |  SELECT r.src, y.dst FROM reach r JOIN sym y ON r.dst = y.src),
             |comp AS (SELECT src AS nid, MIN(dst) AS entity_id
             |  FROM reach GROUP BY src)
             |SELECT c.entity_id, n.p_name,
             |  CAST(COUNT(*) OVER (PARTITION BY c.entity_id) AS BIGINT)
             |    AS n_names
             |FROM comp c JOIN nm n ON n.nid = c.nid
             |ORDER BY entity_id, p_name""".stripMargin)
    ),
    // Grid-blocked spatial radius join (round 4) — "all pairs of points
    // within distance r", the 2-D range join under geo joins, collision
    // detection, and density-based clustering (DBSCAN's ε-neighborhood
    // query is exactly this). Points are the first two embedding dims;
    // the 20 closest in-radius pairs emit. A naive formulation is the N²
    // cross join; the standard scalable shape snaps each point to an
    // r-sized grid cell so any in-radius pair lies within one cell step in
    // each dimension — candidates are cell-equi-join-bounded, never N².
    //
    // Determinism: the cell id floor(x/0.02) and the distance tree
    // (ax-bx)·(ax-bx)+(ay-by)·(ay-by) are each ONE fixed IEEE expression
    // over float→double-widened inputs — bit-identical cross-engine (R7);
    // the radius and cell literals are the SAME decimal text in both
    // engines (0.02 / 0.0004 — a computed 0.02*0.02 would parse to a
    // DIFFERENT double than the literal 0.0004 and admit boundary rows
    // inconsistently); each pair appears exactly once (the offset between
    // two fixed cells is unique, so the 9-offset probe cannot duplicate);
    // 6-dp display round (R8 via roundz), ties → (a_id, b_id) (R1).
    //
    // Plan shape (100 TB): one scan-side cell projection per side, the
    // probe side exploded ×9 (scan-side, no shuffle), ONE (cx, cy)-keyed
    // equi-join — Σ_cell |cell|·|9-neighborhood| candidates — then the
    // exact filter and TakeOrderedAndProject(20). A hot cell (dense urban
    // cluster at geo scale) is the q_join_skew_salted shape: shrink r or
    // salt the cell key; AQE's skew-join split handles moderate cases.
    GQ(
      "q_join_spatial",
      (s, d) => {
        val pts = Tables.t(s, d, "embeddings")
          .select(col("vec_id"),
            col("embedding").getItem(0).cast(DoubleType).as("x"),
            col("embedding").getItem(1).cast(DoubleType).as("y"))
          .withColumn("cx", floor(col("x") / lit(0.02)).cast(LongType))
          .withColumn("cy", floor(col("y") / lit(0.02)).cast(LongType))
        val offsets = array((for { i <- -1 to 1; j <- -1 to 1 } yield
          struct(lit(i.toLong).as("dx"), lit(j.toLong).as("dy"))): _*)
        val probe = pts
          .select(col("vec_id").as("b_id"), col("x").as("bx"),
            col("y").as("by"), col("cx"), col("cy"))
          .withColumn("o", explode(offsets))
          .select(col("b_id"), col("bx"), col("by"),
            (col("cx") + col("o.dx")).as("pcx"),
            (col("cy") + col("o.dy")).as("pcy"))
        pts.as("a")
          .join(probe,
            col("a.cx") === col("pcx") && col("a.cy") === col("pcy") &&
              col("a.vec_id") < col("b_id"))
          .select(col("a.vec_id").as("a_id"), col("b_id"),
            ((col("a.x") - col("bx")) * (col("a.x") - col("bx")) +
              (col("a.y") - col("by")) * (col("a.y") - col("by"))).as("d2"))
          .filter(col("d2") <= lit(0.0004))
          .select(col("a_id"), col("b_id"),
            graft.functions.vec.roundz(col("d2"), 6).as("dist2"))
          .orderBy(col("dist2"), col("a_id"), col("b_id"))
          .limit(20)
      },
      Some("""WITH p AS (SELECT vec_id,
             |    CAST(embedding[1] AS DOUBLE) AS x,
             |    CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
             |c AS (SELECT vec_id, x, y,
             |    CAST(FLOOR(x / 0.02) AS BIGINT) AS cx,
             |    CAST(FLOOR(y / 0.02) AS BIGINT) AS cy FROM p),
             |pr AS (SELECT vec_id AS b_id, x AS bx, y AS by,
             |    cx + r1.dx AS pcx, cy + r2.dy AS pcy
             |  FROM c, range(-1, 2) r1(dx), range(-1, 2) r2(dy)),
             |j AS (SELECT a.vec_id AS a_id, pr.b_id,
             |    (a.x - pr.bx) * (a.x - pr.bx)
             |      + (a.y - pr.by) * (a.y - pr.by) AS d2
             |  FROM c a JOIN pr ON a.cx = pr.pcx AND a.cy = pr.pcy
             |    AND a.vec_id < pr.b_id)
             |SELECT a_id, b_id, ROUND(d2, 6) + 0.0 AS dist2 FROM j
             |WHERE d2 <= 0.0004
             |ORDER BY dist2, a_id, b_id LIMIT 20""".stripMargin)
    )
  )
}
