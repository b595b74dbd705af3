package graft.operators

import graft.{GQ, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph analytics over the word co-occurrence graph (round 4) — the third
  * graph operator family beside `q_dedup_components` (connectivity) and
  * `q_text_textrank` (centrality). The reference has no graph surface; these
  * generalize its P1/P2 projection class the same way the dedup family does:
  * corpus-derived relations processed with scale-bounded joins.
  */
object GraphOps {

  val queries: Seq[GQ] = Seq(
    // Triangle participation counts (top-10 words) over the word
    // co-occurrence graph — the classic clustering-structure probe (a
    // word's triangles measure how interconnected its context is; on a
    // document/link graph the same query finds tightly-knit communities).
    //
    // Algorithm: DEGREE-ORDERED ORIENTATION (Cohen 2009; the MapReduce
    // standard) — orient each undirected edge from the endpoint with the
    // smaller (degree, word) to the larger, enumerate wedges only between
    // out-neighbors, and close each wedge against the oriented edge list.
    // Every triangle is found exactly once, at its minimum vertex under
    // the total order, and the wedge count is bounded by O(m^1.5) instead
    // of Σ deg² — the difference between a hub word generating deg²
    // wedges and the same hub generating none (all its edges point IN).
    //
    // Determinism: counts of exact set constructions — no FP at all; ties
    // in the top-10 break on word (R1).
    //
    // Plan shape (100 TB): one corpus scan → distinct canonical edge agg;
    // degrees from one edge-keyed agg; orientation is a projection; the
    // wedge self-join and the closing join are both equi-joins keyed on a
    // word — no shuffle carries more than the oriented edge relation
    // (vocab²-bounded, corpus-size-independent).
    GQ(
      "q_graph_triangles",
      (s, d) => {
        val pj = Grams.kgramRows(Tables.t(s, d, "documents"), 2, Seq())
          .select(split(col("item"), " ").as("p"))
          .filter(size(col("p")) === 2 && col("p")(0) =!= col("p")(1))
          .select(least(col("p")(0), col("p")(1)).as("a"),
            greatest(col("p")(0), col("p")(1)).as("b"))
          .distinct()
        val deg = pj.select(col("a").as("word"))
          .union(pj.select(col("b").as("word")))
          .groupBy(col("word")).agg(count(lit(1)).as("deg"))
        val withDeg = pj
          .join(deg.select(col("word").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("word").as("b"), col("deg").as("db")), "b")
          .withColumn("ka", struct(col("da").as("dg"), col("a").as("wd")))
          .withColumn("kb", struct(col("db").as("dg"), col("b").as("wd")))
        // orient: src = smaller (deg, word); total order ⇒ no 2-cycles
        val ord = graft.Caches.persist(withDeg.select(
          when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("src"),
          when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("dst"),
          when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("dstk")))
        val wedges = ord.select(col("src"), col("dst").as("v"), col("dstk").as("vk"))
          .join(ord.select(col("src"), col("dst").as("w"), col("dstk").as("wk")),
            "src")
          .filter(col("vk") < col("wk"))
        val tri = wedges.join(
          ord.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
        tri.select(explode(array(col("src"), col("v"), col("w"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("word"))
          .limit(10)
      },
      Some("""WITH dd AS (SELECT string_split(text, ' ') AS ws FROM documents),
             |pj AS (SELECT unnest(list_transform(range(1, len(ws)),
             |    i -> ws[i] || ' ' || ws[i+1])) AS p FROM dd WHERE len(ws) >= 2),
             |e0 AS (SELECT DISTINCT
             |    least(string_split(p, ' ')[1], string_split(p, ' ')[2]) AS a,
             |    greatest(string_split(p, ' ')[1], string_split(p, ' ')[2]) AS b
             |  FROM pj WHERE string_split(p, ' ')[1] <> string_split(p, ' ')[2]),
             |dg AS (SELECT word, COUNT(*) AS deg FROM (
             |    SELECT a AS word FROM e0 UNION ALL SELECT b AS word FROM e0)
             |  GROUP BY word),
             |wd AS (SELECT e0.a, e0.b, x.deg AS da, y.deg AS db FROM e0
             |  JOIN dg x ON x.word = e0.a JOIN dg y ON y.word = e0.b),
             |ord AS (SELECT
             |    CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
             |    CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst,
             |    CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS ddeg
             |  FROM wd),
             |wedge AS (SELECT x.src, x.dst AS v, x.ddeg AS vdeg,
             |    y.dst AS w, y.ddeg AS wdeg
             |  FROM ord x JOIN ord y ON x.src = y.src
             |  WHERE (x.ddeg, x.dst) < (y.ddeg, y.dst)),
             |tri AS (SELECT wedge.src, wedge.v, wedge.w FROM wedge
             |  JOIN ord z ON z.src = wedge.v AND z.dst = wedge.w)
             |SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
             |  SELECT src AS word FROM tri
             |  UNION ALL SELECT v AS word FROM tri
             |  UNION ALL SELECT w AS word FROM tri)
             |GROUP BY word ORDER BY n_tri DESC, word LIMIT 10""".stripMargin)
    )
  )
}
