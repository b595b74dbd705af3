package graft.operators

import graft.{GQ, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed linear algebra over the embeddings table (round 4) — the
  * analysis family beyond similarity search: what DIRECTION explains the
  * corpus's variance, and which vectors sit at its extremes. The classic
  * use in an LLM data pipeline is embedding-drift / outlier triage (a batch
  * whose top principal direction shifts, or whose extreme projections
  * cluster, signals a scraper change or contamination).
  */
object LinearAlgebra {

  private val Q = 1048576L // 2^20 quantization scale
  private val SDiv = 268435456L // 2^28 projection rescale

  val queries: Seq[GQ] = Seq(
    // Top principal direction via POWER ITERATION (6 rounds), reported as
    // the 10 most extreme vectors along it (|projection| DESC) — the
    // embedding-outlier triage list.
    //
    // Determinism (R7 extended, the q_text_textrank pattern): floats
    // quantize to BIGINT once (floor(x·2^20) — exact: float widens to
    // double losslessly, the product has ≤44 significant bits), then EVERY
    // step is integer math — truncating division (Spark `div` ≡ DuckDB
    // `//`, verified equal on negatives too: both truncate toward zero)
    // and order-independent BIGINT sums. Centering uses the truncated mean
    // (≤1-unit bias, identically on both engines). Per round: s_r =
    // (Σ_j c_rj·v_j) div 2^28 per row, w_j = Σ_r s_r·c_rj, v = w div
    // max(|w| div 2^20, 1); after round 6 the sign normalizes so the
    // first nonzero component is positive (eigenvectors are sign-
    // ambiguous). Overflow budget: |c| ≤ 2^21 centered, |v| ≤ ~2^20 ⇒
    // dot terms ≤ 2^41·64 = 2^47, s ≤ 2^19, w terms ≤ 2^40 ⇒ exact up to
    // N ≈ 4M rows in one partial; beyond that the same sums split into
    // block partials (still exact — BIGINT addition is associative).
    //
    // Plan shape (100 TB): the quantized/centered array persists (one
    // corpus scan); each round is ONE aggregation job over it (64 sums +
    // the scan-side dot product), with only a 64-long vector on the
    // driver — the Lloyd-iteration collect pattern. The final output is a
    // scan-side projection + TakeOrderedAndProject, never a global sort.
    GQ(
      "q_embed_pca",
      (s, d) => {
        val emb = Tables.t(s, d, "embeddings")
        // dimension from the data (bounded 1-row probe), so the same query
        // runs on any embedding width; the oracle derives it per row
        val dim = emb.select(size(col("embedding"))).head.getInt(0)
        val base = graft.Caches.persist(emb.select(col("vec_id"),
          expr(s"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $Q.0D) AS BIGINT))")
            .as("c")))
        // truncated per-dim mean, one (dim+1)-expression agg (count + sums)
        val meanRow = base.agg(
          count(lit(1)).as("n"),
          (0 until dim).map(j =>
            sum(expr(s"element_at(c, ${j + 1})")).as(s"s$j")): _*).head()
        val n = meanRow.getLong(0)
        val m = (0 until dim).map(j => meanRow.getLong(j + 1) / n)
        val mSql = m.mkString("array(", "L, ", "L)")
        val cent = graft.Caches.persist(base.select(col("vec_id"),
          expr(s"zip_with(c, $mSql, (x, y) -> x - y)").as("c")))
        def dot(v: IndexedSeq[Long]): String = {
          val vSql = v.mkString("array(", "L, ", "L)")
          s"aggregate(zip_with(c, $vSql, (x, y) -> x * y), 0L, (a, x) -> a + x) div $SDiv"
        }
        var v: IndexedSeq[Long] = IndexedSeq.fill(dim)(Q)
        for (_ <- 1 to 6) {
          val w = cent.select(expr(dot(v)).as("s"), col("c"))
            .agg(sum(expr("s * element_at(c, 1)")).as("w0"),
              (1 until dim).map(j =>
                sum(expr(s"s * element_at(c, ${j + 1})")).as(s"w$j")): _*)
            .head()
          val ws = (0 until dim).map(w.getLong)
          val dsc = math.max(ws.map(math.abs).max / Q, 1L)
          v = ws.map(_ / dsc)
        }
        val sgn = v.find(_ != 0L) match {
          case Some(x) if x < 0 => -1L
          case _ => 1L
        }
        val vf = v.map(_ * sgn)
        cent.select(col("vec_id"), expr(dot(vf)).as("proj"))
          .orderBy(abs(col("proj")).desc, col("vec_id"))
          .limit(10)
      },
      Some {
        // MATERIALIZED is load-bearing: ce is referenced 13× and each
        // round's w twice — DuckDB's default CTE inlining would recompute
        // the whole upstream chain per reference (×2 per round ⇒ 2^6 the
        // base cost); materializing pins each CTE to one evaluation.
        def round(k: Int): String = {
          val prev = if (k == 1) "v0" else s"v${k - 1}"
          s"""s$k AS MATERIALIZED (SELECT vec_id,
             |    CAST(SUM(cv * v) // $SDiv AS BIGINT) AS s
             |  FROM ce JOIN $prev USING (j) GROUP BY vec_id),
             |w$k AS MATERIALIZED (SELECT j, CAST(SUM(s * cv) AS BIGINT) AS w
             |  FROM ce JOIN s$k USING (vec_id) GROUP BY j),
             |n$k AS (SELECT GREATEST(MAX(ABS(w)) // $Q, 1) AS dsc FROM w$k),
             |v$k AS MATERIALIZED (SELECT j,
             |    CAST(w // (SELECT dsc FROM n$k) AS BIGINT) AS v
             |  FROM w$k)"""
        }
        s"""WITH c0 AS (SELECT vec_id, list_transform(embedding,
           |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * $Q.0) AS BIGINT)) AS c
           |  FROM embeddings),
           |e AS (SELECT vec_id, unnest(c) AS cv,
           |    unnest(range(1, len(c) + 1)) AS j FROM c0),
           |mn AS (SELECT j, CAST(SUM(cv) // (SELECT COUNT(*) FROM c0) AS BIGINT)
           |    AS m FROM e GROUP BY j),
           |ce AS MATERIALIZED (SELECT e.vec_id, e.j, e.cv - mn.m AS cv
           |  FROM e JOIN mn USING (j)),
           |v0 AS (SELECT DISTINCT j, CAST($Q AS BIGINT) AS v FROM e),
           |${(1 to 6).map(round).mkString(",\n")},
           |sg AS (SELECT CASE WHEN (SELECT v FROM v6
           |    WHERE j = (SELECT MIN(j) FROM v6 WHERE v <> 0)) < 0
           |  THEN -1 ELSE 1 END AS sgn),
           |pr AS (SELECT vec_id,
           |    CAST(SUM(cv * v * (SELECT sgn FROM sg)) // $SDiv AS BIGINT) AS proj
           |  FROM ce JOIN v6 USING (j) GROUP BY vec_id)
           |SELECT vec_id, proj FROM pr
           |ORDER BY ABS(proj) DESC, vec_id LIMIT 10""".stripMargin
      }
    ),
    // Embedding-norm QA histogram (round 4, batch 12) — the degenerate-
    // encoder gate: a healthy (normalized) embedding batch concentrates at
    // ‖x‖² ≈ 1; zero vectors (dead encoder), tiny norms (collapsed
    // representations), or a label whose norm mass shifts all surface as
    // off-center histogram buckets. Run per label so one bad shard/class
    // is visible against the rest — the vector-space twin of
    // q_doclen_hist.
    //
    // Determinism: ‖x‖² is a strict LEFT FOLD Σx² in BOTH engines (Spark
    // `aggregate` with 0.0 init vs DuckDB `list_reduce` starting at the
    // first element — identical because +0.0 + y ≡ y bitwise for y ≥ 0),
    // with each float widened to double losslessly BEFORE squaring, so
    // the same IEEE ops run in the same order and the double is
    // bit-identical cross-engine; the centi-bucket floor(‖x‖²·100) is
    // then safe at any boundary. Counts exact; order (label, bucket_c)
    // (R1).
    //
    // Plan shape (100 TB): ONE scan-side projection (the fold is a
    // codegen'd per-row loop, no shuffle) into ONE (label, bucket) hash
    // agg with map-side combine — output bounded by |labels|×|buckets|,
    // never corpus-sized. No joins, no windows.
    GQ(
      "q_embed_norm_stats",
      (s, d) => {
        val norm2 = aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
        Tables.t(s, d, "embeddings")
          .select(col("label"),
            floor(norm2 * lit(100)).cast(LongType).as("bucket_c"))
          .groupBy(col("label"), col("bucket_c"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("bucket_c"))
      },
      Some("""WITH h AS (SELECT label,
             |    CAST(FLOOR(list_reduce(list_transform(
             |      CAST(embedding AS DOUBLE[]), x -> x * x),
             |      (a, b) -> a + b) * 100) AS BIGINT) AS bucket_c
             |  FROM embeddings)
             |SELECT label, bucket_c, COUNT(*) AS n
             |FROM h GROUP BY 1, 2 ORDER BY label, bucket_c""".stripMargin)
    ),
    // Scalar (per-dimension min-max) int8 quantization audit (round 5) —
    // the OTHER standard embedding compressor beside q_sim_ann_pq's
    // product quantization: each dimension linearly maps onto [0, 255]
    // by its corpus min/max, 4× smaller vectors with per-dim codebooks
    // of two floats. Emitted per vector: the exact integer CODE SUM
    // (the reproducibility fingerprint two quantization runs compare)
    // and the saturated-dimension count (codes 0/255 — the clipping
    // audit that tells you the corpus has outlier dims).
    //
    // Determinism: min/max of raw floats are exact; the code is ONE
    // fixed IEEE tree floor((v−mn)·255/(mx−mn)) over exact float→double
    // casts — identical doubles cross-engine, so identical floors at
    // every boundary; constant dims (mx = mn) code to 0 by contract.
    // BIGINT sums are order-free; ORDER BY the unique vec_id (R1).
    //
    // Plan shape (100 TB): explode ×64 → dim-keyed agg whose output is
    // 64 rows (map-side combined) → BROADCAST back onto the exploded
    // corpus → vec-keyed hash agg. Two corpus-order scans, both
    // scan-bound linear; nothing wider than ×dims ever materializes,
    // and the per-dim codebook is model-sized forever.
    GQ(
      "q_embed_quantize",
      (s, d) => {
        val ex = Tables.t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .withColumn("v", col("v").cast(DoubleType))
        val dims = ex.groupBy(col("pos"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        ex.join(broadcast(dims), "pos")
          .withColumn("code",
            when(col("mx") > col("mn"),
              least(greatest(
                floor((col("v") - col("mn")) * 255 / (col("mx") - col("mn")))
                  .cast(LongType), lit(0L)), lit(255L)))
              .otherwise(lit(0L)))
          .groupBy(col("vec_id"), col("label"))
          .agg(sum(col("code")).as("codesum"),
            sum(when(col("code") === 0 || col("code") === 255, 1L)
              .otherwise(0L)).as("n_saturated"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |    generate_subscripts(embedding, 1) AS pos,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings),
             |st AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx
             |  FROM e GROUP BY pos),
             |c AS (SELECT vec_id, label,
             |    CASE WHEN mx > mn THEN LEAST(GREATEST(CAST(FLOOR(
             |      (v - mn) * 255 / (mx - mn)) AS BIGINT), 0), 255)
             |    ELSE 0 END AS code
             |  FROM e JOIN st USING (pos))
             |SELECT vec_id, label, CAST(SUM(code) AS BIGINT) AS codesum,
             |  CAST(SUM(CASE WHEN code IN (0, 255) THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_saturated
             |FROM c GROUP BY 1, 2 ORDER BY vec_id""".stripMargin)
    ),
    // Per-label vector centroid through the TYPED Aggregator API (round
    // 5) — SURVEY §2.7's UDAF exemplar shipped as a declared query: the
    // class-prototype computation every embedding pipeline runs (k-NN
    // class centers, nearest-class-mean classifiers, cluster seeding),
    // expressed as `groupByKey(...).agg(aggregator.toColumn)` over a
    // custom `org.apache.spark.sql.expressions.Aggregator` — the blessed
    // typed-UDAF surface beside the engine's catalyst-level
    // TypedImperativeAggregates (HLL/CMS).
    //
    // Determinism: the aggregator buffers EXACT quantized integers
    // (lane → ⌊x·2^20⌋; the double product is exact — float widens
    // losslessly, 2^20 is a power of two — and floor has no half-case
    // convention to diverge on), so reduce/merge order cannot move the
    // state; qsum_total validates ALL lanes as one order-free BIGINT sum
    // while c0..c3 display the first lanes — each ONE IEEE division
    // (R7), roundz(6) + R8. ORDER BY label (R1).
    //
    // Plan shape (100 TB): ONE corpus scan → label-keyed typed agg with
    // map-side partial merge (the Aggregator contract); output is
    // |labels| rows. The dim count is ONE bounded 1-row driver fetch
    // (the Lloyd pattern) so the same query serves any embedding width.
    GQ(
      "q_embed_centroid",
      (s, d) => {
        import s.implicits._
        val e = Tables.t(s, d, "embeddings")
          .select(col("label"), col("embedding"))
        // bounded driver fetch (1 row): the embedding width. An EMPTY
        // table yields no row (round-6 ADVICE): the width-1 sentinel is
        // output-neutral — zero groups reach the aggregator either way.
        val dims = e.select(size(col("embedding"))).take(1)
          .headOption.map(_.getInt(0)).getOrElse(1)
        val agg = new graft.functions.CentroidAggregator(dims)
        val state = e.as[(Int, Seq[Float])]
          .groupByKey(_._1).mapValues(_._2)
          .agg(agg.toColumn)
          .toDF("label", "state")
        def c(j: Int) = graft.functions.vec.roundz(
          col("state").getItem(j + 1).cast(DoubleType) /
            (col("state").getItem(0).cast(DoubleType) * 1048576.0), 6)
        state.select(col("label"),
            col("state").getItem(0).as("n_vecs"),
            expr(s"aggregate(slice(state, 2, $dims), 0L, (acc, x) -> acc + x)")
              .as("qsum_total"),
            c(0).as("c0"), c(1).as("c1"), c(2).as("c2"), c(3).as("c3"))
          .orderBy(col("label"))
      },
      Some {
        def s(j: Int) =
          s"""CAST(SUM(CAST(FLOOR(CAST(embedding[${j + 1}] AS DOUBLE)
             |      * 1048576.0) AS BIGINT)) AS BIGINT) AS s$j""".stripMargin
        def c(j: Int) =
          s"""(ROUND(CAST(s$j AS DOUBLE)
             |    / (CAST(n AS DOUBLE) * 1048576.0), 6) + 0.0) AS c$j""".stripMargin
        s"""WITH u AS (SELECT label,
           |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576.0)
           |      AS BIGINT) AS qv
           |  FROM embeddings),
           |t AS (SELECT label, CAST(SUM(qv) AS BIGINT) AS qsum_total
           |  FROM u GROUP BY 1),
           |g AS (SELECT label, COUNT(*) AS n,
           |  ${(0 to 3).map(s).mkString(",\n")}
           |  FROM embeddings GROUP BY 1)
           |SELECT g.label, g.n AS n_vecs, t.qsum_total,
           |  ${(0 to 3).map(c).mkString(",\n")}
           |FROM g JOIN t ON t.label = g.label
           |ORDER BY g.label""".stripMargin
      }
    )
  )
}
