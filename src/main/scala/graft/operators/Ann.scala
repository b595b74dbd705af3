package graft.operators

import graft.functions.{vec, VectorCentroid}
import graft.{GQ, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search — the scale path for similarity
  * (`Similarity.q_sim_cosine` is the brute-force baseline).
  *
  * IVF (inverted-file) flavor: a fixed small set of coarse centroids (here
  * the first 16 vectors — at 100 TB these come from a k-means sample), every
  * vector is assigned to its best centroid in one broadcast pass, and a query
  * probes only its own cell. Plan shape at scale: broadcast 16 centroids →
  * one scan to assign (16 cosines/row, no shuffle) → shuffle on cell id →
  * per-cell top-k window. The candidate set per query is |cell| ≈ N/16
  * instead of N, and nothing is ever all-pairs.
  *
  * Cell assignments and neighbor ranks hash on engine-side float math → no
  * cross-engine oracle (rows-only check; output is top-3 per query over 5
  * queries, never empty).
  */
object Ann {

  private val NumCentroids = 16
  private val NumQueries = 5
  private val TopK = 3
  private val NumPlanes = 12

  /** Fixed pseudo-random hyperplanes for sign-LSH (splitmix walk, seed
    * distinct from the MinHash coefficients — deterministic across JVMs);
    * component values uniform in [-1, 1]. */
  private def hyperplanes(s: SparkSession): DataFrame = {
    var x = 0x243f6a8885a308d3L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x; z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27; z
    }
    val planes = (0 until NumPlanes).map { pid =>
      (pid, Array.fill(64)(
        (math.floorMod(next(), 2000001L) - 1000000L).toFloat / 1000000.0f))
    }
    s.createDataFrame(planes).toDF("pid", "plane")
  }

  /** Cell assignment: argmax-cosine centroid per vector. The centroids
    * broadcast (16 rows), so assignment is a single no-shuffle scan doing 16
    * cosines per row — at 100 TB the only exchange in the whole IVF build is
    * the later shuffle on cell id. */
  private def assign(s: SparkSession, d: String): DataFrame = {
    val e = Tables.t(s, d, "embeddings")
    val centroids = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cent"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cid"))
    e.crossJoin(broadcast(centroids))
      .select(
        col("vec_id"), col("embedding"), col("cid"),
        vec.cosine(s, "embedding", "cent").as("c_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  val queries: Seq[GQ] = Seq(
    GQ(
      "q_sim_ann_ivf",
      (s, d) => {
        val assigned = assign(s, d)
        // probe: queries search only their own cell
        val q = assigned.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cid"))
        val cand = assigned
          .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("cid"))
        val wTop = Window.partitionBy(col("query_id"))
          .orderBy(col("n_cos").desc, col("neighbor_id"))
        q.join(cand, "cid")
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(
            col("query_id"), col("neighbor_id"),
            vec.cosine(s, "qe", "ne").as("n_cos"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= TopK)
          .select(
            col("query_id"), col("neighbor_id"),
            round(col("n_cos"), 3).as("cos_sim"), col("rn").cast("bigint").as("rn"))
          .orderBy(col("query_id"), col("rn"))
      },
      None
    ),
    // Random-hyperplane LSH ANN (the "LSH-bucketed variant" beside IVF):
    // 12 fixed pseudo-random hyperplanes give every vector a 12-bit sign
    // bucket in ONE broadcast pass (12 dots/row, no shuffle); queries
    // multi-probe — exact bucket for precision plus the 4-bit prefix cell
    // for a recall floor. Same plan spine as IVF — broadcast planes →
    // scan-side bucketing → shuffle on bucket → per-bucket top-k — with
    // buckets that need no training. Deterministic: planes derive from a
    // fixed splitmix walk. Engine-side hashing ⇒ no oracle.
    GQ(
      "q_sim_ann_lsh",
      (s, d) => {
        val planes = hyperplanes(s)
        val e = Tables.t(s, d, "embeddings")
        val bucketed = e.crossJoin(broadcast(planes))
          .select(col("vec_id"), col("embedding"), col("pid"),
            vec.cosine(s, "embedding", "plane").as("proj"))
          .groupBy(col("vec_id"), col("embedding"))
          .agg(sum(expr(
            "IF(proj > 0, shiftleft(CAST(1 AS BIGINT), pid), CAST(0 AS BIGINT))"))
            .as("bucket"))
          // multi-resolution probe: the exact 12-bit bucket gives precision;
          // the 4-bit prefix (16 coarse cells, IVF-like density ~N/16) is
          // the recall floor that keeps the rows-only non-empty contract
          // from riding on any particular bucket being shared
          .withColumn("prefix", col("bucket").bitwiseAND(lit(15L)))
        val q = bucketed.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
            col("bucket"), col("prefix"))
        val cand = bucketed
          .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
            col("bucket"), col("prefix"))
        val wTop = Window.partitionBy(col("query_id"))
          .orderBy(col("n_cos").desc, col("neighbor_id"))
        val fine = q.join(cand.drop("prefix"), "bucket")
          .select(col("query_id"), col("qe"), col("neighbor_id"), col("ne"))
        val coarse = q.join(cand.drop("bucket"), "prefix")
          .select(col("query_id"), col("qe"), col("neighbor_id"), col("ne"))
        fine.union(coarse).distinct()
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            vec.cosine(s, "qe", "ne").as("n_cos"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= TopK)
          .select(
            col("query_id"), col("neighbor_id"),
            round(col("n_cos"), 3).as("cos_sim"), col("rn").cast("bigint").as("rn"))
          .orderBy(col("query_id"), col("rn"))
      },
      None
    ),
    // IVF cell statistics via the custom typed UDAF: per-cell vector count
    // and the exact-math centroid (graft.functions.VectorCentroid — the
    // k-means refinement aggregation). The centroid accumulates quantized
    // longs, so the emitted norm is bit-stable regardless of partitioning /
    // merge order — a double-summing UDAF here would be nondeterministic.
    GQ(
      "q_sim_ann_centroids",
      (s, d) => {
        val centroidOf = udaf(new VectorCentroid(64))
        assign(s, d)
          .groupBy(col("cid"))
          .agg(
            count(lit(1)).as("n_vecs"),
            centroidOf(col("embedding")).as("centroid"))
          .select(
            col("cid"), col("n_vecs"),
            round(sqrt(aggregate(col("centroid"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double"))), 3)
              .as("centroid_norm"))
          .orderBy(col("cid"))
      },
      None
    )
  )
}
