package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Registry, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 targeted stress probes, complementing [[ScaleStress]] (whose 10×
  * replication duplicates every document verbatim — a corpus whose TRUE
  * near-dup pair count grows quadratically, so it measures output growth,
  * not candidate-generation growth).
  *
  * JaccardBlockStress isolates what the round-1 verdict asked to prove:
  * candidate volume vs BLOCK SIZE. Each replica copy suffixes every word
  * with its copy index, so (lang, source) blocks grow ×k while cross-copy
  * similarity is zero and the ≥ Tau output grows only linearly (the base
  * pairs, once per copy). A quadratic candidate generator (the old per-block
  * all-pairs) scales t ∝ k²; the prefix-filter join should stay near-linear.
  *
  * IntervalSkewStress builds the thundering-herd hour the verdict flagged
  * for q_join_interval: every user gets a session inside ONE hour bucket,
  * so that bucket's equi-join candidate volume is C(users, 2) — the
  * worst-case key skew for the bucketed interval join. AQE's skew-join
  * splitting is expected to spread the hot bucket; the probe measures
  * whether it does (if not, Skew.saltedJoin is the tool to wire in).
  */
object JaccardBlockStress {
  def main(args: Array[String]): Unit = {
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 4, 8)
    val spark = Stress2.session()
    for (k <- copiesList) {
      val dst = Stress2.variedVocabDocsDir(spark, k)
      for (q <- Seq("q_dedup_jaccard_words", "q_dedup_jaccard_ngram")) {
        Registry.byName(q).run(spark, dst).count() // warm
        spark.catalog.clearCache() // drop per-plan persists between runs
        graft.Caches.release(spark) // drain the tracked-persist registry too
        val t0 = System.nanoTime()
        val rows = Registry.byName(q).run(spark, dst).count()
        println(f"[jacblock] x$k $q%-24s rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.catalog.clearCache()
        graft.Caches.release(spark) // drain the tracked-persist registry too
      }
    }
    spark.stop()
  }
}

object IntervalSkewStress {
  def main(args: Array[String]): Unit = {
    val spark = Stress2.session()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dst = "/tmp/graft_intervalskew"
    val marker = Paths.get(dst, "_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(dst))
      val base = Tables.events(spark, "/root/testdata/sf0.1")
      val maxId = base.agg(max("event_id")).head.getLong(0) + 1
      val hotHourNs = 1704067200L * 1000000000L // one fixed hour bucket
      // two events per user inside the SAME hour -> a >=2-event session for
      // every user overlapping one bucket (offsets keep user events distinct)
      val users = base.select(col("user_id")).distinct()
      val hot = users
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("user_id"))))
        .select(
          (col("r") + lit(maxId)).as("event_id"),
          (lit(hotHourNs) + col("user_id") % 1000 * 1000000L).as("ts"),
          col("user_id"),
          lit("view").as("event_type"),
          lit(1.0).as("value"),
          lit("""{"k": 1}""").as("props"))
      val hot2 = hot
        .withColumn("event_id", col("event_id") + lit(maxId))
        .withColumn("ts", col("ts") + lit(60L * 1000000000L))
      base.unionByName(hot).unionByName(hot2)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
      Files.createFile(marker)
      val n = users.count()
      println(s"[intervalskew] hot bucket holds ~$n concurrent sessions" +
        s" (~${n * (n - 1) / 2} candidate pairs)")
    }
    Registry.byName("q_join_interval").run(spark, dst).count() // warm
    val t0 = System.nanoTime()
    val rows = Registry.byName("q_join_interval").run(spark, dst).count()
    println(f"[intervalskew] q_join_interval rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

/** Round-3 probe: q_sessionize under credible user skew. The per-user
  * window (partition by user_id, sort by ts) makes one hot user one
  * sequential task — hash partitioning cannot split it and AQE does not
  * re-plan window skew. The probe gives ONE power user 1% (then 10%) of all
  * events in a single 30-min-gap-free chain (every event 1 min apart — the
  * worst case: one unbroken session whose running-sum window walks the
  * whole chain) and times q_sessionize against the unskewed base. Verdict
  * bar: near-linear time at the 1% point. If the 10% point bends the curve,
  * the 100 TB mitigation is a two-phase sessionize (pre-session within
  * (user, coarse time bucket), then merge bucket-boundary sessions) — wired
  * only if this probe shows the need.
  */
object SessionSkewStress {
  def main(args: Array[String]): Unit = {
    val spark = Stress2.session()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def timed(tag: String, dir: String): Double = {
      Registry.byName("q_sessionize").run(spark, dir).count() // warm
      val t0 = System.nanoTime()
      val rows = Registry.byName("q_sessionize").run(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[sessionskew] $tag%-8s rows=$rows $t%.2fs")
      t
    }
    val tBase = timed("base", "/root/testdata/sf0.1")
    for (pct <- Seq(1, 10)) {
      val t = timed(s"hot$pct%", Stress2.hotEventsDir(spark, pct))
      println(f"[sessionskew] hot$pct%% vs base: ${t / tBase}%.2fx time for ${1 + pct / 100.0}%.2fx events")
    }
    spark.stop()
  }
}

/** Round-3 probe for the VERDICT-1 fix: candidate volume of the banded
  * (r=4, b=4) minhash-pair rule vs the retired r=1 positional rule, on a
  * COMMON-VOCABULARY corpus where low-similarity pairs abound.
  *
  * Corpus: k copies of sf0.1 documents; copy i rewrites ~1/3 of each doc's
  * words (deterministic per (word, position, copy) hash) to copy-tagged
  * variants. Cross-copy twins then share the base vocabulary but only
  * ~(2/3)^6 ≈ 9% of shingles ⇒ pairwise J ≈ 0.05 — exactly the
  * uninformative tail the round-2 r=1 rule admitted with p ≈ 1−(1−j)^16 ≈
  * 0.56 and the banded rule admits with p ≈ 1−(1−j⁴)⁴ ≈ 2.5e-5.
  *
  * Measured quantity: Σ_buckets C(n,2) per rule — the exact self-join
  * output volume (what the executor pays), computed from bucket histograms
  * without materializing the joins. A bounded candidate generator keeps
  * band volume near-linear in k while the r=1 volume grows ~k².
  */
object MinhashBandStress {
  def main(args: Array[String]): Unit = {
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4)
    val spark = Stress2.session()
    import graft.operators.Dedup
    for (k <- copiesList) {
      val dst = Stress2.variedDocs(spark, k)
      val sigs = Dedup.minhashSignatures(spark, dst)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairVolume = (sum(col("n") * (col("n") - 1)) / 2).cast("long")
      val t0 = System.nanoTime()
      val bandVol = Dedup.bandRows(sigs)
        .groupBy(col("bpos"), col("bkey")).agg(count(lit(1)).as("n"))
        .agg(pairVolume).head.getLong(0)
      val tBand = (System.nanoTime() - t0) / 1e9
      val sigCols = (0 until Dedup.K).map(j => col(s"sig$j"))
      val r1Vol = sigs.select(
        posexplode(array(sigCols: _*)).as(Seq("j", "v")))
        .groupBy(col("j"), col("v")).agg(count(lit(1)).as("n"))
        .agg(pairVolume).head.getLong(0)
      println(f"[minhashband] x$k band_candidates=$bandVol%-10d " +
        f"r1_candidates=$r1Vol%-12d ratio=${r1Vol.toDouble / math.max(bandVol, 1)}%.0fx " +
        f"band_time=$tBand%.2fs")
      sigs.unpersist()
      spark.catalog.clearCache()
      graft.Caches.release(spark) // drain the tracked-persist registry too
    }
    spark.stop()
  }
}

/** Round-4 probe (verdict items 2 + 5): q_dedup_components' round count and
  * cost growth.
  *
  * (a) PLANTED CHAINS, driving `componentLabels` directly: a path graph is
  * the adversarial shape for min-label propagation — star-shaped near-dup
  * clusters converge in 2 rounds at any size, but a depth-d chain needs ~d
  * rounds without pointer jumping vs ~log2(d)+2 with it (the label has to
  * travel the whole path). 64k vertices split into chains of depth
  * 8/32/128; `ccDebug` prints the per-round ticks so the round count is in
  * the output, and a 128-deep chain finishing well under the 50-round cap
  * is the direct evidence the jump works.
  *
  * (b) ×k CORPUS GROWTH on the MinhashBandStress varied-vocabulary corpora
  * (cross-copy J ≈ 0.05, so TRUE components stay per-copy and output rows
  * grow ×k): end-to-end q_dedup_components time at ×1/×2/×4/×8 — the
  * unmeasured quantity the round-3 verdict flagged (candidate volume was
  * already covered; this adds rounds × per-round cost as the graph grows).
  */
object ComponentChainStress {
  def main(args: Array[String]): Unit = {
    val spark = Stress2.session()
    import graft.operators.Dedup
    for (d <- Seq(8, 32, 128)) {
      val nV = 65536L
      // break the 0..nV id line into chains of d vertices: drop every edge
      // leaving a vertex whose id ≡ d-1 (mod d)
      val edges = spark.range(nV)
        .filter(pmod(col("id"), lit(d)) =!= lit(d - 1))
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      Dedup.ccDebug = true
      val t0 = System.nanoTime()
      val comps = Dedup.componentLabels(edges)
        .groupBy(col("comp")).agg(count(lit(1))).count()
      val t = (System.nanoTime() - t0) / 1e9
      Dedup.ccDebug = false
      println(f"[ccchain] depth=$d%-4d components=$comps%-6d $t%.2fs" +
        f" (expect ${nV / d} components, ~${(math.log(d) / math.log(2)).ceil.toInt + 2} rounds)")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
    }
    for (k <- Seq(1, 2, 4, 8)) {
      val dst = Stress2.variedDocs(spark, k)
      Registry.byName("q_dedup_components").run(spark, dst).count() // warm
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      val t0 = System.nanoTime()
      val rows = Registry.byName("q_dedup_components").run(spark, dst).count()
      println(f"[ccchain] x$k components rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
    }
    spark.stop()
  }
}

/** Round-5 probe (verdict item 1): q_graph_linkpred's wedge volume and time
  * growth after the bigram-node rescale.
  *
  * The query's cost driver is the wedge relation — Σ deg² over capped
  * midpoints of the bigram adjacency. Node degree is STRUCTURALLY bounded
  * by 2·|distinct bigrams sharing a word| (a bigram "x y" only neighbors
  * "y ·" and "· x"), so wedge volume is model-sized and corpus-size-
  * independent; the probe measures it directly on the variedDocs corpora
  * (copy-tagged vocabulary ⇒ the MODEL grows with k too — the worst case
  * for this query; a same-vocab corpus growth leaves the wedge volume
  * flat). Law: time tracks wedge volume, not corpus size, and max degree
  * stays far under the 1024 hub cap.
  */
object LinkpredWedgeStress {
  def main(args: Array[String]): Unit = {
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4)
    val spark = Stress2.session()
    for (k <- copiesList) {
      val dst = Stress2.variedDocs(spark, k)
      // adjacency degree histogram — same construction as the query
      val tg = graft.operators.Grams
        .kgramRows(Tables.t(spark, dst, "documents"), 3, Seq())
        .select(split(col("item"), " ").as("p"))
        .filter(size(col("p")) === 3)
        .select(concat_ws(" ", col("p")(0), col("p")(1)).as("g1"),
          concat_ws(" ", col("p")(1), col("p")(2)).as("g2"))
        .filter(col("g1") =!= col("g2"))
      val pj = tg
        .select(least(col("g1"), col("g2")).as("a"),
          greatest(col("g1"), col("g2")).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2).select(col("a"), col("b"))
      val deg = pj.select(col("a").as("m")).union(pj.select(col("b").as("m")))
        .groupBy(col("m")).agg(count(lit(1)).as("deg"))
      val st = deg.agg(
        count(lit(1)).as("nodes"), max(col("deg")).as("maxdeg"),
        sum(when(col("deg") <= 1024, col("deg") * col("deg"))
          .otherwise(lit(0))).as("wedges")).head
      Registry.byName("q_graph_linkpred").run(spark, dst).count() // warm
      spark.catalog.clearCache(); graft.Caches.release(spark)
      val t0 = System.nanoTime()
      val rows = Registry.byName("q_graph_linkpred").run(spark, dst).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[linkpred] x$k nodes=${st.getLong(0)}%-6d maxdeg=${st.getLong(1)}%-5d " +
        f"wedges=${st.getLong(2)}%-10d rows=$rows $t%.2fs")
      assert(rows > 0, s"x$k linkpred output must be non-empty")
      spark.catalog.clearCache(); graft.Caches.release(spark)
    }
    spark.stop()
  }
}

/** Journey-string skew: q_events_pattern's per-user state is one string
  * proportional to activity — the CEP buffer problem. Reuses
  * SessionSkewStress's hot-user corpora (one synthetic user owning 1% then
  * 10% of all events): the probe measures whether one 10k-event journey
  * (collect + sort + regex on a ~10k-char string in a single task)
  * stretches the stage, and prints the hot user's journey length as the
  * state-size witness. Expected: near-flat — one long string is cheap; the
  * failure mode this guards is accidental quadratic reassembly (e.g. a
  * per-event window re-concatenation).
  */
object PatternSkewStress {
  def main(args: Array[String]): Unit = {
    val spark = Stress2.session()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def timed(tag: String, dir: String): Double = {
      Registry.byName("q_events_pattern").run(spark, dir).count() // warm
      val t0 = System.nanoTime()
      val out = Registry.byName("q_events_pattern").run(spark, dir)
      val rows = out.count()
      val t = (System.nanoTime() - t0) / 1e9
      val maxLen = out.agg(max(length(col("journey")))).head.getInt(0)
      println(f"[patternskew] $tag%-8s rows=$rows maxJourney=$maxLen $t%.2fs")
      t
    }
    val tBase = timed("base", "/root/testdata/sf0.1")
    for (pct <- Seq(1, 10)) {
      val t = timed(s"hot$pct%", Stress2.hotEventsDir(spark, pct))
      println(f"[patternskew] hot$pct%% vs base: ${t / tBase}%.2fx time")
    }
    spark.stop()
  }
}

/** Served-dedup classification scale probe (round 9, VERDICT item 6):
  * q_dedup_served is excluded from the ×100 replica tier by the
  * verbatim-replica caveat (near-dup verify volume is quadratic on
  * replicated text — output physics), so its honest algorithmic curve
  * comes from a VARIED-VOCAB ×k corpus (the JaccardBlockStress trick:
  * every copy's words carry the copy index, so blocks grow ×k with zero
  * cross-copy similarity and the served classification's candidate/verify
  * volume must grow linearly). At each k the probe splits the corpus by
  * the q_dedup_served convention, writes BOTH dedup indexes (timed), then
  * times the storage-served classification min-of-2.
  */
object DedupServedStress {
  def main(args: Array[String]): Unit = {
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 4, 8)
    val spark = Stress2.session()
    for (k <- copiesList) {
      val dir = Stress2.variedVocabDocsDir(spark, k)
      val docs = Tables.t(spark, dir, "documents").filter(col("doc_id") >= 4)
      val idx = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L)
        .select(col("doc_id"), col("text"))
      val batch = docs.filter(pmod(col("doc_id"), lit(10L)) === 0L)
        .select(col("doc_id"), col("text"))
      val tw0 = System.nanoTime()
      graft.sources.IndexLifecycle.writeDedupIndex(spark, idx, s"sds_idx_$k", 8)
      graft.sources.IndexLifecycle.writeDedupIndex(spark, batch, s"sds_new_$k", 8)
      val writeSec = (System.nanoTime() - tw0) / 1e9
      def once(): Long = graft.operators.Dedup
        .servedClassification(spark, s"sds_idx_$k", s"sds_new_$k").count()
      val rows = once() // warm
      val t1 = System.nanoTime(); once()
      val s1 = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime(); once()
      val s2 = (System.nanoTime() - t2) / 1e9
      println(f"""{"probe":"dedup_served","copies":$k,"batch_rows":$rows,""" +
        f""""write_sec":$writeSec%.2f,"serve_sec":${math.min(s1, s2)}%.2f}""")
      spark.catalog.clearCache()
      graft.Caches.release(spark)

      // the MAINTAIN round (round 9, q_dedup_upsert's curve), under the
      // declared query's own splits (idx ∌ batch — the q_dedup_served idx
      // above CONTAINS the %10=5 docs, which would make every batch-2 doc
      // dup_exact and the delta empty). Band/digest rows are per-doc
      // functions of text, so the idxU and b2 generations are doc_id
      // FILTERS of the sds_idx artifacts already written above, re-
      // bucketed — no extra raw-corpus shingle passes (review: the first
      // cut re-derived both from raw, ~doubling untimed setup).
      val m10 = pmod(col("doc_id"), lit(10L))
      def filteredGen(pred: org.apache.spark.sql.Column, out: String): Unit = {
        graft.sources.Warehouse.writeBucketedKeys(
          spark.table(s"sds_idx_${k}_bands").filter(pred),
          s"${out}_bands", 8, "bpos", "bkey")
        graft.sources.Warehouse.writeBucketedKeys(
          spark.table(s"sds_idx_${k}_digests").filter(pred),
          s"${out}_digests", 8, "h", "text")
      }
      filteredGen(m10 =!= 0L && m10 =!= 5L, s"sds_idxu_$k")
      filteredGen(m10 === 5L, s"sds_b2_$k")
      val cls2 = graft.operators.Dedup
        .servedClassification(spark, Seq(s"sds_idxu_$k"), s"sds_b2_$k")
      // MATERIALIZE the accepted ids before the timer starts (review: the
      // lazy cls2 frame would otherwise charge the whole batch-2
      // classification — an index-sized shingle aggregation — to
      // "upsert_sec", which claims to measure only the delta fold)
      val accepted = cls2.filter(col("status") === "new")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      val acceptedDf = {
        import spark.implicits._
        accepted.toDF("doc_id")
      }
      val tu0 = System.nanoTime()
      graft.sources.IndexLifecycle.upsertDedupIndex(spark, s"sds_b2_$k",
        acceptedDf, s"sds_d1_$k", 8)
      val upsertSec = (System.nanoTime() - tu0) / 1e9
      def onceUp(): Long = graft.operators.Dedup
        .servedClassification(spark, Seq(s"sds_idxu_$k", s"sds_d1_$k"),
          s"sds_new_$k").count()
      onceUp() // warm
      val tu1 = System.nanoTime(); onceUp()
      val u1 = (System.nanoTime() - tu1) / 1e9
      val tu2 = System.nanoTime(); onceUp()
      val u2 = (System.nanoTime() - tu2) / 1e9
      println(f"""{"probe":"dedup_upsert","copies":$k,""" +
        f""""upsert_sec":$upsertSec%.2f,""" +
        f""""serve2gen_sec":${math.min(u1, u2)}%.2f}""")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
    }
    spark.stop()
  }
}

/** Generation-DEPTH probe (round 10, VERDICT item 5): serving pays one
  * bucketed scan per live delta generation — DedupServedStress measures
  * only the 2-generation point. This measures the degradation CURVE at
  * 1/2/4/8 live deltas over the same varied-vocab 8× corpus, then the
  * compaction payoff: compactDedupIndex fold time and the post-compaction
  * single-generation serve time. All generations are doc_id FILTERS of
  * one full-corpus artifact write (band/digest rows are per-doc functions
  * of text), so setup pays one shingle pass total.
  *
  * Usage: runMain graft.tools.GenerationDepthStress [copies]
  */
object GenerationDepthStress {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val spark = Stress2.session()
    val dir = Stress2.variedVocabDocsDir(spark, k)
    val docs = Tables.t(spark, dir, "documents").filter(col("doc_id") >= 4)
    graft.sources.IndexLifecycle.writeDedupIndex(
      spark, docs.select(col("doc_id"), col("text")), s"gd_all_$k", 8)
    val m16 = pmod(col("doc_id"), lit(16L))
    def filteredGen(pred: org.apache.spark.sql.Column, out: String): Unit = {
      graft.sources.Warehouse.writeBucketedKeys(
        spark.table(s"gd_all_${k}_bands").filter(pred),
        s"${out}_bands", 8, "bpos", "bkey")
      graft.sources.Warehouse.writeBucketedKeys(
        spark.table(s"gd_all_${k}_digests").filter(pred),
        s"${out}_digests", 8, "h", "text")
    }
    // main = ~7/16 of the corpus, 8 equal deltas, 1/16 probe batch
    filteredGen(m16 >= 8L && m16 <= 14L, s"gd_main_$k")
    (0 until 8).foreach(i => filteredGen(m16 === i.toLong, s"gd_d${i}_$k"))
    filteredGen(m16 === 15L, s"gd_batch_$k")
    def serveOver(prefixes: Seq[String]): Double = {
      def once(): Long = graft.operators.Dedup
        .servedClassification(spark, prefixes, s"gd_batch_$k").count()
      once() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      ts.min
    }
    for (g <- Seq(1, 2, 4, 8)) {
      val gens = s"gd_main_$k" +: (0 until g).map(i => s"gd_d${i}_$k")
      val s = serveOver(gens)
      println(f"""{"probe":"gen_depth","copies":$k,"generations":${g + 1},""" +
        f""""serve_sec":$s%.2f}""")
    }
    val allGens = s"gd_main_$k" +: (0 until 8).map(i => s"gd_d${i}_$k")
    val tc0 = System.nanoTime()
    graft.sources.IndexLifecycle.compactDedupIndex(
      spark, allGens, s"gd_comp_$k", 8)
    val compactSec = (System.nanoTime() - tc0) / 1e9
    val sComp = serveOver(Seq(s"gd_comp_$k"))
    println(f"""{"probe":"gen_compact","copies":$k,"compact_sec":$compactSec%.2f,""" +
      f""""serve_post_sec":$sComp%.2f}""")
    spark.stop()
  }
}

private object Stress2 {
  def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The varied-vocab ×k documents corpus shared by JaccardBlockStress and
    * DedupServedStress: every copy's words carry the copy index, so
    * (lang, source) blocks grow ×k with ZERO cross-copy similarity — the
    * algorithmic-curve corpus for near-dup machinery (verbatim replicas
    * measure output growth instead). */
  def variedVocabDocsDir(spark: SparkSession, k: Int): String = {
    val dst = s"/tmp/graft_jacblock_x$k"
    val marker = Paths.get(dst, "_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(dst))
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val maxId = base.agg(max("doc_id")).head.getLong(0) + 1
      (0 until k).map { i =>
        base
          .withColumn("doc_id", col("doc_id") + lit(i * maxId))
          // copy-distinct vocabulary: every word tagged with its copy id,
          // so blocks grow ×k with zero cross-copy item overlap
          .withColumn("text",
            array_join(transform(split(col("text"), " "),
              w => concat(w, lit(s"_$i"))), " "))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")
      Files.createFile(marker)
    }
    dst
  }

  /** The hot-user events corpus shared by SessionSkewStress and
    * PatternSkewStress: the sf0.1 events plus ONE synthetic user owning
    * `pct`% as many events again (minute-spaced views), the worst-case
    * per-user state for sessionize/journey operators. */
  def hotEventsDir(spark: SparkSession, pct: Int): String = {
    val dst = s"/tmp/graft_sessionskew_p$pct"
    val marker = Paths.get(dst, "_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(dst))
      val base = Tables.events(spark, "/root/testdata/sf0.1")
      val nBase = base.count()
      val maxId = base.agg(max("event_id")).head.getLong(0) + 1
      val n = nBase * pct / 100
      val startNs = 1704067200L * 1000000000L
      val hot = spark.range(n).select(
        (col("id") + lit(maxId)).as("event_id"),
        (lit(startNs) + col("id") * lit(60L * 1000000000L)).as("ts"),
        lit(100000000L).as("user_id"),
        lit("view").as("event_type"),
        lit(1.0).as("value"),
        lit("""{"k": 1}""").as("props"))
      base.unionByName(hot)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
      Files.createFile(marker)
    }
    dst
  }

  /** The varied-vocabulary ×k documents corpus shared by MinhashBandStress
    * and ComponentChainStress: copy i rewrites ~1/3 of each doc's words
    * (deterministic per (word, pos, copy, doc) hash) to copy-tagged
    * variants, so cross-copy twins share vocabulary but only ~9% of
    * shingles (J ≈ 0.05 — the uninformative tail banding must reject). */
  def variedDocs(spark: SparkSession, k: Int): String = {
    val dst = s"/tmp/graft_minhashband_x$k"
    val marker = Paths.get(dst, "_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(dst))
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val maxId = base.agg(max("doc_id")).head.getLong(0) + 1
      (0 until k).map { i =>
        base
          .withColumn("doc_id", col("doc_id") + lit(i * maxId))
          .withColumn("ws", split(col("text"), " "))
          .withColumn("text", array_join(
            transform(col("ws"), (w, p) =>
              when(pmod(xxhash64(w, p, lit(i), col("doc_id")), lit(3)) === 0,
                concat(w, lit(s"~$i"))).otherwise(w)), " "))
          .drop("ws")
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")
      Files.createFile(marker)
    }
    dst
  }
}
