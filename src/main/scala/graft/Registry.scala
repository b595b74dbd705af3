package graft

import graft.operators._

/** Single source of truth for the declared engine surface (SURVEY.md §2.6).
  * SparkEntry derives both `queries` and `oracleSql` from this list, so a
  * query and its oracle can never go out of sync by construction.
  */
object Registry {
  val all: Seq[GQ] =
    Relational.queries ++
      Joins.queries ++
      Aggregates.queries ++
      SetOps.queries ++
      Windows.queries ++
      EventsOps.queries ++
      TextOps.queries ++
      Similarity.queries ++
      Dedup.queries ++
      Ann.queries ++
      Multimodal.queries ++
      Fingerprint.queries ++
      Curation.queries ++
      BloomPrune.queries ++
      Retrieval.queries ++
      Layout.queries ++
      GraphOps.queries ++
      DataQuality.queries ++
      Stats.queries ++
      Recs.queries ++
      LinearAlgebra.queries ++
      Lm.queries ++
      LlmPipeline.queries ++
      graft.streaming.StreamQueries.queries

  lazy val byName: Map[String, GQ] = all.map(q => q.name -> q).toMap

  require(all.size == byName.size, "duplicate query names in Registry")
}
