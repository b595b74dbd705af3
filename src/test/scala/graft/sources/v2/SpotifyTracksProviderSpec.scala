package graft.sources.v2

import graft.TestSpark
import graft.sources.{FakeHttp, FakeHttpClient, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** DataSourceV2 connector: schema, partition-parallel planning (one
  * InputPartition per id-chunk), pagination inside the reader, and the
  * null-track filter.
  */
class SpotifyTracksProviderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = "https://api.spotify.com/v1"

  private def track(id: String): String =
    s"""{"id": "$id", "name": "Song $id", "artists": [{"name": "artist-$id"}],
       |"album": {"name": "album-$id"}}""".stripMargin

  private val pages = Map(
    s"$Base/playlists/p1/tracks" ->
      s"""{"items": [{"track": ${track("t1")}}, {"track": null}],
         |"next": "$Base/playlists/p1/tracks?offset=2"}""".stripMargin,
    s"$Base/playlists/p1/tracks?offset=2" ->
      s"""{"items": [{"track": ${track("t2")}}], "next": null}""".stripMargin,
    s"$Base/playlists/p2/tracks" ->
      s"""{"items": [{"track": ${track("t3")}}], "next": null}""".stripMargin,
    s"$Base/playlists/p3/tracks" ->
      s"""{"items": [], "next": null}""".stripMargin)

  private def load(chunk: Int) = {
    FakeHttp.reset(url => pages.get(url).map(HttpResponse(200, _))
      .getOrElse(HttpResponse(404, "{}")))
    HttpClients.register("v2test", new FakeHttpClient)
    spark.read.format("spotify-tracks")
      .option("ids", "p1,p2,p3")
      .option("chunk", chunk.toString)
      .option("client", "v2test")
      .load()
  }

  test("reads typed rows through the V2 scan, paginating and dropping null tracks") {
    val rows = load(chunk = 2).orderBy("id").collect().map(_.toSeq)
    assert(rows === Seq(
      Seq("t1", "Song t1", "artist-t1", "album-t1", "p1"),
      Seq("t2", "Song t2", "artist-t2", "album-t2", "p1"),
      Seq("t3", "Song t3", "artist-t3", "album-t3", "p2")))
  }

  test("plans one InputPartition per id-chunk (partition-parallel fan-out)") {
    assert(load(chunk = 1).rdd.getNumPartitions === 3)
    assert(load(chunk = 3).rdd.getNumPartitions === 1)
  }

  test("pushed LIMIT stops the HTTP fetches (V2 path, round 6)") {
    // one partition over p1,p2,p3; p1 alone has two pages. LIMIT 1 is
    // satisfied by p1's first page, so the reader must never request p1's
    // second page nor p2/p3 at all — the property SpotifySourceSpec proves
    // for the mapPartitions path, now through the V2 planner's
    // SupportsPushDownLimit hook.
    val one = load(chunk = 3).limit(1).collect()
    assert(one.length === 1)
    assert(FakeHttp.requested === Seq(s"$Base/playlists/p1/tracks"),
      s"LIMIT 1 must cost exactly one page fetch: ${FakeHttp.requested}")
  }

  test("playlist_id filter prunes InputPartitions: no HTTP for other playlists") {
    // the fan-out key IS the partition key, so a pushed playlist_id
    // predicate must prune at PLANNING time — the REST analog of parquet
    // partition pruning. chunk=1 would hide the win (empty chunks cost
    // nothing either way); chunk=3 proves the id LIST shrank before
    // chunking, not merely that readers skipped rows.
    import org.apache.spark.sql.functions.col
    val df = load(chunk = 3).filter(col("playlist_id") === "p2")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("t3"))
    assert(FakeHttp.requested === Seq(s"$Base/playlists/p2/tracks"),
      s"equality prune must fetch ONLY p2: ${FakeHttp.requested}")

    val in = load(chunk = 3).filter(col("playlist_id").isin("p1", "p3"))
    assert(in.select("id").collect().map(_.getString(0)).sorted === Seq("t1", "t2"))
    assert(!FakeHttp.requested.exists(_.contains("/p2/")),
      s"IN prune must never touch p2: ${FakeHttp.requested}")

    // conjunction narrows by intersection: contradictory equalities plan
    // ZERO partitions and issue ZERO requests
    val none = load(chunk = 3)
      .filter(col("playlist_id") === "p1" && col("playlist_id") === "p2")
    assert(none.collect().isEmpty)
    assert(FakeHttp.requested.isEmpty,
      s"contradictory prune must issue no HTTP: ${FakeHttp.requested}")
  }

  test("filter prune composes with pushed LIMIT: one playlist, one page") {
    // p1 has two pages; a pruned-to-p1 scan with LIMIT 1 must fetch only
    // p1's FIRST page — pruning picks the partition, the pushed limit
    // stops its cursor
    import org.apache.spark.sql.functions.col
    val df = load(chunk = 3).filter(col("playlist_id") === "p1").limit(1)
    assert(df.collect().length === 1)
    assert(FakeHttp.requested === Seq(s"$Base/playlists/p1/tracks"),
      s"prune+limit must cost exactly one page: ${FakeHttp.requested}")
  }

  test("non-key filters stay Spark-side residuals over the full scan") {
    import org.apache.spark.sql.functions.col
    val df = load(chunk = 3).filter(col("artist") === "artist-t3")
    assert(df.select("id").collect().map(_.getString(0)).toSeq === Seq("t3"))
    // artist is not a partition key: every playlist still fetched
    assert(FakeHttp.requested.count(_.contains("/playlists/")) === 4,
      s"non-key filter must not prune the fan-out: ${FakeHttp.requested}")
  }

  test("required-column pruning reaches the V2 scan (round 6)") {
    val df = load(chunk = 3).select("playlist_id", "name")
    // the physical scan's read schema must be the pruned pair, not the
    // 5-column table schema with a Project on top
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(scans.head.scan.readSchema().fieldNames.toSet ===
      Set("playlist_id", "name"))
    // and the pruned rows are the right ones
    assert(df.orderBy("playlist_id", "name").collect().map(_.toSeq).toSeq === Seq(
      Seq("p1", "Song t1"), Seq("p1", "Song t2"), Seq("p2", "Song t3")))
  }
}
