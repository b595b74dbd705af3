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
}
