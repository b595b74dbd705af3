package graft.sources.v2

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.{HttpClient, SpotifySource}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 wrapper for the keyed fan-out endpoint (SURVEY.md §2.1 S3) —
  * the REST extract that genuinely benefits from a partition-parallel scan:
  * each playlist id's tracks are independent, so the Batch plans one
  * InputPartition per id-chunk and executors page through their chunk
  * concurrently. (The cursor-paginated endpoints are inherently sequential —
  * their `mapPartitions` form in [[graft.sources.SpotifySource]] is already
  * the right shape; V2 adds catalog/planner integration, not parallelism.)
  *
  *   spark.read.format("spotify-tracks")
  *     .option("ids", "p1,p2,...")     // playlist ids to fan out over
  *     .option("chunk", "8")           // ids per InputPartition
  *     .option("client", key)          // HttpClients registry key
  *     .load()
  *
  * Emits the reference's `playlists_tracks` shape (id, name, artist, album,
  * playlist_id — spotify-etl.py:100-106), null tracks dropped (:106).
  * HTTP goes through [[HttpClients]], a JVM-level registry, because V2
  * options are strings — executors resolve the client by key (works in
  * local and any static-cluster deploy; a dynamic cluster would construct
  * clients from serializable config instead).
  */
class SpotifyTracksProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spotify-tracks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpotifyTracksProvider.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TracksTable(properties.asScala.toMap)
}

object SpotifyTracksProvider {
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("playlist_id", StringType)))
}

/** String-keyed client registry (V2 options cannot carry objects). */
object HttpClients {
  private val clients = TrieMap.empty[String, HttpClient]
  def register(key: String, client: HttpClient): Unit = clients.put(key, client)
  def apply(key: String): HttpClient = clients(key)
}

private class TracksTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"spotify_tracks(${props.getOrElse("ids", "")})"
  override def schema(): StructType = SpotifyTracksProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with SupportsPushDownLimit with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters {
      override def build(): Scan = this
      override def toBatch: Batch = this

      // Pushdown state (round 6, VERDICT r5 item 7): the mapPartitions path
      // proves LIMIT-stops-fetches (SpotifySourceSpec); these make the same
      // property hold through the V2 planner. A pushed LIMIT n caps every
      // partition reader at n rows, so the lazy page cursor stops issuing
      // HTTP once satisfied (isPartiallyPushed stays true — Spark still
      // applies the global limit over the per-partition caps). Pruned
      // columns narrow readSchema, so a playlist_id-only projection never
      // materializes the other four strings per row. playlist_id
      // EqualTo/In filters prune whole InputPartitions — the fan-out key
      // IS the partition key, so a filtered scan never issues HTTP for
      // playlists outside the predicate (the REST analog of parquet
      // partition pruning); they are fully handled here (id-set
      // intersection is exact), everything else stays a Spark-side
      // residual over the scan output.
      private var limit: Int = -1
      private var required: StructType = SpotifyTracksProvider.Schema
      private var idFilter: Option[Set[String]] = None
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def pushLimit(l: Int): Boolean = { limit = l; true }
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def readSchema(): StructType = required

      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        import org.apache.spark.sql.sources.{EqualTo, In}
        def narrow(allowed: Set[String]): Unit =
          idFilter = Some(idFilter.fold(allowed)(_ intersect allowed))
        val (handled, residual) = filters.partition {
          case EqualTo("playlist_id", v: String) => narrow(Set(v)); true
          case In("playlist_id", vs) =>
            narrow(vs.collect { case s: String => s }.toSet); true
          case _ => false
        }
        pushed = handled
        residual
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        pushed

      private def opt(k: String, d: String) =
        Option(options.get(k)).orElse(props.get(k)).getOrElse(d)

      override def planInputPartitions(): Array[InputPartition] = {
        val ids = opt("ids", "").split(",").map(_.trim).filter(_.nonEmpty)
          .filter(id => idFilter.forall(_.contains(id)))
        val chunk = opt("chunk", "8").toInt
        ids.grouped(chunk).map(g => TracksPartition(g.toSeq)).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new TracksReaderFactory(
          opt("client", "default"),
          opt("baseurl", "https://api.spotify.com/v1"),
          required.fieldNames, limit)
    }
}

private case class TracksPartition(ids: Seq[String]) extends InputPartition

private class TracksReaderFactory(
    clientKey: String, baseUrl: String, fields: Array[String], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TracksReader(partition.asInstanceOf[TracksPartition].ids,
      clientKey, baseUrl, fields, limit)
}

/** Pages through its id-chunk lazily: one page fetched at a time, rows
  * streamed out — executor memory holds one page, not the whole scan.
  * `fields` is the pruned projection (table-schema order, from
  * `pruneColumns`); `limit ≥ 0` caps emitted rows, and because the page
  * cursor is lazy, hitting the cap means NO further HTTP requests. */
private class TracksReader(
    ids: Seq[String], clientKey: String, baseUrl: String,
    fields: Array[String], limit: Int)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper
  private val client = HttpClients(clientKey)

  private val rows: Iterator[InternalRow] = ids.iterator.flatMap { pid =>
    Iterator.unfold(Option(s"$baseUrl/playlists/$pid/tracks")) {
      case Some(url) =>
        val r = client.get(url, Map.empty)
        // fail the task loudly: an error body has no "items", and treating
        // it as an empty page would silently drop the whole playlist
        if (r.status < 200 || r.status >= 300)
          sys.error(s"spotify-tracks scan: HTTP ${r.status} for $url")
        Some((r.body, SpotifySource.nextCursorPublic(r.body)))
      case None => None
    }.flatMap { body =>
      val items = mapper.readTree(body).path("items")
      items.elements().asScala.flatMap { item =>
        val t = item.path("track")
        if (t.isMissingNode || t.isNull) None // null-track filter (P5)
        else {
          def s(n: com.fasterxml.jackson.databind.JsonNode) =
            if (n.isMissingNode || n.isNull) null else UTF8String.fromString(n.asText)
          def field(name: String): Any = name match {
            case "id" => s(t.path("id"))
            case "name" => s(t.path("name"))
            case "artist" => s(t.path("artists").path(0).path("name"))
            case "album" => s(t.path("album").path("name"))
            case "playlist_id" => UTF8String.fromString(pid)
          }
          Some(new GenericInternalRow(
            fields.map(field): Array[Any]): InternalRow)
        }
      }
    }
  }

  private var emitted = 0
  private var current: InternalRow = _
  override def next(): Boolean =
    if (limit >= 0 && emitted >= limit) false
    else if (rows.hasNext) { current = rows.next(); emitted += 1; true }
    else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
