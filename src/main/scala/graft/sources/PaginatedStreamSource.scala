package graft.sources

import graft.core.PageOffset
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** A page of source data for the streaming source. Implementations must be
  * deterministic for already-committed ranges (same assumption the
  * reference's offset replay makes): re-fetching a committed page yields the
  * same prefix.
  */
trait PageFetcher extends Serializable {
  def fetch(page: Int): Seq[String]
}

/** Fetcher registry: DSv2 options are string-only, so tests (and in-JVM
  * fetchers generally) register here and pass the key as an option. An HTTP
  * implementation instead constructs itself from its options (url, auth)
  * in both driver and executors.
  */
object PageFetchers {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, PageFetcher]()
  def register(key: String, fetcher: PageFetcher): Unit = registry.put(key, fetcher)
  def get(key: String): PageFetcher =
    Option(registry.get(key)).getOrElse(throw graft.core.GraftError(s"no PageFetcher registered under '$key'"))
}

/** Real Structured Streaming integration of the paginated cursor
  * (SURVEY.md §7.2: "REST paginated source → custom MicroBatchStream whose
  * offset = Offset(page, idx)"): usable as
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.PaginatedTableProvider")
  *   .option("fetcher", key)        // registry key (or URL for an HTTP impl)
  *   .option("pageSize", "3")       // fixed page element count
  *   .load()
  * }}}
  *
  * Offsets are [[PageOffset]]s serialized into the checkpoint's offset log —
  * resume/replay/exactly-once come from the engine's offset protocol, the
  * same way the reference gets them from its transactional state topic.
  * `latestOffset` advances through complete pages (bounded by
  * `maxPagesPerTrigger`) and parks on the partial tail page exactly like
  * `PageCursor.nextPageOrNextIndexIfPageNotComplete`; partition readers
  * re-fetch their page executor-side, so page payloads never transit the
  * driver.
  */
class PaginatedTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PaginatedStream.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table =
    new PaginatedTable(properties.asScala.toMap)
}

private[sources] object PaginatedStream {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false)))
}

private[sources] final class PaginatedTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-pages(${properties.getOrElse("fetcher", "?")})"
  override def schema(): StructType = PaginatedStream.Schema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = PaginatedStream.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PaginatedMicroBatchStream(
          fetcherKey = options.get("fetcher"),
          pageSize = Option(options.get("pageSize")).map(_.toInt)
            .getOrElse(throw graft.core.GraftError("pageSize option is required")),
          maxPagesPerTrigger = Option(options.get("maxPagesPerTrigger")).map(_.toInt).getOrElse(100))
    }
  }
}

private[sources] final case class PageStreamOffset(page: Int, idx: Int) extends Offset {
  override def json(): String = s"""{"page":$page,"idx":$idx}"""
  def toPageOffset: PageOffset = PageOffset(page, idx)
}
private[sources] object PageStreamOffset {
  private val Pattern = """\{"page":(\d+),"idx":(\d+)\}""".r
  def fromJson(json: String): PageStreamOffset = json.trim match {
    case Pattern(p, i) => PageStreamOffset(p.toInt, i.toInt)
    case other         => throw graft.core.GraftError(s"corrupt page offset: '$other'")
  }
}

private[sources] final class PaginatedMicroBatchStream(
    fetcherKey: String,
    pageSize: Int,
    maxPagesPerTrigger: Int
) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def fetcher = PageFetchers.get(fetcherKey)

  override def initialOffset(): Offset = PageStreamOffset(0, 0)

  /** Restored checkpoint offsets seed the walk start, so a restarted query
    * never re-fetches committed pages just to count them. (Any committed
    * offset is a valid seed — the walk parks at the same tail regardless —
    * so taking the max over whatever the engine restores is safe.) */
  override def deserializeOffset(json: String): Offset = {
    val off = PageStreamOffset.fromJson(json)
    val seen = lastKnown
    if (off.page > seen.page || (off.page == seen.page && off.idx > seen.idx)) lastKnown = off
    off
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** `Trigger.AvailableNow` support: capture the end of the CURRENTLY
    * available data once, up front; subsequent micro-batches (still bounded
    * by `maxPagesPerTrigger` each) walk up to exactly that point and the
    * query then terminates on its own — the standard bounded-backfill drain.
    * Data appearing after the capture is left for the next run, by design.
    */
  @volatile private var availableNowCap: Option[PageStreamOffset] = None
  // "all available" still needs a finite page bound so a pathological
  // endpoint serving endless exactly-full pages cannot hang the capture.
  private val AvailableNowMaxPages = 1000000
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(walk(lastKnown, AvailableNowMaxPages))

  /** Progress reporting must not hammer the endpoint: the engine calls this
    * every trigger, and a full walk re-fetches every remaining page just to
    * count it. Under AvailableNow the captured cap IS the latest relevant
    * offset; otherwise report the committed frontier (progress metrics may
    * lag the true remote tail — a fetch-free answer is the right trade). */
  override def reportLatestOffset(): Offset =
    availableNowCap.getOrElse(lastKnown)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is called on SupportsAdmissionControl sources")

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** Walk forward from the committed point through complete pages (bounded
    * per trigger), park on the partial tail — the streaming form of
    * `PageCursor.nextPageOrNextIndexIfPageNotComplete`. Under AvailableNow
    * the walk additionally never passes the captured cap. */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val walked = walk(start.asInstanceOf[PageStreamOffset], maxPagesPerTrigger)
    availableNowCap.fold(walked) { cap =>
      if (walked.page > cap.page || (walked.page == cap.page && walked.idx > cap.idx)) cap
      else walked
    }
  }

  private def walk(start: PageStreamOffset, maxPages: Int): PageStreamOffset = {
    var page = start.page
    var idx = start.idx
    var walked = 0
    var done = false
    while (!done && walked < maxPages) {
      val count = fetcher.fetch(page).length
      if (count >= pageSize) { page += 1; idx = 0; walked += 1 }
      else { idx = count; done = true }
    }
    PageStreamOffset(page, idx)
  }

  @volatile private var lastKnown: PageStreamOffset = PageStreamOffset(0, 0)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageStreamOffset]
    val e = end.asInstanceOf[PageStreamOffset]
    lastKnown = e
    (s.page to e.page).flatMap { page =>
      val fromIdx = if (page == s.page) s.idx else 0
      val untilIdx = if (page == e.page) e.idx else pageSize
      if (untilIdx > fromIdx) Some(PagePartition(fetcherKey, page, fromIdx, untilIdx): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[PagePartition]
      new PartitionReader[InternalRow] {
        private val rows = PageFetchers.get(p.fetcherKey).fetch(p.page)
          .slice(p.fromIdx, p.untilIdx).zipWithIndex.iterator
        private var current: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) {
            val (v, i) = rows.next()
            current = InternalRow(UTF8String.fromString(v), p.page, p.fromIdx + i)
            true
          } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] final case class PagePartition(fetcherKey: String, page: Int, fromIdx: Int, untilIdx: Int)
  extends InputPartition
