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
  * in both driver and executors — see [[HttpPageFetcher]].
  */
object PageFetchers {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, PageFetcher]()
  def register(key: String, fetcher: PageFetcher): Unit = registry.put(key, fetcher)
  def get(key: String): PageFetcher =
    Option(registry.get(key)).getOrElse(throw graft.core.GraftError(s"no PageFetcher registered under '$key'"))
}

/** How a partition reader (possibly on a remote executor) obtains its
  * [[PageFetcher]]. The spec — not the fetcher — is what the driver plans
  * into [[PagePartition]]s, so each variant states its cluster story:
  *
  *  - [[FetcherSpec.Http]] rebuilds from pure config anywhere — the
  *    production path;
  *  - [[FetcherSpec.Embedded]] java-serializes the instance into the task —
  *    works on a real cluster for any genuinely-Serializable fetcher;
  *  - [[FetcherSpec.Registry]] resolves in-JVM and is therefore LOCAL-MODE
  *    ONLY; the driver auto-upgrades it to Embedded when the registered
  *    instance proves serializable, so only non-serializable test fetchers
  *    keep the restriction.
  */
sealed trait FetcherSpec extends Serializable {
  def resolve(): PageFetcher
  def label: String
}
object FetcherSpec {
  final case class Registry(key: String) extends FetcherSpec {
    def resolve(): PageFetcher = PageFetchers.get(key)
    def label: String = key
  }
  final case class Embedded(fetcher: PageFetcher, label: String) extends FetcherSpec {
    def resolve(): PageFetcher = fetcher
  }
  final case class Http(config: HttpFetcherConfig) extends FetcherSpec {
    def resolve(): PageFetcher = new HttpPageFetcher(config)
    def label: String = config.url
  }

  /** DSv2 options → spec: `url` selects the HTTP fetcher, otherwise
    * `fetcher` names a registry entry. */
  def fromOptions(get: String => Option[String]): FetcherSpec =
    get("url") match {
      case Some(_) => Http(HttpFetcherConfig.fromOptions(get))
      case None =>
        Registry(get("fetcher").getOrElse(
          throw graft.core.GraftError("either 'url' or 'fetcher' option is required")))
    }

  private def javaSerializable(x: AnyRef): Boolean =
    try {
      val out = new java.io.ObjectOutputStream(java.io.OutputStream.nullOutputStream())
      out.writeObject(x); out.close(); true
    } catch { case _: java.io.NotSerializableException => false }

  /** The form planned into partitions: registry fetchers that actually
    * serialize are embedded so executors don't need the driver's registry. */
  def planForm(spec: FetcherSpec): FetcherSpec = spec match {
    case Registry(key) =>
      val f = PageFetchers.get(key)
      if (javaSerializable(f)) Embedded(f, key) else spec
    case other => other
  }
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
  override def name(): String =
    s"graft-pages(${properties.getOrElse("url", properties.getOrElse("fetcher", "?"))})"
  override def schema(): StructType = PaginatedStream.Schema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = PaginatedStream.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PaginatedMicroBatchStream(
          spec = FetcherSpec.fromOptions(k => Option(options.get(k))),
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
    spec: FetcherSpec,
    pageSize: Int,
    maxPagesPerTrigger: Int
) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def fetcher = spec.resolve()

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
    * the capture walk already PROVED every page below the cap complete, so
    * the per-trigger advance is pure arithmetic — no re-fetching of pages
    * just to count them (the endpoint is hit once to capture and once per
    * page to read, never a third time). */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[PageStreamOffset]
    availableNowCap match {
      case Some(cap) =>
        val targetPage = s.page.toLong + maxPagesPerTrigger // Long: no overflow near Int.MaxValue
        if (targetPage >= cap.page) cap else PageStreamOffset(targetPage.toInt, 0)
      case None => walk(s, maxPagesPerTrigger)
    }
  }

  private def walk(start: PageStreamOffset, maxPages: Int): PageStreamOffset = {
    val f = fetcher
    var page = start.page
    var idx = start.idx
    var walked = 0
    var done = false
    while (!done && walked < maxPages) {
      val count = f.fetch(page).length
      // Committed-prefix determinism contract: a page the offset log already
      // points INTO may grow or stay, never shrink below the committed index.
      // A shrink would walk the offset BEHIND `start`, and a later re-growth
      // would re-emit rows in [count, start.idx) as duplicates — fail loudly
      // instead of corrupting the offset log.
      if (page == start.page && count < start.idx)
        throw graft.core.GraftError(
          s"paginated source contract violation: committed offset (page=${start.page}, idx=${start.idx}) " +
            s"but page $page now has only $count elements — committed prefixes must be stable")
      if (count >= pageSize) { page += 1; idx = 0; walked += 1 }
      else { idx = count; done = true }
    }
    PageStreamOffset(page, idx)
  }

  @volatile private var lastKnown: PageStreamOffset = PageStreamOffset(0, 0)

  // Resolved once per plan: registry fetchers that java-serialize are
  // embedded into the partitions so executors never consult the driver-side
  // registry (a real-cluster correctness requirement, not just hygiene).
  private lazy val partitionSpec: FetcherSpec = FetcherSpec.planForm(spec)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageStreamOffset]
    val e = end.asInstanceOf[PageStreamOffset]
    lastKnown = e
    (s.page to e.page).flatMap { page =>
      val fromIdx = if (page == s.page) s.idx else 0
      val untilIdx = if (page == e.page) e.idx else pageSize
      if (untilIdx > fromIdx) Some(PagePartition(partitionSpec, page, fromIdx, untilIdx): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[PagePartition]
      new PartitionReader[InternalRow] {
        private val rows = p.spec.resolve().fetch(p.page)
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

private[sources] final case class PagePartition(spec: FetcherSpec, page: Int, fromIdx: Int, untilIdx: Int)
  extends InputPartition
