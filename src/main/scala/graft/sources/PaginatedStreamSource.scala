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
  def isAfter(o: PageStreamOffset): Boolean =
    page > o.page || (page == o.page && idx > o.idx)
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
      // Cap at/behind the committed start: drained — or a capture that
      // walked from a stale seed (the engine may capture before restoring
      // checkpoint offsets) and parked early. Either way, NEVER hand back
      // an offset behind `start`: a regressed offset log re-emits committed
      // pages as duplicates. (Same guard as JdbcWindowedMicroBatchStream.)
      case Some(cap) if !cap.isAfter(s) => s
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

// ---------------------------------------------------------------------------
// Periodic re-pagination (the reference's `periodicallyPaginated` family) as
// a streaming source: the period lives in the checkpoint offset log.
// ---------------------------------------------------------------------------

/** Injectable driver-side clock for the periodic source: period-roll
  * decisions happen ONLY in `latestOffset` (driver), so a registry works on
  * a real cluster — executors never consult it. Tests register a manual
  * clock; production omits the option and gets the system clock. */
object PageClocks {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, () => java.time.Instant]()
  def register(key: String, clock: () => java.time.Instant): Unit = registry.put(key, clock)
  def get(key: String): () => java.time.Instant =
    Option(registry.get(key)).getOrElse(throw graft.core.GraftError(s"no clock registered under '$key'"))
}

/** Periodic re-pagination as a real Structured Streaming source (reference:
  * tamer `rest/src/main/scala/tamer/rest/RESTSetup.scala:250-267` —
  * `periodicallyPaginated`): pages advance while data flows; on an empty
  * page the PERIOD rolls (immediately if `minPeriod` has elapsed, else
  * scheduled at `periodStart + minPeriod`), and a roll re-reads from page 0
  * — re-reading is how this family observes source mutations, so re-emitted
  * rows are the contract, not a bug (each row is stamped with its period).
  * `maxPeriod` bounds a period even mid-pagination, exactly like the
  * reference's overrun clause.
  *
  * Offsets are [[PeriodicPageStreamOffset]]s — `(period, page,
  * periodStartMs)` in the checkpoint offset log, the streaming form of
  * [[graft.core.PeriodicOffset]] (the roll count makes offsets totally
  * ordered even though pages reset). A roll is an offset transition with an
  * EMPTY batch; a "not due yet" poll returns the same offset (no batch, no
  * state change — the trigger cadence supplies the reference's sleep,
  * SURVEY.md §7.4).
  *
  * Replay caveat (same trade the reference makes): a page re-fetched for an
  * uncommitted replayed batch may observe source mutations; committed
  * batches are never re-read. Mutation visibility is bounded by the period.
  *
  * Options: `fetcher`/`url` (+auth) as the fixed source; `minPeriodMs`,
  * `maxPeriodMs`; `periodStart` (ISO-8601, default = first `now()`);
  * `maxPagesPerTrigger` (default 100); `clock` (test-clock registry key).
  */
class PeriodicPaginatedTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PeriodicPaginatedStream.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table =
    new PeriodicPaginatedTable(properties.asScala.toMap)
}

private[sources] object PeriodicPaginatedStream {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("period", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false)))
}

private[sources] final class PeriodicPaginatedTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"graft-periodic-pages(${properties.getOrElse("url", properties.getOrElse("fetcher", "?"))})"
  override def schema(): StructType = PeriodicPaginatedStream.Schema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.MICRO_BATCH_READ).asJava
  // options are looked up through the engine's CaseInsensitiveStringMap
  // (DSv2 option keys are case-insensitive), matching the fixed source
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    private def opt(k: String): Option[String] = Option(options.get(k))
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = PeriodicPaginatedStream.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PeriodicPaginatedMicroBatchStream(
          spec = FetcherSpec.fromOptions(opt),
          minPeriodMs = opt("minPeriodMs")
            .getOrElse(throw graft.core.GraftError("minPeriodMs option is required")).toLong,
          maxPeriodMs = opt("maxPeriodMs")
            .getOrElse(throw graft.core.GraftError("maxPeriodMs option is required")).toLong,
          explicitPeriodStartMs = opt("periodStart").map(java.time.Instant.parse(_).toEpochMilli),
          maxPagesPerTrigger = opt("maxPagesPerTrigger").map(_.toInt).getOrElse(100),
          clock = opt("clock").map(PageClocks.get)
            .getOrElse(() => java.time.Instant.now()))
    }
  }
}

/** `(period, page, periodStartMs)` — totally ordered by (period, page);
  * `periodStartMs` rides along for the min/max-period arithmetic (it may sit
  * in the future: a scheduled not-yet-due period, the reference's
  * "sleep until next read" made non-blocking). */
private[sources] final case class PeriodicPageStreamOffset(period: Long, page: Int, periodStartMs: Long) extends Offset {
  override def json(): String = s"""{"period":$period,"page":$page,"periodStartMs":$periodStartMs}"""
  def isAfter(o: PeriodicPageStreamOffset): Boolean =
    period > o.period || (period == o.period && page > o.page)
}
private[sources] object PeriodicPageStreamOffset {
  private val Pattern = """\{"period":(\d+),"page":(\d+),"periodStartMs":(-?\d+)\}""".r
  def fromJson(json: String): PeriodicPageStreamOffset = json.trim match {
    case Pattern(k, p, m) => PeriodicPageStreamOffset(k.toLong, p.toInt, m.toLong)
    case other            => throw graft.core.GraftError(s"corrupt periodic page offset: '$other'")
  }
}

private[sources] final class PeriodicPaginatedMicroBatchStream(
    spec: FetcherSpec,
    minPeriodMs: Long,
    maxPeriodMs: Long,
    explicitPeriodStartMs: Option[Long],
    maxPagesPerTrigger: Int,
    clock: () => java.time.Instant
) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private def fetcher = spec.resolve()

  override def initialOffset(): Offset =
    PeriodicPageStreamOffset(0L, 0, explicitPeriodStartMs.getOrElse(clock().toEpochMilli))

  override def deserializeOffset(json: String): Offset = PeriodicPageStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is called on SupportsAdmissionControl sources")

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** One admission decision per trigger, the streaming form of
    * `PageCursor.nextPeriodicState`:
    *  1. scheduled period still in the future → park (same offset);
    *  2. `maxPeriod` overrun (even mid-pagination) → roll now;
    *  3. walk non-empty pages forward (bounded) → data offset;
    *  4. empty page: roll now if past `minPeriod`, else roll scheduled at
    *     `periodStart + minPeriod`. */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[PeriodicPageStreamOffset]
    val now = clock().toEpochMilli
    if (s.periodStartMs > now) s
    else if (now > s.periodStartMs + maxPeriodMs)
      PeriodicPageStreamOffset(s.period + 1, 0, now)
    else {
      val f = fetcher
      var page = s.page
      var walked = 0
      while (walked < maxPagesPerTrigger && f.fetch(page).nonEmpty) { page += 1; walked += 1 }
      if (page > s.page) PeriodicPageStreamOffset(s.period, page, s.periodStartMs)
      else if (now > s.periodStartMs + minPeriodMs)
        PeriodicPageStreamOffset(s.period + 1, 0, now)
      else
        PeriodicPageStreamOffset(s.period + 1, 0, s.periodStartMs + minPeriodMs)
    }
  }

  /** Pages `[start.page, end.page)` of start's period, one partition each.
    * A period roll (`end.period > start.period`) carries no rows — the roll
    * itself is the (empty) batch. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PeriodicPageStreamOffset]
    val e = end.asInstanceOf[PeriodicPageStreamOffset]
    val lastPage = if (e.period == s.period) e.page else s.page
    val partitionSpec = FetcherSpec.planForm(spec)
    (s.page until lastPage)
      .map(p => PeriodicPagePartition(partitionSpec, s.period, p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[PeriodicPagePartition]
      new PartitionReader[InternalRow] {
        private val rows = p.spec.resolve().fetch(p.page).zipWithIndex.iterator
        private var current: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) {
            val (v, i) = rows.next()
            current = InternalRow(UTF8String.fromString(v), p.period, p.page, i)
            true
          } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] final case class PeriodicPagePartition(spec: FetcherSpec, period: Long, page: Int)
  extends InputPartition
