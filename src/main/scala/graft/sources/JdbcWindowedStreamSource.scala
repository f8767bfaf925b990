package graft.sources

import graft.core.GraftError
import graft.pipeline.TumblingWindow
import java.sql.{Connection, DriverManager, ResultSet}
import java.time.{Duration, Instant}
import java.util
import java.util.Properties
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** The JDBC windowed source as a REAL Structured Streaming source (SURVEY.md
  * §7.2: "JDBC windowed scan → custom `MicroBatchStream` whose offset is
  * `Window`"): the reference's flagship tumbling-window pull
  * (tamer `db/src/main/scala/tamer/db/DbSetup.scala:35-118`) driven by the
  * engine's offset protocol instead of the epoch runner.
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.JdbcWindowedTableProvider")
  *   .option("url", "jdbc:derby:memory:db")   // any JDBC url
  *   .option("table", "USERS")                // table or "(subquery) t"
  *   .option("tsCol", "MODIFIED_AT")
  *   .option("from", "2026-01-01T00:00:00Z")  // window-walk origin (exclusive)
  *   .option("stepMs", "420000")              // tumbling step
  *   .load()
  * }}}
  *
  * Offsets ARE windows ([[WindowStreamOffset]] — `{"fromUs":…,"toUs":…}` in
  * the checkpoint offset log), so resume/replay/exactly-once come from the
  * engine's offset protocol exactly as the reference gets them from its
  * transactional state topic. Each trigger advances the window by ONE
  * [[TumblingWindow.fold]] step, decided by a single `SELECT MAX(tsCol)`
  * control query on the driver (the reference's `results.max`,
  * `DbSetup.scala:113` — an aggregate the database executes, not a data
  * pull); the batch's rows are then read EXECUTOR-side, the window range
  * sliced into `numPartitions` parallel `WHERE tsCol > ? AND tsCol <= ?`
  * scans, so row data never transits the driver.
  *
  * `Trigger.AvailableNow` capture costs ONE control query: the fold's
  * fixpoint is `(M, max(now-lag, M))` where `M = max(ts) <= now-lag` — the
  * walk is then bounded by it and the query self-terminates. Late data
  * within `lagMs` is caught exactly as in the epoch-runner form: the window
  * `to` is clamped to `now - lag`, holding the frontier back.
  *
  * Other options: `lagMs` (default 0), `numPartitions` (default 4), `user`,
  * `password`, `driver` (JDBC driver class to pre-load), `fetchSize`
  * (default 5000, the reference's `fetchChunkSize`), `now` (fixed ISO-8601
  * instant — deterministic tests; omit for wall clock).
  */
class JdbcWindowedTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val config = JdbcWindowConfig.fromOptions(k => Option(options.get(k)))
    JdbcWindowUtil.schemaOf(config)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table = {
    // DSv2 option keys are case-insensitive: inferSchema already resolves
    // through CaseInsensitiveStringMap, so getTable must too, or an
    // off-case key passes inference then fails construction
    val ci = new CaseInsensitiveStringMap(properties)
    new JdbcWindowedTable(schema, JdbcWindowConfig.fromOptions(k => Option(ci.get(k))))
  }
}

private[sources] final case class JdbcWindowConfig(
    url: String,
    table: String,
    tsCol: String,
    fromUs: Long,
    stepUs: Long,
    lagUs: Long,
    numPartitions: Int,
    user: String,
    password: String,
    driver: String,
    fetchSize: Int,
    fixedNowUs: Option[Long]) {
  require(stepUs > 0, "stepMs must be positive")
  require(numPartitions > 0, "numPartitions must be positive")
}

private[sources] object JdbcWindowConfig {
  def fromOptions(get: String => Option[String]): JdbcWindowConfig = {
    def req(k: String) = get(k).getOrElse(throw GraftError(s"'$k' option is required for the JDBC windowed source"))
    JdbcWindowConfig(
      url = req("url"),
      table = req("table"),
      tsCol = req("tsCol"),
      fromUs = JdbcWindowUtil.instantToUs(Instant.parse(req("from"))),
      stepUs = req("stepMs").toLong * 1000L,
      lagUs = get("lagMs").map(_.toLong * 1000L).getOrElse(0L),
      numPartitions = get("numPartitions").map(_.toInt).getOrElse(4),
      user = get("user").getOrElse(""),
      password = get("password").getOrElse(""),
      driver = get("driver").getOrElse(""),
      fetchSize = get("fetchSize").map(_.toInt).getOrElse(5000),
      fixedNowUs = get("now").map(s => JdbcWindowUtil.instantToUs(Instant.parse(s))))
  }
}

/** Shared JDBC plumbing: connections, schema inference from database
  * metadata, and the java.sql <-> Catalyst value bridge (the same type
  * surface Spark's own JDBC relation supports for these databases).
  */
private[sources] object JdbcWindowUtil {

  def instantToUs(i: Instant): Long = DateTimeUtils.instantToMicros(i)
  def usToInstant(us: Long): Instant = DateTimeUtils.microsToInstant(us)
  def usToSqlTimestamp(us: Long): java.sql.Timestamp = java.sql.Timestamp.from(usToInstant(us))

  def connect(config: JdbcWindowConfig): Connection = {
    if (config.driver.nonEmpty) Class.forName(config.driver)
    val props = new Properties()
    if (config.user.nonEmpty) props.setProperty("user", config.user)
    if (config.password.nonEmpty) props.setProperty("password", config.password)
    DriverManager.getConnection(config.url, props)
  }

  def sqlTypeToCatalyst(sqlType: Int, precision: Int, scale: Int): DataType = {
    import java.sql.Types._
    sqlType match {
      case BIT | BOOLEAN                       => BooleanType
      case TINYINT | SMALLINT                  => ShortType
      case INTEGER                             => IntegerType
      case BIGINT                              => LongType
      case REAL                                => FloatType
      case FLOAT | DOUBLE                      => DoubleType
      case DECIMAL | NUMERIC                   => DecimalType(math.max(precision, 1), scale)
      case CHAR | VARCHAR | LONGVARCHAR | CLOB => StringType
      case DATE                                => DateType
      case TIMESTAMP                           => TimestampType
      case BINARY | VARBINARY | LONGVARBINARY | BLOB => BinaryType
      case other => throw GraftError(s"unsupported JDBC column type $other for the windowed source")
    }
  }

  /** Column names + types from a zero-row probe (`WHERE 1=0`) — the
    * standard JDBC schema handshake; no data moves. */
  def schemaOf(config: JdbcWindowConfig): StructType = {
    val conn = connect(config)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT * FROM ${config.table} WHERE 1=0")
      val md = rs.getMetaData
      StructType((1 to md.getColumnCount).map { i =>
        StructField(
          md.getColumnLabel(i),
          sqlTypeToCatalyst(md.getColumnType(i), md.getPrecision(i), md.getScale(i)),
          md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
      })
    } finally conn.close()
  }

  /** `MAX(tsCol)` over a (half-open, optionally unbounded) window — the
    * fold's control query, executed by the database. */
  def maxTsUs(config: JdbcWindowConfig, fromUs: Option[Long], toUs: Option[Long]): Option[Long] = {
    val conn = connect(config)
    try {
      val preds = fromUs.map(_ => s"${config.tsCol} > ?").toSeq ++ toUs.map(_ => s"${config.tsCol} <= ?")
      val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
      val ps = conn.prepareStatement(s"SELECT MAX(${config.tsCol}) FROM ${config.table}$where")
      (fromUs.toSeq ++ toUs.toSeq).zipWithIndex.foreach { case (us, i) =>
        ps.setTimestamp(i + 1, usToSqlTimestamp(us))
      }
      val rs = ps.executeQuery()
      rs.next()
      Option(rs.getTimestamp(1)).map(t => DateTimeUtils.fromJavaTimestamp(t))
    } finally conn.close()
  }

  def readValue(rs: ResultSet, i: Int, dt: DataType): Any = {
    val v: Any = dt match {
      case BooleanType    => rs.getBoolean(i)
      case ShortType      => rs.getShort(i)
      case IntegerType    => rs.getInt(i)
      case LongType       => rs.getLong(i)
      case FloatType      => rs.getFloat(i)
      case DoubleType     => rs.getDouble(i)
      case d: DecimalType => val bd = rs.getBigDecimal(i); if (bd == null) null else Decimal(bd, d.precision, d.scale)
      case StringType     => UTF8String.fromString(rs.getString(i))
      case DateType       => val d = rs.getDate(i); if (d == null) null else DateTimeUtils.fromJavaDate(d)
      case TimestampType  => val t = rs.getTimestamp(i); if (t == null) null else DateTimeUtils.fromJavaTimestamp(t)
      case BinaryType     => rs.getBytes(i)
      case other          => throw GraftError(s"unsupported catalyst type $other in the JDBC windowed reader")
    }
    if (rs.wasNull()) null else v
  }
}

private[sources] final class JdbcWindowedTable(tableSchema: StructType, config: JdbcWindowConfig)
  extends Table with SupportsRead {
  override def name(): String = s"graft-jdbc-windowed(${config.url}:${config.table})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new JdbcWindowedMicroBatchStream(tableSchema, config)
    }
  }
}

/** A window as a streaming offset: epoch MICROS (Spark timestamp precision —
  * a millis cursor could truncate below a sub-millisecond max timestamp and
  * re-emit the max row). Ordering on (from, to): the fold only ever moves
  * both forward. */
private[sources] final case class WindowStreamOffset(fromUs: Long, toUs: Long) extends Offset {
  override def json(): String = s"""{"fromUs":$fromUs,"toUs":$toUs}"""
  def isAfter(other: WindowStreamOffset): Boolean =
    fromUs > other.fromUs || (fromUs == other.fromUs && toUs > other.toUs)
}
private[sources] object WindowStreamOffset {
  private val Pattern = """\{"fromUs":(-?\d+),"toUs":(-?\d+)\}""".r
  def fromJson(json: String): WindowStreamOffset = json.trim match {
    case Pattern(f, t) => WindowStreamOffset(f.toLong, t.toLong)
    case other         => throw GraftError(s"corrupt window offset: '$other'")
  }
}

private[sources] final class JdbcWindowedMicroBatchStream(schema: StructType, config: JdbcWindowConfig)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import JdbcWindowUtil._

  private def graftWindow(o: WindowStreamOffset): graft.core.Window =
    graft.core.Window(usToInstant(o.fromUs), usToInstant(o.toUs))

  private def nowUs(): Long = config.fixedNowUs.getOrElse(instantToUs(Instant.now()))

  override def initialOffset(): Offset =
    WindowStreamOffset(config.fromUs, config.fromUs + config.stepUs)

  @volatile private var lastKnown: WindowStreamOffset =
    WindowStreamOffset(config.fromUs, config.fromUs + config.stepUs)

  override def deserializeOffset(json: String): Offset = {
    val off = WindowStreamOffset.fromJson(json)
    if (off.isAfter(lastKnown)) lastKnown = off
    off
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** AvailableNow cap: the fold's fixpoint `(M, max(now - lag, M))` with
    * `M = max(ts <= now - lag)` — empty-widen steps only ever move `to`
    * toward `now - lag` and non-empty steps only ever move `from` to the
    * batch max, so the walk from ANY committed window converges exactly
    * there. One control query, captured once per run ("all available"
    * pins `now`, so data landing after the capture waits for the next run,
    * like the paginated source's capture). */
  @volatile private var availableNowCap: Option[WindowStreamOffset] = None
  @volatile private var capNowUs: Long = 0L

  override def prepareForTriggerAvailableNow(): Unit = {
    val n = nowUs()
    val horizon = n - config.lagUs
    val m = maxTsUs(config, None, Some(horizon))
    val cap = m match {
      case Some(maxTs) if maxTs > lastKnown.fromUs =>
        WindowStreamOffset(maxTs, math.max(horizon, maxTs))
      case _ =>
        // nothing (new) available: the committed window is already the cap
        lastKnown
    }
    capNowUs = n
    availableNowCap = Some(cap)
  }

  override def reportLatestOffset(): Offset = availableNowCap.getOrElse(lastKnown)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is called on SupportsAdmissionControl sources")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** One [[TumblingWindow.fold]] step per trigger: `MAX(ts)` over the
    * current window (driver control query), then widen/advance/clamp.
    * Under AvailableNow the fold reuses the captured `now` (deterministic
    * drain) and short-circuits to the cap once the walk's `from` reaches the
    * cap's — skipping the empty-widen tail between the last row and the
    * horizon. A fold that cannot move (continuous mode, window already at
    * `now - lag`, no rows) returns `start` unchanged: no batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[WindowStreamOffset]
    availableNowCap match {
      case Some(cap) if !cap.isAfter(s) => s // drained (or nothing was available)
      case cap =>
        val n = if (cap.isDefined) capNowUs else nowUs()
        val maxTs = maxTsUs(config, Some(s.fromUs), Some(s.toUs))
        val next = TumblingWindow.fold(
          graftWindow(s), maxTs.map(usToInstant),
          Duration.ofNanos(config.stepUs * 1000L), Duration.ofNanos(config.lagUs * 1000L),
          usToInstant(n))
        val folded = WindowStreamOffset(instantToUs(next.from), instantToUs(next.to))
        cap match {
          case Some(c) if folded.fromUs >= c.fromUs => c
          case _                                    => folded
        }
    }
  }

  /** The rows that moved the window from `start` to `end`: exactly
    * `(start.from, end.from]` (the fold sets the new `from` to the batch's
    * max timestamp, so this range IS the batch — and replaying the same
    * offset pair re-reads the same rows). The range is sliced into
    * `numPartitions` parallel window scans. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WindowStreamOffset]
    val e = end.asInstanceOf[WindowStreamOffset]
    if (e.isAfter(lastKnown)) lastKnown = e
    val (lo, hi) = (s.fromUs, e.fromUs)
    if (hi <= lo) Array.empty
    else {
      val n = math.min(config.numPartitions.toLong, hi - lo).toInt
      (0 until n).map { i =>
        val pLo = lo + (hi - lo) * i / n
        val pHi = if (i == n - 1) hi else lo + (hi - lo) * (i + 1) / n
        JdbcWindowPartition(config, pLo, pHi): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val readSchema = schema
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[JdbcWindowPartition]
        new JdbcWindowReader(p, readSchema)
      }
    }
  }
}

private[sources] final case class JdbcWindowPartition(config: JdbcWindowConfig, fromUs: Long, toUs: Long)
  extends InputPartition

/** Executor-side reader: one windowed scan `(fromUs, toUs]`, streamed with
  * the configured fetch size. */
private[sources] final class JdbcWindowReader(p: JdbcWindowPartition, schema: StructType)
  extends PartitionReader[InternalRow] {
  import JdbcWindowUtil._

  private val conn = connect(p.config)
  private val rs = {
    val cols = schema.fields.map(_.name).mkString(", ")
    val ps = conn.prepareStatement(
      s"SELECT $cols FROM ${p.config.table} WHERE ${p.config.tsCol} > ? AND ${p.config.tsCol} <= ?")
    ps.setFetchSize(p.config.fetchSize)
    ps.setTimestamp(1, usToSqlTimestamp(p.fromUs))
    ps.setTimestamp(2, usToSqlTimestamp(p.toUs))
    ps.executeQuery()
  }

  override def next(): Boolean = rs.next()
  override def get(): InternalRow =
    InternalRow.fromSeq(schema.fields.zipWithIndex.map { case (f, i) => readValue(rs, i + 1, f.dataType) })
  override def close(): Unit = conn.close()
}
