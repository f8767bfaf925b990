package graft.core

/** Typed configuration tree loaded from environment variables — the
  * engine's re-expression of the reference's `zio.Config` env tree
  * (tamer `core/src/main/scala/tamer/config.scala:98-184`,
  * `db/src/main/scala/tamer/db/config.scala:27-43`). Same idea, Spark-era
  * names: every knob has a default, parse errors name the offending
  * variable, and the result is plain case classes that serialize into
  * `SparkConf` keys if desired.
  */
final case class SinkConfig(
    path: String,
    maxRetries: Int = 10,
    retryBaseMillis: Long = 100
)

final case class SourceConfig(
    fetchChunkSize: Int = 5000,
    triggerMillis: Long = 0
)

final case class GraftConfig(
    checkpointRoot: String,
    sink: SinkConfig,
    source: SourceConfig = SourceConfig(),
    shufflePartitions: Int = 32
)

object GraftConfig {

  /** Environment keys (prefix GRAFT_). */
  val CheckpointRoot = "GRAFT_CHECKPOINT_ROOT"
  val SinkPath = "GRAFT_SINK_PATH"
  val SinkMaxRetries = "GRAFT_SINK_MAX_RETRIES"
  val SinkRetryBaseMillis = "GRAFT_SINK_RETRY_BASE_MILLIS"
  val FetchChunkSize = "GRAFT_FETCH_CHUNK_SIZE"
  val TriggerMillis = "GRAFT_TRIGGER_MILLIS"
  val ShufflePartitions = "GRAFT_SHUFFLE_PARTITIONS"

  def fromEnv(env: Map[String, String] = sys.env): Either[String, GraftConfig] = {
    def required(key: String): Either[String, String] =
      env.get(key).filter(_.nonEmpty).toRight(s"missing required environment variable $key")
    def intOr(key: String, default: Int): Either[String, Int] =
      env.get(key).map(v => v.toIntOption.toRight(s"$key must be an integer, got '$v'")).getOrElse(Right(default))
    def longOr(key: String, default: Long): Either[String, Long] =
      env.get(key).map(v => v.toLongOption.toRight(s"$key must be a long, got '$v'")).getOrElse(Right(default))

    for {
      ckpt <- required(CheckpointRoot)
      sinkPath <- required(SinkPath)
      retries <- intOr(SinkMaxRetries, 10)
      base <- longOr(SinkRetryBaseMillis, 100)
      chunk <- intOr(FetchChunkSize, 5000)
      trigger <- longOr(TriggerMillis, 0)
      shuffle <- intOr(ShufflePartitions, 32)
      _ <- Either.cond(retries >= 0, (), s"$SinkMaxRetries must be >= 0, got $retries")
      _ <- Either.cond(chunk > 0, (), s"$FetchChunkSize must be > 0, got $chunk")
    } yield GraftConfig(
      checkpointRoot = ckpt,
      sink = SinkConfig(sinkPath, retries, base),
      source = SourceConfig(chunk, trigger),
      shufflePartitions = shuffle)
  }

  /** Throwing variant for entry points. */
  def loadFromEnv(env: Map[String, String] = sys.env): GraftConfig =
    fromEnv(env).fold(msg => throw GraftError(s"configuration error: $msg"), identity)
}
