package graft.serde

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schemaless JSON record serde — the Spark re-expression of the reference's
  * JSON codec family (tamer `core/src/main/scala/tamer/Codec.scala:174-204`:
  * Circe, Jsoniter-Scala and ZIO-Json backends, all `maybeSchema = None` —
  * plain JSON bytes on the wire, no registry, no framing header).
  *
  * Where the Avro path ([[ConfluentAvroFrames]]) must drop to
  * `mapPartitions` for the per-partition registry client, schemaless JSON
  * needs no registry at all, so BOTH directions stay pure Catalyst
  * expressions (`to_json`/`from_json`) inside whole-stage codegen — at
  * 100 TB that is the difference between a fused scan-project stage and a
  * per-record codec call on every row.
  *
  * Parity notes vs the reference's codecs:
  *  - decode failure is loud: `from_json` runs in FAILFAST mode, so a
  *    malformed document aborts the task like the reference's
  *    `Codec.decode` error path (lenient null-filling would silently
  *    corrupt a pipeline);
  *  - null FIELD values are legal (JSON is schemaless; the reference
  *    expresses them as `Option` fields) — only syntax errors throw;
  *  - the `wire` output is a BINARY column, directly usable as the
  *    key/value of [[graft.sinks.KafkaSinkFormat.fromColumns]].
  */
object JsonFrames {

  /** The named columns rendered as one UTF-8 JSON object per row in a
    * binary `wire` column (schemaless analog of
    * [[ConfluentAvroFrames.serialize]]). Field order in the JSON follows
    * `cols` — deterministic, so identical rows produce identical bytes and
    * the wire is safe to hash/dedup on.
    */
  def serialize(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(wireColumn(cols.map(col)).as("wire"))

  /** Expression form: JSON-render arbitrary columns (structs nest). */
  def wireColumn(cols: Seq[Column]): Column =
    to_json(struct(cols: _*)).cast("binary")

  /** The typed fields of `schema` parsed out of a JSON `wire` column and
    * APPENDED to the input columns (same shape as
    * [[ConfluentAvroFrames.deserialize]]). Malformed JSON fails the task
    * (FAILFAST), missing fields decode as null.
    */
  def deserialize(df: DataFrame, wireCol: String, schema: StructType): DataFrame = {
    val parsed = from_json(col(wireCol).cast("string"), schema, Map("mode" -> "FAILFAST"))
    df.withColumn("__parsed", parsed)
      .select(df.columns.map(col) ++ schema.fieldNames.map(f => col(s"__parsed.$f")): _*)
  }

  /** [[deserialize]] with a DEAD-LETTER leg instead of the task abort: a
    * continuously-fed landing zone cannot let one malformed upstream
    * document crash-loop the job on offset replay (the
    * [[graft.streaming.StreamingSrmMonitor]] null-user lesson applied to
    * serde), but silently null-filling it would corrupt the pipeline —
    * so the row is ROUTED, not dropped: returns (good, dead) where
    * `good` has [[deserialize]]'s exact shape and `dead` carries the
    * input columns plus the raw offending `wire` bytes for quarantine
    * and replay-after-fix.
    *
    * A row is dead iff PERMISSIVE `from_json` fills the corrupt-record
    * sentinel field — syntax errors AND unconvertible field values (a
    * string where the schema says long), exactly the set FAILFAST throws
    * on, so routing stays consistent with [[deserialize]]'s contract;
    * PERMISSIVE null-fills the DATA fields of a corrupt row, so the
    * struct itself is non-null and the sentinel is the reliable signal;
    * rows whose wire is null or whose fields are null decode as good
    * with null fields, exactly like [[deserialize]]. Routing is a pure
    * row-local function of the bytes.
    *
    * COST MODEL — the two returned frames are separate plans over the
    * same parse subtree, and Catalyst does NOT share subplans across
    * branches: consuming BOTH legs scans and parses the input twice. For
    * the common write-both-sinks loop, persist/localCheckpoint the
    * input first or use `foreachBatch`; when both legs feed ONE
    * downstream plan, prefer [[deserializeTagged]] — a single frame, a
    * single parse, the split is a per-row flag. */
  def deserializeWithDlq(
      df: DataFrame,
      wireCol: String,
      schema: StructType
  ): (DataFrame, DataFrame) = {
    val tagged = deserializeTagged(df, wireCol, schema)
    val good = tagged.filter(!col("is_dead"))
      .select(df.columns.map(col) ++ schema.fieldNames.map(col): _*)
    val dlq = tagged.filter(col("is_dead")).select(df.columns.map(col): _*)
    (good, dlq)
  }

  /** The one-plan form of [[deserializeWithDlq]]: input columns + the
    * parsed fields (null on dead rows) + an `is_dead` flag, all off ONE
    * `from_json` — at 100 TB the quarantine costs one predicate column,
    * not a second scan+parse. Same routing contract as
    * [[deserializeWithDlq]] (which is a thin splitter over this). */
  def deserializeTagged(
      df: DataFrame,
      wireCol: String,
      schema: StructType
  ): DataFrame = {
    val corrupt = "__graft_corrupt"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not declare the sentinel field $corrupt")
    require(!df.columns.contains("is_dead"), "input already has an is_dead column")
    val withSentinel = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(wireCol).cast("string"), withSentinel,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
    val dead = col(s"__parsed.$corrupt").isNotNull
    df.withColumn("__parsed", parsed)
      .select(df.columns.map(col) ++
        schema.fieldNames.map(f =>
          when(!dead, col(s"__parsed.$f")).as(f)) :+ dead.as("is_dead"): _*)
  }
}
