package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Conventions that make the DuckDB-oracle hash compare deterministic:
  *  - every computed column is aliased IDENTICALLY in the Spark code and the
  *    oracle SQL (the driver sorts columns by name before hashing);
  *  - every query ends in an ORDER BY over a unique key set, present on both
  *    sides, so row order is fully determined;
  *  - double aggregates go through exact decimal sums and are cast back to
  *    double at the end (`cast(sum(cast(x as decimal(18,2))) as double)`) —
  *    bit-identical across engines regardless of accumulation order;
  *  - raw `events.ts` is never emitted (nanosecond parquet timestamps
  *    truncate to micros in Spark but not in DuckDB) — always bucketed or
  *    truncated first.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
