package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot changeset algebra — the table-maintenance primitive pair:
  * [[diffSnapshots]] turns two table vintages into a minimal
  * insert/update/delete changeset (the CDC export), [[applyChangeset]]
  * replays a changeset onto a snapshot (the MERGE INTO shape without a
  * table format). The two satisfy the round-trip law
  * `apply(old, diff(old, new)) == new` — q156/q157's gate — so nightly
  * vintage shipping can move changesets instead of full corpora.
  *
  * Shape at 100 TB: one keyed full-outer join (SMJ-pinned — both sides
  * corpus-shaped) for diff; apply is an anti-join + union. Value
  * comparison is a null-safe struct compare over the non-key columns.
  */
object Snapshot {

  private def valueStruct(df: DataFrame, keys: Seq[String]) = {
    val valueCols = df.columns.filterNot(keys.contains)
    struct(valueCols.map(col): _*)
  }

  /** Changeset rows: (op 'I'|'U'|'D', keys..., non-key columns — the NEW
    * values for I/U, the OLD values for D so the row stays inspectable).
    * Unchanged rows are omitted (the changeset is minimal). */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    val o = oldDf.select(keys.map(col) :+ valueStruct(oldDf, keys).as("__vo"): _*)
      .withColumn("__ino", lit(true))
    val n = newDf.select(keys.map(col) :+ valueStruct(newDf, keys).as("__vn"): _*)
      .withColumn("__inn", lit(true))
    o.hint("shuffle_merge")
      .join(n.hint("shuffle_merge"), keys, "full_outer")
      .withColumn("op",
        when(col("__ino").isNull, lit("I"))
          .when(col("__inn").isNull, lit("D"))
          .when(!(col("__vo") <=> col("__vn")), lit("U")))
      .filter(col("op").isNotNull)
      .select(col("op") +: keys.map(col) ++: valueCols.map(c =>
        when(col("op") === "D", col("__vo").getField(c))
          .otherwise(col("__vn").getField(c)).as(c)): _*)
  }

  /** Replay a [[diffSnapshots]] changeset onto a snapshot: D/U keys drop
    * from the old rows (one SMJ-pinned anti-join against the changeset's
    * key set), then I/U rows union in. Key sets in the changeset must be
    * consistent with the snapshot (a diff against it always is). */
  def applyChangeset(oldDf: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    require(changes.columns.contains("op"), "changes must be a diffSnapshots changeset")
    val touched = changes.filter(col("op").isin("D", "U")).select(keys.map(col): _*)
    val upserts = changes.filter(col("op").isin("I", "U")).drop("op")
      .select(oldDf.columns.map(col): _*)
    oldDf
      .join(touched.hint("shuffle_merge"), keys, "left_anti")
      .unionByName(upserts)
  }
}
