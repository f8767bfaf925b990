package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Changeset algebra: minimality, op semantics, and the round-trip law
  * apply(old, diff(old, new)) == new on adversarial vintage pairs. */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: DataFrame): Set[(Long, String, Long)] =
    df.as[(Long, String, Long)].collect().toSet

  test("diff emits exactly the I/U/D rows; unchanged rows are absent; D carries old values") {
    val oldDf = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val newDf = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L)).toDF("k", "s", "v")
    val got = Snapshot.diffSnapshots(oldDf, newDf, Seq("k"))
      .as[(String, Long, String, Long)].collect().toSet
    assert(got == Set(("U", 2L, "B", 20L), ("D", 3L, "c", 30L), ("I", 4L, "d", 40L)))
  }

  test("identical snapshots diff to empty; applying an empty changeset is identity") {
    val df = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "s", "v")
    val diff = Snapshot.diffSnapshots(df, df, Seq("k"))
    assert(diff.isEmpty)
    assert(canon(Snapshot.applyChangeset(df, diff, Seq("k"))) == canon(df))
  }

  test("round-trip law: apply(old, diff(old, new)) == new, adversarial vintages") {
    for (seed <- Seq(1, 7, 13)) {
      val oldDf = (1L to 500L).filter(_ % 3 != seed % 3)
        .map(i => (i, s"s${(i * seed) % 17}", i * seed % 97)).toDF("k", "s", "v")
      val newDf = (1L to 520L).filter(_ % 5 != seed % 5)
        .map(i => (i, s"s${(i * (seed + 2)) % 13}", i * (seed + 1) % 89)).toDF("k", "s", "v")
      val applied = Snapshot.applyChangeset(oldDf,
        Snapshot.diffSnapshots(oldDf, newDf, Seq("k")), Seq("k"))
      assert(canon(applied) == canon(newDf), s"round trip broke at seed $seed")
    }
  }

  test("null-safe value compare: null <-> value transitions are updates, null==null is unchanged") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "s")
    val newDf = Seq((1L, Some("y")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "s")
    val got = Snapshot.diffSnapshots(oldDf, newDf, Seq("k"))
      .as[(String, Long, Option[String])].collect().toSet
    assert(got == Set(("U", 1L, Some("y")), ("U", 2L, None)))
  }

  test("schema mismatch and missing op column fail loudly") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 2L)).toDF("k", "s", "v")
    intercept[IllegalArgumentException](Snapshot.diffSnapshots(a, b, Seq("k")))
    intercept[IllegalArgumentException](Snapshot.applyChangeset(a, a, Seq("k")))
  }
}
