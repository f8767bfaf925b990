package graft.sources

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Type-coverage hardening for the JDBC windowed stream's row codec
  * (`JdbcWindowUtil.sqlTypeToCatalyst` + `readValue`): every supported JDBC
  * type — booleans, small/int/big integers, real/double, exact decimals,
  * varchar (unicode), date, nullable timestamps, binary — must round-trip
  * value-exact through a LIVE drain against embedded Derby, with NULLs in
  * every nullable column; then the same codec under seeded-random vectors
  * (the property pass), and a wide (60-column) row shape.
  */
class JdbcTypeCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:grafttypes;create=true"
  private val base = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")

  private def withConn[A](f: java.sql.Connection => A): A = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def recreate(table: String, ddl: String): Unit = withConn { conn =>
    val st = conn.createStatement()
    try st.execute(s"DROP TABLE $table") catch { case _: java.sql.SQLException => () }
    st.execute(s"CREATE TABLE $table ($ddl)")
  }

  private def drain(table: String, sinkName: String): Unit = {
    try spark.catalog.dropTempView(sinkName) catch { case _: Exception => () }
    val (minTs, maxTs) = withConn { conn =>
      val rs = conn.createStatement().executeQuery(s"SELECT MIN(TS), MAX(TS) FROM $table")
      rs.next(); (rs.getTimestamp(1).toInstant, rs.getTimestamp(2).toInstant)
    }
    val q = spark.readStream
      .format("graft.sources.JdbcWindowedTableProvider")
      .option("url", url).option("table", table).option("tsCol", "TS")
      .option("from", minTs.minusSeconds(1).toString)
      .option("stepMs", (13 * 60000L).toString) // ragged vs 1 row/minute
      .option("numPartitions", "3")
      .option("now", maxTs.plusSeconds(86400).toString)
      .load()
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory(s"graft-types-$table").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try { assert(q.awaitTermination(120000), "drain timed out") } finally q.stop()
  }

  test("every supported type round-trips value-exact; NULL in every nullable column") {
    recreate("TYPED",
      """ID INT NOT NULL, TS TIMESTAMP NOT NULL,
        |B BOOLEAN, S SMALLINT, I INT, L BIGINT, R REAL, D DOUBLE,
        |DC DECIMAL(12,4), V VARCHAR(64), DT DATE, ETS TIMESTAMP,
        |BIN VARCHAR(16) FOR BIT DATA""".stripMargin)
    val rows: Seq[(Int, Seq[Any])] = Seq(
      1 -> Seq(true, Short.MaxValue, Int.MinValue, Long.MaxValue, 1.5f, math.Pi,
        BigDecimal("12345678.9999"), "héllo wörld ツ", "2026-02-28", "2026-02-28 23:59:59.123",
        Array[Byte](0, 1, -1, 127, -128)),
      2 -> Seq(false, Short.MinValue, 0, Long.MinValue, -0.25f, -1e300,
        BigDecimal("-0.0001"), "", "1970-01-01", "1970-01-01 00:00:00.001",
        Array.empty[Byte]),
      3 -> Seq(null, null, null, null, null, null, null, null, null, null, null))
    withConn { conn =>
      val ps = conn.prepareStatement(s"INSERT INTO TYPED VALUES (${Seq.fill(13)("?").mkString(",")})")
      rows.foreach { case (id, vs) =>
        ps.setInt(1, id)
        ps.setTimestamp(2, new java.sql.Timestamp(base.getTime + id * 60000L))
        import java.sql.Types._
        val sqlTypes = Seq(BOOLEAN, SMALLINT, INTEGER, BIGINT, REAL, DOUBLE, DECIMAL,
          VARCHAR, DATE, TIMESTAMP, VARBINARY)
        vs.zipWithIndex.foreach {
          case (null, i)                => ps.setNull(i + 3, sqlTypes(i))
          case (v: Boolean, i)          => ps.setBoolean(i + 3, v)
          case (v: Short, i)            => ps.setShort(i + 3, v)
          case (v: Int, i)              => ps.setInt(i + 3, v)
          case (v: Long, i)             => ps.setLong(i + 3, v)
          case (v: Float, i)            => ps.setFloat(i + 3, v)
          case (v: Double, i)           => ps.setDouble(i + 3, v)
          case (v: BigDecimal, i)       => ps.setBigDecimal(i + 3, v.bigDecimal)
          case (v: String, i) if sqlTypes(i) == DATE => ps.setDate(i + 3, java.sql.Date.valueOf(v))
          case (v: String, i) if sqlTypes(i) == TIMESTAMP => ps.setTimestamp(i + 3, java.sql.Timestamp.valueOf(v))
          case (v: String, i)           => ps.setString(i + 3, v)
          case (v: Array[Byte], i)      => ps.setBytes(i + 3, v)
          case (v, _) => throw new IllegalArgumentException(s"unhandled $v")
        }
        ps.addBatch()
      }
      ps.executeBatch()
    }
    drain("TYPED", "types_sink")

    val df = spark.table("types_sink")
    // schema must map exactly (incl. decimal precision/scale carried through)
    val byName = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(byName("DC") == "decimal(12,4)", s"decimal type lost: ${byName("DC")}")
    assert(byName("S") == "smallint" && byName("R") == "float" && byName("BIN") == "binary")

    val got = df.collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(1, 2, 3))
    def check(r: Row, vs: Seq[Any]): Unit = {
      if (vs(0) == null) assert(r.isNullAt(2)) else assert(r.getBoolean(2) == vs(0))
      if (vs(1) == null) (2 to 12).foreach(i => assert(r.isNullAt(i), s"col $i not null"))
      else {
        assert(r.getShort(3) == vs(1) && r.getInt(4) == vs(2) && r.getLong(5) == vs(3))
        assert(r.getFloat(6) == vs(4) && r.getDouble(7) == vs(5))
        assert(BigDecimal(r.getDecimal(8)) == vs(6))
        assert(r.getString(9) == vs(7))
        assert(r.getDate(10) == java.sql.Date.valueOf(vs(8).asInstanceOf[String]))
        assert(r.getTimestamp(11) == java.sql.Timestamp.valueOf(vs(9).asInstanceOf[String]))
        assert(r.getAs[Array[Byte]](12).toSeq == vs(10).asInstanceOf[Array[Byte]].toSeq)
      }
    }
    rows.foreach { case (id, vs) => check(got(id), vs) }
  }

  test("row codec property: 200 seeded-random mixed rows survive the drain value-exact") {
    recreate("RANDT",
      "ID INT NOT NULL, TS TIMESTAMP NOT NULL, L BIGINT, D DOUBLE, DC DECIMAL(18,6), V VARCHAR(40), ETS TIMESTAMP")
    val rnd = new scala.util.Random(0x6ea17L) // fixed seed: deterministic vectors
    case class V(l: java.lang.Long, d: java.lang.Double, dec: BigDecimal, s: String, ets: java.sql.Timestamp)
    def gen(): V = V(
      if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextLong()),
      if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)),
      if (rnd.nextInt(10) == 0) null else BigDecimal(BigInt(rnd.nextLong() % 1000000000000L), 6),
      if (rnd.nextInt(10) == 0) null else rnd.alphanumeric.take(rnd.nextInt(40)).mkString,
      if (rnd.nextInt(10) == 0) null else new java.sql.Timestamp(base.getTime + (rnd.nextInt(1 << 30).toLong * 1000L) + rnd.nextInt(1000)))
    val vectors = (1 to 200).map(i => i -> gen()).toMap
    withConn { conn =>
      val ps = conn.prepareStatement("INSERT INTO RANDT VALUES (?,?,?,?,?,?,?)")
      vectors.toSeq.sortBy(_._1).foreach { case (id, v) =>
        import java.sql.Types._
        ps.setInt(1, id)
        ps.setTimestamp(2, new java.sql.Timestamp(base.getTime + id * 60000L))
        if (v.l == null) ps.setNull(3, BIGINT) else ps.setLong(3, v.l)
        if (v.d == null) ps.setNull(4, DOUBLE) else ps.setDouble(4, v.d)
        if (v.dec == null) ps.setNull(5, DECIMAL) else ps.setBigDecimal(5, v.dec.bigDecimal)
        if (v.s == null) ps.setNull(6, VARCHAR) else ps.setString(6, v.s)
        if (v.ets == null) ps.setNull(7, TIMESTAMP) else ps.setTimestamp(7, v.ets)
        ps.addBatch()
      }
      ps.executeBatch()
    }
    drain("RANDT", "randt_sink")
    val got = spark.table("randt_sink").collect().map(r => r.getInt(0) -> r).toMap
    assert(got.size == 200, s"expected 200 rows, got ${got.size}")
    vectors.foreach { case (id, v) =>
      val r = got(id)
      assert((r.isNullAt(2) && v.l == null) || r.getLong(2) == v.l, s"row $id bigint")
      assert((r.isNullAt(3) && v.d == null) || r.getDouble(3) == v.d, s"row $id double (bit-exact)")
      assert((r.isNullAt(4) && v.dec == null) || BigDecimal(r.getDecimal(4)) == v.dec, s"row $id decimal")
      assert((r.isNullAt(5) && v.s == null) || r.getString(5) == v.s, s"row $id varchar")
      assert((r.isNullAt(6) && v.ets == null) || r.getTimestamp(6) == v.ets, s"row $id nullable timestamp")
    }
  }

  test("wide rows: 60 columns round-trip with schema order preserved") {
    val dataCols = (1 to 58).map { i =>
      if (i % 3 == 0) s"C$i BIGINT" else if (i % 3 == 1) s"C$i VARCHAR(20)" else s"C$i DOUBLE"
    }
    recreate("WIDET", (Seq("ID INT NOT NULL", "TS TIMESTAMP NOT NULL") ++ dataCols).mkString(", "))
    withConn { conn =>
      val ps = conn.prepareStatement(s"INSERT INTO WIDET VALUES (${Seq.fill(60)("?").mkString(",")})")
      (1 to 5).foreach { id =>
        ps.setInt(1, id)
        ps.setTimestamp(2, new java.sql.Timestamp(base.getTime + id * 60000L))
        (1 to 58).foreach { i =>
          if (i % 3 == 0) ps.setLong(i + 2, id * 1000L + i)
          else if (i % 3 == 1) ps.setString(i + 2, s"v-$id-$i")
          else ps.setDouble(i + 2, id + i / 100.0)
        }
        ps.addBatch()
      }
      ps.executeBatch()
    }
    drain("WIDET", "widet_sink")
    val df = spark.table("widet_sink")
    assert(df.schema.fields.map(_.name).toSeq == Seq("ID", "TS") ++ (1 to 58).map(i => s"C$i"))
    val r3 = df.filter(df("ID") === 3).head()
    (1 to 58).foreach { i =>
      if (i % 3 == 0) assert(r3.getLong(i + 1) == 3000L + i, s"C$i")
      else if (i % 3 == 1) assert(r3.getString(i + 1) == s"v-3-$i", s"C$i")
      else assert(r3.getDouble(i + 1) == 3 + i / 100.0, s"C$i")
    }
    assert(df.count() == 5)
  }
}
