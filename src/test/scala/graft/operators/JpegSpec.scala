package graft.operators

import graft.TestSpark
import graft.functions.JpegKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JPEG leg's two-part gate (r15 verdict #4): the CONTAINER
  * (SOI/SOFn dims) is oracle-gated cross-engine (q334); the lossy PIXEL
  * path is pinned HERE against committed fixture values — JDK ImageIO's
  * JPEG decode is deterministic per JDK, so the decoded luminance of a
  * fixed synthetic image under a fixed explicit quality is a stable
  * fingerprint (a codec swap or quality drift fails it loudly). */
class JpegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synthOne(seed: Long) = Multimodal.syntheticGrayPngs(
    Seq((seed, seed, false)).toDF("media_id", "seed", "perturb"))

  test("JpegKernel.dims: marker walk on hand-built headers, garbage degrades") {
    // minimal SOI + APP0(len 4) + SOF0 (8 high x 5 wide) prefix
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val sof = b(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x08, 0x00, 0x05, 0x01, 0x11, 0x00, 0x00)
    assert(JpegKernel.dims(sof).toSeq == Seq(1, 5, 8))
    // progressive SOF2 parses the same; DHT (C4) is NOT a frame header
    val sof2 = sof.clone(); sof2(9) = 0xc2.toByte
    assert(JpegKernel.dims(sof2).toSeq == Seq(1, 5, 8))
    val dht = sof.clone(); dht(9) = 0xc4.toByte
    assert(JpegKernel.dims(dht).toSeq == Seq(0, -1, -1))
    // fill FF bytes before a marker are skipped
    val fill = b(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x0b,
      0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x11, 0x00, 0x00)
    assert(JpegKernel.dims(fill).toSeq == Seq(1, 3, 2))
    // garbage, truncation, missing SOI, SOS-before-SOF all degrade
    assert(JpegKernel.dims("NOTAJPEG".getBytes("US-ASCII")).toSeq == Seq(0, -1, -1))
    assert(JpegKernel.dims(null).toSeq == Seq(0, -1, -1))
    assert(JpegKernel.dims(sof.take(12)).toSeq == Seq(0, -1, -1))
    val sos = b(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)
    assert(JpegKernel.dims(sos).toSeq == Seq(0, -1, -1))
  }

  test("transcodeJpeg: real ImageIO JPEG bytes, dims survive, corrupt passes flagged") {
    val media = synthOne(7L).withColumn("content",
      when(col("media_id") === 999L, lit("JUNK".getBytes("US-ASCII")))
        .otherwise(col("content")))
    val jp = Multimodal.transcodeJpeg(media)
    val row = jp.select("mime", "content", "transcoded").head
    assert(row.getBoolean(2) && row.getString(0) == "image/jpeg")
    val bytes = row.getAs[Array[Byte]](1)
    // the container row the q334 oracle gates: SOI present, dims 8x8
    assert(JpegKernel.dims(bytes).toSeq == Seq(1, 8, 8))
    // the JDK's own reader accepts the result (parity vs a real consumer)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 8 && img.getHeight == 8)
    // corrupt input passes through flagged, bytes untouched
    val junk = Multimodal.transcodeJpeg(
      synthOne(3L).withColumn("content", lit("JUNK".getBytes("US-ASCII"))))
    val jr = junk.select("transcoded", "content").head
    assert(!jr.getBoolean(0) && new String(jr.getAs[Array[Byte]](1), "US-ASCII") == "JUNK")
  }

  test("explicit quality makes the encode deterministic; decode is stable per JDK") {
    val media = synthOne(7L)
    val a = Multimodal.transcodeJpeg(media).select("content").head.getAs[Array[Byte]](0)
    val b = Multimodal.transcodeJpeg(media).select("content").head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b), "same input + explicit quality => same bytes")
    val g1 = decodedGrays(a)
    val g2 = decodedGrays(b)
    assert(g1.toSeq == g2.toSeq)
  }

  test("near-dup chain through the LOSSY codec: planted twins survive JPEG, nothing else joins") {
    // The full crawl-image chain — synth PNGs + one-pixel twins → REAL
    // JPEG transcode → REAL decode → luminance-grid features → centered
    // sign-LSH near-dup — asserting the DEDUP DECISION is codec-noise
    // robust on the planted corpus: the pair set equals exactly the
    // planted twin set. Runs at GATE SF (sf0.1: 500 base images + 250
    // twins — r16 ran sf0.001 because the mod-257 generator collided
    // cross-seed at this density; the r17 mix32 generator holds the max
    // cross-seed cosine at ~0.92 over 15 001 seeds, and the no-wrap
    // perturb keeps every twin ≥ 0.9999 pre-JPEG). Threshold 0.97 leaves
    // margin for JPEG noise at q=0.75 on both sides. Not DuckDB-gated BY
    // DESIGN — the decode is lossy, so no SQL oracle can re-derive the
    // features; per-JDK determinism makes the spec the right gate (the
    // q334 dims row covers the cross-engine half of the JPEG leg).
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") % 10 === 0)
    val ids = docs.select(col("doc_id").as("media_id"),
        col("doc_id").as("seed"), lit(false).as("perturb"))
      .unionByName(docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("media_id"),
          col("doc_id").as("seed"), lit(true).as("perturb")))
    val jp = Multimodal.transcodeJpeg(Multimodal.syntheticGrayPngs(ids))
    val feats = Multimodal.extractImageFeatures(
        jp.select(col("media_id"), col("content")), gridW = 8, gridH = 8)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val got = Similarity.cosineNearDupPairsLsh(feats, "vec_id", "embedding",
        threshold = 0.97, dim = 64, bandBits = 3, bands = 32, centerForBuckets = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = docs.filter(col("doc_id") % 20 === 0).collect().map(_.getLong(0))
      .map(i => (i, i + 1000000L)).sorted.toSeq
    assert(got == want,
      s"JPEG near-dup decision drifted: missing=${want.diff(got)} extra=${got.diff(want)}")
  }

  private def decodedGrays(bytes: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
      .map(_ & 0xff)
  }

  test("fixture pin: decoded luminance of the seed-7 image at quality 0.75") {
    // The committed fingerprint of decode(encode(synthetic seed-7 8x8))
    // under this JDK's ImageIO at explicit quality 0.75. Lossy-codec
    // outputs are NOT cross-engine-oracle-expressible, but they ARE
    // deterministic per JDK — a quality drift, chroma-subsampling
    // change, or codec swap moves these values and fails loudly. The
    // PNG-side values (pre-JPEG) come from the mix32 closed form
    // (Multimodal.synthGray scaladoc), seed 7.
    val bytes = Multimodal.transcodeJpeg(synthOne(7L))
      .select("content").head.getAs[Array[Byte]](0)
    val got = decodedGrays(bytes)
    assert(got.length == 64)
    assert(got.toSeq == JpegFixture.Seed7Quality075.toSeq,
      s"decoded luminance drifted: ${got.mkString(",")}")
  }
}
