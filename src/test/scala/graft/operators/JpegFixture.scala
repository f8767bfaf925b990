package graft.operators

/** Committed JPEG decode fingerprint (see JpegSpec's fixture-pin test):
  * decode(encodeJpeg(syntheticGrayPng(seed = 7), quality = 0.75)) under
  * this JDK's ImageIO, luminance channel, row-major. Harvested once and
  * committed — lossy-codec bytes are not cross-engine-oracle-expressible
  * but ARE deterministic per JDK, so any quality drift, subsampling
  * change, or codec swap moves these values and fails the spec loudly. */
object JpegFixture {
  val Seed7Quality075: Array[Int] = Array(
    18, 22, 40, 42, 49, 51, 69, 73, 82, 83, 93, 102, 111, 126, 125, 134,
    147, 146, 167, 173, 186, 175, 209, 192, 201, 223, 221, 231, 237, 248, 0, 9,
    21, 22, 37, 38, 51, 58, 70, 76, 78, 83, 93, 103, 101, 125, 118, 138,
    143, 147, 167, 175, 176, 174, 202, 196, 204, 223, 217, 227, 240, 255, 0, 13)
}
