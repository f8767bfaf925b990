package graft.operators

/** Committed JPEG decode fingerprint (see JpegSpec's fixture-pin test):
  * decode(encodeJpeg(syntheticGrayPng(seed = 7), quality = 0.75)) under
  * this JDK's ImageIO, luminance channel, row-major. Harvested once and
  * committed — lossy-codec bytes are not cross-engine-oracle-expressible
  * but ARE deterministic per JDK, so any quality drift, subsampling
  * change, or codec swap moves these values and fails the spec loudly.
  * Re-harvested r17 for the mix32 pixel generator (the r16 mod-257 form
  * collided cross-seed at sf0.1 density). */
object JpegFixture {
  val Seed7Quality075: Array[Int] = Array(
    137, 131, 190, 250, 216, 82, 174, 140, 166, 202, 171, 175, 150, 95, 50, 56,
    150, 168, 123, 166, 38, 131, 0, 71, 234, 103, 156, 166, 43, 174, 85, 255,
    86, 136, 40, 134, 20, 212, 209, 202, 193, 158, 188, 242, 79, 57, 35, 92,
    139, 4, 11, 126, 135, 116, 108, 208, 229, 81, 33, 13, 219, 101, 99, 235)
}
