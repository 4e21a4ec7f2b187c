package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal
import java.nio.charset.StandardCharsets.US_ASCII

/** The real-codec paths beyond what the oracle round trip covers:
  * header edge cases the synthesized fixtures never produce.
  */
class MultimodalSpec extends AnyFunSuite {

  test("PPM P6 round trip and sums") {
    val rgb = Array[Byte](10, 20, 30, 40, 50, 60) // 2x1 image
    val f = Multimodal.PpmDecoder.decode(Multimodal.encodePpm(2, 1, rgb), "image")
    assert(f.toSeq == Seq(2.0, 1.0, 50.0, 70.0, 90.0))
  }

  test("PPM header tolerates comments and mixed whitespace") {
    val rgb = Array[Byte](1, 2, 3)
    val bytes = "P6 # a comment\n# another\n 1\t1 \n255\n".getBytes(US_ASCII) ++ rgb
    val f = Multimodal.PpmDecoder.decode(bytes, "image")
    assert(f.toSeq == Seq(1.0, 1.0, 1.0, 2.0, 3.0))
    // high bytes read unsigned
    val hi = Multimodal.PpmDecoder.decode(
      Multimodal.encodePpm(1, 1, Array(0xff.toByte, 0x80.toByte, 0x00)), "image")
    assert(hi.toSeq == Seq(1.0, 1.0, 255.0, 128.0, 0.0))
    intercept[IllegalArgumentException](
      Multimodal.PpmDecoder.decode("P5\n1 1\n255\n ".getBytes(US_ASCII), "image"))
    intercept[IllegalArgumentException]( // truncated pixel data
      Multimodal.PpmDecoder.decode("P6\n2 2\n255\n123".getBytes(US_ASCII), "image"))
  }

  test("perceptual aHash: known image, strict-mean threshold, grid sampling") {
    // 4x4 image, gray rises with pixel index: pixel p has channels
    // (3p, 3p, 3p) -> gray = 9p, total = 9*120 = 1080, mean = 67.5.
    // Grid == pixels at w=h=4. Bit i set iff 16*9i > 1080 <=> i >= 8.
    val rgb = Array.tabulate(48)(j => (3 * (j / 3)).toByte)
    val f = Multimodal.PhashDecoder.decode(Multimodal.encodePpm(4, 4, rgb), "image")
    assert(f.toSeq == Seq(0xff00.toDouble)) // top 8 grid cells set
    // constant image: no gray is strictly above the mean -> hash 0
    val flat = Array.fill[Byte](12)(42)
    assert(Multimodal.PhashDecoder.decode(
      Multimodal.encodePpm(2, 2, flat), "image").toSeq == Seq(0.0))
    // non-square image exercises the floor grid map: 2x1, left pixel
    // dark, right pixel bright -> samples gx<2 read pixel 0, gx>=2 read
    // pixel 1, all four rows identical
    val lr = Array[Byte](0, 0, 0, 100, 100, 100)
    val g = Multimodal.PhashDecoder.decode(Multimodal.encodePpm(2, 1, lr), "image")
    val expected = (0 until 16).filter(i => i % 4 >= 2).map(1L << _).sum.toDouble
    assert(g.toSeq == Seq(expected))
  }

  test("WAV PCM16 round trip, negative samples, unknown chunk skip") {
    val samples = Array[Short](100, -200, 32767, -32768, 0)
    val f = Multimodal.WavDecoder.decode(
      Multimodal.encodeWavPcm16(44100, 1, samples), "audio")
    assert(f.toSeq == Seq(44100.0, 1.0, 5.0, -101.0, -32768.0, 32767.0))
    // splice an unknown odd-sized LIST chunk between fmt and data: the
    // RIFF walker must skip it (with pad byte) and still find the data
    val canonical = Multimodal.encodeWavPcm16(8000, 1, Array[Short](7, -7))
    val listChunk = "LIST".getBytes(US_ASCII) ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val spliced = canonical.take(36) ++ listChunk ++ canonical.drop(36)
    val g = Multimodal.WavDecoder.decode(spliced, "audio")
    assert(g.toSeq == Seq(8000.0, 1.0, 2.0, 0.0, -7.0, 7.0))
    intercept[IllegalArgumentException](
      Multimodal.WavDecoder.decode("RIFX".getBytes(US_ASCII) ++ canonical.drop(4), "audio"))
  }
}
