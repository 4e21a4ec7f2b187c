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

  test("Y4M round trip: header, frame walk, sampling, plane sums, motion") {
    // two 2x2 C420 frames (4 Y + 1 U + 1 V bytes each), hand-valued
    val f0 = Array[Byte](10, 20, 30, 40, /*U*/ 5, /*V*/ 6)
    val f1 = Array[Byte](12, 17, 35, 40, /*U*/ 9, /*V*/ 1)
    val clip = Multimodal.encodeY4m(2, 2, 25, 1, Seq(f0, f1))
    // stride 1: both frames sampled
    val a = new Multimodal.Y4mFrameSampler(1).decode(clip, "video")
    // motion = |12-10| + |17-20| + |35-30| + |40-40| = 2+3+5+0 = 10
    assert(a.toSeq == Seq(2.0, 2.0, 25.0, 1.0, 2.0, 2.0,
      (10 + 20 + 30 + 40 + 12 + 17 + 35 + 40).toDouble, (5 + 9).toDouble, 10.0))
    // stride 2: only frame 0 sampled -> no motion pair, f1 skipped O(1)
    val b = new Multimodal.Y4mFrameSampler(2).decode(clip, "video")
    assert(b.toSeq == Seq(2.0, 2.0, 25.0, 1.0, 2.0, 1.0, 100.0, 5.0, 0.0))
  }

  test("Y4M header tolerates tag order, extra tags, FRAME params") {
    val plane = Array[Byte](1, 2, 3, 4, 5, 6)
    // tags shuffled, interlace/aspect/extension tags present, FRAME
    // marker carries a parameter — all per the published format
    val bytes = "YUV4MPEG2 C420 F30:1 Ip A1:1 H2 W2 Xextra\n".getBytes(US_ASCII) ++
      "FRAME Xk=v\n".getBytes(US_ASCII) ++ plane
    val f = new Multimodal.Y4mFrameSampler(1).decode(bytes, "video")
    assert(f.toSeq == Seq(2.0, 2.0, 30.0, 1.0, 1.0, 1.0, 10.0, 5.0, 0.0))
    // rejections: wrong magic, non-420 chroma, truncated frame
    intercept[IllegalArgumentException](new Multimodal.Y4mFrameSampler(1)
      .decode("YUV4MPEG1 W2 H2 F25:1\n".getBytes(US_ASCII), "video"))
    intercept[IllegalArgumentException](new Multimodal.Y4mFrameSampler(1)
      .decode(("YUV4MPEG2 W2 H2 F25:1 C444\n" +
        "FRAME\n").getBytes(US_ASCII) ++ Array.fill[Byte](12)(0), "video"))
    intercept[IllegalArgumentException](new Multimodal.Y4mFrameSampler(1)
      .decode("YUV4MPEG2 W2 H2 F25:1\nFRAME\n".getBytes(US_ASCII) ++
        Array[Byte](1, 2, 3), "video"))
  }

  test("box resize: exact coverage cells and floor means, odd dims") {
    // 2x2 image: each cell is one pixel, mean = its own gray
    val rgb = Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4)
    val f = Multimodal.BoxResizeDecoder.decode(
      Multimodal.encodePpm(2, 2, rgb), "image")
    assert(f.toSeq == Seq(2.0, 2.0, 3.0, 6.0, 9.0, 12.0))
    // 3x3: boundary at floor(3/2)=1 -> cells are 1x1, 1x2, 2x1, 2x2;
    // gray of pixel p = 3p (p row-major 0..8); floor means:
    // m00 = 0; m01 = (3+6)/2 = 4; m10 = (9+18)/2 = 13;
    // m11 = (12+15+21+24)/4 = 18
    val g3 = Array.tabulate(27)(j => (j / 3).toByte)
    val g = Multimodal.BoxResizeDecoder.decode(
      Multimodal.encodePpm(3, 3, g3), "image")
    assert(g.toSeq == Seq(3.0, 3.0, 0.0, 4.0, 13.0, 18.0))
    // floor division is exercised: 1x2 cell {3,6} -> 4 (not 4.5)
  }

  test("Y4M seeded-random round trip: sums/motion match direct computation") {
    val rnd = new scala.util.Random(0x412L) // deterministic
    for (_ <- 1 to 25) {
      val w = 2 * (1 + rnd.nextInt(4)); val h = 2 * (1 + rnd.nextInt(3))
      val nf = 1 + rnd.nextInt(5); val every = 1 + rnd.nextInt(3)
      val ySize = w * h; val cSize = ySize / 4
      val frames = Seq.fill(nf) {
        val f = new Array[Byte](ySize + 2 * cSize); rnd.nextBytes(f); f
      }
      val got = new Multimodal.Y4mFrameSampler(every)
        .decode(Multimodal.encodeY4m(w, h, 30, 1, frames), "video")
      val sampled = (0 until nf).filter(_ % every == 0)
      def ysum(t: Int) = (0 until ySize).map(j => frames(t)(j) & 0xff).sum.toLong
      val sumY = sampled.map(ysum).sum
      val sumU = sampled.flatMap(t =>
        (0 until cSize).map(j => (frames(t)(ySize + j) & 0xff).toLong)).sum
      val motion = sampled.sliding(2).collect { case Seq(a, b) =>
        (0 until ySize).map(j =>
          math.abs((frames(b)(j) & 0xff) - (frames(a)(j) & 0xff)).toLong).sum
      }.sum
      assert(got.toSeq == Seq(w, h, 30, 1, nf, sampled.size,
        sumY, sumU, motion).map(_.toDouble),
        s"w=$w h=$h nf=$nf every=$every")
    }
  }

  test("box resize rejects sources a 2x2 grid cannot cover") {
    intercept[IllegalArgumentException](Multimodal.BoxResizeDecoder.decode(
      Multimodal.encodePpm(1, 3, Array.fill[Byte](9)(1)), "image"))
    intercept[IllegalArgumentException](Multimodal.BoxResizeDecoder.decode(
      Multimodal.encodePpm(3, 1, Array.fill[Byte](9)(1)), "image"))
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

  test("WAV VAD features: energy, zero crossings, framed peak, tail window") {
    // 10 samples at frame=4 -> frames [4,4,2]; hand-computed:
    //   energy = 1+4+9+16 + 25+36+49+64 + 100+121 = 425
    //   frame energies: 30, 174, 221 -> peak 221
    //   signs: + - + - - + + - - +  -> 6 sign changes
    val samples = Array[Short](1, -2, 3, -4, -5, 6, 7, -8, -10, 11)
    val f = new Multimodal.WavVadDecoder(frame = 4)
      .decode(Multimodal.encodeWavPcm16(8000, 1, samples), "audio")
    assert(f.toSeq == Seq(10.0, 3.0, 425.0, 6.0, 221.0))
    // zero is non-negative: 0 -> -1 crosses, -1 -> 0 crosses back
    val g = new Multimodal.WavVadDecoder(frame = 8)
      .decode(Multimodal.encodeWavPcm16(8000, 1, Array[Short](0, -1, 0)), "audio")
    assert(g.toSeq == Seq(3.0, 1.0, 1.0, 2.0, 1.0))
    // empty clip stays total
    val e = new Multimodal.WavVadDecoder(frame = 8)
      .decode(Multimodal.encodeWavPcm16(8000, 1, Array.empty[Short]), "audio")
    assert(e.toSeq == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
  }
}
