package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The decode /
  * feature-extract step runs per-partition (one codec context per
  * partition, batch-amortized). Two REAL public byte formats are decoded
  * end-to-end — PPM P6 (netpbm binary RGB; public spec, trivially
  * self-describing) and canonical-header WAV PCM16 (RIFF chunks) — so the
  * pipeline exercises an actual parse of actual image/audio bytes, not a
  * hash of them. Heavier codecs (JPEG/FLAC/video) plug in through the
  * same [[Multimodal.Decoder]] seam: per-partition init, bytes in, fixed
  * feature vector out.
  */
object Multimodal {

  /** Typed metadata carried with every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("byte_len", LongType, nullable = false),
    StructField("sha", StringType, nullable = false)))

  /** Feature row produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private val synthSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** The pluggable decode step: bytes in, feature vector out. One
    * instance serves a whole partition (a real codec holds its native
    * context here).
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): Array[Double]
  }

  // ------------------------------------------------------------ PPM P6

  /** Encode an RGB image as PPM P6: ASCII header `P6\n<w> <h>\n255\n`
    * followed by 3·w·h raw channel bytes (the netpbm binary format).
    */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    s"P6\n$w $h\n255\n".getBytes(US_ASCII) ++ rgb
  }

  /** Parsed PPM header: dimensions plus the offset of the raw RGB data. */
  private final case class PpmHeader(w: Int, h: Int, dataPos: Int)

  /** Whitespace-and-comment-tolerant PPM P6 ASCII header parse (magic,
    * width, height, maxval, then exactly one whitespace byte), validating
    * that exactly 3·w·h pixel bytes follow.
    */
  private def parsePpmHeader(payload: Array[Byte]): PpmHeader = {
    var pos = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWs(): Unit = {
      var go = true
      while (go && pos < payload.length) {
        if (isWs(payload(pos))) pos += 1
        else if (payload(pos) == '#') { // comment runs to end-of-line
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < payload.length && !isWs(payload(pos))) pos += 1
      new String(payload, start, pos - start, US_ASCII)
    }
    require(token() == "P6", "not a PPM P6 payload")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
    pos += 1 // exactly ONE whitespace byte after maxval, per the spec
    require(payload.length - pos == 3 * w * h,
      s"pixel data is ${payload.length - pos} bytes, want ${3 * w * h}")
    PpmHeader(w, h, pos)
  }

  /** Real PPM P6 parser: header via [[parsePpmHeader]], then the raw RGB
    * triplets. Features: [width, height, sum_r, sum_g, sum_b] —
    * integer-exact, so an oracle can reproduce them from the generation
    * parameters without decoding.
    */
  object PpmDecoder extends Decoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      val hd = parsePpmHeader(payload)
      val n = hd.w * hd.h
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < n) {
        sr += payload(hd.dataPos + 3 * i) & 0xff
        sg += payload(hd.dataPos + 3 * i + 1) & 0xff
        sb += payload(hd.dataPos + 3 * i + 2) & 0xff
        i += 1
      }
      Array(hd.w.toDouble, hd.h.toDouble, sr.toDouble, sg.toDouble, sb.toDouble)
    }
  }

  /** Perceptual average-hash over decoded pixels — the image near-dup
    * fingerprint: nearest-neighbor downsample to a 4×4 grid (sample
    * (gx, gy) reads pixel (⌊gx·w/4⌋, ⌊gy·h/4⌋)), per-sample gray = r+g+b
    * (integer, no luma weights — keeps every engine bit-identical), bit
    * i = gy·4+gx set iff 16·gray_i > Σgray (strict, cross-multiplied so
    * the mean is never materialized as a float). 16 bits keeps the
    * closed-form oracle tractable; a production 64-bit dHash is the same
    * loop over an 8×8 grid. Feature: [phash].
    */
  object PhashDecoder extends Decoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      val hd = parsePpmHeader(payload)
      val gray = new Array[Long](16)
      var total = 0L
      var i = 0
      while (i < 16) {
        val x = (i % 4) * hd.w / 4
        val y = (i / 4) * hd.h / 4
        val p = hd.dataPos + 3 * (y * hd.w + x)
        gray(i) = (payload(p) & 0xff).toLong + (payload(p + 1) & 0xff) +
          (payload(p + 2) & 0xff)
        total += gray(i)
        i += 1
      }
      var phash = 0L
      i = 0
      while (i < 16) {
        if (16L * gray(i) > total) phash |= 1L << i
        i += 1
      }
      Array(phash.toDouble)
    }
  }

  // --------------------------------------------------------- WAV PCM16

  /** Encode 16-bit little-endian PCM with the canonical 44-byte RIFF
    * header (RIFF size WAVE, `fmt ` 16-byte PCM block, `data`).
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(US_ASCII))
      .put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes(US_ASCII)).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** The shared RIFF/WAVE chunk walk both WAV decoders run: validates
    * the magics, skips unknown chunks with odd-size padding (per RIFF),
    * reads the PCM16 `fmt ` block and the `data` samples.
    */
  private def parseWavPcm16(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def str4(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, US_ASCII)
    }
    require(str4() == "RIFF", "not a RIFF payload")
    bb.getInt // declared riff size; chunk walk below is authoritative
    require(str4() == "WAVE", "not a WAVE form")
    var rate = 0; var ch = 0
    var samples: Array[Short] = null
    while (rate == 0 || samples == null) {
      require(bb.remaining() >= 8, "missing fmt/data chunk")
      val id = str4(); val size = bb.getInt
      id match {
        case "fmt " =>
          require(bb.getShort == 1, "PCM only")
          ch = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          require(bb.getShort == 16, "16-bit only")
          if (size > 16) bb.position(bb.position() + size - 16)
        case "data" =>
          val n = size / 2
          val arr = new Array[Short](n)
          var i = 0
          while (i < n) { arr(i) = bb.getShort; i += 1 }
          samples = arr
        case _ => // unknown chunk: skip, odd sizes pad to even
          bb.position(bb.position() + size + (size & 1))
      }
    }
    (rate, ch, samples)
  }

  /** Real RIFF/WAVE decoder over [[parseWavPcm16]]'s chunk walk.
    * Features: [sample_rate, channels, n_samples, sum, min, max] —
    * integer-exact.
    */
  object WavDecoder extends Decoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      val (rate, ch, samples) = parseWavPcm16(payload)
      var s = 0L; var mn = 0L; var mx = 0L
      if (samples.nonEmpty) { mn = samples(0); mx = samples(0) }
      samples.foreach { v =>
        s += v; if (v < mn) mn = v; if (v > mx) mx = v
      }
      Array(rate.toDouble, ch.toDouble, samples.length.toDouble,
        s.toDouble, mn.toDouble, mx.toDouble)
    }
  }

  /** Windowed audio features over the decoded PCM — the
    * voice-activity-detection primitives every audio curation pipeline
    * computes before anything model-shaped: total energy Σs², zero
    * crossings (consecutive samples changing sign — the cheap
    * pitch/noise discriminator), and the peak energy over
    * non-overlapping `frame`-sample windows (tail partial window
    * included) — the statistic VAD thresholds against. Features:
    * [n_samples, n_frames, energy, zcr, max_frame_energy], all exact
    * integers.
    */
  final class WavVadDecoder(frame: Int) extends Decoder {
    require(frame >= 1, s"frame must be >= 1, got $frame")
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      val (_, _, samples) = parseWavPcm16(payload)
      val n = samples.length
      var energy = 0L; var zcr = 0L
      var maxFe = 0L; var fe = 0L
      var i = 0
      while (i < n) {
        val v = samples(i).toLong
        energy += v * v
        fe += v * v
        if (i > 0 && (samples(i - 1) < 0) != (samples(i) < 0)) zcr += 1
        if ((i + 1) % frame == 0 || i == n - 1) {
          if (fe > maxFe) maxFe = fe
          fe = 0L
        }
        i += 1
      }
      Array(n.toDouble, ((n + frame - 1) / frame).toDouble,
        energy.toDouble, zcr.toDouble, maxFe.toDouble)
    }
  }

  // ------------------------------------------------- Y4M (YUV4MPEG2)

  /** Encode planar 4:2:0 frames as a real YUV4MPEG2 stream: the ASCII
    * stream header `YUV4MPEG2 W<w> H<h> F<num>:<den> C420jpeg\n`, then
    * per frame the `FRAME\n` marker followed by the raw Y (w·h bytes),
    * U and V (w/2 · h/2 bytes each) planes — the uncompressed video
    * interchange format ffmpeg/mpv/x264 all speak.
    */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"C420 needs positive even dimensions, got ${w}x$h")
    val frameBytes = w * h * 3 / 2
    frames.foreach(f => require(f.length == frameBytes,
      s"frame is ${f.length} bytes, want $frameBytes"))
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen C420jpeg\n".getBytes(US_ASCII)
    val marker = "FRAME\n".getBytes(US_ASCII)
    val bb = ByteBuffer.allocate(
      header.length + frames.map(marker.length + _.length).sum)
    bb.put(header)
    frames.foreach { f => bb.put(marker); bb.put(f) }
    bb.array()
  }

  /** Real YUV4MPEG2 parser with FRAME SAMPLING — the video analogue of
    * the PPM/WAV decoders, plus the one operation video pipelines add:
    * decode every `every`-th frame and skip the rest byte-exactly (the
    * plane sizes from the header make skipping O(1) per frame — no
    * decode work is paid for unsampled frames, which is the whole point
    * of frame sampling at 100 TB). The header parse is tag-order
    * tolerant (W/H/F/C read wherever they appear; I/A/X tags skipped,
    * per spec), accepts `FRAME` markers with parameters, and rejects
    * non-4:2:0 chroma layouts loudly. Features:
    * [w, h, fps_num, fps_den, n_frames, n_sampled, sum_y, sum_u, motion]
    * — sum_y/sum_u over SAMPLED frames' luma/chroma planes (pins the
    * plane offsets: a wrong stride corrupts them), and motion = Σ per
    * pixel |Y_t − Y_prev| between consecutive sampled frames (the
    * temporal-activity signal scene-change detection thresholds on).
    * All integer-exact, closed-form over the fixture generator.
    */
  final class Y4mFrameSampler(every: Int) extends Decoder {
    require(every >= 1, s"sample stride must be >= 1, got $every")
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      var pos = 0
      def line(): String = {
        val start = pos
        while (pos < payload.length && payload(pos) != '\n') pos += 1
        require(pos < payload.length, "unterminated Y4M line")
        pos += 1
        new String(payload, start, pos - 1 - start, US_ASCII)
      }
      val header = line().split(' ')
      require(header.head == "YUV4MPEG2", "not a YUV4MPEG2 stream")
      var w = -1; var h = -1; var fn = -1; var fd = -1; var c = "420jpeg"
      header.tail.filter(_.nonEmpty).foreach { tag =>
        (tag.head, tag.tail) match {
          case ('W', v) => w = v.toInt
          case ('H', v) => h = v.toInt
          case ('F', v) =>
            val nd = v.split(':'); require(nd.length == 2, s"bad F tag $tag")
            fn = nd(0).toInt; fd = nd(1).toInt
          case ('C', v) => c = v
          case _ => () // I (interlacing), A (aspect), X (extension): skipped
        }
      }
      require(w > 0 && h > 0 && fn > 0 && fd > 0,
        s"missing/invalid W/H/F header tags (got ${w}x$h @ $fn:$fd)")
      require(c.startsWith("420"), s"only C420 chroma supported, got C$c")
      require(w % 2 == 0 && h % 2 == 0, s"C420 needs even dims, got ${w}x$h")
      val ySize = w * h; val cSize = ySize / 4
      var nFrames = 0L; var nSampled = 0L
      var sumY = 0L; var sumU = 0L; var motion = 0L
      var prevYPos = -1
      while (pos < payload.length) {
        val fl = line()
        require(fl == "FRAME" || fl.startsWith("FRAME "),
          s"expected FRAME marker, got '$fl'")
        require(payload.length - pos >= ySize + 2 * cSize,
          "truncated frame payload")
        if (nFrames % every == 0) {
          var i = 0
          while (i < ySize) { sumY += payload(pos + i) & 0xff; i += 1 }
          i = 0
          while (i < cSize) { sumU += payload(pos + ySize + i) & 0xff; i += 1 }
          if (prevYPos >= 0) {
            i = 0
            while (i < ySize) {
              motion += math.abs(
                (payload(pos + i) & 0xff) - (payload(prevYPos + i) & 0xff))
              i += 1
            }
          }
          prevYPos = pos
          nSampled += 1
        }
        pos += ySize + 2 * cSize
        nFrames += 1
      }
      Array[Double](w.toDouble, h.toDouble, fn.toDouble, fd.toDouble,
        nFrames.toDouble, nSampled.toDouble, sumY.toDouble, sumU.toDouble,
        motion.toDouble)
    }
  }

  // --------------------------------------------------- box-filter resize

  /** Exact box-filter downscale to a 2×2 grid — the resize kernel, as
    * opposed to [[PhashDecoder]]'s nearest-neighbor SAMPLING: every
    * source pixel lands in exactly one output cell (cell gx covers
    * x ∈ [⌊gx·w/2⌋, ⌊(gx+1)·w/2⌋), likewise y), the cell value is the
    * integer floor-mean of its pixels' gray (r+g+b) — so no pixel is
    * dropped and no float enters the kernel, keeping the result
    * bit-identical across engines. Features:
    * [w, h, m00, m01, m10, m11] (row-major, m{gy}{gx}). A production
    * resize to n×n is the same partition with interpolated boundary
    * weights; the exact-coverage variant keeps the oracle integer.
    */
  object BoxResizeDecoder extends Decoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      val hd = parsePpmHeader(payload)
      require(hd.w >= 2 && hd.h >= 2,
        s"2x2 box resize needs source dims >= 2x2, got ${hd.w}x${hd.h}" +
          " (a 1-wide/1-tall image leaves a cell with zero coverage)")
      val out = new Array[Double](6)
      out(0) = hd.w.toDouble; out(1) = hd.h.toDouble
      var gy = 0
      while (gy < 2) {
        var gx = 0
        while (gx < 2) {
          val x0 = gx * hd.w / 2; val x1 = (gx + 1) * hd.w / 2
          val y0 = gy * hd.h / 2; val y1 = (gy + 1) * hd.h / 2
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = hd.dataPos + 3 * (y * hd.w + x)
              s += (payload(p) & 0xff) + (payload(p + 1) & 0xff) +
                (payload(p + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          out(2 + gy * 2 + gx) =
            (s / ((x1 - x0).toLong * (y1 - y0))).toDouble
          gx += 1
        }
        gy += 1
      }
      out
    }
  }

  // -------------------------------------------------- fixture synthesis

  /** Deterministic media fixtures, encoded through the REAL encoders so
    * the decode stage parses real format bytes. Per id: a (2+id%7) ×
    * (2+id%5) RGB image whose j-th channel byte is (id·31 + 7j) mod 256,
    * and a 16+id%17-sample mono 8 kHz PCM16 clip whose j-th sample is
    * ((id·131 + 17j) mod 2048) − 1024. Every derived feature has a
    * closed form over id, so a SQL oracle checks the encode→decode round
    * trip byte-exactly without itself decoding anything.
    */
  def synthPpm(ids: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(synthSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (2 + id % 7).toInt
        val h = (2 + id % 5).toInt
        val rgb = Array.tabulate(3 * w * h)(j => ((id * 31 + 7L * j) % 256).toByte)
        Row(id, encodePpm(w, h, rgb))
      }
    }
  }

  def synthWav(ids: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(synthSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (16 + id % 17).toInt
        val samples = Array.tabulate(n)(j =>
          (((id * 131 + 17L * j) % 2048) - 1024).toShort)
        Row(id, encodeWavPcm16(8000, 1, samples))
      }
    }
  }

  /** The video fixture: a (2·(1+id%3)) × (2·(1+id%2)) C420 clip of
    * 3+id%4 frames at 25:1, encoded through the REAL Y4M encoder. Plane
    * bytes are per-plane affine residues — frame t's Y byte j is
    * (id·37 + 11t + 5j) mod 256, U is (id·53 + 13t + 3j) mod 256, V is
    * (id·29 + 7t + 9j) mod 256 — so every sampled-frame sum and the
    * inter-frame motion total have closed forms over id for the oracle.
    */
  def synthY4m(ids: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(synthSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (2 * (1 + id % 3)).toInt
        val h = (2 * (1 + id % 2)).toInt
        val nf = (3 + id % 4).toInt
        val ySize = w * h; val cSize = ySize / 4
        val frames = Seq.tabulate(nf) { t =>
          val f = new Array[Byte](ySize + 2 * cSize)
          var j = 0
          while (j < ySize) {
            f(j) = ((id * 37 + 11L * t + 5L * j) % 256).toByte; j += 1
          }
          j = 0
          while (j < cSize) {
            f(ySize + j) = ((id * 53 + 13L * t + 3L * j) % 256).toByte; j += 1
          }
          j = 0
          while (j < cSize) {
            f(ySize + cSize + j) = ((id * 29 + 7L * t + 9L * j) % 256).toByte
            j += 1
          }
          f
        }
        Row(id, encodeY4m(w, h, 25, 1, frames))
      }
    }
  }

  /** Wrap any binary-bearing frame into the media model: payload +
    * length + content hash (the metadata extraction is pure SQL and
    * codegen'd; only `decode` needs bytes-in-JVM).
    */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("payload"),
      lit(mediaType).as("media_type"),
      octet_length(col(binCol)).cast("long").as("byte_len"),
      sha2(col(binCol), 256).as("sha"))

  /** Per-partition decode → features. mapPartitions keeps one decoder
    * instance per partition (where a real codec would hold its native
    * context) and streams rows through it.
    */
  def extractFeatures(media: DataFrame, decoder: Decoder): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media_type", "byte_len", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val feat = decoder.decode(r.getAs[Array[Byte]]("payload"),
            r.getAs[String]("media_type"))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            r.getAs[Long]("byte_len"), feat.toSeq)
        }
      }
  }
}
