package graft.operators

/** Pure-JVM container-header parsing for multimodal columns: PNG
  * dimensions from the IHDR chunk and WAV sample-rate/duration from
  * the RIFF fmt/data chunks. No codecs involved — these are byte-level
  * header reads, so width/height/sample_rate come from the ACTUAL
  * payload bytes even in this codec-less container; only the sample
  * decode (pixels/PCM → features) remains stubbed
  * (Multimodal.decodeStub).
  *
  * All readers are defensive: any malformed/truncated header yields
  * None, never an exception — at 100 TB a corrupt blob must degrade to
  * a null-metadata row, not kill the stage.
  */
object MediaHeaders {

  final case class PngInfo(width: Int, height: Int)
  final case class JpegInfo(width: Int, height: Int, progressive: Boolean)
  final case class WavInfo(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, durationMs: Long)

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u8(b: Byte): Int = b & 0xff

  /** Big-endian uint32 at offset (PNG chunk fields). */
  private def be32(b: Array[Byte], off: Int): Long =
    (u8(b(off)).toLong << 24) | (u8(b(off + 1)) << 16) |
      (u8(b(off + 2)) << 8) | u8(b(off + 3))

  /** Little-endian uint32 / uint16 at offset (RIFF chunk fields). */
  private def le32(b: Array[Byte], off: Int): Long =
    (u8(b(off + 3)).toLong << 24) | (u8(b(off + 2)) << 16) |
      (u8(b(off + 1)) << 8) | u8(b(off))
  private def le16(b: Array[Byte], off: Int): Int =
    (u8(b(off + 1)) << 8) | u8(b(off))

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, "US-ASCII")

  /** PNG: 8-byte signature, then the IHDR chunk (always first):
    * length(4 BE) + "IHDR" + width(4 BE) + height(4 BE) + ...
    */
  /** Container-format sniff from magic numbers alone — the ingest
    * gate that distrusts declared MIME/kind columns: PNG signature,
    * JPEG SOI, RIFF/WAVE, MP4 ftyp box, else "unknown". Reads ≤ 12
    * bytes; never parses past the signature.
    */
  def sniffFormat(bytes: Array[Byte]): String = {
    def b(i: Int) = bytes(i) & 0xff
    if (bytes == null || bytes.length < 4) "unknown"
    else if (bytes.length >= 8 && b(0) == 0x89 && b(1) == 0x50 &&
      b(2) == 0x4e && b(3) == 0x47) "png"
    else if (b(0) == 0xff && b(1) == 0xd8) "jpeg"
    else if (bytes.length >= 12 && b(0) == 'R' && b(1) == 'I' &&
      b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' &&
      b(10) == 'V' && b(11) == 'E') "wav"
    else if (bytes.length >= 12 && b(4) == 'f' && b(5) == 't' &&
      b(6) == 'y' && b(7) == 'p') "mp4"
    else "unknown"
  }

  def parsePng(bytes: Array[Byte]): Option[PngInfo] =
    if (bytes == null || bytes.length < 24) None
    else if (!bytes.take(8).sameElements(PngSignature)) None
    else if (ascii(bytes, 12, 4) != "IHDR") None
    else {
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some(PngInfo(w.toInt, h.toInt))
    }

  /** JPEG: marker walk from SOI (FFD8) to the first frame header.
    * Dimensions live in the SOF segment: baseline SOF0, progressive
    * SOF2, and the other SOFn variants (everything in C0–CF except the
    * non-frame C4/C8/CC) carry `len(2 BE) precision(1) height(2 BE)
    * width(2 BE)`. Real corpora are mostly JPEG, so this walk — not
    * the PNG path — is the one that matters at scale; like the others
    * it reads O(header) bytes and never decodes entropy-coded data.
    */
  def parseJpeg(bytes: Array[Byte]): Option[JpegInfo] = {
    if (bytes == null || bytes.length < 4) return None
    if (u8(bytes(0)) != 0xff || u8(bytes(1)) != 0xd8) return None // SOI
    var off = 2
    while (off + 3 < bytes.length) {
      if (u8(bytes(off)) != 0xff) return None // desynced marker stream
      var m = off + 1
      while (m < bytes.length && u8(bytes(m)) == 0xff) m += 1 // fill bytes
      if (m >= bytes.length) return None
      val marker = u8(bytes(m))
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no SOF seen
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off = m + 1 // standalone markers carry no length
      } else {
        if (m + 2 >= bytes.length) return None
        val len = (u8(bytes(m + 1)) << 8) | u8(bytes(m + 2))
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (m + 7 >= bytes.length) return None
          val h = (u8(bytes(m + 4)) << 8) | u8(bytes(m + 5))
          val w = (u8(bytes(m + 6)) << 8) | u8(bytes(m + 7))
          return if (w <= 0 || h <= 0) None
          else Some(JpegInfo(w, h, progressive = marker == 0xc2))
        }
        off = m + 1 + len
      }
    }
    None
  }

  /** WAV: "RIFF" + size + "WAVE", then a chunk walk for "fmt " (format
    * fields) and "data" (payload size → duration via byte rate).
    */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    if (ascii(bytes, 0, 4) != "RIFF" || ascii(bytes, 8, 4) != "WAVE") return None
    var off = 12
    var walkable = true
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataSize: Option[Long] = None
    while (walkable && off + 8 <= bytes.length &&
      (fmt.isEmpty || dataSize.isEmpty)) {
      val id = ascii(bytes, off, 4)
      val size = le32(bytes, off + 4)
      if (id == "fmt " && off + 24 <= bytes.length) {
        val channels = le16(bytes, off + 10)
        val rate = le32(bytes, off + 12)
        val byteRate = le32(bytes, off + 16)
        val bits = le16(bytes, off + 22)
        if (channels > 0 && rate > 0 && rate <= Int.MaxValue)
          fmt = Some((channels, rate.toInt, bits, byteRate))
      } else if (id == "data") {
        dataSize = Some(size)
      }
      // chunks are word-aligned: odd sizes carry a pad byte; a declared
      // size past the buffer (or overflowing) ends the walk — whatever
      // was parsed so far stands
      val step = 8L + size + (size & 1L)
      if (step <= 0 || off + step > bytes.length) walkable = false
      else off += step.toInt
    }
    (fmt, dataSize) match {
      case (Some((ch, rate, bits, byteRate)), Some(ds)) =>
        val br = if (byteRate > 0) byteRate
          else rate.toLong * ch * math.max(bits / 8, 1)
        Some(WavInfo(ch, rate, bits,
          if (br > 0) ds * 1000L / br else 0L))
      case _ => fmtOnly(fmt)
    }
  }

  private def fmtOnly(fmt: Option[(Int, Int, Int, Long)]): Option[WavInfo] =
    fmt.map { case (ch, rate, bits, _) => WavInfo(ch, rate, bits, 0L) }

  final case class Mp4Info(brand: String, durationMs: Long,
                           width: Int, height: Int, nTracks: Int)

  /** MP4/ISO-BMFF: a box walk, no demuxing. Boxes are
    * `size(4 BE) type(4 ascii) payload`; `size == 1` means a 64-bit
    * largesize follows (skipped defensively — a header box never needs
    * it). Reads `ftyp` (major brand), `moov/mvhd` (timescale +
    * duration → ms) and each `moov/trak/tkhd` (track dims, 16.16
    * fixed-point; audio tracks carry 0×0, so dims come from the first
    * track with nonzero width). Like the other parsers this is
    * O(header) — `mdat` is skipped by size, the sample data is never
    * touched, and any malformed/truncated structure yields None.
    *
    * Reference stores raw media paths/URLs as opaque columns (e.g.
    * data lake ingest in ingestion/fetch_data.py); the box walk is
    * the Spark-side metadata step a real video corpus needs before
    * any GPU decode.
    */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes == null || bytes.length < 16) return None
    if (ascii(bytes, 4, 4) != "ftyp") return None
    val brand = ascii(bytes, 8, 4)
    var durationMs = -1L
    var width = 0; var height = 0; var nTracks = 0
    // walk children of [from, until); returns false on malformed sizes
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val size = be32(bytes, off)
        if (size == 1 || size < 8 || off + size > until) return size == 0
        val typ = ascii(bytes, off + 4, 4)
        val p = off + 8 // payload start
        typ match {
          case "moov" if depth == 0 =>
            if (!walk(p, off + size.toInt, 1)) return false
          case "trak" if depth == 1 =>
            nTracks += 1
            if (!walk(p, off + size.toInt, 2)) return false
          case "mvhd" if depth == 1 && p + 20 <= until =>
            val v = u8(bytes(p))
            // v0: ver/flags(4) c(4) m(4) timescale(4) duration(4)
            // v1: ver/flags(4) c(8) m(8) timescale(4) duration(8)
            if (v == 0 && p + 20 <= until) {
              val ts = be32(bytes, p + 12)
              val dur = be32(bytes, p + 16)
              if (ts > 0) durationMs = dur * 1000L / ts
            } else if (v == 1 && p + 32 <= until) {
              val ts = be32(bytes, p + 20)
              val dur = (be32(bytes, p + 24) << 32) | be32(bytes, p + 28)
              if (ts > 0) durationMs = dur * 1000L / ts
            }
          case "tkhd" if depth == 2 =>
            val v = u8(bytes(p))
            // width/height are 16.16 fixed point at the end of the box:
            // v0 payload @76/@80, v1 @88/@92
            val wOff = if (v == 0) p + 76 else p + 88
            if (wOff + 8 <= until && width == 0) {
              val w = (be32(bytes, wOff) >> 16).toInt
              val h = (be32(bytes, wOff + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case _ => () // ftyp/mdat/free/udta/mdia/...: skip by size
        }
        off += size.toInt
      }
      true
    }
    if (!walk(0, bytes.length, 0)) return None
    if (durationMs < 0) None
    else Some(Mp4Info(brand, durationMs, width, height, nTracks))
  }

  // ------------------------------------------------------------------
  // Fixture builders — REAL header bytes for tests and the synthetic
  // media table (the payload after the header is arbitrary noise; the
  // header fields are what the parsers read).
  // ------------------------------------------------------------------

  /** Minimal valid-header PNG: signature + IHDR + `payloadLen` noise
    * bytes standing in for the compressed image data.
    */
  def pngBytes(width: Int, height: Int, payloadLen: Int = 32,
               noiseSeed: Long = 42L): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 25 + payloadLen)
    buf.put(PngSignature)
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(8.toByte).put(6.toByte) // bit depth, color type RGBA
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
    buf.putInt(0) // crc (unchecked by the parser, as by most readers)
    var h = noiseSeed
    (0 until payloadLen).foreach { _ =>
      h = h * 6364136223846793005L + 1442695040888963407L
      buf.put((h >>> 56).toByte)
    }
    buf.array()
  }

  /** Minimal valid WAV: RIFF/WAVE + fmt (PCM) + data chunk of
    * `nSamples` samples — zeros by default, or deterministic LCG noise
    * when `noiseSeed != 0` (so PCM-decode tests read real non-trivial
    * amplitudes).
    */
  def wavBytes(sampleRate: Int, nSamples: Int, channels: Int = 1,
               bitsPerSample: Int = 16, noiseSeed: Long = 0L): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort).putShort(channels.toShort)
    buf.putInt(sampleRate).putInt(sampleRate * blockAlign)
    buf.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    if (noiseSeed != 0L && bitsPerSample == 16) {
      var h = noiseSeed
      (0 until nSamples * channels).foreach { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        buf.putShort((h >>> 48).toShort)
      }
    }
    buf.array()
  }

  /** 16-bit mono PCM WAV with every sample at CONSTANT `amplitude` —
    * the planted decode twin whose PCM statistics are closed-form
    * integers: meanAmp = rms = maxAbs = amplitude/32768 EXACTLY
    * (dyadic values; repeated addition of equal dyadics and the sqrt
    * of an exact square are both exact in IEEE doubles), zero
    * crossings = 0. Multiplying the decoded stats back by 32768
    * recovers the integer amplitude — DuckDB-replayable arithmetic
    * over a REAL byte-level decode.
    */
  def constWavBytes(sampleRate: Int, nSamples: Int,
                    amplitude: Int): Array[Byte] = {
    require(amplitude > 0 && amplitude <= 32767,
      s"amplitude out of 16-bit range: $amplitude")
    val arr = wavBytes(sampleRate, nSamples) // header + zeroed payload
    val bb = java.nio.ByteBuffer.wrap(arr)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      bb.putShort(44 + 2 * i, amplitude.toShort)
      i += 1
    }
    arr
  }

  /** SOLID-COLOR PNG (every pixel = (r,g,b)) — the image-side planted
    * decode twin: PNG is lossless, so the decoded pixel statistics
    * are closed-form (meanR/G/B = the planted ints, luma stddev = 0)
    * and replayable as arithmetic on the source table.
    */
  def solidPngBytes(width: Int, height: Int,
                    r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A 9×8-pixel gray PNG whose dHash is EXACTLY `hash`: at that
    * size every dHash grid block is a single pixel, so bit k (row
    * k/8, col k%8) is `luma(r,c) < luma(r,c+1)` over pixels we set
    * directly — a ±10 gray walk per row (PNG lossless, gray luma =
    * the gray value exactly) encodes any 64-bit pattern. The
    * closed-form fixture behind the q344 dHash twin: hamming
    * distances between planted images equal popcount arithmetic on
    * the planned patterns.
    */
  def dhashPatternPngBytes(hash: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      var c = 0
      while (c < 9) {
        val g = v & 0xff
        img.setRGB(c, r, (g << 16) | (g << 8) | g)
        if (c < 8) {
          val bit = (hash >>> (r * 8 + c)) & 1L
          v = if (bit == 1L) v + 10 else v - 10
        }
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 16-bit mono PCM WAV carrying a PURE SINE at `freqHz` — the
    * closed-form audio fixture: the tone frequency is exactly
    * recoverable from the payload, so byte-level DSP (Goertzel
    * detection) can be graded against arithmetic on the source
    * table, the same trick [[mp4Bytes]]/[[imageBytes]] play for
    * metadata.
    */
  def toneWavBytes(sampleRate: Int, nSamples: Int,
                   freqHz: Int): Array[Byte] = {
    val arr = wavBytes(sampleRate, nSamples) // header + zeroed payload
    val bb = java.nio.ByteBuffer.wrap(arr)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = 2.0 * math.Pi * freqHz / sampleRate
    var i = 0
    while (i < nSamples) {
      bb.putShort(44 + 2 * i,
        math.round(30000.0 * math.sin(w * i)).toShort)
      i += 1
    }
    arr
  }

  /** REAL encoded image via the JVM's own codec (`javax.imageio` —
    * present in every JRE, no new dependency): a deterministic
    * per-pixel pattern seeded by `seed`, written as `"png"` or
    * `"jpg"`. These are full decodable images, not just valid headers.
    */
  def imageBytes(width: Int, height: Int, format: String,
                 seed: Long = 42L): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var h = seed
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        h = h * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((h >>> 40) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Minimal valid MP4: `ftyp` + `moov(mvhd + trak(tkhd))` + an
    * `mdat` of deterministic noise. Real ISO-BMFF structure — every
    * field the box walk reads is genuine; only the sample data is
    * noise (a real encoder's output differs only inside mdat and in
    * the codec boxes the parser never visits).
    */
  def mp4Bytes(width: Int, height: Int, durationMs: Long,
               timescale: Int = 1000, payloadLen: Int = 32,
               noiseSeed: Long = 42L): Array[Byte] = {
    val mvhdSize = 8 + 100 // v0 mvhd payload is 100 bytes
    val tkhdSize = 8 + 84  // v0 tkhd payload is 84 bytes
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + mvhdSize + trakSize
    val mdatSize = 8 + payloadLen
    val buf = java.nio.ByteBuffer.allocate(16 + moovSize + mdatSize)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
    buf.put("isom".getBytes("US-ASCII")).putInt(0x200) // brand, version
    buf.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    buf.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
    buf.putInt(0)                              // version 0 + flags
    buf.putInt(0).putInt(0)                    // creation, modification
    buf.putInt(timescale)
    buf.putInt((durationMs * timescale / 1000L).toInt)
    buf.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    buf.putShort(0.toShort).putInt(0).putInt(0)     // reserved
    // identity matrix (9 × 4 bytes)
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0))    // pre_defined
    buf.putInt(2)                              // next_track_ID
    buf.putInt(trakSize).put("trak".getBytes("US-ASCII"))
    buf.putInt(tkhdSize).put("tkhd".getBytes("US-ASCII"))
    buf.putInt(7)                              // version 0, flags enabled
    buf.putInt(0).putInt(0)                    // creation, modification
    buf.putInt(1).putInt(0)                    // track_ID, reserved
    buf.putInt((durationMs * timescale / 1000L).toInt)
    buf.putInt(0).putInt(0)                    // reserved[2]
    buf.putShort(0.toShort).putShort(0.toShort) // layer, alternate_group
    buf.putShort(0.toShort).putShort(0.toShort) // volume, reserved
    buf.putInt(0x00010000).putInt(0).putInt(0)  // identity matrix
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    buf.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
    buf.putInt(mdatSize).put("mdat".getBytes("US-ASCII"))
    var h = noiseSeed
    (0 until payloadLen).foreach { _ =>
      h = h * 6364136223846793005L + 1442695040888963407L
      buf.put((h >>> 56).toByte)
    }
    buf.array()
  }

  /** Solid-color image — decode tests can assert exact channel means. */
  def solidImageBytes(width: Int, height: Int, rgb: Int,
                      format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }
}
