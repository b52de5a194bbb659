package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL pure-JVM BMP (uncompressed 24-bit BGR) codec — the image
  * tier's honest end-to-end decode, [[WavCodec]]'s discipline applied
  * to the perceptual family's container: [[parse]] reads the
  * BITMAPFILEHEADER + BITMAPINFOHEADER byte-for-byte (magic, declared
  * sizes, the pixel-array OFFSET — never assumed to be 54 — 4-byte
  * row stride padding, and the bottom-up/top-down row order the
  * height's SIGN selects), validates every format field, and
  * reconstructs the LOGICAL pixel grid. Every failure is a TYPED
  * reason, never a garbage row — the reference's parse-or-die
  * container discipline (`/root/reference/src/main.rs:33-104`: the
  * `ProcessingError` + `expect_*` event-grammar combinators),
  * re-expressed for BMP.
  *
  * [[build]] is the registered query's deterministic payload
  * synthesizer (the container doesn't exist in the testdata, so m16
  * manufactures a real one from the document bytes) — but the parser
  * never assumes the builder: a subset of containers store rows
  * top-down (negative height) and another subset carries a junk gap
  * between the headers and the pixel array (bfOffBits > 54), so a
  * parser that hard-coded the canonical layout or ignored the height
  * sign would misread exactly those documents and go red against the
  * oracle.
  */
object BmpCodec {

  /** A parsed 24-bit BMP: logical dimensions + the pixel bytes in
    * LOGICAL order — row-major from the TOP row, 3 bytes (B, G, R)
    * per pixel, stride padding removed. Exactly `3*width*height`
    * bytes regardless of the container's physical row order.
    */
  final case class Bmp24(width: Int, height: Int, pixels: Array[Byte])

  private val FileHeaderLen = 14
  private val InfoHeaderLen = 40

  /** Row stride: rows are padded to a 4-byte boundary. */
  private def stride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Build an uncompressed 24-bit BMP whose LOGICAL pixel bytes are
    * `raw` in row-major order (B,G,R per pixel), at the given
    * `width`. Height is `max(1, raw.length / (3*width))`: trailing
    * bytes that don't fill a full row are dropped; input shorter than
    * one row is zero-padded. `topDown` stores rows in logical order
    * under a NEGATIVE biHeight; the default stores them bottom-up
    * (the BMP-canonical order — physically REVERSED). `gap` inserts
    * junk bytes between the headers and the pixel array, advancing
    * bfOffBits — same logical image, different physical layout.
    */
  def build(raw: Array[Byte], width: Int = 25,
      topDown: Boolean = false, gap: Int = 0): Array[Byte] = {
    require(width > 0 && gap >= 0)
    val rowBytes = 3 * width
    val h = math.max(1, raw.length / rowBytes)
    val st = stride(width)
    val pixelBytes = st * h
    val off = FileHeaderLen + InfoHeaderLen + gap
    val buf = ByteBuffer.allocate(off + pixelBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(off + pixelBytes)                  // bfSize
      .putShort(0.toShort).putShort(0.toShort)   // reserved
      .putInt(off)                               // bfOffBits
    buf.putInt(InfoHeaderLen)                    // biSize
      .putInt(width)
      .putInt(if (topDown) -h else h)            // sign = row order
      .putShort(1.toShort)                       // biPlanes
      .putShort(24.toShort)                      // biBitCount
      .putInt(0)                                 // BI_RGB
      .putInt(pixelBytes)                        // biSizeImage
      .putInt(2835).putInt(2835)                 // 72 DPI
      .putInt(0).putInt(0)                       // colors used/important
    var g = 0
    while (g < gap) { buf.put(0x5a.toByte); g += 1 }
    // Physical row j holds logical row (topDown ? j : h-1-j); rows
    // beyond `raw` (short input) and the per-row stride tail are zero.
    var j = 0
    while (j < h) {
      val logical = if (topDown) j else h - 1 - j
      val from = logical * rowBytes
      val n = math.max(0, math.min(rowBytes, raw.length - from))
      if (n > 0) buf.put(raw, from, n)
      var p = n
      while (p < st) { buf.put(0.toByte); p += 1 }
      j += 1
    }
    buf.array()
  }

  /** Parse a BMP container. Left = typed failure reason; Right = the
    * validated logical pixel grid. Honors bfOffBits (gap layouts),
    * the height sign (bottom-up vs top-down), and the 4-byte row
    * stride; refuses (rather than guesses at) truncation, non-24-bit
    * depths, palettes, and compressed encodings.
    */
  def parse(bytes: Array[Byte]): Either[String, Bmp24] = {
    def u16(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 2).order(ByteOrder.LITTLE_ENDIAN)
        .getShort.toInt & 0xffff
    def i32(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN)
        .getInt
    if (bytes.length < FileHeaderLen + InfoHeaderLen)
      return Left("truncated header")
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return Left("not a BM container")
    val fileSize = i32(2).toLong & 0xffffffffL
    if (fileSize > bytes.length) return Left("truncated container")
    val offBits = i32(10).toLong & 0xffffffffL
    val biSize = i32(14)
    if (biSize < InfoHeaderLen)
      return Left(s"info header too short ($biSize)")
    val width = i32(18)
    val rawHeight = i32(22)
    if (width <= 0 || rawHeight == 0)
      return Left(s"bad dimensions ${width}x$rawHeight")
    if (u16(26) != 1) return Left("planes != 1")
    val bits = u16(28)
    if (bits != 24) return Left(s"unsupported depth $bits (want 24)")
    if (i32(30) != 0) return Left(s"unsupported compression ${i32(30)}")
    val topDown = rawHeight < 0
    val h = math.abs(rawHeight)
    val st = stride(width)
    if (offBits + st.toLong * h > bytes.length)
      return Left("truncated pixel array")
    val rowBytes = 3 * width
    val out = new Array[Byte](rowBytes * h)
    var j = 0
    while (j < h) {
      val logical = if (topDown) j else h - 1 - j
      System.arraycopy(bytes, (offBits + j.toLong * st).toInt,
        out, logical * rowBytes, rowBytes)
      j += 1
    }
    Right(Bmp24(width, h, out))
  }

  /** Perceptual average-hash (aHash) over the LOGICAL pixel grid —
    * the m07/m08 perceptual family's signature, now computed off a
    * REAL decode instead of a byte-hash stand-in, and integer-exact
    * end to end so the oracle restates it from the raw bytes:
    *
    *   - luma per pixel = B + 2·G + 4·R (the m16 channel weights —
    *     any fixed integer combination works; this one makes a
    *     channel-order misread flip the hash);
    *   - an 8×8 SAMPLE grid at (y, x) = ((gy·H) div 8, (gx·W) div 8)
    *     — sampling, not block means, keeps the oracle's restatement
    *     a flat 64-element projection;
    *   - mean = (Σ samples) div 64; bit k (row-major) set iff
    *     sample_k > mean (strict — ties vote 0 in both engines).
    *
    * Returns (mean, lo, hi): the 64 bits split into two 32-bit
    * halves, each well inside a non-negative BIGINT — packing bit 63
    * into one signed 64-bit value would make the cross-engine compare
    * depend on shift-overflow semantics; the split avoids the class.
    */
  def ahash(b: Bmp24): (Long, Long, Long) = {
    val lum = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val y = (k / 8) * b.height / 8
      val x = (k % 8) * b.width / 8
      val base = (y * b.width + x) * 3
      lum(k) = (b.pixels(base) & 0xff).toLong +
        2L * (b.pixels(base + 1) & 0xff) +
        4L * (b.pixels(base + 2) & 0xff)
      k += 1
    }
    val mean = lum.sum / 64
    var lo = 0L
    var hi = 0L
    k = 0
    while (k < 64) {
      if (lum(k) > mean) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (mean, lo, hi)
  }

  /** Integer-exact image features over the LOGICAL pixel grid — every
    * quantity a plain Long fold, so the oracle restates them from the
    * same bytes with zero FP caveats: per-channel mass (B, G, R —
    * BMP's channel order, weight-separated so a channel-order misread
    * goes red) and a position-weighted checksum
    * Σ (y+1)·(x+1)·w(c)·v with w = 1/2/4 for B/G/R — row flips,
    * stride-padding leaks, and gap misreads all move it.
    */
  def features(b: Bmp24): (Long, Long, Long, Long) = {
    var sumB = 0L; var sumG = 0L; var sumR = 0L; var wsum = 0L
    val rowBytes = 3 * b.width
    var i = 0
    val n = b.pixels.length
    while (i < n) {
      val v = (b.pixels(i) & 0xff).toLong
      val c = i % 3
      c match {
        case 0 => sumB += v
        case 1 => sumG += v
        case _ => sumR += v
      }
      val p = i / 3
      val x = p % b.width
      val y = i / rowBytes
      wsum += (y + 1).toLong * (x + 1).toLong * (1L << c) * v
      i += 1
    }
    (sumB, sumG, sumR, wsum)
  }
}
