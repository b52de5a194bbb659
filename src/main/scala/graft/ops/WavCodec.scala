package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL pure-JVM RIFF/WAVE PCM codec — the honest end-to-end decode
  * path the multimodal family's stub (`Multimodal.fakeDecode`) stands
  * in for everywhere else: [[parse]] walks the container's chunk list
  * byte-for-byte (magic, declared sizes, word-alignment padding,
  * chunks in any order with unknown chunks skipped), validates the
  * format chunk, and extracts the 16-bit little-endian PCM samples.
  * Every failure is a TYPED reason, never a garbage row — the
  * reference's parse-or-die container discipline
  * (`/root/reference/src/main.rs:33-104`: the `ProcessingError` +
  * `expect_*` event-grammar combinators), re-expressed for RIFF.
  *
  * [[build]] is the registered query's deterministic payload
  * synthesizer (the container doesn't exist in the testdata, so m15
  * manufactures a real one from the document bytes) — but the parser
  * never assumes the builder: a subset of containers carry an extra
  * LIST chunk between fmt and data, so a parser that hard-coded the
  * canonical 44-byte layout would misread exactly those documents and
  * go red against the oracle.
  */
object WavCodec {

  /** A parsed PCM WAV: format-chunk fields + the decoded samples. */
  final case class WavPcm(nChannels: Int, sampleRate: Int,
      bitsPerSample: Int, samples: Array[Short])

  /** Build a canonical PCM WAV container around `pcm` (interpreted as
    * little-endian 16-bit samples; a trailing odd byte is dropped, as
    * a sample needs both). `withJunk` inserts a LIST chunk between
    * fmt and data — same logical audio, different physical layout.
    */
  def build(pcm: Array[Byte], sampleRate: Int = 8000,
      withJunk: Boolean = false): Array[Byte] = {
    val dataLen = (pcm.length / 2) * 2
    val junkPayload =
      if (withJunk) "INFOgraft-synthetic".getBytes("US-ASCII")
      else Array.empty[Byte]
    // Chunks are word-aligned: an odd-sized chunk carries a pad byte
    // that is NOT counted in its declared size.
    val junkPad = junkPayload.length % 2
    val junkChunkLen = if (withJunk) 8 + junkPayload.length + junkPad else 0
    val riffSize = 4 + (8 + 16) + junkChunkLen + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                    // audioFormat = PCM
      .putShort(1.toShort)                    // nChannels
      .putInt(sampleRate)
      .putInt(sampleRate * 2)                 // byteRate
      .putShort(2.toShort)                    // blockAlign
      .putShort(16.toShort)                   // bitsPerSample
    if (withJunk) {
      buf.put("LIST".getBytes("US-ASCII")).putInt(junkPayload.length)
        .put(junkPayload)
      if (junkPad == 1) buf.put(0.toByte)
    }
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(pcm, 0, dataLen)
    buf.array()
  }

  /** Parse a WAV container. Left = typed failure reason; Right = the
    * validated PCM. Accepts chunks in any order, skips unknown ones,
    * honors word-alignment pad bytes, and refuses (rather than
    * guesses at) truncation, non-PCM codecs, and non-16-bit samples.
    */
  def parse(bytes: Array[Byte]): Either[String, WavPcm] = {
    def ascii(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN)
        .getInt.toLong & 0xffffffffL
    def u16(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 2).order(ByteOrder.LITTLE_ENDIAN)
        .getShort.toInt & 0xffff
    if (bytes.length < 12) return Left("truncated header")
    if (ascii(0) != "RIFF") return Left("not a RIFF container")
    val riffSize = u32(4)
    if (8 + riffSize > bytes.length) return Left("truncated container")
    if (ascii(8) != "WAVE") return Left("not a WAVE form")
    val end = (8 + riffSize).toInt
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (off < end) {
      if (off + 8 > end) return Left("truncated chunk header")
      val id = ascii(off)
      val size = u32(off + 4)
      val body = off + 8
      if (body + size > end) return Left(s"truncated $id chunk")
      id match {
        case "fmt " =>
          if (size < 16) return Left("fmt chunk too short")
          val audioFormat = u16(body)
          if (audioFormat != 1)
            return Left(s"unsupported codec $audioFormat (want PCM)")
          val bits = u16(body + 14)
          if (bits != 16)
            return Left(s"unsupported sample width $bits (want 16)")
          fmt = Some((u16(body + 2), u32(body + 4).toInt, bits))
        case "data" => data = Some((body, size.toInt))
        case _ => // unknown chunk: skip (LIST, fact, cue , ...)
      }
      off = body + size.toInt + (size % 2).toInt // word-alignment pad
    }
    (fmt, data) match {
      case (None, _) => Left("missing fmt chunk")
      case (_, None) => Left("missing data chunk")
      case (Some((ch, rate, bits)), Some((dOff, dLen))) =>
        val n = dLen / 2
        val out = new Array[Short](n)
        val bb = ByteBuffer.wrap(bytes, dOff, n * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { out(i) = bb.getShort; i += 1 }
        Right(WavPcm(ch, rate, bits, out))
    }
  }

  /** Integer-exact audio features over the decoded samples — every
    * quantity a plain Long fold, so the oracle restates them from the
    * same bytes with zero FP caveats: sample count, peak |s|, total
    * |s| mass, and sign-change count ((sᵢ₋₁ < 0) ≠ (sᵢ < 0)).
    */
  def features(w: WavPcm): (Long, Long, Long, Long) = {
    var peak = 0L
    var sumAbs = 0L
    var zc = 0L
    var i = 0
    val n = w.samples.length
    while (i < n) {
      val a = math.abs(w.samples(i).toLong)
      if (a > peak) peak = a
      sumAbs += a
      if (i > 0 && ((w.samples(i - 1) < 0) != (w.samples(i) < 0)))
        zc += 1
      i += 1
    }
    (n.toLong, peak, sumAbs, zc)
  }
}
