package graft.operators

/** Hand-rolled RIFF/WAVE PCM codec — a pure, lock-free function over
  * byte arrays.
  *
  * Why this exists: `javax.sound.sampled` serializes concurrent
  * encode/decode behind a JVM-GLOBAL provider lock (measured in round
  * 12: 16 threads over 20k WAVs ran SLOWER than serial, 2.64 s vs
  * 1.98 s, and a fanned Spark codec stage regressed 8.9 → 23.3 s at
  * sf1), which forced the audio catalog entries to clamp to ONE
  * partition per executor JVM while the image family fanned out across
  * all cores. PCM WAV is a trivially parseable container — a 44-byte
  * canonical header plus raw little-endian samples — so the honest fix
  * is to drop the provider entirely: this codec has no shared state, no
  * locks, no temp files, and scales with task parallelism like any
  * other narrow map. Interop is pinned by MultimodalSpec both ways
  * (javax decodes our bytes sample-exact; we decode javax's bytes
  * sample-exact).
  *
  * Format notes (RIFF spec, public):
  *  - container: "RIFF" + u32le(total-8) + "WAVE", then a chunk walk of
  *    ("fmt ", "data", and anything else — LIST/INFO/fact chunks are
  *    skipped); chunk payloads are word-aligned, so an odd-sized chunk
  *    is followed by one pad byte that is NOT counted in its size.
  *  - "fmt " (>=16 bytes): u16 audio_format (1 = integer PCM), u16
  *    channels, u32 sample_rate, u32 byte_rate, u16 block_align, u16
  *    bits_per_sample. Only integer PCM is in scope; anything else
  *    (float 3, a-law 6, extensible 0xFFFE, ...) decodes to None and
  *    surfaces through the caller's error-row posture.
  *  - samples of 9..16 bits are little-endian signed int16 frames; PCM
  *    WAV has no big-endian variant (that is AIFF), so a successful
  *    decode IS int16-LE — callers need no endianness check.
  */
object RiffWav {

  /** Decoded "fmt " chunk, the subset a PCM pipeline consumes. */
  final case class Format(sampleRate: Int, bitsPerSample: Int, channels: Int)

  /** Encode raw little-endian PCM frame bytes as a canonical 44-byte
    * -header RIFF/WAVE file (the exact layout `AudioSystem.write`
    * emits for integer PCM, minus its provider lock). `pcm.length` must
    * be a whole number of frames; 16-bit frames keep the data chunk
    * even so no pad byte is ever needed on this path. */
  def encode(pcm: Array[Byte], sampleRate: Int, bitsPerSample: Int = 16,
             channels: Int = 1): Array[Byte] = {
    val blockAlign = channels * ((bitsPerSample + 7) / 8)
    require(blockAlign > 0 && pcm.length % blockAlign == 0,
      s"pcm length ${pcm.length} is not a whole number of $blockAlign-byte frames")
    val pad = pcm.length & 1 // word-align the data chunk (odd only for 8-bit)
    val out = new Array[Byte](44 + pcm.length + pad)
    def u32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def u16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); u32(4, 36 + pcm.length + pad); tag(8, "WAVE")
    tag(12, "fmt "); u32(16, 16)
    u16(20, 1) // audio_format: integer PCM
    u16(22, channels)
    u32(24, sampleRate)
    u32(28, sampleRate * blockAlign) // byte_rate
    u16(32, blockAlign)
    u16(34, bitsPerSample)
    tag(36, "data"); u32(40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** Decode a RIFF/WAVE byte array to (format, raw PCM frame bytes).
    * Walks the chunk list (pad-byte aware), so javax-written files,
    * LIST/INFO-bearing files, and the canonical [[encode]] layout all
    * parse. None on anything malformed or non-integer-PCM: truncated
    * header, wrong magic, missing/short "fmt " or "data", a declared
    * chunk size past the buffer, or a compression code other than 1 —
    * the never-throw contract callers turn into NULL-stats rows. */
  def decode(bytes: Array[Byte]): Option[(Format, Array[Byte])] = {
    def tagAt(off: Int, s: String): Boolean =
      bytes(off) == s.charAt(0) && bytes(off + 1) == s.charAt(1) &&
        bytes(off + 2) == s.charAt(2) && bytes(off + 3) == s.charAt(3)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)

    if (bytes.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE")) return None
    var fmt: Format = null
    var data: Array[Byte] = null
    var off = 12
    // stop as soon as both chunks are in hand — trailing metadata is noise
    while ((fmt == null || data == null) && off + 8 <= bytes.length) {
      val size = u32(off + 4)
      val body = off + 8
      if (body + size > bytes.length) return None // truncated
      if (tagAt(off, "fmt ")) {
        if (size < 16) return None
        if (u16(body) != 1) return None // integer PCM only
        fmt = Format(u32(body + 4).toInt, u16(body + 14), u16(body + 2))
      } else if (tagAt(off, "data")) {
        data = java.util.Arrays.copyOfRange(bytes, body, (body + size).toInt)
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (fmt == null || data == null) None else Some((fmt, data))
  }

  /** Decode straight to int16 samples — the shape every stats consumer
    * wants. None unless the file is 16-bit mono integer PCM (PCM WAV is
    * little-endian by construction; see the object doc). */
  def decodeInt16Mono(bytes: Array[Byte]): Option[(Format, Array[Int])] =
    decode(bytes).collect {
      case (fmt, data) if fmt.bitsPerSample == 16 && fmt.channels == 1 =>
        val n = data.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        (fmt, samples)
    }
}
