package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** G.711 μ-law / A-law WAV decode: cross-checked byte-for-byte
  * against the JDK's independent `javax.sound.sampled` G.711
  * converters over ALL 256 code bytes, plus the WAV-container
  * dispatch and fault contract.
  */
class G711Spec extends AnyFunSuite {

  /** Decode `wav` through the JDK's audio system to 16-bit signed
    * little-endian PCM samples.
    */
  private def jdkDecode(wav: Array[Byte]): Array[Int] = {
    import javax.sound.sampled._
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val src = ais.getFormat
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      src.getSampleRate, 16, 1, 2, src.getSampleRate, false)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, ais)
    val bytes = pcm.readAllBytes()
    Array.tabulate(bytes.length / 2)(i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt)
  }

  test("all 256 mu-law codes expand EXACTLY as the JDK's ULAW " +
    "converter — cross-implementation, zero tolerance") {
    val codes = Array.tabulate(256)(identity)
    val wav = MediaCodec.synthesizeWavG711(8000, codes, ulaw = true)
    assert(MediaCodec.detect(wav) === "wav")
    val mine = MediaCodec.decodeG711(wav)
    val jdk = jdkDecode(wav)
    assert(mine.length === 256 && jdk.length === 256)
    for (i <- 0 until 256)
      assert(mine(i) === jdk(i), s"ulaw code $i")
  }

  test("all 256 A-law codes expand EXACTLY as the JDK's ALAW " +
    "converter — cross-implementation, zero tolerance") {
    val codes = Array.tabulate(256)(identity)
    val wav = MediaCodec.synthesizeWavG711(8000, codes, ulaw = false)
    val mine = MediaCodec.decodeG711(wav)
    val jdk = jdkDecode(wav)
    assert(mine.length === 256 && jdk.length === 256)
    for (i <- 0 until 256)
      assert(mine(i) === jdk(i), s"alaw code $i")
  }

  test("decodeAudio dispatches PCM16 and both G.711 variants through " +
    "one shape; non-audio format tags reject clearly") {
    val pcm = MediaCodec.synthesizeWavPcm16(16000,
      Array.tabulate(50)(i => i * 100 - 2500))
    assert(MediaCodec.isDecodableAudio(pcm))
    assert(MediaCodec.decodeAudio(pcm).length === 50)
    val ulaw = MediaCodec.synthesizeWavG711(8000,
      Array.tabulate(30)(i => (i * 17) % 256), ulaw = true)
    assert(MediaCodec.isDecodableAudio(ulaw))
    assert(MediaCodec.decodeAudio(ulaw) ===
      MediaCodec.decodeG711(ulaw))
    val alaw = MediaCodec.synthesizeWavG711(8000,
      Array.tabulate(30)(i => (i * 29) % 256), ulaw = false)
    assert(MediaCodec.decodeAudio(alaw).length === 30)
    // an ADPCM format tag (0x11) is honestly undecodable
    val adpcm = ulaw.clone()
    adpcm(20) = 0x11
    assert(!MediaCodec.isDecodableAudio(adpcm))
    val e = intercept[IllegalArgumentException](MediaCodec.decodeAudio(adpcm))
    assert(e.getMessage.contains("format tag"), e.getMessage)
  }

  test("truncated G.711 data chunks fail as data faults and gate " +
    "false — untrusted corpus bytes contract") {
    val wav = MediaCodec.synthesizeWavG711(8000,
      Array.tabulate(100)(i => (i * 13) % 256), ulaw = true)
    val cut = wav.take(80) // data chunk claims 100 bytes, has 36
    assert(MediaCodec.detect(cut) === "wav")
    assert(!MediaCodec.isCompleteG711(cut))
    assert(!MediaCodec.isDecodableAudio(cut))
    intercept[IllegalArgumentException](MediaCodec.decodeG711(cut))
  }

  /** Overwrite the fmt chunk header with a junk id and a size near
    * Int.MaxValue: `off += 8 + sz` must not wrap an Int cursor back
    * inside the buffer (it did — AIOOBE from inside the bounds guard).
    */
  private def nearMaxChunk(wav: Array[Byte]): Array[Byte] = {
    val evil = wav.clone()
    evil(12) = 'J'; evil(13) = 'U'; evil(14) = 'N'; evil(15) = 'K'
    val sz = Int.MaxValue - 15
    evil(16) = (sz & 0xff).toByte
    evil(17) = ((sz >> 8) & 0xff).toByte
    evil(18) = ((sz >> 16) & 0xff).toByte
    evil(19) = ((sz >> 24) & 0xff).toByte
    evil
  }

  test("a chunk size near Int.MaxValue cannot wrap the cursor back " +
    "into the buffer — gates false, decodes fail as data faults") {
    val g711 = nearMaxChunk(MediaCodec.synthesizeWavG711(8000,
      Array.tabulate(64)(i => (i * 13) % 256), ulaw = true))
    assert(MediaCodec.detect(g711) === "wav")
    assert(!MediaCodec.isCompleteG711(g711))
    assert(!MediaCodec.isDecodableAudio(g711))
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodeG711(g711))
    assert(e1.getMessage.contains("no data chunk"), e1.getMessage)

    val pcm = nearMaxChunk(MediaCodec.synthesizeWavPcm16(16000,
      Array.tabulate(64)(i => i * 100 - 3200)))
    assert(!MediaCodec.isCompletePcm16(pcm))
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodePcm16(pcm))
    assert(e2.getMessage.contains("no data chunk"), e2.getMessage)
  }
}
