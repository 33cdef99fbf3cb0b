package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Decoder fuzzing (VERDICT r13 task 7): the wavDHash data-chunk bug was
  * found by reading, not testing — this spec throws seeded-random and
  * adversarial byte layouts at every JVM-side decoder and asserts the
  * decoder CONTRACT, not specific hashes:
  *
  *   1. never throw — arbitrary bytes, truncations, junk headers and
  *      adversarial header fields return None / a raw-kind tuple;
  *   2. never mis-hash — bytes outside the declared pixel array / data
  *      chunk (trailing junk, over-declared sizes) must not influence
  *      the signature;
  *   3. decode only what is really there — every truncation strictly
  *      below the payload a header declares returns None.
  *
  * Pure JVM (no Spark session): the decoders are partition-local byte
  * functions, so the fuzz costs milliseconds and can afford thousands
  * of layouts. Property-style with seeded Random — the scalacheck
  * bridge is not in the offline dependency set (PropertySpec note). */
class MultimodalFuzzSpec extends AnyFunSuite {

  private def le32(bytes: Array[Byte], off: Int, v: Int): Unit = {
    bytes(off) = (v & 0xFF).toByte
    bytes(off + 1) = ((v >> 8) & 0xFF).toByte
    bytes(off + 2) = ((v >> 16) & 0xFF).toByte
    bytes(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  private def decodeAll(p: Array[Byte]): Unit = {
    Multimodal.decode(p)
    Multimodal.bmpDHash(p)
    Multimodal.wavDHash(p)
    ()
  }

  test("arbitrary byte soup never throws (decode, bmpDHash, wavDHash)") {
    val rng = new Random(1401)
    for (_ <- 1 to 2000) {
      val p = new Array[Byte](rng.nextInt(4096))
      rng.nextBytes(p)
      decodeAll(p)
    }
  }

  test("magic-primed junk never throws: BM/RIFF prefixes over random headers") {
    val rng = new Random(1402)
    for (_ <- 1 to 2000) {
      val p = new Array[Byte](54 + rng.nextInt(512))
      rng.nextBytes(p)
      if (rng.nextBoolean()) {
        p(0) = 'B'; p(1) = 'M'
        if (rng.nextBoolean()) le32(p, 14, 40) // valid biSize, junk rest
      } else {
        "RIFF".getBytes("US-ASCII").copyToArray(p, 0)
        "WAVEfmt ".getBytes("US-ASCII").copyToArray(p, 8)
        if (rng.nextBoolean()) le32(p, 16, 16)
        if (rng.nextBoolean())
          "data".getBytes("US-ASCII").copyToArray(p, 36)
      }
      decodeAll(p)
    }
  }

  test("adversarial BMP header fields return None, never throw") {
    // width near 2^30 overflowed `w * 3` in Int before the r14 hardening:
    // rowSize went negative, the size bound passed, and the pixel loop
    // read out of bounds. Every layout here must answer None.
    val evil = Seq(
      (0x40000000, 16), (0x7FFFFFFF, 1), (3, Int.MinValue),
      (Int.MinValue, 3), (0x2AAAAAAB, 2), (1, 0x7FFFFFFF))
    for ((w, h) <- evil) {
      val p = Multimodal.syntheticBmp(7L, 4, 4)
      le32(p, 18, w)
      le32(p, 22, h)
      assert(Multimodal.bmpDHash(p).isEmpty, s"w=$w h=$h")
      Multimodal.decode(p) // must not throw either
    }
    // oversized declared data chunk on a WAV: hash bounded by the payload
    val wv = Multimodal.syntheticWav(7L, 256)
    le32(wv, 40, 0xFFFFFFFF)
    assert(Multimodal.wavDHash(wv).nonEmpty)
  }

  test("every truncation of a valid container returns None or hashes in-bounds") {
    val bmp = Multimodal.syntheticBmp(42L, 16, 16)
    for (n <- 0 until bmp.length) {
      val t = bmp.take(n)
      assert(Multimodal.bmpDHash(t).isEmpty,
        s"truncated BMP ($n of ${bmp.length} bytes) must not hash")
      Multimodal.decode(t)
    }
    val wav = Multimodal.syntheticWav(42L, 512)
    for (n <- 0 until wav.length by 7) {
      // a truncated WAV may still hash (samples are bounded by BOTH the
      // declared chunk and the payload), but must never throw — and
      // anything below the 46-byte minimum must be None
      val h = Multimodal.wavDHash(wav.take(n))
      if (n < 46) assert(h.isEmpty)
    }
  }

  test("bytes beyond the declared body never influence the signature") {
    val rng = new Random(1404)
    for (seed <- 1L to 20L) {
      val bmp = Multimodal.syntheticBmp(seed, 16, 16)
      val wav = Multimodal.syntheticWav(seed, 256)
      val hb = Multimodal.bmpDHash(bmp)
      val hw = Multimodal.wavDHash(wav)
      assert(hb.nonEmpty && hw.nonEmpty)
      val junk = new Array[Byte](1 + rng.nextInt(128))
      rng.nextBytes(junk)
      assert(Multimodal.bmpDHash(bmp ++ junk) == hb,
        "trailing junk changed the image hash")
      assert(Multimodal.wavDHash(wav ++ junk) == hw,
        "bytes past the declared data chunk changed the audio hash")
      // shrink the declared data chunk: the bytes it cuts off must stop
      // mattering — two WAVs differing only beyond `declared` hash equal
      val declared = 128 * 2
      val a = wav.clone(); le32(a, 40, declared)
      val b = wav.clone(); le32(b, 40, declared)
      var i = 44 + declared
      while (i < b.length) { b(i) = (b(i) ^ 0x5A).toByte; i += 1 }
      assert(Multimodal.wavDHash(a) == Multimodal.wavDHash(b),
        "bytes beyond the shrunk data chunk leaked into the hash")
    }
  }

  test("single-byte header mutations never throw") {
    val rng = new Random(1405)
    val bmp = Multimodal.syntheticBmp(9L, 8, 8)
    val wav = Multimodal.syntheticWav(9L, 128)
    for (_ <- 1 to 3000) {
      val p = (if (rng.nextBoolean()) bmp else wav).clone()
      val i = rng.nextInt(math.min(p.length, 54))
      p(i) = rng.nextInt(256).toByte
      decodeAll(p)
    }
  }

  test("top-down BMP (negative height) hashes identically to bottom-up") {
    for (seed <- 1L to 10L) {
      val up = Multimodal.syntheticBmp(seed, 16, 12)
      val h = 12
      val rowSize = ((16 * 3 + 3) / 4) * 4
      val down = up.clone()
      le32(down, 22, -h)
      for (r <- 0 until h) // reverse the row order
        System.arraycopy(up, 54 + (h - 1 - r) * rowSize,
          down, 54 + r * rowSize, rowSize)
      assert(Multimodal.bmpDHash(down) == Multimodal.bmpDHash(up))
    }
  }

  test("perceptual contract: same seed ≡ hash-equal, one-pixel/block edit stays near") {
    for (seed <- 1L to 10L) {
      val a = Multimodal.bmpDHash(Multimodal.syntheticBmp(seed, 16, 16)).get
      val b = Multimodal.bmpDHash(Multimodal.syntheticBmp(seed, 16, 16)).get
      val near = Multimodal.bmpDHash(
        Multimodal.syntheticBmp(seed, 16, 16, perturb = seed)).get
      assert(a == b)
      assert(java.lang.Long.bitCount(a ^ near) <= 5)
      val wa = Multimodal.wavDHash(Multimodal.syntheticWav(seed, 2080)).get
      val wNear = Multimodal.wavDHash(
        Multimodal.syntheticWav(seed, 2080, perturb = seed)).get
      assert(java.lang.Long.bitCount(wa ^ wNear) <= 5)
    }
  }
}
