package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, RealCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Audio/video perceptual-hash receipts (round 14 — the modality set's
  * completion after q209/q210's images): aHash64/vHash64 against scalar
  * references through the real WAV/AVI codecs, the planted-duplicate
  * contracts (8→16-bit PCM transcode and per-frame integer-lattice
  * resize MUST pair; inversion must not), and the feature-stage row
  * contracts. The cross-engine end-to-end proof is the q211–q214
  * oracle hash. */
class AvHashSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudorandom sample/pixel fields. */
  private def samp(seed: Long)(i: Int): Int =
    (((i * 2654435761L + seed * 40503L) >>> 16) & 0xff).toInt
  private def pix(seed: Long)(x: Int, y: Int, f: Int): Int =
    (((x * 2654435761L + y * 40503L + f * 69069L + seed) >>> 16) & 0xff).toInt

  /** Scalar aHash reference straight from a sample array — the same
    * 65-window floor-lattice sum + strict-gradient spelling the q211
    * DuckDB replay computes from text bytes. */
  private def refAHash(s: Array[Int]): Long = {
    val n = s.length
    val sums = Array.tabulate(65)(k =>
      s.slice(k * n / 65, (k + 1) * n / 65).foldLeft(0L)(_ + _))
    (0 until 64).foldLeft(0L)((h, b) =>
      if (sums(b + 1) > sums(b)) h | (1L << b) else h)
  }

  /** Scalar vHash reference straight from a pixel function — the q212
    * replay's cross-frame lattice sums. */
  private def refVHash(w: Int, h: Int, nf: Int, p: (Int, Int, Int) => Int): Long = {
    def s(gx: Int, gy: Int): Long =
      (0 until nf).foldLeft(0L)((a, f) => a + p(gx * w / 9, gy * h / 8, f))
    (0 until 64).foldLeft(0L) { (v, b) =>
      val gx = b % 8; val gy = b / 8
      if (s(gx + 1, gy) > s(gx, gy)) v | (1L << b) else v
    }
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash64 equals the scalar window reference through 8- and 16-bit WAV") {
    for (seed <- 1L to 8L; n <- Seq(65, 80, 129, 500)) {
      val s = Array.tabulate(n)(samp(seed))
      val expect = refAHash(s)
      val wav8 = RealCodec.encodeWav(8000, s.map(_.toByte))
      assert(Multimodal.aHash64(wav8) == expect, s"8-bit n=$n seed=$seed")
      val wav16 = RealCodec.encodeWav16(8000, s)
      assert(Multimodal.aHash64(wav16) == expect, s"16-bit n=$n seed=$seed")
    }
  }

  test("negative/overrunning chunk lengths THROW in BOTH wav walks (never a non-advancing loop)") {
    // a RIFF/WAVE container whose first chunk declares a NEGATIVE length:
    // without the guard, i += 8 + len never advances — an infinite loop
    // inside an executor task (round-15 advice: the guard existed only in
    // decodeWavSamples; decodeWav is reachable from RealCodec.decode for
    // any hostile RIFF non-AVI blob)
    val s = Array.tabulate(100)(samp(3L))
    val wav = RealCodec.encodeWav(8000, s.map(_.toByte))
    val hostile = wav.clone()
    // first chunk header starts at offset 12; its length field at 16
    java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -12)
    intercept[IllegalArgumentException](RealCodec.decodeWav(hostile))
    intercept[IllegalArgumentException](RealCodec.decodeWavSamples(hostile))
    // and an overrunning (positive but past-the-end) length
    val overrun = wav.clone()
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, wav.length)
    intercept[IllegalArgumentException](RealCodec.decodeWav(overrun))
    intercept[IllegalArgumentException](RealCodec.decodeWavSamples(overrun))
  }

  test("the 16-bit transcode rewrites every data byte but round-trips the samples exactly") {
    val s = Array.tabulate(200)(samp(5L))
    val wav8 = RealCodec.encodeWav(8000, s.map(_.toByte))
    val wav16 = RealCodec.encodeWav16(8000, RealCodec.decodeWavSamples(wav8))
    assert(wav8.length != wav16.length, "transcode kept the container size")
    assert(RealCodec.decodeWavSamples(wav16).sameElements(s),
      "16-bit round-trip lost samples — the normalization inverse broke")
    assert(Multimodal.aHash64(wav16) == Multimodal.aHash64(wav8))
  }

  test("vHash64 equals the scalar cross-frame reference through the AVI codec") {
    for (seed <- 1L to 6L; (w, h, nf) <- Seq((4, 3, 2), (12, 7, 5), (9, 8, 3), (20, 16, 4))) {
      val expect = refVHash(w, h, nf, pix(seed))
      assert(Multimodal.vHash64(RealCodec.encodeAvi(w, h, nf, pix(seed))) == expect,
        s"AVI $w x $h x$nf seed=$seed")
    }
  }

  test("decodeAviFramePixels round-trips every frame the encoder wrote") {
    val (w, h, nf) = (11, 6, 3)
    val (dw, dh, dn, frames) = RealCodec.decodeAviFramePixels(
      RealCodec.encodeAvi(w, h, nf, pix(9L)))
    assert((dw, dh, dn) == (w, h, nf))
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
      assert(frames(f)(y * w + x) == pix(9L)(x, y, f), s"pixel ($x,$y,$f)")
  }

  test("18x16 per-frame resize is vHash-invariant for EVERY synthetic video (the q214 identity)") {
    val vids = Multimodal.syntheticMedia(spark, TestSpark.sf01)
      .filter(col("media_type") === "video")
    val before = Multimodal.vhashFeatures(vids).withColumnRenamed("vhash", "v0")
    val after = Multimodal.vhashFeatures(Multimodal.resizeVideo(vids, 18, 16))
    val n = before.count()
    assert(n > 0, "no video rows in the synthetic fixture")
    val moved = before.join(after, "media_id").filter(col("v0") =!= col("vhash")).count()
    assert(moved == 0,
      s"$moved of $n videos changed vHash under the 2x-lattice frame resize")
  }

  test("16-bit transcode is aHash-invariant for EVERY synthetic audio row (the q213 identity)") {
    val auds = Multimodal.syntheticMedia(spark, TestSpark.sf01)
      .filter(col("media_type") === "audio")
    val before = Multimodal.ahashFeatures(auds).withColumnRenamed("ahash", "a0")
    val after = Multimodal.ahashFeatures(Multimodal.transcodeWav16(auds))
    val n = before.count()
    assert(n > 0, "no hashable audio rows in the synthetic fixture")
    val moved = before.join(after, "media_id").filter(col("a0") =!= col("ahash")).count()
    assert(moved == 0, s"$moved of $n audio rows changed aHash under the 16-bit transcode")
  }

  test("planted audio transcode pairs at hamming 0; inversion does not pair") {
    val s = Array.tabulate(300)(samp(21L))
    val inv = s.map(255 - _)
    assert(ham(refAHash(s), refAHash(inv)) > 3,
      "inversion landed within banding reach — the discrimination direction is untested")
    val rows = Seq(
      MediaRow(1L, "audio", RealCodec.encodeWav(8000, s.map(_.toByte)), "s"),
      MediaRow(2L, "audio", RealCodec.encodeWav16(8000, s), "s"),
      MediaRow(3L, "audio", RealCodec.encodeWav(8000, inv.map(_.toByte)), "s"))
    val pairs = Multimodal.phashPairs(
        Multimodal.ahashFeatures(spark.createDataset(rows)), hashCol = "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L)),
      s"expected exactly the planted transcode pair at hamming 0, got $pairs")
  }

  test("planted video resize pairs at hamming 0; inversion does not pair") {
    // at the round-16 video banding point (3-of-8 combos, hamming <= 5)
    val (w, h, nf) = (13, 9, 4)
    def inverted(x: Int, y: Int, f: Int): Int = 255 - pix(31L)(x, y, f)
    assert(ham(refVHash(w, h, nf, pix(31L)), refVHash(w, h, nf, inverted)) >
      Multimodal.VhashMaxHamming)
    val base = MediaRow(1L, "video", RealCodec.encodeAvi(w, h, nf, pix(31L)), "s")
    val rows = Seq(
      base,
      base.copy(media_id = 2L, content = RealCodec.resizeAvi(base.content, 18, 16)),
      MediaRow(3L, "video", RealCodec.encodeAvi(w, h, nf, inverted), "s"))
    val pairs = Multimodal.phashPairs(
        Multimodal.vhashFeatures(spark.createDataset(rows)), hashCol = "vhash",
        maxHamming = Multimodal.VhashMaxHamming, intact = Multimodal.VhashIntact)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L)),
      s"expected exactly the planted resize pair at hamming 0, got $pairs")
  }

  test("ahash/vhash recall vs exact envelope/lattice truth holds the floors (DedupQuality receipt)") {
    // r14 measured ahash 0.992 sf0.01 / 0.991 sf0.1; vhash at the ham-≤3
    // radius measured 0.72 (the ±2 noise flips ~4–5 % of single-pixel-
    // sampled bits — a fidelity limit of the radius, not the hash:
    // majority/median/trimmed per-frame statistics all measured at or
    // below the sum form). Round 16 moves the video family to 3-of-8
    // banding with hamming ≤ 5 at EXACT pigeonhole completeness —
    // measured 0.811 sf0.01 / 0.832 sf0.1. Floors leave regen noise room
    // while catching a codec/lattice/banding regression.
    val ((af, at, ar), (vf, vt, vr)) =
      graft.tools.DedupQuality.measureAvHash(spark, TestSpark.sf01)
    assert(at > 0 && vt > 0, "planted av-hash truth degenerated")
    assert(ar >= 0.9, f"ahash recall $af/$at = $ar%.3f < 0.9")
    assert(vr >= 0.75, f"vhash recall $vf/$vt = $vr%.3f < 0.75")
  }

  test("phashCrossPairs is modality-generic: audio cross pairs equal the symmetric restriction") {
    // q217 pins the image identity; this pins the same machinery over
    // the audio hash column (transcode variants arriving against the
    // stored originals — the incremental contract for every modality)
    val auds = Multimodal.syntheticMedia(spark, TestSpark.sf0001)
      .filter(col("media_type") === "audio")
    val offset = 1000000L
    val orig = Multimodal.ahashFeatures(auds)
    val vars = Multimodal.ahashFeatures(Multimodal.transcodeWav16(auds))
      .select(col("media_id") + offset as "media_id", col("ahash"))
    val sym = Multimodal.phashPairs(orig.unionAll(vars), hashCol = "ahash")
      .filter(col("id_a") < offset && col("id_b") >= offset)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cross = Multimodal.phashCrossPairs(orig, vars, hashCol = "ahash")
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cross == sym, s"cross=${cross.size} sym=${sym.size}")
    assert(cross.nonEmpty, "fixture must contain audio original-variant pairs")
  }

  test("feature stages hash exactly their modality's rows (others skipped, not failed)") {
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf0001)
    // the aHash lattice needs >= 65 PCM samples (WAV header is 44
    // bytes); shorter audio is SKIPPED by contract, exactly like
    // non-image rows in phashFeatures
    val audio65 = media.filter(col("media_type") === "audio" &&
      octet_length(col("content")) >= 44 + 65).count()
    val video = media.filter(col("media_type") === "video").count()
    assert(Multimodal.ahashFeatures(media).count() == audio65)
    assert(Multimodal.vhashFeatures(media).count() == video)
    assert(audio65 > 0 && video > 0)
  }
}
