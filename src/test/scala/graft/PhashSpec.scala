package graft

import graft.operators.{Multimodal, TextDedup}
import graft.operators.Multimodal.{MediaRow, RealCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash dedup receipts (round 14 — the verdict's top ask):
  * the dHash signature against a scalar lattice reference through every
  * image codec, the planted-duplicate contracts (container transcode
  * and integer-lattice resize MUST pair; inversion must not), and
  * banding completeness vs brute-force hamming on the real fixture.
  * The cross-engine end-to-end proof is the q209/q210 oracle hash. */
class PhashSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudorandom pixel field (the CodecPropSpec one). */
  private def pix(seed: Long)(x: Int, y: Int): Int =
    (((x * 2654435761L + y * 40503L + seed) >>> 16) & 0xff).toInt

  /** Scalar dHash reference straight from a pixel function — the same
    * 9×8 floor-lattice + strict-gradient spelling the q209 DuckDB
    * replay computes from text bytes. */
  private def refDHash(w: Int, h: Int, p: (Int, Int) => Int): Long = {
    var v = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (p((gx + 1) * w / 9, gy * h / 8) > p(gx * w / 9, gy * h / 8))
        v |= 1L << (gy * 8 + gx)
    v
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash64 equals the scalar lattice reference through every image codec") {
    for (seed <- 1L to 8L; (w, h) <- Seq((4, 3), (16, 9), (12, 5), (9, 8), (40, 40))) {
      val expect = refDHash(w, h, pix(seed))
      assert(Multimodal.dHash64(RealCodec.encodeBmp(w, h, pix(seed))) == expect, s"BMP $w x $h seed $seed")
      assert(Multimodal.dHash64(RealCodec.encodePng(w, h, pix(seed))) == expect, s"PNG $w x $h seed $seed")
      assert(Multimodal.dHash64(RealCodec.encodePpm(w, h, pix(seed))) == expect, s"PPM $w x $h seed $seed")
    }
  }

  test("transcode rewrites every container byte but never the dHash (BMP<->PNG<->PPM)") {
    val row = MediaRow(7L, "image", RealCodec.encodeBmp(11, 6, pix(3L)), "s")
    val png = Multimodal.transcode(row, "png")
    val ppm = Multimodal.transcode(row, "ppm")
    assert(!java.util.Arrays.equals(row.content, png.content),
      "transcode produced identical bytes — the byte-dedup-defeating premise is hollow")
    assert(Multimodal.dHash64(png.content) == Multimodal.dHash64(row.content))
    assert(Multimodal.dHash64(ppm.content) == Multimodal.dHash64(row.content))
    assert(Multimodal.dHash64(Multimodal.transcode(png, "bmp").content) ==
      Multimodal.dHash64(row.content))
  }

  test("18x16 integer-lattice resize is dHash-invariant for EVERY synthetic image (the q210 identity)") {
    val imgs = Multimodal.syntheticMedia(spark, TestSpark.sf01)
      .filter(col("media_type") === "image")
    val before = Multimodal.phashFeatures(imgs).withColumnRenamed("phash", "p0")
    val after = Multimodal.phashFeatures(Multimodal.resizeMedia(imgs, 18, 16))
    val n = before.count()
    assert(n > 0, "no image rows in the synthetic fixture")
    val moved = before.join(after, "media_id").filter(col("p0") =!= col("phash")).count()
    assert(moved == 0,
      s"$moved of $n images changed dHash under the 2x-lattice resize — the floor-arithmetic identity broke")
  }

  test("planted transcode + off-lattice-noise duplicates pair; inversion does not") {
    val w = 13; val h = 7
    val base = pix(11L) _
    // off-lattice columns for w=13: x in {3, 6, 9, 12} are never sampled
    // by gx*13/9 (gx=0..8 hits 0,1,2,4,5,7,8,10,11) — perturbing them
    // changes bytes, not the hash
    val offLattice = Set(3, 6, 9, 12)
    def noisy(x: Int, y: Int): Int =
      if (offLattice(x)) (base(x, y) + 7) & 0xff else base(x, y)
    def inverted(x: Int, y: Int): Int = 255 - base(x, y)
    val rows = Seq(
      MediaRow(1L, "image", RealCodec.encodeBmp(w, h, base), "s"),
      Multimodal.transcode(MediaRow(2L, "image", RealCodec.encodeBmp(w, h, base), "s"), "png"),
      MediaRow(3L, "image", RealCodec.encodePng(w, h, noisy), "s"),
      MediaRow(4L, "image", RealCodec.encodeBmp(w, h, inverted), "s"))
    assert(ham(Multimodal.dHash64(rows(3).content), Multimodal.dHash64(rows.head.content)) > 3,
      "inversion landed within banding reach — the discrimination direction is untested")
    val pairs = Multimodal.phashPairs(
        Multimodal.phashFeatures(spark.createDataset(rows)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)),
      s"expected the three planted duplicates at hamming 0 and no inverted pair, got $pairs")
  }

  test("banding emission equals brute-force hamming<=3 on the real fixture (pigeonhole completeness)") {
    val feats = Multimodal.phashFeatures(
      Multimodal.syntheticMedia(spark, TestSpark.sf01)
        .filter(col("media_type") === "image"))
    val sig = feats.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, pa) <- sig; (ib, pb) <- sig
      if ia < ib && ham(pa, pb) <= 3
    } yield (ia, ib)).toSet
    // the completeness claim holds below the cap; assert the fixture is
    // actually below it so a silent cap-drop can't masquerade as a pass
    val mx = Multimodal.phashBucketSizes(feats).agg(max("n")).head().getLong(0)
    assert(mx <= TextDedup.DefaultMaxBucketSize,
      s"fixture's max combo bucket $mx exceeds the cap — completeness check needs a capped-truth form")
    val banded = Multimodal.phashPairs(feats)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banding missed ${(brute -- banded).take(3)} / emitted phantom ${(banded -- brute).take(3)}")
  }

  test("phash recall vs exact pixel-lattice truth holds the floor (DedupQuality receipt, round 14)") {
    // r14 measured 0.904 at sf0.01 / 0.890 at sf0.1 on planted
    // transcode + resize + ±2-noise variants; the misses are ±noise
    // pairs flipping low-gradient bits — the signature's documented
    // fidelity limit, not a banding loss (banding is pigeonhole-complete
    // per the test above). Floor 0.8 leaves regen noise room while
    // catching a lattice/banding regression.
    val (found, truth, recall) = graft.tools.DedupQuality.measurePhash(spark, TestSpark.sf01)
    assert(truth > 0, "no pixel-near planted pairs — the phash receipt fixture degenerated")
    assert(recall >= 0.8,
      f"phash recall $found/$truth = $recall%.3f < 0.8 — re-measure via DedupQuality and re-tune")
  }

  test("phashTopK equals brute-force hamming top-k on the real fixture (pigeonhole exactness, q219)") {
    val imgs = Multimodal.syntheticMedia(spark, TestSpark.sf0001)
      .filter(col("media_type") === "image")
    val corpus = Multimodal.phashFeatures(imgs)
    val queries = Multimodal.phashFeatures(
        Multimodal.resizeMedia(imgs, 18, 16)
          .map(r => r.copy(media_id = r.media_id + 1000000L))(
            org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .select(col("media_id").as("query_id"), col("phash"))
    val k = 3
    val got = Multimodal.phashTopK(corpus, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force restricted to the operator's contract: neighbors at
    // hamming <= SimhashChunks - 1 (the single-chunk pigeonhole bound)
    val cs = corpus.collect().map(r => (r.getLong(0), r.getLong(1)))
    val qs = queries.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for ((qid, qh) <- qs) yield {
      val ranked = cs.map { case (id, h) => (id, ham(qh, h)) }
        .filter(_._2 <= TextDedup.SimhashChunks - 1)
        .sortBy { case (id, d) => (d, id) }.take(k)
      ranked.zipWithIndex.map { case ((id, d), i) => (qid, id, d.toLong, (i + 1).toLong) }
    }).flatten.toSet
    assert(got == brute,
      s"multi-index top-k diverged from brute force: missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    // every resize variant's top-1 must be its own original at hamming 0
    val top1 = got.filter(_._4 == 1L)
    assert(top1.nonEmpty && top1.forall { case (qid, id, d, _) => id == qid - 1000000L && d == 0L },
      "a resize variant's nearest neighbor was not its original at hamming 0")
    // the scale form: wider substrings (chunks=4 -> 16-bit indexes,
    // radius 3) must ALSO equal brute force at their own radius
    val got4 = Multimodal.phashTopK(corpus, queries, k, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val brute4 = (for ((qid, qh) <- qs) yield {
      val ranked = cs.map { case (id, h) => (id, ham(qh, h)) }
        .filter(_._2 <= 3)
        .sortBy { case (id, d) => (d, id) }.take(k)
      ranked.zipWithIndex.map { case ((id, d), i) => (qid, id, d.toLong, (i + 1).toLong) }
    }).flatten.toSet
    assert(got4 == brute4, s"chunks=4 top-k diverged: missing=${(brute4 -- got4).take(3)}")
  }

  test("recommendedHammingChunks follows the MIH m ~ 64/log2(n) rule (q219 self-sizing)") {
    // fixed m makes posting lists grow with n (measured 18.5x wall at
    // 10x); the rule keeps them O(1) by widening substrings with scale,
    // narrowing the exact radius chunks-1 accordingly
    assert(Multimodal.recommendedHammingChunks(167) == 8, "sf0.01 images: radius-7 regime")
    assert(Multimodal.recommendedHammingChunks(1667) == 4, "sf0.1 images: 16-bit substrings, radius 3")
    assert(Multimodal.recommendedHammingChunks(16667) == 4, "10x: still 16-bit")
    assert(Multimodal.recommendedHammingChunks(1L << 30) == 2, "10^9: 32-bit substrings, radius 1")
    assert(Multimodal.recommendedHammingChunks(1) == 8, "degenerate floor")
  }

  test("phashFeatures hashes exactly the image rows (audio/video skipped, not failed)") {
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf0001)
    val images = media.filter(col("media_type") === "image").count()
    assert(Multimodal.phashFeatures(media).count() == images)
    assert(images > 0)
  }
}
