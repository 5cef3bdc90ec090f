package graft

import graft.operators.Multimodal.RealCodec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property tests for the pure-JVM container codecs (raw scalacheck —
  * same offline-cache posture as SanitizerPropSpec): every encoder
  * round-trips through its decoder with the exact pixel/sample mean, at
  * arbitrary dimensions. PNG is the load-bearing case — arbitrary
  * heights exercise arbitrary interleavings of the five scanline
  * filters against real zlib compression. */
class CodecPropSpec extends AnyFunSuite {

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val dims: Gen[(Int, Int, Long)] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    seed <- Gen.choose(0L, 1L << 40)
  } yield (w, h, seed)

  /** Deterministic pseudorandom pixel field from the generated seed. */
  private def pix(seed: Long)(x: Int, y: Int): Int =
    (((x * 2654435761L + y * 40503L + seed) >>> 16) & 0xff).toInt

  private def exactMean(w: Int, h: Int, seed: Long): Double =
    (for { y <- 0 until h; x <- 0 until w } yield pix(seed)(x, y).toLong)
      .sum.toDouble / (w.toLong * h)

  test("PNG round-trips exactly at arbitrary dims (all filter mixes vs real zlib)") {
    check(forAll(dims) { case (w, h, seed) =>
      val (dw, dh, mean) = RealCodec.decodePng(RealCodec.encodePng(w, h, pix(seed)))
      dw == w && dh == h && mean == exactMean(w, h, seed)
    }, "png-roundtrip")
  }

  test("BMP round-trips exactly at arbitrary dims (row padding excluded)") {
    check(forAll(dims) { case (w, h, seed) =>
      val (dw, dh, mean) = RealCodec.decodeBmp(RealCodec.encodeBmp(w, h, pix(seed)))
      dw == w && dh == h && mean == exactMean(w, h, seed)
    }, "bmp-roundtrip")
  }

  test("real resize: resample + re-encode round-trips in every image family") {
    import graft.operators.Multimodal.MediaRow
    val dimsT = for { (w, h, seed) <- dims; tw <- Gen.choose(1, 30); th <- Gen.choose(1, 30) }
      yield (w, h, seed, tw, th)
    check(forAll(dimsT) { case (w, h, seed, tw, th) =>
      Seq(
        RealCodec.encodeBmp(w, h, pix(seed)),
        RealCodec.encodePng(w, h, pix(seed)),
        RealCodec.encodePpm(w, h, pix(seed))
      ).forall { container =>
        val out = RealCodec.resizeImage(MediaRow(1L, "image", container, "s"), tw, th)
        val (dw, dh, px) = RealCodec.decodePixels(out.content)
        // nearest-neighbor ground truth straight from the source field
        val ok = (0 until th).forall(y => (0 until tw).forall(x =>
          px(y * tw + x) == pix(seed)(x * w / tw, y * h / th)))
        dw == tw && dh == th && ok
      }
    }, "resize-roundtrip")
  }

  test("malformed containers always throw — never hang, loop, or lie") {
    // Truncate a valid container at arbitrary prefix lengths (magic kept
    // intact so the right parser claims the bytes): the decoders must
    // ALWAYS throw — every parser cross-checks its declared sizes
    // against the actual byte count, so no truncation can decode
    // quietly, hang, or return header fiction. (Payload bit flips are
    // covered by the CRC test in TierESpec.)
    val png = RealCodec.encodePng(9, 6, pix(7L))
    val avi = RealCodec.encodeAvi(5, 4, 3, (x, y, f) => pix(11L + f)(x, y))
    val cut = for {
      which <- Gen.oneOf("png", "avi")
      // keep the magic intact so the right parser claims the bytes
      len <- Gen.choose(12, (if (which == "png") png else avi).length - 1)
    } yield (which, len)
    check(forAll(cut) { case (which, len) =>
      val threw =
        try {
          if (which == "png") RealCodec.decodePng(png.take(len))
          else RealCodec.decodeAvi(avi.take(len))
          false
        } catch { case _: Exception => true }
      threw
    }, "truncation-throws")
  }

  test("AVI round-trips exactly at arbitrary dims and frame counts") {
    val dimsF = for { (w, h, seed) <- dims; f <- Gen.choose(1, 6) } yield (w, h, f, seed)
    check(forAll(dimsF) { case (w, h, f, seed) =>
      val avi = RealCodec.encodeAvi(w, h, f, (x, y, fr) => pix(seed + fr)(x, y))
      val (dw, dh, df, mean) = RealCodec.decodeAvi(avi)
      // AVI means include the row pad bytes in the denominator (movi
      // payload semantics) — recompute the same way
      val rowSize = (w * 3 + 3) / 4 * 4
      val sum = (for { fr <- 0 until f; y <- 0 until h; x <- 0 until w }
        yield 3L * pix(seed + fr)(x, y)).sum
      dw == w && dh == h && df == f &&
        mean == sum.toDouble / (f.toLong * rowSize * h)
    }, "avi-roundtrip")
  }
}
