package graft

import org.scalatest.funsuite.AnyFunSuite

/** q185 epoch-upsampling vs an INDEPENDENT scalar reference (the repo
  * convention: every declared operator gets a JVM-side re-derivation that
  * shares no Spark code with the entry). The reference recomputes the
  * md5-prefix priority with java.security.MessageDigest, sorts, prefix-
  * sums, and applies the boost rule with plain Longs — then the spec
  * compares the full per-lang report on the real sf0.001 documents table
  * (not a hand fixture, so the comparison exercises real hash/priority
  * collisions and per-language totals). */
class EpochUpsampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val UpsamplePct = 230L // mirror of SparkEntry's constant (CorpusSpec-style pin)

  private def md5Prefix8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("epochUpsampleFrame equals the scalar reference over sf0.001 documents") {
    Tables.register(spark, TestSpark.sf0001)
    val docs = Tables.table(spark, TestSpark.sf0001, "documents")
    val rows = docs.select("doc_id", "lang", "text", "n_chars").collect().map { r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))
    }
    // scalar reference: priority = md5prefix DIV (n_chars DIV 100 + 1),
    // per-lang ascending (prio, doc_id) prefix sum of whitespace tokens,
    // boost while cum*100 <= tot*rem, emitted = n_toks * (full + boost)
    val full = UpsamplePct / 100
    val rem = UpsamplePct % 100
    val expected = rows.groupBy(_._2).map { case (lang, ds) =>
      val withPrio = ds.map { case (id, _, text, nChars) =>
        val nToks = text.split(" ", -1).length.toLong
        val prio = md5Prefix8(id.toString) / (nChars / 100 + 1)
        (id, nToks, prio)
      }.sortBy(t => (t._3, t._1))
      val tot = withPrio.map(_._2).sum
      var cum = 0L
      var nBoosted = 0L
      var emitted = 0L
      withPrio.foreach { case (_, nToks, _) =>
        cum += nToks
        val boost = if (cum * 100 <= tot * rem) 1L else 0L
        nBoosted += boost
        emitted += nToks * (full + boost)
      }
      lang -> ((ds.length.toLong, nBoosted, emitted, tot, emitted * 10000L / tot))
    }
    val got = SparkEntry.epochUpsampleFrame(docs).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (lang, exp) =>
      assert(got(lang) === exp, s"lang=$lang")
    }
    // the regime is genuinely data-constrained: every language emits
    // more tokens than it has (emitted_bp > 10000) and some docs boost
    assert(got.values.forall(_._5 > 10000L))
    assert(got.values.exists(_._2 > 0L))
  }
}
