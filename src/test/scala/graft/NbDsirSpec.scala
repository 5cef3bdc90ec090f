package graft

import org.scalatest.funsuite.AnyFunSuite

/** Trained-classifier (q188-q191) and DSIR (q192-q194) families vs an
  * INDEPENDENT scalar reference over the FULL sf0.001 corpus: token
  * counting, vocab capping, integer-bit surprisal, argmin prediction,
  * hashed-bigram histograms and basis-point log-ratio weights all
  * recomputed with plain Scala collections (java MessageDigest for the
  * bigram hash — not the engine's expression) and compared exactly.
  * Also pins the family identities the oracles rely on: incremental ≡
  * batch restricted to batch ids, streaming ≡ incremental. */
class NbDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val Split = SparkEntry.IncrementalSplitId
  private val Scale = graft.operators.NaiveBayes.Scale

  private lazy val docs: Seq[(Long, String, String)] = {
    val d = Tables.table(spark, dir, "documents")
    d.select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
  }
  private def toks(text: String): Seq[String] = text.split(" ", -1).toSeq
  private def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  // ---------------- scalar Naive Bayes ----------------

  /** (doc_id -> (pred, best, second)) over every doc with ≥1 in-vocab
    * token, scored against the train-split model. */
  private lazy val refNb: Map[Long, (String, Long, Long)] = {
    val train = docs.filter(_._1 < Split)
    val tokCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    train.foreach { case (_, text, lang) =>
      toks(text).foreach(t => tokCounts((lang, t)) = tokCounts.getOrElse((lang, t), 0L) + 1) }
    val byTok = tokCounts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val vocab = byTok.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(graft.operators.NaiveBayes.DefaultVocab).map(_._1).toSet
    val v = vocab.size.toLong
    val nl = tokCounts.toSeq.filter(e => vocab(e._1._2))
      .groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val dl = train.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val dTrain = train.size.toLong
    val labN = dl.size.toLong
    val labels = nl.keySet.intersect(dl.keySet).toSeq.sorted
    val bits0 = labels.map(l => l -> bits((nl(l) + v) * Scale)).toMap
    val prior = labels.map(l => l -> bits((dTrain + labN) * Scale / (dl(l) + 1))).toMap
    val bitsLT = tokCounts.collect { case ((l, t), n) if vocab(t) && nl.contains(l) =>
      (l, t) -> bits((nl(l) + v) * Scale / (n + 1)) }.toMap
    docs.flatMap { case (id, text, _) =>
      val inVoc = toks(text).filter(vocab)
      if (inVoc.isEmpty) None
      else {
        val cnt = inVoc.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val m = inVoc.size.toLong
        val scores = labels.map { l =>
          val s = m * bits0(l) + prior(l) -
            cnt.map { case (t, c) => c * (bits0(l) - bitsLT.getOrElse((l, t), bits0(l))) }.sum
          (l, s)
        }.sortBy { case (l, s) => (s, l) }
        Some(id -> (scores.head._1, scores.head._2, scores(1)._2))
      }
    }.toMap
  }

  private def nbOut(name: String): Map[Long, (String, String, Long, Long)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("q188 predictions equal the independent scalar NB over the full sf0.001 corpus") {
    val got = SparkEntry.nbScoresAll(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("pred_label"), r.getAs[Long]("best_bits"), r.getAs[Long]("second_bits")))
      .toMap
    assert(got.keySet === refNb.keySet)
    got.foreach { case (id, g) => assert(g === refNb(id), s"doc $id") }
    // the classifier must actually discriminate on this corpus, not
    // collapse to the prior's argmin for every document
    assert(got.values.map(_._1).toSet.size > 1, "degenerate single-class prediction")
  }

  test("q190 (incremental merge) equals the batch model restricted to batch docs; q191 (streamed) equals q190") {
    val inc = nbOut("q190_nb_incremental")
    assert(inc.keySet === refNb.keySet.filter(_ >= Split))
    inc.foreach { case (id, (_, pred, best, margin)) =>
      val (rp, rb, rs) = refNb(id)
      assert((pred, best, margin) === ((rp, rb, rs - rb)), s"doc $id") }
    assert(nbOut("q191_nb_stream") === inc)
  }

  // ---------------- scalar DSIR ----------------

  private def md5Bucket(bigram: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(bigram.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) %
      graft.operators.Dsir.Buckets
  }

  private def feats(text: String): Seq[Long] = {
    val t = toks(text)
    if (t.size < 2) Seq.empty
    else t.sliding(2).map(p => md5Bucket(p.mkString(" "))).toSeq
  }

  /** doc_id -> (n_feat, dsir_score) for every doc with ≥2 tokens whose
    * buckets appear in the raw train histogram. */
  private lazy val refDsir: Map[Long, (Long, Long)] = {
    val train = docs.filter(_._1 < Split)
    val raw = train.flatMap(d => feats(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val tgt = train.filter(_._3 == SparkEntry.DsirTargetLang)
      .flatMap(d => feats(d._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rTot = raw.values.sum
    val tTot = tgt.values.sum
    val wb = raw.map { case (f, rn) =>
      // Dsir.Scale, not the NB Scale alias above — the two constants are
      // independently tunable and only coincidentally equal
      f -> (bits((tgt.getOrElse(f, 0L) * 10000L / tTot + 1L) * graft.operators.Dsir.Scale /
        (rn * 10000L / rTot + 1L)) - graft.operators.Dsir.ZeroBits)
    }
    docs.flatMap { case (id, text, _) =>
      val fs = feats(text).filter(wb.contains)
      if (fs.isEmpty) None
      else Some(id -> (fs.size.toLong, fs.map(wb).sum))
    }.toMap
  }

  private def dsirOutOf(name: String): Seq[(Long, Long, Long)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq

  test("q192 equals the independent scalar DSIR top-100 over the full sf0.001 corpus") {
    val expect = refDsir.toSeq.map { case (id, (n, s)) => (id, n, s) }
      .sortBy { case (id, _, s) => (-s, id) }.take(100)
    assert(dsirOutOf("q192_dsir_weights") === expect)
    // weights must separate docs, not collapse to one score
    assert(expect.map(_._3).toSet.size > 1, "degenerate constant DSIR score")
  }

  test("q193 (merged histograms) equals scalar DSIR restricted to batch docs; q194 (streamed) equals q193") {
    val expect = refDsir.toSeq.collect { case (id, (n, s)) if id >= Split => (id, n, s) }
      .sortBy { case (id, _, s) => (-s, id) }.take(100)
    val inc = dsirOutOf("q193_dsir_incremental")
    assert(inc === expect)
    assert(dsirOutOf("q194_dsir_stream") === inc)
  }

  test("q196 budget selection equals the scalar DSIR-priority prefix over the full sf0.001 corpus") {
    val byLang = docs.flatMap { case (id, text, lang) =>
      refDsir.get(id).map { case (_, s) =>
        (lang, id, toks(text).size.toLong, s)
      }
    }.groupBy(_._1)
    // a language whose first doc alone exceeds the budget keeps nothing
    // and (like the Spark entry's filter-before-groupBy and the oracle's
    // WHERE-before-GROUP BY) produces NO output row — flatMap, not map
    val expect = byLang.toSeq.flatMap { case (lang, rows) =>
      val ordered = rows.sortBy { case (_, id, _, s) => (-s, id) }
      val tot = ordered.map(_._3).sum
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var cum = 0L
      ordered.foreach { case (_, id, n, s) =>
        cum += n
        if (cum * 100 <= tot * SparkEntry.MixBudgetPct) kept += ((id, n, s))
      }
      if (kept.isEmpty) None
      else Some((lang, kept.size.toLong, kept.map(_._2).sum, tot,
        kept.map(_._2).sum * 10000L / tot, kept.map(_._3).sum))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q196_dsir_budget")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
    // the budget must genuinely cut (not keep everything)
    got.foreach { case (lang, _, keptToks, tot, _, _) =>
      assert(keptToks < tot, s"$lang: budget kept the whole language") }
  }
}
