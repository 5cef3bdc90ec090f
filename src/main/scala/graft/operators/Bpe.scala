package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + segmentation — real subword
  * support for the training-data pipeline (token budgeting, tokenizer
  * fertility measurement, vocab-size decisions), replacing the
  * `TextAnalysis.subwordCountEstimate` heuristic with merges actually
  * learned from the corpus.
  *
  * Scale shape (the part that must hold at 100 TB): the only
  * distributed pass is one tokenize + word-count aggregate — map-side
  * combine reduces it to vocabulary size before the single exchange —
  * and the merge loop then runs DRIVER-SIDE on that (word, count)
  * histogram, exactly like the reference BPE trainers (which iterate a
  * word-frequency dict, never the corpus; Sennrich et al. 2016,
  * arXiv:1508.07909 — the reference repo has no tokenizer training).
  * `maxVocab` caps driver memory, with deterministic (count DESC, word)
  * selection: the dropped tail is the lowest-signal mass by
  * construction. Segmentation is scan-local (`mapPartitions`, the
  * `packSequences` class — an imperative per-word merge loop no
  * expression tree expresses), with merge ranks shipped once per task
  * closure and a per-partition word→length memo because Zipf'd corpora
  * repeat words heavily. No shuffle anywhere in segmentation.
  *
  * Determinism (the oracle-gate discipline, even though the entry is
  * rows-only — DuckDB cannot replay an iterative trainer): merge
  * selection breaks count ties on the lexicographically smallest
  * (left, right); segmentation merges the lowest-rank pair first,
  * leftmost on rank ties. Two runs over the same corpus produce
  * byte-identical merges and counts (TierESpec pins this plus a
  * hand-computed fixture).
  */
object Bpe {

  /** A learned merge: adjacent symbol pair → its rank (0 = learned first). */
  final case class Merge(left: String, right: String, rank: Int)

  /** End-of-word sentinel symbol, kept out of any plausible corpus
    * character by the '<'/'>' framing (the Sennrich convention). */
  val EndOfWord = "</w>"

  /** Train `nMerges` merges on the corpus word histogram. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            maxVocab: Int = 100000): Seq[Merge] = {
    val hist: Array[(String, Long)] = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString).toArray :+ EndOfWord, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var iter = 0
    var exhausted = false
    while (iter < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: highest count, then smallest (left, right)
        var best: ((String, String), Long) = null
        pairCounts.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && Ordering[(String, String)].lt(kv._1, best._1))) best = kv
        }
        val (l, r) = best._1
        merges += Merge(l, r, iter)
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        iter += 1
      }
    }
    merges.toSeq
  }

  /** Segment every token of every document under the trained merges and
    * report per-document subword statistics: token count, subword count,
    * fertility (subwords per token) in exact basis points. */
  def segmentStats(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        def nSub(word: String): Int = memo.getOrElseUpdate(word, {
          var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
          var done = false
          while (!done && syms.length > 1) {
            var bestRank = Int.MaxValue
            var bestI = -1
            var i = 0
            while (i < syms.length - 1) {
              val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < bestRank) { bestRank = r; bestI = i } // strict < keeps leftmost
              i += 1
            }
            if (bestI < 0) done = true
            else {
              val out = new Array[String](syms.length - 1)
              var j = 0
              var k = 0
              while (j < syms.length) {
                if (j == bestI) { out(k) = syms(j) + syms(j + 1); j += 2 }
                else { out(k) = syms(j); j += 1 }
                k += 1
              }
              syms = out
            }
          }
          syms.length
        })
        it.map { case (id, text) =>
          val toks = text.split(" ").filter(_.nonEmpty)
          val nt = toks.length.toLong
          var ns = 0L
          toks.foreach(w => ns += nSub(w))
          (id, nt, ns, if (nt == 0) 0L else ns * 10000L / nt)
        }
      }
      .toDF(idCol, "n_tokens", "n_subwords", "fertility_bp")
  }
}
