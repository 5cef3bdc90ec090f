package graft.tools

import graft.Tables
import graft.operators.Bpe
import org.apache.spark.sql.SparkSession

/** BPE trainer scaling measurement (round-12 verdict #6): the declared
  * q163 entry trains 50 merges; a production tokenizer is ~32k merges
  * over a much larger type inventory. This times the driver-side merge
  * loop at increasing merge counts on the real sf0.1 histogram and
  * prints the per-merge slope, so BASELINE.md records a measured bound
  * instead of a claim. Usage: runMain graft.tools.BpeBench [dir]. */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
    else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, "documents")
    val vocab = docs.selectExpr("explode(split(text, ' ')) AS w")
      .filter("length(w) > 0").select("w").distinct().count()
    println(s"[bpebench] $dir word types=$vocab")
    // warm the histogram aggregation path once so merge-loop timings are
    // driver-side cost, not first-scan cost
    Bpe.train(docs, "text", nMerges = 1)
    Seq(50, 200, 1000).foreach { n =>
      val t0 = System.nanoTime()
      val merges = Bpe.train(docs, "text", nMerges = n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpebench] nMerges=$n%5d learned=${merges.size}%5d wall=$sec%7.2f s " +
        f"(${sec / merges.size * 1000}%6.2f ms/merge)")
    }
    // The testdata vocabulary (31 types) exhausts at ~107 merges, so the
    // production-regime bound needs a realistic type inventory: a
    // synthetic Zipf histogram at the maxVocab cap (100k types — the
    // trainer's documented driver-memory bound), deterministic seeded
    // words of realistic length. This measures the merge loop the way a
    // ~32k-merge tokenizer build would pay it.
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val types = (0 until 100000).map { i =>
      val len = 4 + rng.nextInt(9)
      val w = Array.fill(len)(alphabet(rng.nextInt(26))).mkString
      // Zipf-ish counts: rank r gets ~1e7/(r+1) occurrences
      (w, (10000000L / (i + 1)).max(1L))
    }
    // Bpe.train consumes a DataFrame of raw tokens; feed the histogram as
    // weighted rows via explode of a repeat? too big — instead train on
    // the histogram DIRECTLY through a text column where each row is one
    // type repeated `min(count, 1)` times: counts only affect WHICH merge
    // wins, and the cost we are bounding is the per-merge rescan over the
    // symbol inventory, which depends on types × length alone. Keep the
    // Zipf weights by passing each type once with its count encoded via
    // duplicated rows capped at 50 (enough to spread counts 3 orders).
    val weighted = types.flatMap { case (w, c) =>
      Seq.fill(math.min(50L, 1L + c / 200000L).toInt)(w)
    }
    println(s"[bpebench] synthetic: ${types.size} types, ${weighted.size} weighted rows")
    val synth = weighted.toDF("text")
    Seq(200, 1000).foreach { n =>
      val t0 = System.nanoTime()
      val merges = Bpe.train(synth, "text", nMerges = n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpebench] synthetic-100k nMerges=$n%5d learned=${merges.size}%5d wall=$sec%7.2f s " +
        f"(${sec / merges.size * 1000}%6.2f ms/merge)")
    }
    spark.stop()
  }
}
