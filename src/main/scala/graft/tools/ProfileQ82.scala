package graft.tools

import graft.Tables
import graft.operators.TextDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage profiler for the q82 portable-MinHash pipeline (dev tool):
  * decomposes the narrow-band + join-back shape vs the round-5 wide
  * (payload-fanout) shape so shuffle-vs-recompute tradeoffs are measured,
  * not guessed. */
object ProfileQ82 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q82] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val shingleN = TextDedup.PortableShingleN
    val numHashes = TextDedup.PortableNumHashes
    val bands = TextDedup.PortableBands
    val rpb = numHashes / bands
    val coeffs = TextDedup.affineCoeffs(numHashes)

    val baseRaw = docs.select(col("doc_id"),
      array_distinct(TextDedup.portableShingleHashes(col("text"), shingleN)).as("__hs"))
      .filter(size(col("__hs")) > 0)
    time("md5 base pass alone (count)")(baseRaw.count())

    def bandedOf(sig: DataFrame, extra: Seq[String]): DataFrame =
      sig.select((col("doc_id") +: extra.map(col)) :+
        posexplode(array((0 until bands).map(b =>
          array_join(slice(col("__sig"), b * rpb + 1, rpb), "-")): _*))
          .as(Seq("__band", "__bkey")): _*)

    // round-5 wide shape: __hs rides through banding, no joins
    val sigWide = baseRaw.select(col("doc_id"), col("__hs"),
      TextDedup.affineSignature(col("__hs"), coeffs).as("__sig"))
    val wide = bandedOf(sigWide, Seq("__hs"))
      .groupBy("__band", "__bkey")
      .agg(collect_list(struct(col("doc_id").as("id"), col("__hs").as("hs"))).as("__m"))
      .filter(size(col("__m")) >= 2)
      .select(explode(col("__m")).as("a"), col("__m"))
      .select(col("a"), explode(col("__m")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.hs").as("__ha"), col("b.hs").as("__hb"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ha"), col("__hb"))).cast("long").as("n_inter"),
        size(array_union(col("__ha"), col("__hb"))).cast("long").as("n_union"))
      .filter(col("n_inter") * 10 >= col("n_union") * 9)
    time("WIDE r5 shape end-to-end (count)")(wide.count())

    // narrow shape, base recomputed per reference (no checkpoint)
    def narrowFrom(base: DataFrame): DataFrame = {
      val sig = base.select(col("doc_id"),
        TextDedup.affineSignature(col("__hs"), coeffs).as("__sig"))
      val pairs = bandedOf(sig, Nil)
        .groupBy("__band", "__bkey")
        .agg(collect_list(col("doc_id")).as("__ids"))
        .filter(size(col("__ids")) >= 2)
        .select(explode(col("__ids")).as("id_a"), col("__ids"))
        .select(col("id_a"), explode(col("__ids")).as("id_b"))
        .filter(col("id_a") < col("id_b"))
        .distinct()
      pairs
        .join(base.select(col("doc_id").as("id_a"), col("__hs").as("__ha")), Seq("id_a"))
        .join(base.select(col("doc_id").as("id_b"), col("__hs").as("__hb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("__ha"), col("__hb"))).cast("long").as("n_inter"),
          size(array_union(col("__ha"), col("__hb"))).cast("long").as("n_union"))
        .filter(col("n_inter") * 10 >= col("n_union") * 9)
    }
    time("NARROW no-checkpoint end-to-end (count)")(narrowFrom(baseRaw).count())

    val baseCp = time("localCheckpoint(base) materialize")(
      { val b = baseRaw.localCheckpoint(true); b })
    time("NARROW checkpointed end-to-end (count)")(narrowFrom(baseCp).count())

    time("current portablePairStats (count)")(
      TextDedup.portablePairStats(docs, "doc_id", "text")
        .filter(col("n_inter") * 10 >= col("n_union") * 9).count())

    spark.stop()
  }
}
