package graft.tools
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileQ162 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, "documents")
    graft.functions.PortableShingleHash.register(spark)
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[p162] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    t("warm count")(docs.count())
    val stream = graft.streaming.StreamOps.docsSource(spark, dir, docs.schema)
    val tmp = java.nio.file.Files.createTempDirectory("p162").toString
    val model = t("lmModelStream")(
      graft.streaming.StreamOps.lmModelStream(spark, stream, "text", s"$tmp/partials"))
    val st = docs
      .select(col("doc_id"), split(col("text"), " ").as("t")).filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        call_function("portable_shingle_hash", col("t"), lit(2)).as("h2"),
        expr("slice(portable_shingle_hash(t, 1), 1, size(t) - 1)").as("h1p"))
      .select(col("doc_id"), explode(arrays_zip(col("h2"), col("h1p"))).as("z"))
      .select(col("doc_id"), col("z.h2").as("k"), col("z.h1p").as("k1"))
    val c2 = model.groupBy("k").agg(sum("m").as("c2"))
    val c1 = model.groupBy("k1").agg(sum("m").as("c1"))
    val out = st.join(c2, Seq("k")).join(c1, Seq("k1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(expr("(c2 * 10000) DIV c1")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"), expr("sp DIV n_bigrams").as("lm_bp"))
      .orderBy(col("lm_bp").desc, col("doc_id")).limit(100)
    t("scoring tail")(out.collect().length)
    println(out.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.takeWhile(!_.startsWith("(")).mkString("\n"))
    spark.stop()
  }
}
