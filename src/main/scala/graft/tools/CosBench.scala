package graft.tools
import graft.Tables
import graft.functions.{CosineSim, VectorFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CosBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CosineSim.register(spark)
    val emb = Tables.table(spark, "/root/testdata/sf0.1", "embeddings")
    val paired = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("vec_id").as("id2"), col("embedding").as("e2")))
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cos] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both paths once, then time
    paired.select(call_function("cosine_sim", col("embedding"), col("e2")).as("s")).agg(sum("s")).head()
    time("native cosine_sim 4M pairs")(
      paired.select(call_function("cosine_sim", col("embedding"), col("e2")).as("s")).agg(sum("s")).head())
    paired.select(VectorFunctions.cosine(col("embedding"), col("e2")).as("s")).agg(sum("s")).head()
    time("zip_with+aggregate 4M pairs")(
      paired.select(VectorFunctions.cosine(col("embedding"), col("e2")).as("s")).agg(sum("s")).head())
    spark.stop()
  }
}
