package graft.tools

import graft.{Corpus, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the load-bearing queries — the
  * "is this the plan you'd want at 100 TB" review loop. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, dir)
    val interesting = args.toSeq match {
      case Nil => Seq("q02_filter", "q04_agg_rank", "q11_join4_chain", "q16_topn_window",
        "q28_in_subquery", "q40_minhash_neardup", "q44_cosine_topk")
      case xs => xs
    }
    interesting.foreach { id =>
      println(s"\n========== $id ==========")
      val df = SparkEntry.queries(id)(spark, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
