package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL A/B timer (dev tool, not part of the driver contract):
  * times each SQL file passed as an argument against the registered
  * testdata tables with Bench's session settings — min/median of
  * SPARK_GRAFT_AB_REPS (default 5) back-to-back runs per variant, round
  * robin so a host-contention burst cannot poison one variant's whole
  * window. */
object SqlAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SqlAb <file.sql> [file2.sql ...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, dir)
    spark.sql("SELECT COUNT(*) FROM region").collect()
    val sqls = args.toSeq.map { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try f -> src.mkString finally src.close()
    }
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, sql) <- sqls) {
      val t0 = System.nanoTime()
      spark.sql(sql).count()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    sqls.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"[sqlab] $name min=${ts.head}%.3f median=${ts(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
