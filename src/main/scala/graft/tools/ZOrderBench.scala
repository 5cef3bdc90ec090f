package graft.tools

import graft.Tables
import graft.sources.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the 2-D claim of the z-order layout (dev tool backing
  * BASELINE.md): write lineitem twice at the same file count — sorted on
  * l_orderkey alone, and z-ordered on (l_orderkey, l_partkey) — then
  * probe a ~1% range on EACH column against both layouts and report files
  * read. The single-column layout prunes only its leading column; z-order
  * must prune both. */
object ZOrderBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targetFiles = if (args.nonEmpty) args(0).toInt else 256
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.table(spark, dir, "lineitem")
    val sortedOut = "/tmp/graft_zob/sorted"
    val zOut = "/tmp/graft_zob/zorder"
    Sinks.writeSortedParquet(li, sortedOut, Seq("l_orderkey", "l_partkey"), targetFiles)
    Sinks.writeZOrderedParquet(li, zOut, Seq("l_orderkey", "l_partkey"), targetFiles)
    def domain(c: String): (Long, Long) = {
      val r = li.agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    Seq("l_orderkey", "l_partkey").foreach { c =>
      val (mn, mx) = domain(c)
      val lo = mn + (mx - mn) / 2
      val hi = lo + math.max(1L, (mx - mn) / 100)
      def probe(path: String): (Long, Int, Int, Double) = {
        val t0 = System.nanoTime()
        val (df, s) = Sinks.readRangeSkipping(spark, path, c, BigDecimal(lo), BigDecimal(hi))
        val n = df.count()
        (n, s.filesRead, s.filesTotal, (System.nanoTime() - t0) / 1e9)
      }
      val (n1, r1, t1, s1) = probe(sortedOut)
      val (n2, r2, t2, s2) = probe(zOut)
      assert(n1 == n2, s"layouts disagree on $c: $n1 != $n2")
      println(f"[zorder] col=$c range=[$lo,$hi] rows=$n1 " +
        f"sorted=$r1/$t1 files ($s1%.2f s) zorder=$r2/$t2 files ($s2%.2f s)")
    }
    spark.stop()
  }
}
