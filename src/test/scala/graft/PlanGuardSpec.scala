package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corpus-wide physical-plan guard: the 100 TB posture in one test. Every
  * declared entry is planned (not executed) at sf0.001 and must contain
  * no CartesianProduct at all, and no BroadcastNestedLoopJoin outside the
  * allowlisted intentional broadcasts (a small query/centroid/benchmark
  * side cross-joined against the corpus IS the plan you want there). A
  * new operator that accidentally plans a cartesian or an unintended BNL
  * turns this red before any benchmark does. */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // entries whose builder EXECUTES eagerly (streaming run-to-completion,
  // iterative fixpoints, two-pass RDD ops) — planned shapes are covered
  // by their own specs/PLANS.md instead
  private val eager = Set("q51_stream_hourly", "q65_stream_join",
    "q73_ntile_dist", "q74_neardup_clusters", "q75_seq_pack")

  // intentional broadcast cross joins: a tiny side (query set, centroid
  // set, benchmark set) against the corpus — BNL with a broadcast build
  // IS the linear-scan plan, not a quadratic accident
  private val bnlAllowed = Set("q44_cosine_topk", "q53_ann_ivf", "q68_contamination")

  test("no cartesian products or unintended nested-loop joins anywhere in the corpus") {
    val dir = TestSpark.sf0001
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (id, build) =>
      if (eager(id)) None
      else {
        val plan = build(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed(id)
        if (cartesian || bnl)
          Some(s"$id: ${if (cartesian) "CartesianProduct " else ""}${if (bnl) "unexpected BNL" else ""}")
        else None
      }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
