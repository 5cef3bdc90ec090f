package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketches over hashed set elements — the
  * bounded-size scale path for pairwise set overlap when the exact
  * distinct self-join (q132) stops being viable: at an unbounded source
  * count the exact form's per-source distinct streams grow with the
  * corpus, while a KMV sketch is a fixed ≤k longs per source no matter
  * how many shingles feed it (the "KMV-sketch form" the q132 comment
  * promised; reference has no dedup analogue — LLM-pipeline brief row).
  *
  * Estimator (Beyer et al., SIGMOD 2007, "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations"): for sets A, B with KMV
  * sketches S_A, S_B (each the k smallest distinct hash values), let
  * U = the k smallest of S_A ∪ S_B. Then |U ∩ S_A ∩ S_B| / |U| estimates
  * the Jaccard similarity J(A, B) with standard error ≈ √(J(1−J)/k).
  * SketchesSpec pins both the exact-regime identity (k ≥ |A ∪ B| ⇒ the
  * estimate IS the exact Jaccard) and the error bound at small k.
  */
object Sketches {

  /** Default sketch size: 64 longs ⇒ ~6 pp standard error at J ≈ 0.3 —
    * the screening regime (candidate source pairs for exact follow-up). */
  val DefaultKmvK = 64

  /** Per-group KMV sketch: the k smallest DISTINCT values of `hashCol`
    * as a sorted array. Exchanges carry (group, long) rows only; the
    * windowed top-k is pruned by WindowGroupLimit before the per-group
    * sort materializes anything beyond rank k. */
  def kmvSketch(df: DataFrame, groupCol: String, hashCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(hashCol))
    df.select(col(groupCol), col(hashCol)).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(groupCol)
      .agg(sort_array(collect_list(col(hashCol))).as("sketch"))
  }

  /** Pairwise Jaccard ESTIMATES between all groups whose sketches share
    * at least one member. Candidate pairs come from an equi-join on the
    * EXPLODED sketches — (long, group) rows, the repo's keys+ids pair
    * discipline, never a nested-loop over the group universe — and each
    * surviving pair evaluates the estimator over its two ≤k arrays
    * joined back by group (AQE broadcasts the sketch table while it is
    * small; the join stays a keyed equi-join at any group count).
    * Output: (src_a, src_b, k_union, n_shared, est_bp),
    * est_bp = 10⁴·|U ∩ S_A ∩ S_B| DIV |U|. */
  def kmvJaccard(df: DataFrame, groupCol: String, hashCol: String, k: Int): DataFrame = {
    val sk = Checkpoints.cut(kmvSketch(df, groupCol, hashCol, k), eager = false)
    val m = sk.select(col(groupCol), explode(col("sketch")).as("h"))
    val cand = m.select(col(groupCol).as("src_a"), col("h"))
      .join(m.select(col(groupCol).as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .select("src_a", "src_b").distinct()
    cand
      .join(sk.select(col(groupCol).as("src_a"), col("sketch").as("sa")), Seq("src_a"))
      .join(sk.select(col(groupCol).as("src_b"), col("sketch").as("sb")), Seq("src_b"))
      .withColumn("__u", slice(array_sort(array_union(col("sa"), col("sb"))), 1, k))
      // intersect materialized ONCE (CLAUDE.md: no expensive
      // subexpression inlined into N output branches)
      .withColumn("__i",
        size(array_intersect(array_intersect(col("sa"), col("sb")), col("__u"))).cast("long"))
      .select(col("src_a"), col("src_b"),
        size(col("__u")).cast("long").as("k_union"),
        col("__i").as("n_shared"),
        expr("__i * 10000L DIV size(__u)").as("est_bp"))
  }
}
