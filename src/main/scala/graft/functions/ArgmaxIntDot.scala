package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmax-by-integer-dot over a BAKED-IN centroid matrix: returns
  * struct(cid, s) for the centroid with the highest dot(vec, centroid),
  * ties to the LOWEST cid — the SemDeDup assignment primitive (round
  * 16, the PortableBuckets fix applied to the last scale-risky composed
  * expression).
  *
  * The composed form (`Similarity.semAssignExpr`: `array_max` over
  * nlist inlined `struct(intDot(vec, lit), -cid)` entries) is fine at
  * the gate SFs (nlist 16) but `semNlistFor` grows nlist ≈ n/125 up to
  * the 4096 clamp — past a few hundred entries the single projection
  * outgrows janino's 64 KB method limit (the portableBucketCols failure
  * measured at 468 inlined calls) and the q208-class streaming argmax
  * silently leaves whole-stage codegen exactly at scale. One native
  * loop over the constant matrix is size-independent.
  *
  * Edge parity with the composed form (NativeExprPropSpec pins it for
  * every non-null input): a LENGTH MISMATCH nulls every intDot, and
  * struct ordering puts null s first, so array_max picks the largest
  * -cid → (LOWEST cid, null s) — same here. ONE intentional delta: a
  * NULL vector propagates null (standard UnaryExpression semantics)
  * where the composed form accidentally produced (lowest cid, null);
  * embeddings are non-null by fixture contract (DriftGuard pins it),
  * and null-in → null-out is the saner consumer contract. */
case class ArgmaxIntDot(child: Expression, cids: Array[Long],
                        matrix: Array[Int], n: Int, dim: Int)
  extends UnaryExpression {

  require(n > 0 && cids.length == n && matrix.length == n * dim,
    s"centroid matrix ${matrix.length} != $n x $dim")

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("s", LongType, nullable = true)))
  override def prettyName: String = "argmax_int_dot"

  override def nullSafeEval(v: Any): Any =
    ArgmaxIntDot.compute(cids, matrix, n, dim, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("argmaxCids", cids, "long[]")
    val matRef = ctx.addReferenceObj("argmaxMatrix", matrix, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.ArgmaxIntDot.compute($cidsRef, $matRef, $n, $dim, $v);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxIntDot =
    copy(child = newChild)
}

object ArgmaxIntDot {

  /** Column form from the (cid, centroid) list `collectCentroids`
    * returns; expression constructed directly (GraftColumnBridge). */
  def column(vec: org.apache.spark.sql.Column,
             cents: Seq[(Long, Seq[Long])]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    require(cents.nonEmpty, "ArgmaxIntDot needs at least one centroid")
    val n = cents.length
    val dim = cents.head._2.length
    val cids = cents.map(_._1).toArray
    // packed Int matrix (round 17, the IntDotLookup.pack rule): ±10⁴-
    // scaled components are lossless in 4 B, halving the baked-in
    // reference object the generated code carries per centroid set
    val flat = new Array[Int](n * dim)
    cents.zipWithIndex.foreach { case ((_, cv), i) =>
      require(cv.length == dim, "ragged centroid matrix")
      IntDotLookup.pack(cv).copyToArray(flat, i * dim)
    }
    GraftColumnBridge.column(
      ArgmaxIntDot(GraftColumnBridge.expression(vec), cids, flat, n, dim))
  }

  /** Called from generated code. Length mismatch → (lowest cid, null s),
    * the composed array_max's null-first struct ordering. */
  def compute(cids: Array[Long], matrix: Array[Int], n: Int, dim: Int,
              vec: ArrayData): InternalRow = {
    if (vec.numElements() != dim) {
      var mn = cids(0)
      var i = 1
      while (i < n) { if (cids(i) < mn) mn = cids(i); i += 1 }
      return InternalRow(mn, null)
    }
    val v = vec.toLongArray()
    var bestCid = 0L
    var bestS = 0L
    var first = true
    var c = 0
    var off = 0
    while (c < n) {
      var dot = 0L
      var i = 0
      while (i < dim) { dot += v(i) * matrix(off + i); i += 1 }
      if (first || dot > bestS || (dot == bestS && cids(c) < bestCid)) {
        bestCid = cids(c); bestS = dot; first = false
      }
      off += dim
      c += 1
    }
    InternalRow(bestCid, bestS)
  }
}
