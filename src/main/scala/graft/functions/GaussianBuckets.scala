package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All LSH bucket keys of one FLOAT/DOUBLE vector against a baked-in
  * Gaussian hyperplane matrix — the float-path twin of
  * [[PortableBuckets]] (round 16).
  *
  * The composed form (per-plane `when(dot ≥ 0)` where `dot` is the
  * `zip_with` + `aggregate` HOF) allocates two arrays per plane per row;
  * at the self-sized q45 point (26 tables × 8 bits = 208 planes) that
  * measured 4.26 s vs the portable twin's 0.32 s on the same corpus —
  * and the same tables × bits inlining outgrows janino's 64 KB method
  * limit at wider rule points. One native expression, one tight loop,
  * bytecode size independent of the operating point.
  *
  * Sign decisions replicate the HOF exactly: the dot is the SAME
  * sequential left-to-right double fold (`0.0 + v₀p₀ + v₁p₁ + …`, each
  * element cast to double first), so every IEEE rounding step matches.
  * Non-null edges replicate too: a length mismatch (zip_with pads with
  * null → null fold) or a null element each nulled the composed dot,
  * whose `when` then contributed 0 per bit — every table's key is 0.
  * ONE intentional delta (ADVICE r16, pinned in NativeExprPropSpec): a
  * NULL vector propagates NULL (standard UnaryExpression nullSafeEval)
  * where the composed form emitted all-zero keys; a null vector can
  * never survive exact verification, so no pair or search result moves.
  * NativeExprPropSpec pins the non-null equivalence. */
case class GaussianBuckets(child: Expression, planes: Array[Double],
                           tables: Int, bits: Int, dim: Int)
  extends UnaryExpression {

  require(planes.length == tables * bits * dim,
    s"plane matrix ${planes.length} != $tables x $bits x $dim")

  // lazy: the child is unresolved at construction (col("...")); its
  // dataType only exists after analysis, and eval/doGenCode run on the
  // resolved instance
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gaussian_buckets"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(
      GaussianBuckets.compute(planes, tables, bits, dim, arr, isFloat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshFloatPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.GaussianBuckets.compute($planesRef, $tables, $bits, $dim, $v, $isFloat));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GaussianBuckets =
    copy(child = newChild)
}

object GaussianBuckets {

  /** Column form — planes in `Similarity.hyperplanes` layout. */
  def column(vec: org.apache.spark.sql.Column,
             planes: Seq[Seq[Array[Double]]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val tables = planes.length
    val bits = if (tables == 0) 0 else planes.head.length
    val dim = if (bits == 0) 0 else planes.head.head.length
    val flat = new Array[Double](tables * bits * dim)
    var i = 0
    planes.foreach(_.foreach { p =>
      require(p.length == dim, "ragged plane matrix")
      System.arraycopy(p, 0, flat, i, dim); i += dim
    })
    GraftColumnBridge.column(
      GaussianBuckets(GraftColumnBridge.expression(vec), flat, tables, bits, dim))
  }

  /** Called from generated code. Null/mismatched/null-element vectors
    * key every table at 0 (the composed HOF's edge). */
  def compute(planes: Array[Double], tables: Int, bits: Int, dim: Int,
              vec: ArrayData, isFloat: Boolean): Array[Long] = {
    val out = new Array[Long](tables)
    if (vec.numElements() != dim) return out
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return out
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var t = 0
    var off = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v(j) * planes(off + j); j += 1 }
        if (dot >= 0.0) key |= 1L << b
        off += dim
        b += 1
      }
      out(t) = key
      t += 1
    }
    out
  }
}
