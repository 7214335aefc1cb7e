package graft.similarity

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Loop kernel shared by interpreted eval and generated code. Kept as a
  * static method so `doGenCode` emits a single call and the JIT compiles
  * one tight loop instead of per-element lambda dispatch.
  */
object VectorUtil {
  /** Cosine similarity in double precision, left-to-right accumulation
    * (bit-identical to DuckDB's `list_cosine_similarity(a::DOUBLE[],
    * b::DOUBLE[])` on the same inputs). Null (boxed) when lengths differ
    * or any element is null — the semantics the previous
    * `zip_with`/`aggregate` composition had. */
  def cosine(a: ArrayData, b: ArrayData,
             aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `cosine(a, b)` over `array<float>`/`array<double>` columns as a native
  * Catalyst expression. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) is evaluated interpreted, allocating
  * several intermediate arrays per row — on an all-pairs similarity join
  * that dominated the runtime. This stays inside whole-stage codegen and
  * allocates nothing.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine"

  /** Analyzer-driven widening: array<float>/array<double> pass through
    * unchanged (exact member match — the float fast path stays
    * cast-free); any other numeric array is implicitly cast to
    * array<double>, and non-castable inputs fail analysis with the
    * standard type-check error. This runs during RESOLUTION, so it
    * covers plain `col(...)` inputs that are unresolved when the
    * Column is built. */
  override def inputTypes = {
    val accepted = org.apache.spark.sql.graft.ColumnBridge.floatOrDoubleArray
    Seq(accepted, accepted)
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorUtil.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("cos")
      s"""
        java.lang.Double $tmp =
          graft.similarity.VectorUtil.cosine($l, $r, $lf, $rf);
        if ($tmp == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $tmp.doubleValue();
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
