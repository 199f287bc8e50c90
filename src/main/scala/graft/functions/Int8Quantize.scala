package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Symmetric int8 quantization of a double vector as one native
  * codegen Expression: each component maps to
  * `floor(x * 127.0 / max(|x_i|))`, kept as double (the integer values
  * are exact in a double, and downstream dot products stay on the
  * codegen double path).
  *
  * Semantically identical to the Column formula
  * `transform(v, x => floor(x * 127.0 / array_max(transform(v, abs))))`
  * — the difference is mechanical: higher-order-function lambdas
  * evaluate INTERPRETED per element (the r04 bench's worst
  * non-anomalous entry was exactly this lambda), while this expression
  * runs one tight JVM loop per row inside whole-stage codegen.
  *
  * Same IEEE ops in the same order as the DuckDB oracle's
  * `list_transform(v, x -> floor(x * 127.0 / list_aggregate(...abs...,
  * 'max')))`, so quantized values — and every integer dot product over
  * them — compare bit-exact.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(v: Any): Any =
    Int8Quantize.eval(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Int8Quantize$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  def eval(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      // NaN must PROPAGATE to the max (Spark's array_max and DuckDB's
      // list max both order NaN above every value) — a bare `a > mx`
      // is false for NaN and would silently quantize the finite
      // components while the documented-equivalent formulas return an
      // all-NaN vector
      if (a > mx || java.lang.Double.isNaN(a)) mx = a
      i += 1
    }
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * 127.0 / mx)
      i += 1
    }
    new GenericArrayData(out)
  }
}
