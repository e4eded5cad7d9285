package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression for the embedding dot product — the hot
 * path of cosine similarity search.
 *
 * Spark's higher-order functions (`aggregate(zip_with(...))`) evaluate
 * their lambdas INTERPRETED, allocating a zipped intermediate array per
 * row; this expression generates a tight primitive loop inside
 * whole-stage codegen (and its interpreted fallback reads both arrays
 * directly with no intermediates). Semantics match
 * `Similarity.dot`: Σ aᵢ·bᵢ in double over the common prefix.
 */
case class ArrayFloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayFloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Single-pass cosine similarity: dot, ‖a‖² and ‖b‖² accumulate in ONE
 * loop over the arrays, where the composed form
 * `graft_dot(a,b) / (sqrt(graft_dot(a,a)) * sqrt(graft_dot(b,b)))`
 * traverses both arrays three times. Each accumulator adds in the same
 * index order as its standalone loop, so results are bit-identical to
 * the guarded composed form. Zero-norm vectors score 0.0 (defined "no
 * similarity"), NOT IEEE NaN — NaN sorts above every double in Spark's
 * total order and would rank a zero vector #1 in every top-k; the
 * Similarity.cosine fallback applies the identical guard.
 */
case class ArrayFloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      s += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // norms run over each array's FULL length — identical to the
    // composed graft_dot(a,a)/graft_dot(b,b), even on ragged inputs
    while (i < nx) { val xi = x.getFloat(i).toDouble; na += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getFloat(i).toDouble; nb += yi * yi; i += 1 }
    // zero-norm guard: cosine with a zero vector is undefined; raw IEEE
    // division gives NaN, and Spark's total order puts NaN ABOVE every
    // double — a zero vector would rank #1 in every top-k and pass
    // every >= tau gate. Define it as 0 (no similarity) instead.
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else s / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $s += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |for (; $i < $nx; $i++) {
         |  double $xi = (double) $x.getFloat($i); $na += $xi * $xi;
         |}
         |for ($i = $n; $i < $ny; $i++) {
         |  double $yi = (double) $y.getFloat($i); $nb += $yi * $yi;
         |}
         |double ${s}_d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = (${s}_d == 0.0) ? 0.0 : $s / ${s}_d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayFloatCosine =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions hook: registers `graft_dot` and
 *  `graft_cosine` so any session configured with
 *  `spark.sql.extensions=graft.functions.GraftExtensions`
 *  (or built `.withExtensions(new GraftExtensions)`) can call them from
 *  SQL and DataFrame `expr(...)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayFloatDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        ArrayFloatDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayFloatCosine].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine takes exactly 2 arguments")
        ArrayFloatCosine(children.head, children(1))
      }))
  }
}
