package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared kernel for eval and codegen: identical arithmetic to
  * [[graft.ops.Similarity.cosine]] (ascending-index double accumulation), so
  * the native expression, the typed Scala path and the HOF formulation all
  * produce bit-equal values. Takes ArrayData directly — no boxing, no
  * per-element lambda dispatch. */
object CosineMath {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // cosine_similarity is a user-callable SQL function: unequal lengths must
    // be a clear error, not an out-of-bounds read returning silent garbage.
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_similarity: embedding lengths differ ($n vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-norm => 0.0, not NaN: Spark orders NaN above every real number,
    // so NaN would rank a zero vector first in every ANN top-k (must stay
    // bit-equal to Similarity.cosine's convention)
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/**
 * Native Catalyst expression for cosine similarity over two `ARRAY<FLOAT>`
 * columns — the scoring kernel of every ANN/near-dup re-rank (q24/q27/q40/
 * q41 and the Dedup/Similarity verify stages).
 *
 * Why an `Expression` and not the `aggregate`/`zip_with` higher-order
 * formulation: HOFs are CodegenFallback in Spark — each row pays interpreted
 * lambda dispatch and breaks the surrounding WholeStageCodegen span.
 * `doGenCode` splices a direct static call over the unsafe ArrayData into
 * the generated Java, so a broadcast-join + score + filter pipeline stays in
 * ONE codegen'd loop (builder contract: "a native Catalyst Expression (with
 * doGenCode) beats a Scala UDF").
 */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineMath.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  import org.apache.spark.sql.graftbridge.Bridge
  /** Column-API entry point: `select(CosineSimilarity.of($"a", $"b"))`. */
  def of(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
