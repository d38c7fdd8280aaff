package graft.functions

import graft.model.VersionCompare
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the reference's sortable version key
 * (`Model/Artifact.java:63-84`; semantics in [[graft.model.VersionCompare]]):
 * three dot components, each zero-padded to 5 digits with non-digits
 * stripped; missing/`x`/overlong components become "00000".
 *
 * Why an `Expression` and not a UDF: `doGenCode` splices a direct static
 * call into the generated Java, so the key stays inside the surrounding
 * WholeStageCodegen span — no ScalaUDF boxing/closure dispatch, no codegen
 * fence in the scan->project pipeline that computes it (builder contract:
 * "a native Catalyst Expression (with doGenCode) beats a Scala UDF").
 */
case class VersionCompareKey(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"version_compare_key requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "version_compare_key"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(VersionCompare.key(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.model.VersionCompare.key($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): VersionCompareKey =
    copy(child = newChild)
}

object VersionCompareKey {
  import org.apache.spark.sql.graftbridge.Bridge
  /** Column-API entry point: `select(VersionCompareKey.of($"version"))`. */
  def of(col: Column): Column =
    Bridge.column(VersionCompareKey(Bridge.expression(col)))
}

/**
 * Session extension registering `version_compare_key(str)` as a SQL
 * function (`spark.sql.extensions=graft.functions.GraftExtensions`), so
 * `spark.sql("SELECT version_compare_key(version) ...")` resolves without
 * imports — the (c)-tier extension path from the builder contract, used
 * here for the one scalar the engine computes in every mined-artifact row.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("version_compare_key"),
      new ExpressionInfo(classOf[VersionCompareKey].getName, "version_compare_key"),
      (children: Seq[Expression]) => VersionCompareKey(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
  }
}
