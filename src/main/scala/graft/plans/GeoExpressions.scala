package graft.plans

import graft.serde.EWKB
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType}

/** Native Catalyst expressions for the hottest scalar ops — the
  * "promote to `Expression` with `doGenCode`" tier from SURVEY §4.3.
  * Unlike the ScalaUDF surface, these inline a static JVM call directly
  * into whole-stage-generated code: no encoder round trip, no Option
  * boxing, null handling compiled into the consuming operator.
  *
  * Registered by [[GraftExtensions]] under `st_area_native` /
  * `st_length_native` / `st_intersects_native`, usable from SQL and
  * `expr(...)`. The UDF registry remains the semantic reference; these are
  * drop-in equivalents for hot paths (same EWKB-in, same JTS kernels,
  * same null-in-null-out).
  */
object GeoNative {
  def area(b: Array[Byte]): Double = EWKB.read(b).getArea
  def length(b: Array[Byte]): Double = EWKB.read(b).getLength
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ga = EWKB.read(a)
    val gb = EWKB.read(b)
    if (ga.isEmpty || gb.isEmpty) false
    else org.locationtech.jts.operation.relateng.RelateNG.relate(ga, gb,
      org.locationtech.jts.operation.relateng.RelatePredicate.intersects())
  }
}

private[plans] object NativeTypeCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def binary(fn: String, children: Expression*): TypeCheckResult =
    children.find(_.dataType != BinaryType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$fn expects BINARY, got ${c.dataType}")
    }
}

case class STAreaNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = NativeTypeCheck.binary("st_area_native", child)
  override protected def nullSafeEval(input: Any): Any =
    GeoNative.area(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GeoNative.area($c)")
  override protected def withNewChildInternal(newChild: Expression): STAreaNative =
    copy(child = newChild)
}

case class STLengthNative(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = NativeTypeCheck.binary("st_length_native", child)
  override protected def nullSafeEval(input: Any): Any =
    GeoNative.length(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GeoNative.length($c)")
  override protected def withNewChildInternal(newChild: Expression): STLengthNative =
    copy(child = newChild)
}

case class STIntersectsNative(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() =
    NativeTypeCheck.binary("st_intersects_native", left, right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoNative.intersects(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GeoNative.intersects($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): STIntersectsNative = copy(left = newLeft, right = newRight)
}

object GeoExpressions {
  /** (identifier, info, builder) triples for SparkSessionExtensions. */
  def registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("st_area_native"),
      new ExpressionInfo(classOf[STAreaNative].getName, "st_area_native"),
      (args: Seq[Expression]) => STAreaNative(args.head)),
    (FunctionIdentifier("st_length_native"),
      new ExpressionInfo(classOf[STLengthNative].getName, "st_length_native"),
      (args: Seq[Expression]) => STLengthNative(args.head)),
    (FunctionIdentifier("st_intersects_native"),
      new ExpressionInfo(classOf[STIntersectsNative].getName, "st_intersects_native"),
      (args: Seq[Expression]) => STIntersectsNative(args(0), args(1))))
}
