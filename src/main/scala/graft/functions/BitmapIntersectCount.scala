package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `|A ∩ B|` of two dictionary bitmaps (`array<bigint>` of 64-bit
  * words): popcount of the element-wise AND.
  *
  * This is the native-codegen form of `SetSimJoin.interSizeFold`
  * (`zip_with` + `aggregate`). The fold is already loop-shaped, but it
  * materializes the zipped array and walks generic `ArrayData` through
  * two higher-order-function frames per pair; on an exact similarity
  * join the expression sits inside an O(candidate-pairs) loop, so a
  * fused `doGenCode` loop — no intermediate array, no lambda frames,
  * `Long.bitCount` intrinsic per word — is worth a real constant
  * factor. Evaluated per-pair inside whole-stage codegen; spills
  * nothing; scales with pair count, not data size.
  *
  * Word counts may differ (caller contracts equal universes; trailing
  * missing words are treated as zero — AND with nothing contributes
  * nothing), and null elements are treated as 0-words.
  *
  * Registered as SQL function `bitmap_inter_count` by
  * [[graft.plans.GraftExtensions]] (SparkSessionExtensions
  * `injectFunction`).
  */
case class BitmapIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bitmap_inter_count requires two array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_inter_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value} += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitmapIntersectCount {
  /** (identifier, info, builder) triple for `SparkSessionExtensions.injectFunction`. */
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bitmap_inter_count"),
    new ExpressionInfo(classOf[BitmapIntersectCount].getCanonicalName, "bitmap_inter_count"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"bitmap_inter_count takes 2 arguments, got ${args.length}")
      BitmapIntersectCount(args(0), args(1))
    })
}
