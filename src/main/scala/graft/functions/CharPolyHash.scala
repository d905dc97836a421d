package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash of a string: fold over code points,
  * `acc = (acc*31 + cp) % 2^30` — bit-identical to the HOF formulation in
  * [[Hashing.charPolyHash]] (`aggregate(transform(sequence ...))`) and to
  * the DuckDB oracle's `list_reduce(list_transform(generate_series ...))`,
  * but one tight loop instead of three interpreted lambda evaluations per
  * character. Code points (not UTF-16 units) because SQL `substr`/`ascii`
  * index and value code points.
  */
case class CharPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_poly_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "char_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    CharPolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharPolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Hashing.Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
