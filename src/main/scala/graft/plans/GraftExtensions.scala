package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharPolyHash, DotProductLong}

/** The library's canonical Spark extension point: registers the codegen'd
  * kernel functions and the fan-out lint rule through
  * `SparkSessionExtensions`, so a cluster enables everything with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) — no imperative setup
  * calls. The per-operator `Hashing.registerAll` path stays as an
  * idempotent fallback for sessions created without the extension.
  *
  * End-to-end coverage: every CLI main (Verify/Bench/RunPipeline/Explain)
  * builds its session through this class, so the driver's smoke, bench
  * and correctness runs all exercise the extension wiring.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FanoutLint)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  /** The injected function descriptors (name, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
      exprs => DotProductLong(exprs(0), exprs(1))),
    (FunctionIdentifier("char_poly_hash"),
      new ExpressionInfo(classOf[CharPolyHash].getName, "char_poly_hash"),
      exprs => CharPolyHash(exprs.head)))
}
