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
    // preCBO, not injectOptimizerRule: the operator-optimization batch
    // runs to fixed point, so a rule there sees INTERMEDIATE plans and
    // would record phantom findings for joins later rules eliminate
    // (e.g. PropagateEmptyRelation). The preCBO hook runs once, after
    // that batch — the lint analyzes only the settled plan, the same
    // end-of-pipeline semantics as experimental.extraOptimizations.
    ext.injectPreCBORule(_ => FanoutLint)
    ext.injectPreCBORule(_ => WindowLint)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      // a clear arity error instead of a raw IndexOutOfBounds from the
      // builder — surfaced to SQL users as an analysis failure
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  /** The injected function descriptors (name, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
      arity("dot_long", 2)(exprs => DotProductLong(exprs(0), exprs(1)))),
    (FunctionIdentifier("char_poly_hash"),
      new ExpressionInfo(classOf[CharPolyHash].getName, "char_poly_hash"),
      arity("char_poly_hash", 1)(exprs => CharPolyHash(exprs.head))))
}
