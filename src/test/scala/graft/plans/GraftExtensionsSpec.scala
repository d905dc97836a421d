package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

import graft.SparkSpec
import graft.functions.{CharPolyHash, DotProductLong}

/** The SparkSessionExtensions entry point: descriptor wiring and
  * application. The end-to-end proof lives in the CLI mains — every
  * forked Verify/Bench/RunPipeline/Explain session is built
  * `withExtensions(new GraftExtensions)`, so the oracle suite itself
  * exercises functions and lint injected this way.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("descriptors build the codegen expressions under the right names") {
    val byName = GraftExtensions.functions.map(f => f._1.funcName -> f._3).toMap
    assert(byName.keySet === Set("dot_long", "char_poly_hash"))
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(byName("dot_long")(Seq(Literal(1L), Literal(2L)))
      .isInstanceOf[DotProductLong])
    assert(byName("char_poly_hash")(Seq(Literal("x")))
      .isInstanceOf[CharPolyHash])
  }

  test("applying the extension to a fresh extensions registry succeeds") {
    // getOrCreate reuses the suite-wide session, so injection can't be
    // observed in-process; assert the application path itself (the forked
    // CLI mains cover the live behavior)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
