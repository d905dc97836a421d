package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Similarity search over embedding columns (SURVEY.md §2B X3) — the
  * library API behind the x3 demos. Embeddings quantize to int64
  * (floor(x·10⁴)) so dot products and norms are exact integers (codegen'd
  * dot_long kernel) and cosines are single deterministic IEEE divisions.
  *
  * Scale contract: the query side broadcasts (it is small by construction
  * — a batch of probe vectors); the corpus streams through one scan.
  * Brute force scores every corpus row per query (the exact baseline);
  * the hyperplane-bucket variant prunes the corpus to matching buckets —
  * the shape IVF/LSH vector indexes take at 100 TB.
  */
object VectorSearch {

  /** id + int64-quantized vector + exact squared norm. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    Hashing.registerAll(df.sparkSession)
    df.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => floor(x.cast("double") * 10000).cast("long")).as("qv"))
      .select(col("vec_id"), col("qv"),
        call_function("dot_long", col("qv"), col("qv")).as("nq"))
  }

  /** Exact cosine from an integer dot and the two squared norms. A
    * zero-norm vector (all components quantize to 0) has no direction:
    * NULL, not an ANSI division-by-zero error.
    */
  private[operators] def cosineOf(dot: Column, na: Column, nb: Column): Column =
    when(na > 0 && nb > 0,
      dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
      .otherwise(lit(null))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"))

  /** Exact top-k cosine neighbors of each query vector (brute force —
    * the baseline every ANN variant is measured against). `queries` and
    * `corpus` carry (idCol, vecCol) and MUST share one id space —
    * self-matches are excluded by id equality, so a query batch is
    * expected to be a (filtered) subset of the corpus. For a probe set
    * from a different table, give it ids outside the corpus range.
    */
  def topKCosine(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = quantize(corpus, idCol, vecCol)
    val q = quantize(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
    val scored = broadcast(q)
      .join(c, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(call_function("dot_long", col("q_qv"), col("qv")),
          col("q_nq"), col("nq")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Sign-bucket of a quantized vector under 8 fixed integer hyperplanes
    * (array literals dotted via the codegen'd kernel): h_i[d] =
    * ((i·64+d−1)·2654435761) mod 2³¹ − 2³⁰ — deterministic, no RNG, so
    * the approximation itself is reproducible.
    */
  private val planes: IndexedSeq[Column] = (0 until 8).map { i =>
    typedLit((1 to 64).map(d =>
      ((i * 64L + d - 1) * 2654435761L) % 2147483648L - 1073741824L))
  }

  def bucketOf(qv: Column): Column =
    (0 until 8).map(i =>
      when(call_function("dot_long", qv, planes(i)) >= 0, lit(1L << (7 - i)))
        .otherwise(lit(0L)))
      .reduce(_ + _)

  /** Bucketed ANN: candidates = corpus vectors in the query's hyperplane
    * sign bucket (~1/256 of the corpus per probe); exact rerank within
    * the bucket. The 100 TB path — the corpus scan prunes to matching
    * buckets (partition the stored corpus by bucket for physical pruning).
    * Same id-space contract as [[topKCosine]].
    */
  def bucketedAnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = quantize(corpus, idCol, vecCol).withColumn("bucket", bucketOf(col("qv")))
    val q = quantize(queries, idCol, vecCol).withColumn("bucket", bucketOf(col("qv")))
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nq").as("q_nq"), col("bucket").as("q_bucket"))
    val scored = broadcast(q)
      .join(c, col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineOf(call_function("dot_long", col("q_qv"), col("qv")),
          col("q_nq"), col("nq")).as("cosine"))
    rankTopK(scored, k)
  }
}
