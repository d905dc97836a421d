package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition (SURVEY.md §2B X3/X5 extension): fuse
  * independent per-document rankings — lexical BM25
  * ([[TextAnalysis.bm25TopK]]), vector cosine ([[VectorSearch
  * .topKCosine]]), or any other (id, rank) frame — into one result list.
  * The RAG-ingest shape: retrieval quality at corpus scale comes from
  * fusing cheap heterogeneous retrievers, not from one perfect one.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    * fused(d) = Σ_legs 1/(kRrf + rank_leg(d)), summing only the legs
    * where d appears; ties break on id. The classic kRrf = 60 damps any
    * single leg's top ranks so CONSENSUS beats one-leg enthusiasm.
    *
    * Determinism/oracle parity: each term is one exact IEEE division
    * and the legs sum in declared order as one fixed expression tree —
    * no data-dependent accumulation order, so scores replay
    * bit-identically in SQL. Output: (fused_rank, id, rrf_score,
    * rank_0 … rank_{n-1}) with per-leg ranks NULL where absent.
    *
    * Scale: each leg is already a bounded top-k frame (k rows per
    * query), so the fusion join is k-bounded regardless of corpus size;
    * the final rank window runs over the LIMIT-ed fused rows only —
    * never a corpus-scale global sort.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    require(kRrf >= 1 && topK >= 1, "kRrf and topK must be positive")
    val legs = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$i"))
    }
    val joined = legs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf) + col(s"rank_$i")), lit(0.0)))
      .reduce(_ + _)
    val top = joined
      .select(col(idCol) +: score.as("rrf_score") +:
        rankings.indices.map(i => col(s"rank_$i")): _*)
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK) // TakeOrdered — distributed partial top-k
    top
      .withColumn("fused_rank", row_number().over( // topK rows only
        Window.orderBy(col("rrf_score").desc, col(idCol).asc)))
      .select(col("fused_rank") +: col(idCol) +: col("rrf_score") +:
        rankings.indices.map(i => col(s"rank_$i")): _*)
  }
}
