package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Deduplication operators for LLM-data pipelines (SURVEY.md §2B X1/X2)
  * over the `documents` / `embeddings` tables: exact keep-first dedup,
  * MinHash+LSH near-dup detection, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Oracle-parity design: every hash is deterministic integer arithmetic
  * (graft.functions.Hashing) reproducible in DuckDB SQL; similarity scores
  * are exact-integer ratios so the final doubles are bit-identical across
  * engines. No engine-native hash functions, no RNG.
  */
object DedupDemos {

  import Hashing.{Mod, P}

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** tokens of a document text (whitespace tokenization). */
  private val toks: Column = split(col("text"), " ")

  /** Distinct 3-token shingles of the token array. Callers must filter
    * size(toks) >= 3 first (Spark `sequence` steps backwards when
    * start > stop, so an unguarded `sequence(0, size-3)` is a trap).
    */
  private def shingleSet(tokens: Column): Column =
    array_distinct(
      transform(sequence(lit(0), size(tokens) - 3), i =>
        concat_ws(" ",
          element_at(tokens, i + 1),
          element_at(tokens, i + 2),
          element_at(tokens, i + 3))))

  /** DuckDB equivalents of the shared CTEs (same shingle definition).
    * `extraWhere` bounds brute-force demos to a fixed sample (see x2c).
    */
  private def oracleShingleCtes(extraWhere: String = ""): String = s"""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3$extraWhere),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(toks)-2),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shs
        FROM tok)"""

  /** Exact pairwise shingle-set Jaccard (used by both the brute-force n-gram
    * demo and as the verification stage of the LSH demo).
    */
  private def jaccardOfSets(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  private def oracleJaccardPairs(threshold: Double, extraWhere: String = ""): String = s"""
      ${oracleShingleCtes(extraWhere)}
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             cast(len(list_intersect(a.shs, b.shs)) AS double)
               / (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE jaccard >= $threshold
      ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST"""

  /** docs with >= 3 tokens and their distinct shingle sets. The token
    * array goes through its own projection so `split(text)` materializes
    * once per row — inlining it into the shingle lambda would recompute
    * the split per element_at (O(tokens²·chars) per doc; CollapseProject
    * keeps the boundary because the reference is non-cheap and repeated).
    */
  private def tokArrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)

  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    tokArrays(s, dir)
      .select(col("doc_id"), shingleSet(col("toks")).as("shs"))

  // -------------------------------------------------------------------
  // X1: exact dedup — keep-first by key via window row_number. Scales as
  // one hash shuffle on the key; no driver state, no dropDuplicates
  // (whose keep-"first" depends on partition order).
  // -------------------------------------------------------------------
  private val x1 = Demo("x1_dedup_exact", Some("""
      SELECT lang, source, doc_id
      FROM (SELECT lang, source, doc_id,
                   row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
            FROM documents)
      WHERE rn = 1
      ORDER BY lang ASC NULLS LAST, source ASC NULLS LAST"""),
    (s, dir) => t(s, dir, "documents")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("lang"), col("source"), col("doc_id"))
      .orderBy(col("lang").asc_nulls_last, col("source").asc_nulls_last))

  // -------------------------------------------------------------------
  // X2a: document fingerprint — rolling hash over the token sequence of
  // char-polynomial token hashes. Pure narrow projection; also the parity
  // canary for the nested higher-order-function hash machinery.
  // -------------------------------------------------------------------
  private val tokenHashes: Column =
    transform(toks, tk => call_function("char_poly_hash", tk))

  private val x2a = Demo("x2a_fingerprint", Some(s"""
      SELECT doc_id,
             list_reduce(
               list_prepend(cast(0 AS bigint),
                 list_transform(string_split(text, ' '), tk ->
                   list_reduce(
                     list_prepend(cast(0 AS bigint),
                       list_transform(generate_series(1, length(tk)), i ->
                         cast(ascii(substr(tk, i, 1)) AS bigint))),
                     (acc, v) -> (acc * 31 + v) % $Mod))),
               (acc, h) -> (acc * 131 + h) % $Mod) AS fingerprint
      FROM documents
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => {
      Hashing.registerAll(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          aggregate(tokenHashes, lit(0L), (acc, h) => (acc * 131 + h) % Mod)
            .as("fingerprint"))
        .orderBy(col("doc_id").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X2b: MinHash + LSH near-dup pairs — THE 100 TB dedup path.
  // tokenize → shingle → char-poly hash → 128 minhash permutations
  // (map-side-combinable min aggregates) → 64 bands of r=2 → self-join on
  // band key → exact Jaccard verify on candidates → threshold 0.5.
  // At j >= 0.5 the miss probability per pair is (1-j^2)^64 <= 1e-8, so the
  // output equals the brute-force oracle with overwhelming probability while
  // the cluster-side cost is O(n · bands) shuffle instead of O(n^2).
  // -------------------------------------------------------------------
  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    Hashing.registerAll(s)
    val sets = shingleSets(s, dir)
    val hashed = tokArrays(s, dir)
      .select(col("doc_id"), explode(shingleSet(col("toks"))).as("sh"))
      .select(col("doc_id"), call_function("char_poly_hash", col("sh")).as("x"))
      .groupBy("doc_id")
      .agg(udaf(graft.functions.MinHashAgg).apply(col("x")).as("sig"))
    val bands = hashed.select(col("doc_id"),
      explode(array((0 until 64).map(b =>
        struct(lit(b).as("band"),
          (element_at(col("sig"), 2 * b + 1) * P
            + element_at(col("sig"), 2 * b + 2)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // candidate pairs per bucket via collect + in-bucket pair expansion —
    // evaluates the minhash pipeline ONCE (a band self-join would run it
    // twice); bucket membership lists are tiny (binomial tail), so the
    // per-bucket pair product is bounded
    val cand = bands.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("ds")) - 1), i =>
          transform(sequence(i + 1, size(col("ds"))), j =>
            struct(element_at(col("ds"), i).as("id_a"),
              element_at(col("ds"), j).as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("shs").as("shs_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("shs").as("shs_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardOfSets(col("shs_a"), col("shs_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
  }

  private val x2b = Demo("x2b_minhash_lsh", Some(oracleJaccardPairs(0.5)), minhashPairs)

  // -------------------------------------------------------------------
  // X2c: exact n-gram (3-token shingle) Jaccard via an INVERTED-INDEX
  // join — the exact semantics the LSH path approximates, full corpus.
  // explode(shingle) → self-join on the shingle key → count shared
  // shingles per pair → jaccard from exact set sizes. Every pair with
  // jaccard >= t shares >= 1 shingle, so this equals the all-pairs scan
  // while touching only co-occurring docs: O(Σ posting² per shingle)
  // instead of O(n²). At 100 TB you additionally drop stop-shingles
  // (document frequency cap) to bound the worst posting list — the same
  // frequency cut every production near-dup pipeline applies.
  // -------------------------------------------------------------------
  private val x2c = Demo("x2c_ngram_jaccard",
    Some(oracleJaccardPairs(0.05)),
    (s, dir) => {
      val td = tokArrays(s, dir)
      // explode the shingle expression directly (not a pre-projected column):
      // keeps the Generate adjacent to the scan with one array build per row,
      // instead of re-evaluating a projected array in pushed-down filters
      val sizes = td.select(col("doc_id"), size(shingleSet(col("toks"))).as("n"))
      val posts = td.select(col("doc_id"), explode(shingleSet(col("toks"))).as("sh"))
      // per-shingle posting list → in-list pair expansion → count of shared
      // shingles per pair. One evaluation of the postings (a self-join
      // would run the shingle pipeline twice); posting lists are short, so
      // the per-shingle pair product is bounded — the stop-shingle
      // frequency cap noted above bounds it at open-web scale.
      posts.groupBy(col("sh"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(1), size(col("ds")) - 1), i =>
            transform(sequence(i + 1, size(col("ds"))), j =>
              struct(element_at(col("ds"), i).as("id_a"),
                element_at(col("ds"), j).as("id_b")))))).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.05)
        .orderBy(col("id_a").asc_nulls_last, col("id_b").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X2d: SimHash — 30-bit signature from per-token votes. Explode-based:
  // (doc, token) → (doc, bit, ±1 vote) → bit majorities → packed signature.
  // All shuffle-aggregated (map-side combine on (doc_id, bit)); signature
  // comparison (hamming distance) is then a cheap self-join on small output.
  // -------------------------------------------------------------------
  private val x2d = Demo("x2d_simhash", Some(s"""
      WITH th AS (
        SELECT doc_id,
               list_reduce(
                 list_prepend(cast(0 AS bigint),
                   list_transform(generate_series(1, length(tok)), i ->
                     cast(ascii(substr(tok, i, 1)) AS bigint))),
                 (acc, v) -> (acc * 31 + v) % $Mod) AS x
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      votes AS (
        SELECT doc_id, bit,
               sum(CASE WHEN (x >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, generate_series(0, 29) AS g(bit)
        GROUP BY doc_id, bit)
      SELECT doc_id,
             cast(sum(CASE WHEN v > 0 THEN (cast(1 AS bigint) << bit) ELSE 0 END)
                  AS bigint) AS simhash
      FROM votes
      GROUP BY doc_id
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => {
      Hashing.registerAll(s)
      t(s, dir, "documents")
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), call_function("char_poly_hash", col("tok")).as("x"))
      .select(col("doc_id"), col("x"), explode(sequence(lit(0), lit(29))).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(when(expr("(x >> bit) & 1") === 1, 1).otherwise(-1)).as("v"))
      .groupBy("doc_id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(cast(1 as bigint), bit)"))
        .otherwise(0L)).as("simhash"))
      .orderBy(col("doc_id").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X2e: embedding-cosine near-dup pairs. Embeddings are quantized to
  // int64 (floor(x * 10^4)) so dot products and norms are EXACT integers;
  // the final cosine is one deterministic IEEE expression — bit-identical
  // across engines. Brute-force O(n^2) pairs, bounded to a fixed 1000-vector
  // sample; the bucketed full-corpus scale path is in SimilarityDemos (x3b).
  // -------------------------------------------------------------------
  private val x2e = Demo("x2e_embed_neardup", Some("""
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                 cast(floor(cast(x AS double) * 10000) AS bigint)) AS qv
        FROM embeddings
        WHERE vec_id < 1000),
      n AS (
        SELECT vec_id, qv,
               cast(list_sum(list_transform(qv, v -> v * v)) AS bigint) AS nq
        FROM q)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             cast(cast(list_sum(list_transform(generate_series(1, 64),
                    i -> a.qv[i] * b.qv[i])) AS bigint) AS double)
               / (sqrt(cast(a.nq AS double)) * sqrt(cast(b.nq AS double))) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE cosine >= 0.4
      ORDER BY vec_a ASC NULLS LAST, vec_b ASC NULLS LAST"""),
    (s, dir) => {
      Hashing.registerAll(s)
      val q = t(s, dir, "embeddings").filter(col("vec_id") < 1000).select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 10000).cast("long")).as("qv"))
      val n = q.select(col("vec_id"), col("qv"),
        call_function("dot_long", col("qv"), col("qv")).as("nq"))
      n.alias("a")
        .join(n.alias("b"), col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          (call_function("dot_long", col("a.qv"), col("b.qv")).cast("double")
            / (sqrt(col("a.nq").cast("double")) * sqrt(col("b.nq").cast("double"))))
            .as("cosine"))
        .filter(col("cosine") >= 0.4)
        .orderBy(col("vec_a").asc_nulls_last, col("vec_b").asc_nulls_last)
    })

  val all: Seq[Demo] = Seq(x1, x2a, x2b, x2c, x2d, x2e)
}
