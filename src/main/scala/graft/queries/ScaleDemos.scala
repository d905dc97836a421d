package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Scale-mechanics demonstrators: the skew-handling machinery of
  * [[graft.operators.ScaleOps]] run as oracle-checked queries, proving
  * the two-phase plans produce IDENTICAL results to their naive
  * single-phase equivalents (the oracle IS the naive formulation).
  * Bucketed/partitioned storage stays spec-only (ScaleOpsSpec pins the
  * no-Exchange and partition-pruning plans) — materializing warehouse
  * tables inside a read-only query demo would be a side effect.
  */
object ScaleDemos {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // -------------------------------------------------------------------
  // X14: salted two-phase aggregation over the 3-value l_returnflag key —
  // the skew pattern: a direct groupBy on a 3-key column funnels 600k
  // rows into 3 reducers; the salt spreads each hot key over 16 partials
  // first, then re-aggregates 48 partial rows. The oracle is the PLAIN
  // single-phase GROUP BY — same result by re-aggregability of
  // sum/count; the salt never leaks into the output. l_quantity is
  // integer-valued, so sums stay exact longs under any partial order.
  // -------------------------------------------------------------------
  private val x14 = Demo("x14_salted_agg", Some("""
      SELECT l_returnflag,
             cast(count(*) AS bigint) AS n_items,
             cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag ASC NULLS LAST"""),
    (s, dir) => ScaleOps.saltedAgg(
        t(s, dir, "lineitem"),
        keys = Seq("l_returnflag"),
        saltFrom = col("l_orderkey"),
        saltBuckets = 16,
        partials = Seq(
          "n_p" -> count(lit(1)),
          "sq_p" -> sum(col("l_quantity").cast("long"))),
        finals = Seq(
          "n_items" -> sum(col("n_p")),
          "sum_qty" -> sum(col("sq_p"))))
      .orderBy(col("l_returnflag").asc_nulls_last))

  // -------------------------------------------------------------------
  // X17: join-key skew diagnostic — ScaleOps.keySkewProfile over the
  // events user_id key: top-10 heaviest values with count and frequency
  // share. This is the measurement that decides whether x14's salting is
  // warranted. The share division is one double op over exact integers;
  // ties rank deterministically by (count DESC, key ASC).
  // -------------------------------------------------------------------
  private val x17 = Demo("x17_key_skew", Some("""
      WITH counts AS (SELECT user_id AS key, count(*) AS cnt
                      FROM events GROUP BY 1),
      total AS (SELECT sum(cnt) AS total FROM counts),
      top AS (SELECT key, cnt,
                     row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
              FROM counts ORDER BY cnt DESC, key ASC LIMIT 10)
      SELECT rank, key, cnt,
             cast(cnt AS double) / cast(total AS double) AS share
      FROM top CROSS JOIN total
      ORDER BY rank ASC NULLS LAST"""),
    (s, dir) => ScaleOps.keySkewProfile(
        t(s, dir, "events"), col("user_id"), topK = 10)
      .orderBy(col("rank").asc_nulls_last))

  // -------------------------------------------------------------------
  // X24: JSONL SINK → SOURCE round-trip — JSON-lines is the standard
  // training-data interchange format; this demo writes the documents
  // corpus as JSONL and reads it back with an EXPLICIT schema (no
  // inference pre-scan — at 100 TB schema inference is a full extra
  // read), emitting the round-tripped rows. The oracle reads the
  // ORIGINAL parquet, so the hash-match proves the JSON escaping
  // round-trip is lossless byte-for-byte, including multi-line and
  // non-ASCII text. Scale: both sides are splittable line-oriented
  // scans; the sink is a narrow per-partition write.
  // -------------------------------------------------------------------
  private def freshScratchDir(name: String): String = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_demo_$name")
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    root.toString
  }

  private val x24 = Demo("x24_jsonl_roundtrip", Some("""
      SELECT doc_id, text, lang, source, n_chars
      FROM documents
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val scratch = freshScratchDir("x24_jsonl")
      docs.write.mode("overwrite").json(scratch)
      s.read.schema(docs.schema).json(scratch)
        .orderBy(col("doc_id").asc_nulls_last)
    })

  val all: Seq[Demo] = Seq(x14, x17, x24)
}
