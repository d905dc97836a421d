package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics for 100 TB operation (SURVEY.md §4 100 TB notes):
  * bucketed materialization for shuffle-free co-located joins, and
  * deterministic salting for skewed keys. These are library utilities —
  * the demos stay declarative, but a production pipeline applies these at
  * the points where a key's cardinality profile demands it.
  */
object ScaleOps {

  /** Materialize `df` bucketed by `keys` so downstream equi-joins and
    * aggregations on those keys read pre-partitioned data with NO
    * exchange: both sides of a join bucketed to the same count on the
    * join keys co-locate bucket-for-bucket. This is the batch analogue
    * of co-partitioned storage — at 100 TB the exchange this avoids is
    * the dominant cost of a fact-fact join.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Materialize `df` hive-partitioned by `partitionCols` (e.g. a date
    * bucket): queries filtering on those columns prune at the DIRECTORY
    * level — at 100 TB a day-grain query then touches 1/365th of the
    * files, before any row is read. Pick partition columns of bounded
    * cardinality (date, region), never high-cardinality keys (file-per-
    * value explosion); bucket WITHIN partitions for join co-location.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Two-phase aggregation with a deterministic salt: phase 1 aggregates
    * on (keys × salt) so a hot key's rows spread over `saltBuckets`
    * reducers; phase 2 re-aggregates the partials on the true keys.
    * Correct for re-aggregable aggregates (sum/count/min/max — pass the
    * partial→final pairs). `saltFrom` should be a high-cardinality column
    * (row id); the salt is a hash, never an RNG, so runs are reproducible.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFrom: Column,
      saltBuckets: Int, partials: Seq[(String, Column)],
      finals: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Skew-safe equi-join of a large fact against a small-but-not-tiny
    * dimension: the fact side gets a deterministic salt in [0, n), the
    * dimension replicates n-fold, and the join key becomes (key, salt) —
    * a hot key's fact rows land on n reducers instead of one. Use when
    * the dim is too big to broadcast and AQE's skew split isn't enough.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, saltFrom: Column,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltFrom), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
