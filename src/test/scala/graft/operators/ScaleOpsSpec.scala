package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** ScaleOps semantics and plan shape: salting must not change results,
  * and bucketed joins must eliminate the exchange.
  */
class ScaleOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("saltedAgg == plain agg (sum/count re-aggregation)") {
    val orders = Tables.table(spark, sfDir, "orders")
    val plain = orders.groupBy("o_orderpriority")
      .agg(sum("o_totalprice").as("total"), count(lit(1)).as("n"))
    val salted = ScaleOps.saltedAgg(orders,
      keys = Seq("o_orderpriority"),
      saltFrom = col("o_orderkey"), saltBuckets = 8,
      partials = Seq("p_total" -> sum("o_totalprice"), "p_n" -> count(lit(1))),
      finals = Seq("total" -> sum("p_total"), "n" -> sum("p_n")))
    val a = plain.orderBy("o_orderpriority").collect().map(r =>
      (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSeq
    val b = salted.orderBy("o_orderpriority").collect().map(r =>
      (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("saltedJoin == plain join") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.table(spark, sfDir, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val salted = ScaleOps.saltedJoin(li, part, "l_partkey", 4, col("l_orderkey"))
    assert(plain.count() == salted.count())
    val key = Seq("l_partkey", "l_orderkey", "l_quantity", "p_brand")
    assert(plain.groupBy(key.map(col): _*).count().orderBy(key.map(col): _*).collect().toSeq ==
      salted.groupBy(key.map(col): _*).count().orderBy(key.map(col): _*).collect().toSeq)
  }

  test("partitioned write prunes non-matching partitions at the scan") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.table(s, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
    ScaleOps.writePartitioned(events, dir, Seq("day"))
    val oneDay = s.read.parquet(dir).filter(col("day") === "2024-01-03")
    val plan = oneDay.queryExecution.executedPlan.toString
    // partition filter must reach the file index, not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-03"), plan)
    val n = oneDay.count()
    val total = s.read.parquet(dir).count()
    assert(n > 0 && n < total)
    // pruned scan reads only the matching directory
    val readFiles = oneDay.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\\n")).mkString
    assert(!readFiles.contains("day=2024-01-04") || n == total)
  }

  test("bucketed tables join without exchange") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.table(s, sfDir, "lineitem").select("l_orderkey", "l_quantity")
      val od = Tables.table(s, sfDir, "orders").select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      ScaleOps.writeBucketed(li, "b_lineitem", 8, Seq("l_orderkey"))
      ScaleOps.writeBucketed(od, "b_orders", 8, Seq("l_orderkey"))
      val joined = s.table("b_lineitem").join(s.table("b_orders"), Seq("l_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
      s.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("appendBucketed keeps the store's partitioning; spec drift fails fast") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val od = Tables.table(s, sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
      ScaleOps.writeBucketed(od.filter(col("o_orderkey") % 2 === 0),
        "b_append", 8, Seq("o_orderkey"))
      ScaleOps.appendBucketed(od.filter(col("o_orderkey") % 2 === 1),
        "b_append", 8, Seq("o_orderkey"))
      assert(s.table("b_append").count() === od.count())
      // appending with a DIFFERENT bucket spec must fail, not silently
      // break the store's co-location property
      intercept[Exception] {
        ScaleOps.appendBucketed(od, "b_append", 16, Seq("o_orderkey"))
      }
      // a bucket-key aggregate over the appended store still plans with
      // NO exchange — the append preserved the physical layout contract
      val agg = s.table("b_append").groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"appended store re-shuffles:\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS b_append")
    }
  }

  test("runtime bloom filter prunes the fact scan under a selective dim filter") {
    // the 100 TB mechanism: a selective filter on the build side injects
    // a bloom_filter_might_contain predicate into the fact-side scan at
    // optimization time, so most of the big table is dropped BEFORE the
    // join shuffle. Thresholds are tuned for production sizes (apply
    // side >= 10GB), so pin them down to make the injection observable
    // at test scale; restore every conf afterwards.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.table(spark, sfDir, "lineitem")
      val p = Tables.table(spark, sfDir, "part")
        .filter(col("p_brand") === "Brand#11") // selective build side
      val joined = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        plan)
      joined.collect() // and the plan actually executes
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the RUNTIME complement of saltedJoin: when a shuffle partition's
    // size exceeds factor×median and the threshold, AQE splits it across
    // extra tasks mid-query with no code change. Thresholds are tuned
    // for production sizes, so pin them down to observe the split at
    // test scale; restore every conf afterwards.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 7 carries 200k fact rows (~MBs on the shuffle); every other
      // key is tiny — the canonical straggler shape
      val fact = spark.range(0, 200000)
        .select(lit(7L).as("k"), col("id").as("v"))
        .unionByName(spark.range(0, 1000)
          .select((col("id") % 97).as("k"), col("id").as("v")))
      val dim = spark.range(0, 100)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // collect() (not count()) — count builds a different plan tree and
      // the AQE final plan lives on the executed query's own DF
      assert(joined.collect().length === 201000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("zOrderValue: exact bit interleave, bijective on the grid") {
    val s = spark
    import s.implicits._
    val bits = 3
    val grid = (for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = grid.select(col("x"), col("y"),
        ScaleOps.zOrderValue(col("x"), col("y"), bits).as("z"))
      .as[(Long, Long, Long)].collect()
    def interleave(x: Long, y: Long): Long =
      (0 until bits).map(k => (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))).sum
    out.foreach { case (x, y, z) => assert(z == interleave(x, y), s"($x,$y)") }
    assert(out.map(_._3).toSet == (0L until 64L).toSet) // bijection
    intercept[IllegalArgumentException] {
      ScaleOps.zOrderValue(col("x"), col("y"), 0)
    }
  }

  test("zOrder layout: one range-sort prunes min/max stats on BOTH dimensions") {
    val s = spark
    import s.implicits._
    // full 64×64 grid, one row per cell — the clustering claim in its
    // purest form. 16 range partitions on z = 16 contiguous z-runs of
    // 256 cells = 16×16 squares, so an 8-wide band in EITHER dimension
    // overlaps only the square-row (or column) it cuts through.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", ScaleOps.zOrderValue(col("x"), col("y"), 6))
    def overlapping(df: org.apache.spark.sql.DataFrame, dim: String,
        lo: Long, hi: Long): Long =
      df.groupBy(spark_partition_id().as("p"))
        .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()
    val zSorted = grid.repartitionByRange(16, col("z")).cache()
    try {
      assert(zSorted.rdd.getNumPartitions == 16)
      val byX = overlapping(zSorted, "x", 8, 15)
      val byY = overlapping(zSorted, "y", 8, 15)
      // a single-column sort leaves the OTHER dimension unprunable —
      // every partition spans it
      val xSorted = grid.repartitionByRange(16, col("x")).cache()
      val xSortedByY = overlapping(xSorted, "y", 8, 15)
      assert(byX <= 8, s"x-band overlaps $byX of 16")
      assert(byY <= 8, s"y-band overlaps $byY of 16")
      assert(xSortedByY == 16, s"expected no y-pruning under x-sort, got $xSortedByY")
      xSorted.unpersist()
    } finally zSorted.unpersist()
  }

  test("ORC roundtrip (x38 shape): lossless, filter pushed to the ORC scan") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = Tables.table(s, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    docs.write.mode("overwrite").orc(dir)
    val back = s.read.orc(dir)
    assert(back.count() === docs.count())
    val filtered = back.filter(col("n_chars") >= 300)
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate must reach the ORC scan's PushedFilters (stripe-stat
    // skipping at scale), not survive only as a post-scan Filter
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(n_chars,300)"),
      plan)
    assert(filtered.count() ===
      docs.filter(col("n_chars") >= 300).count())
  }
}
