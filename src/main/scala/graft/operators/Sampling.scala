package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators — the reproducibility-critical
  * counterpart of `df.sample()` for training-data pipelines: a corpus
  * sample must be identical across runs, engines, partitionings, and
  * retries, so selection is a pure function of the row key (a Knuth
  * multiplicative hash), never an RNG.
  *
  * Scale: both operators are narrow filters over the scan — no shuffle,
  * no driver state; the hash predicate pushes into codegen.
  */
object Sampling {

  /** Pseudo-random bucket in [0, 100) from a key column: Knuth
    * multiplicative hash with the low 16 product bits discarded before
    * the mod — deterministic, reproducible in any SQL engine, and
    * structure-resistant (a raw `key*C mod 100` residue would depend only
    * on the key's last decimal digits, so stride-100 keys would all land
    * in one bucket; dropping the low bits and modding the remaining ~46
    * mixes the full key). The key folds to 31 bits first so the multiply
    * can't overflow int64 (ANSI mode makes overflow an error, not a wrap).
    *
    * Contract: keys are expected non-negative (pmod keeps negatives
    * uniform on the Spark side, but plain SQL `%` follows the dividend's
    * sign — mirror the pmod explicitly if negative ids must replay in an
    * oracle); a NULL key never passes the filter (NULL bucket compares
    * NULL), so null-key rows are dropped even at percent=100.
    */
  def hashBucket(key: Column): Column =
    pmod(shiftright(pmod(key.cast("long"), lit(2147483648L)) * 2654435761L,
      16), lit(100L))

  /** Keep ~`percent`% of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashBucket(key) < percent)

  /** Stratified deterministic sample: per-stratum keep-rates (percent by
    * stratum value; missing strata default to `defaultPercent`).
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], defaultPercent: Int = 0): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultPercent)) { case (acc, (value, pct)) =>
      when(stratum === value, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(key) < rateCol)
  }

  /** [[hashBucket]] at parts-per-million resolution — for rate-valued
    * (data-dependent) sampling where integer percents are too coarse.
    * Same Knuth mix, same contracts (non-negative keys, NULL never
    * passes); the ~46 post-shift bits give every ppm bucket ~2^26
    * distinct residues, so ppm-level rates stay unbiased.
    */
  def hashBucketPpm(key: Column): Column =
    pmod(shiftright(pmod(key.cast("long"), lit(2147483648L)) * 2654435761L,
      16), lit(1000000L))

  /** Deterministic downsample to TARGET DOMAIN PROPORTIONS — the
    * training-corpus "data mixing" step: given integer weights per
    * domain value (source, language, …), keep the LARGEST subset whose
    * domain counts are proportional to the weights. The binding domain
    * (the one that runs out first, i.e. minimal count/weight) is kept at
    * 100%; every other domain's keep-rate follows in exact integer
    * parts-per-million:
    *
    *   rate_ppm(d) = (1e6 · cnt(binding) · w(d)) div (w(binding) · cnt(d))
    *
    * All-integer arithmetic end to end — the rates (and therefore the
    * kept set) are bit-identical on any engine that replays the formula.
    * Overflow bound: 1e6·cnt·w must fit int64, i.e. cnt·w ≤ 9.2e12 per
    * domain — comfortable for any real corpus (1e10 docs × w≤100);
    * switch the rate expression to DECIMAL(38,0) beyond that. Rows whose
    * domain is absent from `weights` (or NULL) are dropped.
    *
    * Scale: one hash-agg for the per-domain counts (|domains| rows), a
    * 1-row binding selection with a (ratio, domain) tiebreak, and a
    * broadcast rate join back onto the scan — the data path itself is a
    * narrow filter, exactly like [[hashSample]]; nothing all-pairs,
    * nothing driver-side.
    */
  def mixToTarget(df: DataFrame, key: Column, domainCol: String,
      weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"positive weights required, got $weights")
    val spark = df.sparkSession
    val wdf = spark.createDataFrame(
      weights.toSeq.map { case (d, w) => (d, w.toLong) }).toDF("__dom", "__w")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__cnt"))
      .join(wdf, "__dom") // inner: unlisted/NULL domains drop here
    // binding = argmin count/weight; the double ratio is the same IEEE
    // division on every engine, and equal ratios as REALS yield equal
    // rates below regardless of which argmin wins, so the domain
    // tiebreak only needs to match when ratios are double-equal (it
    // does: lexicographic on both sides)
    val binding = counts
      .orderBy((col("__cnt").cast("double") / col("__w")).asc,
        col("__dom").asc)
      .limit(1)
      .select(col("__cnt").as("__bc"), col("__w").as("__bw"))
    val rates = counts.crossJoin(binding) // scalar × |domains|
      .select(col("__dom"),
        expr("(1000000L * __bc * __w) div (__bw * __cnt)").as("rate_ppm"))
    df.join(broadcast(rates), col(domainCol) === col("__dom"))
      .filter(hashBucketPpm(key) < col("rate_ppm"))
      .drop("__dom")
  }

  /** Temperature-scaled mixture shares (the XLM-R / mC4 idiom, Conneau
    * et al. 2020: q_l ∝ p_l^α) — the step that COMPUTES the mixture a
    * downsampler ([[mixToTarget]]) or epoch planner ([[mixtureEpochs]])
    * consumes: α < 1 upweights scarce domains (α = 0.5 the common
    * multilingual default), α = 1 keeps natural proportions. Output one
    * row per non-NULL domain: `(domain, n_docs, share_ppm)`.
    *
    * Oracle parity: the two floating steps (p_l = n_l/N and the power)
    * are each ONE IEEE operation on exact integers, then quantized ×10⁶
    * to bigints BEFORE the normalizing sum (the x33 law: no
    * data-ordered float accumulation). α ∈ {1, 0.5, 0.25} reduce to
    * correctly-rounded division/sqrt — bit-identical on any engine;
    * other α fall back to `pow`, which is only ~1-ulp on either side
    * and therefore NOT hash-stable cross-engine (documented, not
    * default).
    */
  def temperatureShares(df: DataFrame, domainCol: String,
      alpha: Double = 0.5): DataFrame = {
    // α ≤ 0 inverts the mixture (upweights empty domains toward ∞) and
    // α > 1 sharpens instead of flattening — both outside the method's
    // contract, and large α can floor-quantize EVERY weight to 0
    require(alpha > 0 && alpha <= 1,
      s"temperatureShares: alpha must be in (0, 1], got $alpha")
    val spark = df.sparkSession
    // ONE corpus aggregate, then driver-side arithmetic: the per-domain
    // count frame is bounded by contract (domains are languages/sources
    // — dozens, the same boundedness mixToTarget's weights map assumes),
    // while the previous all-DataFrame formulation re-executed the
    // corpus scan once per derived aggregate (~4 scans — r8 review).
    // The math is identical: exact long sums, one IEEE division, one
    // correctly-rounded power step, ×10⁶ floor-quantization, exact
    // integer normalization.
    // cast in the aggregate: a non-string domain column (int language
    // id, date-partition source) shares the path instead of a bare
    // ClassCastException at getString (r8 advice)
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty,
      s"temperatureShares: no non-NULL '$domainCol' values")
    val total = counts.map(_._2).sum
    def tpow(p: Double): Double = alpha match {
      case 1.0  => p
      case 0.5  => math.sqrt(p)
      case 0.25 => math.sqrt(math.sqrt(p))
      case a    => math.pow(p, a)
    }
    val w = counts.map { case (d, n) =>
      (d, n, math.floor(tpow(n.toDouble / total) * 1000000L).toLong)
    }
    val ws = w.map(_._3).sum
    // with α ≤ 1 the LARGEST domain's weight quantizes to ≥ ⌊(1/D)^α·10⁶⌋
    // > 0 for any realistic domain count, but guard anyway: a zero sum
    // here must read as "quantization underflow", not a bare /0
    require(ws > 0,
      s"temperatureShares: all ${counts.length} domain weights quantized " +
        "to 0 (×10⁶) — domain cardinality is too high for the ppm grid")
    spark.createDataFrame(w.toSeq.map { case (d, n, wi) =>
      (d, n, 1000000L * wi / ws)
    }).toDF("domain", "n_docs", "share_ppm")
  }

  /** Quality-aware resampling — the "don't throw ALL the low-quality
    * data away" step of a training-corpus pipeline (a quality-filtered
    * corpus still wants a small, reproducible slice of the rejected tail
    * for robustness and for auditing the filter itself): rows passing
    * `keepFlag` sample at `keepPct`%, the rest at `tailPct`%. Selection
    * composes the deterministic [[hashBucket]] with ANY boolean quality
    * signal (a metrics threshold, a classifier verdict), so the sample
    * replays bit-identically wherever the flag does. NULL flags take the
    * tail rate (a row of unknown quality is not a keeper).
    *
    * Scale: like [[hashSample]] — a narrow codegen'd filter over the
    * scan (the flag is a projection, the rate a CASE); no shuffle, no
    * driver state, regardless of corpus size.
    */
  def qualityResample(df: DataFrame, key: Column, keepFlag: Column,
      keepPct: Int, tailPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100 && tailPct >= 0 && tailPct <= 100,
      s"percents must be in [0,100], got keep=$keepPct tail=$tailPct")
    df.filter(hashBucket(key) <
      when(coalesce(keepFlag, lit(false)), lit(keepPct.toLong))
        .otherwise(lit(tailPct.toLong)))
  }

  /** Deterministic pseudo-random SORT key from a row key: a 31-bit
    * multiply–xorshift mixer (two rounds of ·odd-constant mod 2^31 then
    * h ^= h >> k — each step a bijection, so distinct keys in a 2^31
    * window get distinct sort keys), with the salt added BEFORE mixing
    * so each salt is an independent permutation. The [[hashBucket]]
    * shape (multiply, keep HIGH bits) is NOT enough here: without a
    * final mod the product is monotonic in the key until it first
    * overflows (key ~3.5e9), i.e. no shuffle at all — an ORDERING needs
    * the mod-2^31 wraparound plus xor-shifts to break the resulting
    * arithmetic lattice. Every intermediate stays below 2^62, so engines
    * with checked int64 arithmetic (DuckDB) replay it verbatim.
    * Contracts as [[hashBucket]]: non-negative keys, NULL yields NULL.
    */
  def shuffleKey(key: Column, salt: Long): Column = {
    require(salt >= 0, s"non-negative salt required, got $salt")
    val m = lit(2147483648L)
    val h1 = pmod(pmod(key.cast("long") + lit(salt), m) * 2654435761L, m)
    val h2 = h1.bitwiseXOR(shiftright(h1, 15))
    val h3 = pmod(h2 * 2246822519L, m)
    h3.bitwiseXOR(shiftright(h3, 13))
  }

  /** Per-domain document cap — the web-corpus "no single domain may
    * dominate" step (cap docs per registrable domain / source before
    * training): keep at most `maxPerDomain` rows per `domainCol` value.
    * The keepers are the first `maxPerDomain` in [[shuffleKey]] order
    * (tiebreak on the row key), i.e. a REPRODUCIBLE uniform sample of
    * each domain rather than a lowest-id prefix — so the kept set is
    * unbiased w.r.t. crawl/insert order and replays bit-identically on
    * any engine that mixes the same key. NULL domains form one group
    * (both Spark and SQL window semantics put them together).
    *
    * Scale: one hash exchange on the domain key feeding a partitioned
    * window — rank state is O(1) per row; a pathologically hot domain is
    * exactly the AQE-skew case and still ranks within its partition. At
    * 100 TB pre-aggregate nothing: the window IS the single pass.
    */
  def capPerDomain(df: DataFrame, key: Column, domainCol: String,
      maxPerDomain: Int, salt: Long = 0L): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(shuffleKey(key, salt).asc, key.asc)
    df.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= maxPerDomain)
  }

  /** Deterministic training-order shuffle + shard assignment — the
    * "shuffle the corpus before training, reproducibly" step: adds
    * `shuffle_key` (sort by it, tiebreak on the row key, for a global
    * pseudo-random order that replays bit-identically across runs,
    * engines, and partitionings — `df.orderBy(rand())` does not) and
    * `shard` = shuffle_key mod `numShards` (which training file the row
    * lands in; a different salt gives an independent epoch order).
    *
    * Scale: the columns are narrow codegen'd projections — zero
    * shuffles here. Consumers sort with a range-partitioned exchange on
    * `shuffle_key` (uniform by construction — no skew, every partition
    * an even slice) or `partitionBy("shard")` at write time; both are
    * the plans you want at 100 TB.
    */
  def shuffleShard(df: DataFrame, key: Column, numShards: Int,
      salt: Long = 0L): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    df.withColumn("shuffle_key", shuffleKey(key, salt))
      .withColumn("shard", pmod(col("shuffle_key"), lit(numShards.toLong)))
  }

  /** Deterministic multi-way dataset split — the train/val/test
    * assignment every pipeline needs: the row's [[hashBucketPpm]] bucket
    * falls into consecutive ppm ranges, one per named split, so the
    * assignment is a pure function of the key (reproducible across runs,
    * engines, and partitionings — and STABLE under corpus growth: a row
    * never migrates between splits when other rows arrive, unlike
    * `randomSplit`). `splits` are (name, ppm) in declared order and must
    * sum to 1,000,000 so every keyed row lands somewhere. A NULL key
    * gets a NULL split — consistent with the library's "NULL key never
    * passes" sampling contract (an earlier version let NULL buckets
    * fall through every `when` into the LAST declared split, silently
    * training on unkeyed rows).
    *
    * Scale: one narrow codegen projection over the scan — no shuffle,
    * no sampling pass.
    */
  def assignSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"positive ppm shares required, got $splits")
    require(splits.map(_._2).sum == 1000000L,
      s"split ppm must sum to 1000000, got ${splits.map(_._2).sum}")
    val bucket = hashBucketPpm(key)
    val bounds = splits.scanLeft(0L)(_ + _._2).tail // cumulative upper ppm
    val expr0 = splits.zip(bounds).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", when(bucket.isNotNull, expr0))
  }

  /** Token-weighted mixture EPOCH plan — the complement of
    * [[mixToTarget]] (which downsamples): given target mixture shares in
    * ppm per domain, compute per-domain token counts and how many
    * EPOCHS (repeat passes) of each domain a training run needs so the
    * effective mixture hits the target without discarding scarce-domain
    * data. This is the planning step of a curated pretraining mix: the
    * output drives a downstream repeat-and-interleave materialization.
    *
    * Output per listed domain: `n_docs`, `n_tokens`, `actual_ppm`
    * (floor(tokens·10⁶ / total) — the domain's organic share) and
    * `epochs` = ceil(target_ppm / actual_ppm), all in exact bigint
    * arithmetic (floor-div + ceil-div round identically on every
    * engine; no doubles anywhere). Domains absent from `targetPpm` are
    * excluded from BOTH the totals and the output, mirroring
    * mixToTarget's inner-join contract.
    *
    * Scale: one map-side-combinable aggregate over the corpus (tokens
    * counted with size(split) — a codegen projection), then arithmetic
    * on |domains| rows. The exact bigint form holds to ~9·10¹² total
    * tokens (long overflow in tokens·10⁶); past that switch the ppm
    * computation to decimal(38,0).
    */
  def mixtureEpochs(df: DataFrame, domainCol: String, textCol: String,
      targetPpm: Map[String, Long]): DataFrame = {
    require(targetPpm.nonEmpty && targetPpm.values.forall(_ > 0),
      s"positive target ppm shares required, got $targetPpm")
    val spark = df.sparkSession
    val tdf = spark.createDataFrame(targetPpm.toSeq)
      .toDF("__dom", "target_ppm")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
      .join(broadcast(tdf), "__dom") // inner: unlisted domains drop here
    val total = counts.agg(sum(col("n_tokens")).as("__total"))
    counts.crossJoin(total) // scalar × |domains|
      .select(col("__dom").as(domainCol), col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 1000000L) div __total").as("actual_ppm"),
        col("target_ppm"))
      // a listed domain below 1 ppm floors to actual_ppm = 0 — exactly
      // the scarce data this planner exists to keep; clamp the DIVISOR
      // to 1 ppm (ANSI mode would otherwise error, non-ANSI would NULL
      // the epochs and silently drop the domain downstream). actual_ppm
      // itself stays 0 in the output — informative, only the division
      // is guarded.
      .withColumn("epochs",
        expr("(target_ppm + greatest(actual_ppm, 1L) - 1L)" +
          " div greatest(actual_ppm, 1L)"))
  }

  /** Materialize a [[mixtureEpochs]] plan: replicate every row of its
    * domain `epochs` times, tagged with the 1-based `epoch` index — the
    * repeat half of repeat-and-interleave (compose with [[shuffleShard]]
    * keyed on (row key, epoch) for the interleave). Domains outside the
    * plan are dropped (same inner-join contract as the planner).
    *
    * Scale: the per-domain plan is |domains| rows → broadcast join onto
    * the corpus scan (no shuffle), and the explode is a narrow Generate
    * whose fan-out IS the intended output volume. At 100 TB the
    * materialized epochs feed `partitionBy(shard)` writers — rows never
    * concentrate on one executor because replication happens inside
    * each scan partition.
    *
    * `maxEpochs` guards the degenerate fan-out: a sub-ppm domain's
    * 1-ppm divisor clamp makes `epochs = target_ppm` (up to 1,000,000),
    * so an accidental plan could replicate rows a million-fold. Any
    * domain whose plan exceeds `maxEpochs` fails the JOB loudly
    * (`raise_error` inside the plan projection — distributed, no extra
    * driver action); callers that truly want a larger fan-out must say
    * so explicitly.
    */
  def materializeEpochs(df: DataFrame, domainCol: String, textCol: String,
      targetPpm: Map[String, Long], maxEpochs: Long = 1000L): DataFrame = {
    require(maxEpochs >= 1, s"need maxEpochs >= 1, got $maxEpochs")
    val plan = mixtureEpochs(df, domainCol, textCol, targetPpm)
      .select(col(domainCol),
        when(col("epochs") <= maxEpochs, col("epochs"))
          .otherwise(raise_error(concat(
            lit("materializeEpochs: domain "), col(domainCol).cast("string"),
            lit(" plans "), col("epochs").cast("string"),
            lit(s" epochs > maxEpochs=$maxEpochs — raise maxEpochs" +
              " explicitly if this fan-out is intended"))).cast("long"))
          .as("epochs"))
    df.join(broadcast(plan), domainCol)
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
      .drop("epochs")
  }
}
