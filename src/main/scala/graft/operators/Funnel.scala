package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis — "how many users did A, then B after A,
  * then C after B" — the conversion query every event warehouse runs.
  *
  * Semantics: a user reaches step k+1 if they have a step-k+1 event
  * STRICTLY after their FIRST reach of step k (the unbounded classic
  * funnel; windowed variants add a max gap to the `t > pt` predicate).
  *
  * Scale: every stage is a user-keyed filter → join → min aggregation —
  * all shuffles share the user key, so the exchanges align stage to
  * stage; nothing is ever ordered globally and no per-user event list
  * is materialized (the sessionize-then-scan alternative holds a user's
  * whole history in one task). Counts are exact; the conversion ratio is
  * one double division per step.
  */
object Funnel {

  /** Per-step first-reach times (u, rt), shared by [[funnel]] and
    * [[funnelLatency]]: strictly-after-the-prior-step min timestamps,
    * optionally gap-bounded.
    */
  private def reachTimes(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGap: Option[String]): List[DataFrame] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct: $steps")
    // fail at the call site with the parameter named, not with a parse
    // error from deep inside stage-2 plan construction
    maxGap.foreach(g => require(
      g.matches("""(?i)\d+\s+(SECOND|MINUTE|HOUR|DAY|WEEK)S?"""),
      s"maxGap must look like '6 HOURS', got '$g'"))
    val ev = df.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    steps.foldLeft(List.empty[DataFrame]) { case (acc, st) =>
      val base = ev.filter(col("et") === st)
      val stage = acc match {
        case Nil => base.groupBy(col("u")).agg(min(col("t")).as("rt"))
        case prev :: _ =>
          val inOrder = col("t") > col("pt")
          val inWindow = maxGap
            .map(g => inOrder && col("t") <= col("pt") + expr(s"INTERVAL $g"))
            .getOrElse(inOrder)
          base.join(prev.select(col("u"), col("rt").as("pt")), Seq("u"))
            .filter(inWindow)
            .groupBy(col("u")).agg(min(col("t")).as("rt"))
      }
      stage :: acc
    }.reverse
  }

  /** Per-step reach counts and conversion vs step 1:
    * `(step, step_name, n_users, conversion)`, one row per step.
    * `maxGap` (a SQL interval string, e.g. "6 HOURS") bounds each
    * step-to-step gap — the windowed funnel; None = unbounded classic.
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGap: Option[String] = None): DataFrame = {
    val reach = reachTimes(df, userCol, typeCol, tsCol, steps, maxGap)
    val wide = reach.zipWithIndex
      .map { case (r, i) => r.agg(count(lit(1)).as(s"n$i")) }
      .reduce(_ crossJoin _)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      struct(lit((i + 1).toLong).as("step"), lit(st).as("step_name"),
        col(s"n$i").as("n_users"),
        when(col("n0") > 0,
          col(s"n$i").cast("double") / col("n0").cast("double"))
          .as("conversion"))
    }
    wide.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step").as("step"), col("r.step_name").as("step_name"),
        col("r.n_users").as("n_users"), col("r.conversion").as("conversion"))
  }

  /** Time-to-convert distribution per funnel step: for every user who
    * reached step i (≥ 2), the elapsed time from their FIRST-step reach,
    * summarized as p50/p90 seconds — the product-metric companion of
    * [[funnel]]'s conversion rates. Elapsed times are exact microsecond
    * longs (`unix_micros` difference), so the percentile interpolation is
    * bit-identical across engines (the x9b integer-input law); the final
    * /10⁶ to seconds is one IEEE division on the interpolated value.
    *
    * Scale: shares [[reachTimes]]'s user-keyed join ladder (exchanges
    * align stage-to-stage); the percentile aggregate is per step —
    * |steps|−1 groups.
    */
  def funnelLatency(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGap: Option[String] = None): DataFrame = {
    require(steps.size >= 2, s"latency needs >= 2 funnel steps: $steps")
    val reach = reachTimes(df, userCol, typeCol, tsCol, steps, maxGap)
    val first = reach.head.select(col("u"), col("rt").as("t0"))
    val perStep = steps.zipWithIndex.drop(1).zip(reach.tail).map {
      case ((st, i), r) =>
        r.join(first, Seq("u"))
          .select(lit((i + 1).toLong).as("step"), lit(st).as("step_name"),
            expr("unix_micros(rt) - unix_micros(t0)").as("us"))
    }
    perStep.reduce(_ union _)
      .groupBy(col("step"), col("step_name"))
      .agg(count(lit(1)).as("n_users"),
        (expr("percentile(us, 0.5)") / 1000000.0).as("p50_secs"),
        (expr("percentile(us, 0.9)") / 1000000.0).as("p90_secs"))
  }
}
