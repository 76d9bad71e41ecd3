package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an event log — classic OLAP surface
  * (funnels, cohort retention) expressed as ordinary aggregates + joins so
  * Catalyst keeps every step declarative.
  *
  * Scale shape: every stage is a groupBy(user) aggregate — all stages hash-
  * partition on the SAME key, so AQE/Exchange reuse keeps the per-stage
  * joins co-partitioned; the event scan is re-read per stage with the
  * event_type filter PUSHED DOWN (a 100 TB log with type-partitioned or
  * type-clustered layout reads only each stage's slice). No window over the
  * whole log, no per-user collect_list — state per user is one timestamp
  * per stage.
  */
object Behavior {

  /** Strict-sequence funnel: stage i is reached at the EARLIEST event of
    * `stages(i)` strictly after the user's stage-(i-1) time. Returns one row
    * per user who reached stage 0, with each stage's timestamp (null once
    * the sequence breaks) and `stage_reached` = how many stages completed.
    */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String], maxGap: Option[String] = None): DataFrame = {
    require(stages.nonEmpty)
    val u = col(userCol)
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(u.as("user"))
      .agg(min(col(tsCol)).as("ts_0"))
    for (i <- 1 until stages.length) {
      val next = events.filter(col(typeCol) === stages(i))
        .select(u.as("__nu"), col(tsCol).as("__t"))
      // "strictly after" (and the optional conversion window — "within
      // maxGap of the previous stage") lives in the JOIN condition: a user
      // with no qualifying stage-i event (or a broken sequence, ts_{i-1}
      // null) keeps their row with a null match instead of dropping out
      val within = maxGap match {
        case Some(g) => col("__t") <= col(s"ts_${i - 1}") + expr(s"INTERVAL $g")
        case None => lit(true)
      }
      acc = acc
        .join(next,
          col("user") === col("__nu") && col("__t") > col(s"ts_${i - 1}") && within,
          "left")
        .groupBy((col("user") +: (0 until i).map(j => col(s"ts_$j"))): _*)
        .agg(min(col("__t")).as(s"ts_$i"))
    }
    val reached = stages.indices.map(i => when(col(s"ts_$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stage_reached", reached.cast("long"))
  }

  /** Stage-to-stage conversion latency over [[funnel]]'s per-user stage
    * timestamps: for every converted user and stage i, `ts_i − ts_{i−1}` in
    * integer microseconds, aggregated per stage to count, doubled-median
    * (the BIGINT-percentile trick), p90 and max — "how long does the step
    * take", the funnel's other axis. Quantiles run on BIGINT µs inputs
    * (the r5 percentile bit-parity), p90's interpolated double included
    * (corpus_quantiles precedent at non-half fractions). One funnel pass +
    * a stage-count-sized union + one aggregate. */
  def funnelLatency(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "latency needs at least two stages")
    val f = funnel(events, userCol, typeCol, tsCol, stages)
    val lats = (1 until stages.length).map { i =>
      f.filter(col(s"ts_$i").isNotNull)
        .select(lit(i.toLong).as("stage"), lit(stages(i)).as("stage_name"),
          (unix_micros(col(s"ts_$i")) - unix_micros(col(s"ts_${i - 1}"))).as("lat_us"))
    }.reduce(_ unionByName _)
    lats.groupBy(col("stage"), col("stage_name")).agg(
      count(lit(1)).as("n_converted"),
      expr("percentile(lat_us * 2, 0.5)").cast("long").as("median_x2_us"),
      expr("percentile(lat_us, 0.9)").as("p90_us"),
      max(col("lat_us")).as("max_us"))
  }

  /** Stage-level funnel summary: (stage index, stage name, users remaining). */
  def funnelSummary(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, typeCol, tsCol, stages)
    val spark = f.sparkSession
    import spark.implicits._
    val names = stages.zipWithIndex.map { case (nm, i) => (i.toLong + 1, nm) }
      .toDF("stage", "stage_name")
    f.groupBy().agg(
        array(stages.indices.map(i =>
          sum(when(col(s"ts_$i").isNotNull, 1L).otherwise(0L))): _*).as("counts"))
      .select(posexplode(col("counts")).as(Seq("pos", "n_users")))
      .select((col("pos") + 1).cast("long").as("stage"), col("n_users"))
      .join(names, "stage")
      .select(col("stage"), col("stage_name"), col("n_users"))
  }

  /** Per-(user, day) activity with TRAILING-WINDOW rollups: event count and
    * summed value for the day, plus the running `windowDays`-day totals — the
    * standard feature-engineering shape ("7-day activity") for churn/usage
    * models. `valueCents` must already be an exact integer measure (cents) so
    * the windowed sums are order-free.
    *
    * Plan: one groupBy(user, day) aggregate collapses the log to at most one
    * row per user-day BEFORE the window (the window then slides over tiny
    * per-user partitions, never raw events), with a RANGE frame on the
    * integer day number — no self-join, no explode of the window. */
  def rollingDaily(
      events: DataFrame, userCol: String, tsCol: String, valueCents: Column,
      windowDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = col(userCol)
    val daily = events
      .groupBy(u.as("user"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(valueCents).as("value_cents"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(col("user")).orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("n_events_window", sum(col("n_events")).over(w))
      .withColumn("value_cents_window", sum(col("value_cents")).over(w))
      .select(col("user"), col("day").cast("timestamp").as("day"),
        col("n_events"), col("value_cents"),
        col("n_events_window"), col("value_cents_window"))
  }

  /** First-order event-transition matrix (the Markov view of user
    * journeys): for every consecutive event pair inside a user's stream,
    * count (from_type, to_type) and estimate P(to | from) — the
    * journey-analytics complement to [[funnel]]'s fixed-sequence view
    * (funnels answer "how many complete A→B→C"; transitions answer "where
    * do users actually go after A").
    *
    * Ordering inside a user is (ts, tie-break id) so duplicate timestamps
    * cannot make the lag nondeterministic. Counts are integers; the
    * probability is one division on identical operands. Plan: one window
    * over per-user partitions (shuffle on user only) + one pair count. */
  def transitionMatrix(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_ab"))
    // row-count totals via a window over the (tiny) pair table — a self-join
    // with an aggregate of `pairs` would replay the full event window twice
    val wFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("n_a", sum(col("n_ab")).over(wFrom))
      .select(col("from_type"), col("to_type"), col("n_ab"), col("n_a"),
        (col("n_ab").cast("double") / col("n_a")).as("p"))
  }

  /** Stationary behavior mix: `rounds` of the power iteration π ← πP over
    * [[transitionMatrix]]'s fixed-point probabilities — where a user
    * population settles if today's transition behavior persists, the
    * long-run engagement mix behind capacity planning and "steady-state
    * funnel" dashboards. The matrix is (event-type-domain)² — metadata by
    * definition — so it collects and iterates driver-side (the
    * pcaPower/kmeans principle: clustering a metadata-sized iteration buys
    * only scheduler latency). All integer: p in 1e-6 fixed point, each
    * round an order-free Σ π_f·p_ft followed by ONE truncating div — the
    * unrolled-SQL oracle reproduces it exactly. States with no incoming
    * transitions decay to 0; truncation loses < k units of 1e-6 mass per
    * round (not renormalized — determinism over cosmetics). */
  def markovSteadyState(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val spark = events.sparkSession
    val tm = transitionMatrix(events, userCol, typeCol, tsCol, tieCol)
      .select(col("from_type"), col("to_type"),
        expr("n_ab * 1000000 div n_a").as("pm"))
      .collect()
    require(tm.nonEmpty, "no transitions")
    val states = tm.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val pm = Array.ofDim[Long](k, k)
    tm.foreach(r => pm(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    var pi = Array.fill(k)(1000000L / k)
    for (_ <- 1 to rounds) {
      val next = Array.ofDim[Long](k)
      var f = 0
      while (f < k) {
        var t = 0
        while (t < k) { next(t) += pi(f) * pm(f)(t); t += 1 }
        f += 1
      }
      pi = next.map(_ / 1000000L)
    }
    import spark.implicits._
    states.zip(pi).toSeq.toDF("state", "pi_scaled")
  }

  /** DAU/MAU stickiness: per calendar day, distinct active users that day
    * over distinct active users in the day's calendar month, in 1e-6 fixed
    * point — THE product-analytics engagement ratio. Two distinct-count
    * aggregates (day-keyed and month-keyed, both map-side partial) + one
    * broadcast join of the month relation; exact distincts here, swap in
    * the HLL sketch family for approximate at extreme cardinalities. */
  def stickiness(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = events.select(date_trunc("day", col(tsCol)).as("day"), col(userCol).as("u"))
      .groupBy(col("day")).agg(countDistinct(col("u")).as("dau"))
    val month = events.select(date_trunc("month", col(tsCol)).as("month"), col(userCol).as("u"))
      .groupBy(col("month")).agg(countDistinct(col("u")).as("mau"))
    day.withColumn("month", date_trunc("month", col("day")))
      .join(broadcast(month), "month")
      .select(col("day"), col("dau"), col("mau"),
        expr("dau * 1000000 div mau").as("stickiness_micro"))
  }

  /** Journey-similarity pairs: users whose event-type SEQUENCES are within
    * `maxDist` edit operations — behavioral twin discovery (bot rings,
    * scripted flows, UX cohorts) where transition counts are too coarse:
    * order matters. Each user's journey is the string of type initials
    * over their first `maxLen` tie-broken events; pairs are generated
    * through a length-band equi-join (true pairs differ by ≤ maxDist in
    * length, so bands of width maxDist+1 with a 3-band probe are lossless
    * — the fuzzy-dedup blocking argument) and verified with the exact
    * built-in `levenshtein`. A corpus of uniform-length journeys
    * degenerates to ONE band — the exact all-pairs cost AND a single hot
    * join key — so the band join is SALTED (probe keyed by a hash salt,
    * index replicated across the `salts` lanes — the [[Skew]] replicated-
    * join shape, result-neutral: each pair still matches exactly once):
    * the quadratic verify spreads over every core instead of one reducer
    * (measured 55 s single-lane → seconds salted at sf0.1). Truncation to
    * `maxLen` bounds the per-pair cost at O(maxLen²). */
  def journeyPairs(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, maxDist: Int, maxLen: Int = 40,
      salts: Int = 32): DataFrame = {
    require(maxDist >= 0 && maxLen >= 1 && salts >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val j = events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
      .withColumn("__c", substring(col(typeCol), 1, 1))
      .groupBy(col(userCol).as("uid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col("__c")))),
        x => x.getField("__c")), "").as("j"))
      .withColumn("len", length(col("j")))
      .withColumn("band", expr(s"len div ${maxDist + 1}"))
      // persisted: the windowed journey aggregate feeds the probe AND the
      // salted index leg — one evaluation instead of two (r17)
      .transform(Residuals.persist)
    val probe = j.withColumn("__b",
      explode(array(col("band") - 1, col("band"), col("band") + 1)))
      .withColumn("__s", pmod(hash(col("uid")), lit(salts)))
    val index = j.select(col("uid").as("uid_b"), col("j").as("jb"),
      col("len").as("len_b"), col("band").as("__b"))
      .withColumn("__s", explode(array((0 until salts).map(lit(_)): _*)))
    // The candidate rows are BYTE-small but CPU-heavy (a maxLen² DP each):
    // AQE's size-based coalescing would fold them onto one task and
    // serialize the whole verify. An explicit numPartitions repartition is
    // exempt from coalescing and pins the verify stage's parallelism.
    probe.join(index, Seq("__b", "__s"))
      .filter(col("uid") < col("uid_b"))
      .filter(abs(col("len") - col("len_b")) <= maxDist)
      .repartition(salts, col("__s"), col("uid"))
      .withColumn("dist", levenshtein(col("j"), col("jb")))
      .filter(col("dist") <= maxDist)
      .select(col("uid").as("user_a"), col("uid_b").as("user_b"),
        col("dist").cast("long").as("dist"))
  }

  /** Top event PATHS of length 3 (journey mining): consecutive triples
    * inside each user's tie-broken stream, counted corpus-wide. Same single
    * window as [[transitionMatrix]] — two lead() offsets reuse one sort —
    * then a count and a TakeOrdered top-k, never a global sort. */
  def topPaths(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      tieCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__s2", lead(col(typeCol), 1).over(w))
      .withColumn("__s3", lead(col(typeCol), 2).over(w))
      .filter(col("__s2").isNotNull && col("__s3").isNotNull)
      .groupBy(col(typeCol).as("step1"), col("__s2").as("step2"), col("__s3").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Quantized exponential-decay weights for integer day ages 0..maxAge:
    * w(d) = floor(2^(-d/halfLife) · 1e9 + 0.5). Computed ONCE driver-side
    * and embedded as literals in both the Spark plan and any oracle SQL —
    * the half-life curve becomes a lookup table, so no runtime `pow` (whose
    * last-ulp behavior is libm-specific) ever enters a compared result. */
  def decayWeights(halfLifeDays: Double, maxAge: Int): Array[Long] =
    (0 to maxAge).map(d =>
      math.floor(math.pow(2.0, -d / halfLifeDays) * 1e9 + 0.5).toLong).toArray

  /** Default weight-table length for [[decayedValue]]: 52 half-lives, the
    * point where the 1e9-quantized weight is exactly 0 (2^-52·1e9 ≈ 2e-7
    * floors to 0 after the +0.5 rounding), so the age clamp cannot retain
    * residual weight for arbitrarily old events. */
  def defaultMaxAge(halfLifeDays: Double): Int =
    math.max(1, math.ceil(52.0 * halfLifeDays).toInt)

  /** Recency-weighted per-user value: Σ over events of value · 2^(-age/hl),
    * where age = whole days between the event and the corpus's LAST day —
    * the standard freshness weighting for sampling/retention features.
    * All integer: cents × quantized weight summed order-free; one final
    * double division by 1e9 descales. One tiny max-aggregate fixes the
    * reference day; the weighting itself is a scan-speed projection feeding
    * one groupBy(user).
    *
    * The weight table has a FIXED, data-independent length and the age is
    * clamped into it on lookup — so any oracle embedding the same literal
    * table can never index past the list end no matter how far the data
    * spans, and no extra pass over the events is needed to size the table.
    * The default length DERIVES from the half-life ([[defaultMaxAge]], 52
    * half-lives) because clamping is only sound once the clamped weight
    * has quantized to 0 — a fixed 366 silently kept ~6% weight forever at
    * halfLifeDays = 90. Callers overriding `maxAge` own that invariant
    * (decayWeights(hl, maxAge).last == 0). */
  def decayedValue(
      events: DataFrame, userCol: String, tsCol: String, valueCents: Column,
      halfLifeDays: Double, maxAge: Int = 0): DataFrame = {
    val m = if (maxAge > 0) maxAge else defaultMaxAge(halfLifeDays)
    val day = to_date(col(tsCol))
    val ref = events.agg(max(day).as("ref_day"))
    val w = decayWeights(halfLifeDays, m)
    val weights = array(w.map(lit(_)).toIndexedSeq: _*)
    val age = least(datediff(col("ref_day"), day), lit(m))
    events.crossJoin(broadcast(ref))
      .select(col(userCol).as("user"),
        (valueCents * element_at(weights, age + 1)).as("wv"))
      .groupBy(col("user"))
      .agg(sum(col("wv")).as("score_scaled"))
      .withColumn("score", col("score_scaled").cast("double") / 1e9 / 100.0)
  }

  /** Per-group outlier flags via a SQRT-FREE z-test: x is an outlier in its
    * group iff (x−μ)² > z²·σ² — squaring both sides removes the one
    * transcendental (sqrt) that would break cross-engine exactness, so the
    * flag is pure integer algebra on cents.
    *
    * Overflow discipline (the PSI lesson): the mean stays in cents
    * (`sum div n`), but squared deviations are accumulated in whole
    * DOLLARS² (`dev² div 10000`) — per-row terms ≤ ~4e6 for values up to
    * ~$10k, so the per-group sum stays inside BIGINT up to ~10^12 rows.
    * The truncation is identical in both engines and costs sub-dollar
    * variance resolution only, irrelevant to a z>3 flag.
    *
    * Scale shape: one map-side-combined stats aggregation per group, one
    * deviation aggregation, and a broadcast join of the group-count-sized
    * stats back onto the stream — the corpus is scanned twice, shuffled
    * never (group stats are metadata-sized). */
  /** Hourly volume-anomaly detection per event type — the pipeline-ops
    * monitor for BOTH failure modes ("did traffic surge" and "did the feed
    * die"): each hour's count is z-tested against its trailing window of
    * up to `trailing` present hours, entirely in the sqrt-free integer
    * algebra of [[valueOutliers]]: with trailing sum S, sum-of-squares Q
    * over m hours, anomalous ⇔ `(m·n − S)² > z²·(m·Q − S²)`, and `spike`
    * reports the signed direction: +1 surge, −1 drop, 0 normal. Exact
    * integers, engine-portable. Overflow bound: the squared terms reach
    * ~(trailing·n)² and z²·trailing²·n², so hourly counts must stay under
    * ~4e7 at the defaults (trailing=24, z=3) to keep both inside BIGINT —
    * pre-scale counts (e.g. div 100) beyond that. Hours with fewer than
    * `minHistory` trailing observations report 0 (cold start is not an
    * anomaly). One aggregation + one bounded window over the per-(type,
    * hour) rollup — the window slides over HOURS, never raw events. */
  def hourlySpikes(
      events: DataFrame, tsCol: String, typeCol: String,
      z: Int = 3, trailing: Int = 24, minHistory: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-trailing, -1)
    hourly
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("q", sum(col("n") * col("n")).over(w))
      .select(col("hour"), col("event_type"), col("n"),
        coalesce(col("m"), lit(0L)).as("m"),
        when(col("m") >= minHistory &&
            (col("m") * col("n") - col("s")) * (col("m") * col("n") - col("s"))
              > lit(z.toLong * z) * (col("m") * col("q") - col("s") * col("s")),
          signum(col("m") * col("n") - col("s")).cast("long"))
          .otherwise(lit(0L)).as("spike"))
  }

  def valueOutliers(
      events: DataFrame, idCol: String, groupCol: String, valueCents: Column,
      z: Int = 3): DataFrame = {
    val base = events.select(col(idCol).as("id"), col(groupCol).as("g"),
      valueCents.as("xc"))
    val stats = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("xc")).as("sum_c"))
      .select(col("g"), col("n"), expr("sum_c div n").as("mean_c"))
    val withDev = base.join(broadcast(stats), "g")
      .withColumn("dev_c", col("xc") - col("mean_c"))
      .withColumn("dev_d2", expr("dev_c * dev_c div 10000"))
    val vars = withDev.groupBy(col("g"))
      .agg(expr("sum(dev_d2) div count(1)").as("var_d2"))
    withDev.join(broadcast(vars), "g")
      .select(col("id"), col("g"), col("xc"), col("dev_c"),
        when(col("dev_d2") > lit(z.toLong * z) * col("var_d2"), lit(1L))
          .otherwise(lit(0L)).as("is_outlier"))
  }

  /** Cohort retention: cohort = calendar day of the user's FIRST event;
    * a user is retained at offset d if they had any event on cohort_day + d.
    * Returns (cohort_day, day_offset, n_users) — the classic retention
    * triangle. Two aggregates and one co-partitioned join, all on user_id.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val u = col(userCol)
    val day = to_date(col(tsCol))
    val cohort = events
      .groupBy(u.as("user"))
      .agg(min(day).as("cohort_day"))
    val active = events
      .select(u.as("user"), day.as("act_day"))
      .distinct()
    cohort.join(active, "user")
      .groupBy(col("cohort_day"), datediff(col("act_day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("day_offset", col("day_offset").cast("long"))
  }

  /** Median absolute deviation per group — the robust dispersion pair to
    * [[valueOutliers]]' mean/variance z-test (one wild value shifts a mean
    * arbitrarily; it moves a median by at most one rank). Cross-engine
    * exactness: values go through fixed-point cents, and the interpolated
    * median is carried DOUBLED (`median_x2` — 2·median of integers is
    * itself an integer) so the deviation stream stays pure BIGINT; both
    * `percentile` calls then run on BIGINT inputs, where Spark percentile
    * == DuckDB quantile_cont bit-for-bit (the r5 precedent — the
    * double-input interpolation order is NOT guaranteed, so no double ever
    * enters a quantile here). Two grouped aggregates + one broadcast-sized
    * join on the group key. */
  def valueMad(events: DataFrame, typeCol: String, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val med = events
      .groupBy(col(typeCol))
      .agg((expr(s"percentile(CAST(floor($valueCol * 100 + 0.5) AS BIGINT) * 2, 0.5)"))
        .cast("long").as("median_x2"))
    events.select(col(typeCol), cents.as("cents"))
      .join(broadcast(med), typeCol)
      .groupBy(col(typeCol), col("median_x2"))
      .agg(expr("percentile(abs(cents * 2 - median_x2), 0.5)").as("mad_x2"))
  }

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * customer-value grid as one pass over the event log. Per user:
    * `recency_days` (whole days between the user's last event and the
    * corpus's newest event — integer µs division, no calendar math),
    * `frequency` (event count), `monetary_cents` (fixed-point value sum);
    * each metric then scores 1–3 by its tertiles and
    * `segment = r·100 + f·10 + m` (333 = best). Recency scores REVERSED —
    * recent is good.
    *
    * Exactness: all three metrics are BIGINT, so the tertile thresholds
    * (Spark `percentile` == DuckDB `quantile_cont` bit-for-bit on BIGINT,
    * the r5 precedent) and the strict-`>` comparison assignments are
    * engine-portable; no double enters a quantile. Shape: ONE groupBy(user)
    * aggregate, one O(1) anchor aggregate, one 6-threshold aggregate over
    * the user-count-sized relation, then a scan-speed projection — no
    * window, no global sort, user-partitioned all the way. */
  /** Seasonal-naive forecast anomaly monitor: hourly event volumes vs the
    * SAME HOUR YESTERDAY (the zero-parameter forecast every monitoring stack
    * starts from), flagged when the forecast error leaves a robust
    * median ± k·MAD band. `flag` is SIGNED (+1 surge / −1 drop — the
    * hourlySpikes lesson: an outage must not look like a surge).
    *
    * Exactness: counts are integers, the error stream is BIGINT, and the
    * band is the [[valueMad]] doubled-median trick (`err·2` vs `median_x2`,
    * `mad_x2`) so every percentile runs on BIGINT inputs and the strict `>`
    * band test is engine-portable — no double anywhere.
    *
    * Shape: one hour-truncated aggregate (map-side combinable), one
    * self-join shifted by `INTERVAL 1 DAY` on the hour key, one O(hours)
    * percentile aggregate. Hours with zero events are absent from both the
    * actual and the shifted side — consistent in any engine. */
  def forecastAnomaly(events: DataFrame, tsCol: String, k: Long = 3L): DataFrame = {
    val hours = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val shifted = hours.select(
      (col("hour") + expr("INTERVAL 1 DAY")).as("hour"),
      col("n_events").as("forecast"))
    val err = hours.join(shifted, "hour")
      .withColumn("err", col("n_events") - col("forecast"))
    val band = err.agg(
      expr("percentile(err * 2, 0.5)").cast("long").as("median_x2")).head()
    val medianX2 = band.getLong(0)
    val mad = err.agg(
      expr(s"percentile(abs(err * 2 - $medianX2), 0.5)").cast("long").as("mad_x2")).head()
    val madX2 = mad.getLong(0)
    err.select(col("hour"), col("n_events"), col("forecast"), col("err"),
      lit(medianX2).as("median_x2"), lit(madX2).as("mad_x2"),
      when(col("err") * 2 - lit(medianX2) > lit(k) * lit(madX2), 1L)
        .when(lit(medianX2) - col("err") * 2 > lit(k) * lit(madX2), -1L)
        .otherwise(0L).as("flag"))
  }

  def rfm(events: DataFrame, userCol: String, tsCol: String, valueCol: String): DataFrame = {
    val anchor = events.agg(max(unix_micros(col(tsCol)))).head().getLong(0)
    val perUser = events
      .groupBy(col(userCol).as("user_id"))
      .agg(max(unix_micros(col(tsCol))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(floor(col(valueCol) * 100 + lit(0.5)).cast("long")).as("monetary_cents"))
      .withColumn("recency_days", expr(s"($anchor - last_us) div 86400000000"))
    val cuts = perUser.agg(
      expr(s"percentile(recency_days, ${1.0 / 3})").as("r1"),
      expr(s"percentile(recency_days, ${2.0 / 3})").as("r2"),
      expr(s"percentile(frequency, ${1.0 / 3})").as("f1"),
      expr(s"percentile(frequency, ${2.0 / 3})").as("f2"),
      expr(s"percentile(monetary_cents, ${1.0 / 3})").as("m1"),
      expr(s"percentile(monetary_cents, ${2.0 / 3})").as("m2")).head()
    def score(c: Column, t1: Double, t2: Double): Column =
      lit(1L) + when(c > lit(t1), 1L).otherwise(0L) + when(c > lit(t2), 1L).otherwise(0L)
    perUser.select(
      col("user_id"), col("recency_days"), col("frequency"), col("monetary_cents"),
      (lit(4L) - score(col("recency_days"), cuts.getDouble(0), cuts.getDouble(1))).as("r_score"),
      score(col("frequency"), cuts.getDouble(2), cuts.getDouble(3)).as("f_score"),
      score(col("monetary_cents"), cuts.getDouble(4), cuts.getDouble(5)).as("m_score"))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** Weekly seasonality profile: event counts per (day-of-week, hour) cell
    * with per-mille share of the total and a peak flag (cells ≥ 2× the
    * uniform share) — the traffic-shape fingerprint behind capacity
    * planning and the baseline [[forecastAnomaly]] deviates from. All
    * integer: counts, `share_permille = n·1000 div total`, the flag a
    * BIGINT comparison `n·168 ≥ 2·total`. dow follows ISO (1 = Monday) via
    * `dayofweek` remapping so both engines agree by construction. One
    * map-side-combined aggregate + an O(1) total broadcast. */
  def weeklyProfile(events: DataFrame, tsCol: String): DataFrame = {
    // Spark dayofweek: 1=Sunday..7=Saturday -> ISO 1=Monday..7=Sunday
    val isoDow = ((dayofweek(col(tsCol)) + 5) % 7 + 1).cast("long")
    val cells = events
      .groupBy(isoDow.as("dow"), hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("total"))
    cells.crossJoin(broadcast(tot))
      .withColumn("share_permille", expr("n * 1000 div total"))
      .withColumn("is_peak",
        when(col("n") * 168 >= lit(2L) * col("total"), 1L).otherwise(0L))
      .select(col("dow"), col("hour"), col("n"), col("share_permille"), col("is_peak"))
  }

  /** Per-user burst velocity over SLIDING windows: the maximum event count
    * any 1-hour window (sliding every `slideMinutes`) contains, per user —
    * the rate-limit/scraper signal [[interArrival]]'s median can't see (a
    * bot can pace politely on average and still burst). Hop-window
    * assignment is pure integer arithmetic on epoch minutes (each event
    * lands in windowMinutes/slideMinutes hops), so the whole feature is
    * exactly re-derivable. Returns (user_id, peak_window_start, peak_n)
    * with the EARLIEST peak window as tiebreak.
    *
    * Scale: one explode (hop factor ≤ windowMinutes/slideMinutes) + two
    * user-keyed aggregates — same key, one shuffle lineage. */
  def burstVelocity(events: DataFrame, userCol: String, tsCol: String,
      windowMinutes: Int = 60, slideMinutes: Int = 15): DataFrame = {
    require(windowMinutes % slideMinutes == 0, "slide must divide window")
    val hops = windowMinutes / slideMinutes
    val em = expr(s"unix_micros($tsCol) div 60000000") // epoch minutes
    val perHop = events
      .select(col(userCol).as("user_id"), em.as("em"))
      .withColumn("j", explode(sequence(lit(0), lit(hops - 1))))
      .withColumn("wstart", expr(s"(em div $slideMinutes - j) * $slideMinutes"))
      .filter(col("em") < col("wstart") + windowMinutes && col("em") >= col("wstart"))
      .groupBy(col("user_id"), col("wstart")).agg(count(lit(1)).as("n"))
    perHop.groupBy(col("user_id"))
      .agg(max(struct(col("n"), (-col("wstart")).as("negw"))).as("m"))
      .select(col("user_id"), (-col("m.negw")).as("peak_window_start_min"),
        col("m.n").as("peak_n"))
  }

  /** Per-user behavioral entropy: Shannon entropy of each user's
    * event-type distribution in micro-nats — the diversity complement to
    * [[interArrival]]'s timing signal (a scripted client does ONE thing; a
    * human wanders). Same per-term quantization as the character-entropy
    * operator: `H_micro = (N·qln(N) − Σ n_c·qln(n_c)) div N` with
    * `qln(x) = floor(ln(x)·1e6 + 0.5)` — order-free integer sums, exact at
    * any user size below N·qln(N) ~ 2⁶³. One groupBy(user, type) + one
    * groupBy(user) — single key family, no window. */
  def userEntropy(events: DataFrame, userCol: String, typeCol: String): DataFrame = {
    events.groupBy(col(userCol).as("user_id"), col(typeCol).as("t"))
      .agg(count(lit(1)).as("n_c"))
      .groupBy(col("user_id"))
      .agg(sum(col("n_c")).as("n_events"), count(lit(1)).as("n_types"),
        sum(col("n_c") * Features.qln(col("n_c"))).as("s"))
      .withColumn("__qn", Features.qln(col("n_events")))
      .withColumn("entropy_micro", expr("(n_events * __qn - s) div n_events"))
      .select(col("user_id"), col("n_events"), col("n_types"), col("entropy_micro"))
  }

  /** Per-user inter-arrival regularity — the bot/scripted-client detector:
    * human traffic has dispersed gaps, automation is metronomic. Gaps in µs
    * via lag over each user's time-ordered events (window PARTITIONED by
    * user — parallel, per-user state only; timestamp ties leave the gap
    * MULTISET unchanged, so the stats are order-ambiguity-free), then
    * per-user robust stats on BIGINT gaps: doubled median
    * (`percentile(gap·2, 0.5)` — integer-exact, the valueMad trick),
    * MAD×2 (bit-portable double on BIGINT inputs, the r5 precedent),
    * min/max, and `is_metronomic` = MAD < 5% of the median — a scripted
    * client pinging on a timer trips it, a human never does.
    *
    * Scale: one per-user window + two user-keyed aggregations — the same
    * key throughout, one shuffle under AQE Exchange reuse. */
  def interArrival(events: DataFrame, userCol: String, tsCol: String,
      minGaps: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user")).orderBy(col("us"))
    val gaps = events.select(col(userCol).as("user"), unix_micros(col(tsCol)).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val agg = gaps.groupBy(col("user"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap * 2, 0.5)").cast("long").as("median_gap_x2"),
        min(col("gap")).as("min_gap_us"), max(col("gap")).as("max_gap_us"))
      .filter(col("n_gaps") >= minGaps)
    gaps.join(agg, "user")
      .groupBy(col("user"), col("n_gaps"), col("median_gap_x2"),
        col("min_gap_us"), col("max_gap_us"))
      .agg(expr("percentile(abs(gap * 2 - median_gap_x2), 0.5)").as("mad_x2"))
      .withColumn("is_metronomic",
        when(col("mad_x2") * 20 < col("median_gap_x2").cast("double"), 1L).otherwise(0L))
      .select(col("user").as("user_id"), col("n_gaps"), col("median_gap_x2"),
        col("mad_x2"), col("min_gap_us"), col("max_gap_us"), col("is_metronomic"))
  }

  /** Composite bot score — the event-log front-door cut (the traffic twin
    * of the documents-side Gopher battery): three independently-gated
    * signals fuse into one integer score per user. Metronomic timing
    * ([[interArrival]] — a timer, not a human) weighs 50; low behavioral
    * entropy ([[userEntropy]] — scripted clients do one thing) and a high
    * burst peak ([[burstVelocity]] — rate beyond human cadence) weigh 25
    * each. Pure composition: each signal keeps its own oracle-checked
    * semantics, the fusion is three left joins on the user key +
    * integer arithmetic (users without enough gaps for the timing signal
    * score it 0 — absence of evidence). Thresholds are caller knobs;
    * score ≥ 50 is the "needs review" line at the defaults.
    *
    * Shape: three user-domain aggregates + two left equi-joins keyed on
    * the user — no new shuffle class beyond the signals themselves. */
  def botScore(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entropyMaxMicro: Long = 1560000L, peakMin: Long = 3L): DataFrame = {
    val ia = interArrival(events, userCol, tsCol)
      .select(col("user_id"), col("is_metronomic"))
    val ue = userEntropy(events, userCol, typeCol)
      .select(col("user_id"), col("n_events"), col("entropy_micro"))
    val bv = burstVelocity(events, userCol, tsCol)
      .select(col("user_id"), col("peak_n"))
    ue.join(ia, Seq("user_id"), "left")
      .join(bv, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        coalesce(col("is_metronomic"), lit(0L)).as("metronomic"),
        when(col("entropy_micro") < entropyMaxMicro, 1L).otherwise(0L).as("low_entropy"),
        when(coalesce(col("peak_n"), lit(0L)) >= peakMin, 1L).otherwise(0L).as("bursty"))
      .withColumn("bot_score",
        col("metronomic") * 50L + col("low_entropy") * 25L + col("bursty") * 25L)
  }

  /** Cohort lifetime-value curve: users grouped by first-event day, revenue
    * from `revenueEvent` values accumulated per (cohort, age-in-days) —
    * the money axis of the retention triangle, and the payback-period
    * readout acquisition spend is judged against. All fixed-point: cents
    * sums, cumulative via a per-cohort window over DISTINCT ages (tie-free
    * ⇒ default RANGE frame == ROWS, the r8 precedent),
    * `ltv_micro = cum_cents·1e6 div cohort_size` (micro-cents per user).
    * Ages with zero revenue simply don't emit a row — the curve is a step
    * function read with LAST_VALUE semantics.
    *
    * Scale: two groupBy(user)-keyed aggregates + a window over the
    * (cohort × age) relation — day-domain-sized, never the event log. */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, typeCol: String, revenueEvent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firsts = events.groupBy(col(userCol).as("user"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val sizes = firsts.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    val rev = events.filter(col(typeCol) === revenueEvent)
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("d"),
        floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("cents"))
      .join(firsts, "user")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("age_days"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age_days"))
    rev.join(sizes, "cohort")
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      // decomposed x1e6 (the r11 targetEncode overflow lesson): exact for
      // nonneg revenue at any cohort size — naive sum*1e6 binds at ~$92B
      .withColumn("ltv_micro",
        expr("(cum_rev_cents div cohort_size) * 1000000" +
          " + ((cum_rev_cents % cohort_size) * 1000000) div cohort_size"))
      .select(col("cohort").cast("timestamp").as("cohort_day"), col("age_days"),
        col("cohort_size"), col("rev_cents"), col("cum_rev_cents"), col("ltv_micro"))
  }

  /** A/B experiment readout over a raw event log: users are assigned to
    * variants by md5 parity of their id (the reproducible assignment a log
    * without an experiment table needs — first hex digit < '8' → A),
    * exposure = ≥1 `exposureEvent`, conversion = ≥1 `convEvent`. Emits the
    * 2×2 cells, fixed-point conversion rates, and the two-proportion
    * chi-square statistic
    * `N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` — computed as DOUBLE from the
    * BIGINT cells with a FIXED left-associated operation order, so the
    * statistic itself is IEEE-bit-identical cross-engine (the chi2Terms
    * precedent; +,−,×,÷ are correctly rounded — only transcendentals need
    * the quantize-first pattern). Degenerate margins (no conversions, or
    * everyone converts) yield NULL instead of NaN.
    *
    * Scale: one groupBy(user) aggregate + one O(1) global aggregate; the
    * double cast loses integer exactness above 2⁵³ events per cell —
    * stated, and irrelevant to the test's significance at that n. */
  def abTest(events: DataFrame, userCol: String, typeCol: String,
      exposureEvent: String, convEvent: String): DataFrame = {
    val perUser = events.groupBy(col(userCol).as("user"))
      .agg(
        max(when(col(typeCol) === exposureEvent, 1L).otherwise(0L)).as("exposed"),
        max(when(col(typeCol) === convEvent, 1L).otherwise(0L)).as("converted"))
      .filter(col("exposed") === 1L)
      .withColumn("variant",
        when(substring(md5(col("user").cast("string")), 1, 1) < "8", "A").otherwise("B"))
    def d(c: Column): Column = c.cast("double")
    perUser.groupBy().agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "A", col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "B", col("converted")).otherwise(0L)).as("conv_b"))
      .withColumn("rate_a_micro", expr("conv_a * 1000000 div nullif(n_a, 0)"))
      .withColumn("rate_b_micro", expr("conv_b * 1000000 div nullif(n_b, 0)"))
      .withColumn("chi2",
        when(col("n_a") > 0 && col("n_b") > 0
          && col("conv_a") + col("conv_b") > 0
          && col("n_a") + col("n_b") - col("conv_a") - col("conv_b") > 0,
          (d(col("n_a") + col("n_b"))
            * ((d(col("conv_a")) * d(col("n_b") - col("conv_b")))
              - (d(col("n_a") - col("conv_a")) * d(col("conv_b"))))
            * ((d(col("conv_a")) * d(col("n_b") - col("conv_b")))
              - (d(col("n_a") - col("conv_a")) * d(col("conv_b")))))
            / (((d(col("n_a")) * d(col("n_b"))) * d(col("conv_a") + col("conv_b")))
              * d(col("n_a") + col("n_b") - col("conv_a") - col("conv_b")))))
  }

  /** Kaplan–Meier time-to-conversion survival: duration = days from a
    * user's first event to their first `convEvent`; users who don't convert
    * within the `horizonDays` observation window are RIGHT-CENSORED at the
    * horizon (they leave the risk set without an event — the reason KM
    * exists; a plain conversion-time histogram silently drops them and
    * biases the curve down). Events at t precede censorings at t, the
    * standard convention, so the horizon risk set includes its censored
    * mass. Emits one row per event time t with the risk-set size, event
    * count, and the LOG-survival in 1e-6 fixed point:
    * `km_log_scaled(t) = Σ_{t'≤t} (qln(n−d) − qln(n))` — per-term quantized
    * ln of BIGINTs (libm parity), summed by a cumulative window, so the
    * curve itself hash-matches; S(t) = exp(km_log_scaled/1e6). A risk set
    * fully consumed by events (n == d) drives survival to exact 0 — that
    * row and everything after carry NULL (log 0 undefined), via a
    * null-count poisoning window.
    *
    * Scale: one groupBy(user) pass, then windows over the DISTINCT-duration
    * relation — bounded by the horizon's day domain, never users. */
  def survivalKm(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convEvent: String, horizonDays: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(horizonDays >= 1, "need a positive observation horizon")
    val perUser = events.groupBy(col(userCol).as("user"))
      .agg(min(col(tsCol)).as("first_ts"),
        min(when(col(typeCol) === convEvent, col(tsCol))).as("conv_ts"))
    val tRaw = datediff(to_date(col("conv_ts")), to_date(col("first_ts"))).cast("long")
    val durations = perUser.select(
      when(col("conv_ts").isNotNull && tRaw <= horizonDays, tRaw)
        .otherwise(lit(horizonDays.toLong)).as("t"),
      when(col("conv_ts").isNotNull && tRaw <= horizonDays, 1L)
        .otherwise(0L).as("converted"))
    val agg = durations.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("converted")).as("d"))
    val wDesc = Window.orderBy(col("t").desc)
    val wAsc = Window.orderBy(col("t").asc)
    agg
      .withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .filter(col("d") > 0)
      .withColumn("term",
        when(col("n_risk") > col("d"),
          Features.qln(col("n_risk") - col("d")) - Features.qln(col("n_risk"))))
      .withColumn("km_log_scaled",
        when(sum(when(col("term").isNull, 1L).otherwise(0L)).over(wAsc) > 0, lit(null))
          .otherwise(sum(col("term")).over(wAsc)))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("d_events"),
        col("km_log_scaled"))
  }

  /** Markov removal-effect attribution (Anderl et al. '14) — the
    * data-driven credit model beyond first/last touch: build the
    * first-order journey chain START → touches → CONV/NULL, compute the
    * conversion-absorption probability, then for each channel REMOVE it
    * (its inbound transitions retarget to NULL, its outbound rows drop)
    * and measure how much conversion probability disappears. Credit is the
    * normalized removal effect.
    *
    * Deterministic integer form: transition COUNTS collect driver-side
    * (states = channels + START/CONV/NULL — bounded by construction, the
    * markovSteadyState precedent) and absorption runs `iters` fixed-point
    * rounds of `p(s) = Σ_t cnt(s,t)·p(t) div out(s)` in 1e-6 units
    * (monotone from 0; truncating division identical in Scala/Spark/
    * DuckDB). The oracle unrolls base + per-channel-removal chains.
    *
    * Conversion rule (pinned): a journey converts iff the user has ≥ 1
    * event in `converters`. Touch order is (ts, tieCol). `channels` is the
    * FIXED domain to report (a channel with no touches has effect 0). */
  def markovAttribution(touches: DataFrame, userCol: String, tsCol: String,
      tieCol: String, channelCol: String, converters: DataFrame, convUserCol: String,
      channels: Seq[Long] = 0L to 9L, iters: Int = 12): DataFrame = {
    require(iters >= 1 && channels.nonEmpty, "bad attribution params")
    // channel values share the state space with the START/CONV/NULL
    // sentinels — a colliding value would silently corrupt the chain
    // (removing "channel 100" would retarget every CONV transition)
    require(channels.forall(c => c >= 0L && c < 100L),
      s"channels must lie in [0, 99] (sentinel collision): ${channels.filterNot(c => c >= 0L && c < 100L)}")
    val spark = touches.sparkSession
    import spark.implicits._
    val Start = -1L
    val Conv = 100L
    val Null = 101L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ts"), col("tie"))
    // data-derived channel values get the same sentinel guard as the
    // declared domain: ch = -1 would merge into START, ch = 100/101 into
    // CONV/NULL — raise_error embeds in the kept expression (scd2 pattern,
    // fires at execution, costs one comparison per row)
    val chRaw = col(channelCol).cast("long")
    val chSafe = when(chRaw.isNull || chRaw < 0L || chRaw >= 100L,
      raise_error(concat(lit("markovAttribution: channel value outside [0, 99] collides with sentinels: "),
        coalesce(chRaw.cast("string"), lit("NULL")))).cast("long"))
      .otherwise(chRaw)
    val seq0 = touches.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(tieCol).as("tie"), chSafe.as("ch"))
      .withColumn("prev", lag(col("ch"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("rn_desc", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("u")).orderBy(col("ts").desc, col("tie").desc)))
    val conv = converters.select(col(convUserCol).as("u")).distinct()
      .withColumn("has_conv", lit(true))
    val withConv = seq0.join(conv, Seq("u"), "left")
      .withColumn("has_conv", coalesce(col("has_conv"), lit(false)))
      .transform(Residuals.persist)
    val trans = withConv.select(
      when(col("rn") === 1, lit(Start)).otherwise(col("prev")).as("f"), col("ch").as("t"))
      .unionByName(withConv.filter(col("rn_desc") === 1).select(col("ch").as("f"),
        when(col("has_conv"), lit(Conv)).otherwise(lit(Null)).as("t")))
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect()
    require(trans.nonEmpty, "no touches — nothing to attribute")
    def absorb(rows: Array[(Long, Long, Long)]): Long = {
      val outs = rows.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
      var p = Map.empty[Long, Long].withDefaultValue(0L)
      for (_ <- 1 to iters) {
        val next = rows.groupBy(_._1).map { case (f, rs) =>
          val s = rs.map { case (_, t, c) =>
            c * (if (t == Conv) 1000000L else if (t == Null) 0L else p(t))
          }.sum
          f -> s / outs(f)
        }
        p = next.withDefaultValue(0L)
      }
      p(Start)
    }
    val base = absorb(trans)
    val rows = channels.map { r =>
      val removed = trans.collect {
        case (f, t, c) if f != r => (f, if (t == r) Null else t, c)
      }
      val pr = if (removed.exists(_._1 == Start)) absorb(removed) else 0L
      val eff = math.max(0L, base - pr)
      (r, base, pr, eff)
    }
    val total = rows.map(_._4).sum
    spark.createDataset(rows.map { case (ch, b, pr, eff) =>
      (ch, b, pr, eff, if (total == 0) 0L else eff * 1000000L / total)
    }).toDF("channel", "base_micro", "removed_micro", "effect_micro", "credit_micro")
  }

  /** Gapped sequential-pattern mining (PrefixSpan's length-2 core): for
    * every ordered event-type pair (a → b, a ≠ b), the number of users who
    * performed a STRICTLY BEFORE some later b — any gap, any intervening
    * events. [[transitionMatrix]] counts only ADJACENT steps; the gapped
    * form is what funnel discovery and "what eventually follows signup"
    * analyses need.
    *
    * The naive per-user event self-join is O(events²/user). A user exhibits
    * pattern (a, b) iff `min ts(a) < max ts(b)` — so one aggregate to per-
    * (user, type) first/last timestamps collapses the join to the
    * type-domain square per user: O(users · |types|²), with |types| a small
    * bounded domain. Strictly-before uses `<` on timestamps (an a and b at
    * the same instant do not order).
    *
    * Scale shape: one map-side-combined aggregate + one self-equi-join on
    * the user key (co-partitioned, no skew: both sides ≤ |types| rows per
    * user) + one count. Returns (type_a, type_b, n_users) with support
    * ≥ minSupport. */
  def seqPatterns(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, "minSupport must be positive")
    val spans = events
      .groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
      .transform(Residuals.persist)
    spans.select(col("u"), col("t").as("type_a"), col("first_ts"))
      .join(spans.select(col("u"), col("t").as("type_b"), col("last_ts")), "u")
      .filter(col("type_a") =!= col("type_b") && col("first_ts") < col("last_ts"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
  }

  /** Weekly growth accounting — the standard user-lifecycle ledger (Social
    * Capital's "accounting for growth" framing): every active (user, week)
    * is classified NEW (first-ever week), RETAINED (also active the week
    * before) or RESURRECTED (returning after a gap), and CHURNED counts the
    * users active in week w−1 who went silent in w. The identity
    * `active(w) = new + retained + resurrected` and
    * `retained(w) + churned(w) = active(w−1)` holds exactly — it's what
    * makes the ledger audit-able, and the spec pins it.
    *
    * Weeks are epoch-day div 7 (integer floor of µs — no calendar/locale
    * WEEK() semantics to disagree across engines). All classification is
    * distinct-set membership: one distinct (user, week) relation, one
    * per-user min, two self-joins on (user, week−1) — every stage hash-
    * partitions on the user key, no windows over the log. Churn for the
    * week AFTER the last observed week is not emitted (unknowable — the
    * observation window ended). Output per week:
    * (week, n_active, n_new, n_retained, n_resurrected, n_churned). */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = events.select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div 604800000000").as("w"))
      .distinct()
      .transform(Residuals.persist)
    val firstW = active.groupBy(col("u")).agg(min(col("w")).as("w0"))
    val prev = active.select(col("u"), (col("w") + 1).as("w"), lit(1L).as("was_prev"))
    val classified = active
      .join(firstW, "u")
      .join(prev, Seq("u", "w"), "left")
      .select(col("w"),
        when(col("w") === col("w0"), lit("new"))
          .when(col("was_prev").isNotNull, lit("retained"))
          .otherwise(lit("resurrected")).as("status"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val maxW = active.agg(max(col("w")).as("w_max"))
    val churned = active.select(col("u"), (col("w") + 1).as("w"))
      .join(active.select(col("u"), col("w"), lit(1L).as("still")), Seq("u", "w"), "left")
      .filter(col("still").isNull)
      .crossJoin(broadcast(maxW)).filter(col("w") <= col("w_max"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_churned"))
    classified.join(churned, Seq("w"), "full_outer")
      .select(col("w").as("week"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** EWMA anomaly monitor over per-type hourly volumes — the streaming-ops
    * complement to [[graft.operators.Drift]]'s distribution tests and the
    * trailing-window spike flags: an exponentially-weighted baseline in
    * exact milli-units, s_t = (α·1000·x_t + (1000−α·1000)·s_{t−1}) div
    * 1000 with α in per-mille, flags when the hour's count breaks ±2× of
    * the PREVIOUS baseline (the hour under test must not influence its own
    * baseline) after a `burnIn`-hour warm-up. Flags are SIGNED (+1 surge /
    * −1 drop — the hourlySpikes lesson: an outage must not look like a
    * surge).
    *
    * The recursion is inherently sequential PER SERIES, so the fold runs
    * where the series lives: the hourly aggregate shuffles once on the
    * type key and each type's dense hour grid folds inside its executor
    * task (`flatMapGroups`) — zero driver state, cost `types × hours`
    * spread across the cluster (r14 verdict #4; the old driver-side
    * collect bounded the WHOLE grid globally and refused on multi-year
    * high-cardinality corpora that are perfectly foldable per type).
    * `maxGridRows` is therefore a PER-TYPE dense-span cap (default 2M ≈
    * 228 years of hours — per-task memory insurance, not a corpus bound),
    * enforced inside the fold task before the dense grid is allocated —
    * an over-span type fails its task with a named
    * IllegalArgumentException cause (fused guard, r15 verdict #3: a
    * separate up-front guard job + the persist it required were pure
    * fixed overhead). Output row ORDER is partition-dependent (a
    * flatMapGroups contract) — consumers needing an order must sort;
    * every gate query already carries a total ORDER BY. Scala's
    * `/` on nonnegative Longs truncates exactly like Spark `div` and
    * DuckDB `//`, which is what keeps the executor fold oracle-exact
    * against a recursive-CTE re-derivation. Missing hours are real zeros:
    * the hour grid is dense from each type's first to last active hour
    * (gaps decay the baseline rather than silently skipping time). */
  def ewmaAnomaly(events: DataFrame, typeCol: String, tsCol: String,
      alphaMille: Long = 300L, burnIn: Int = 3,
      maxGridRows: Int = 2000000): DataFrame = {
    require(alphaMille >= 1 && alphaMille <= 1000, "alpha must be in (0, 1] per-mille")
    require(burnIn >= 1, "burnIn must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = hourlyGrid(events, typeCol, tsCol, maxGridRows)
    hourly.groupByKey(_._1).flatMapGroups { (t, it) =>
      val rs = it.map(r => (r._2, r._3)).toArray
      val byHr = rs.toMap
      val (h0, h1) = (rs.iterator.map(_._1).min, rs.iterator.map(_._1).max)
      spanGuard("ewmaAnomaly", t, h0, h1, maxGridRows)
      var s = byHr.getOrElse(h0, 0L) * 1000L
      (h0 to h1).iterator.zipWithIndex.map { case (hr, i) =>
        val x = byHr.getOrElse(hr, 0L)
        val sPrev = s
        s = if (i == 0) x * 1000L
            else (alphaMille * 1000L * x + (1000L - alphaMille) * sPrev) / 1000L
        val flag =
          if (i < burnIn) 0L
          else if (x * 1000L > 2L * sPrev) 1L
          else if (x * 2000L < sPrev) -1L
          else 0L
        (t, hr, x, if (i == 0) x * 1000L else sPrev, s, flag)
      }
    }.toDF("event_type", "hr", "n", "ewma_prev_milli", "ewma_milli", "flag")
  }

  /** Shared front half of the three per-type hourly folds ([[ewmaAnomaly]] /
    * [[cusumShift]] / [[burstDetect]]): the (type, hour, n) aggregate as a
    * typed Dataset. The PER-TYPE dense-span cap is enforced INSIDE each
    * fold task ([[spanGuard]], called before the dense grid is allocated):
    * fusing the guard into the fold drops the separate guard job AND the
    * persist the two consumers needed (r15 verdict #3 — the extra job +
    * materialization was pure fixed overhead at small SF), at the cost of
    * the refusal surfacing as a task failure (SparkException whose CAUSE
    * is the named [[IllegalArgumentException]]) when the query RUNS rather
    * than eagerly when it is built. On a real cluster that trade has a
    * second cost local[] never shows (r16 ADVICE): the failing task is
    * retried `spark.task.maxFailures` times (default 4) before the job
    * dies, and sibling tasks do work that is then thrown away — refusal
    * LATENCY scales with the retry policy even though the refusal itself
    * is certain (the guard is deterministic per group, so every retry
    * fails identically). Acceptable here because the cap is a
    * misconfiguration guard, not a data-dependent branch; jobs that need
    * fast-fail semantics at scale should validate the span up front and
    * pay the extra aggregate deliberately. */
  private def hourlyGrid(events: DataFrame, typeCol: String, tsCol: String,
      maxGridRows: Int)
      : org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    require(maxGridRows >= 1, "maxGridRows must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(typeCol).cast("string").as("t"),
        expr(s"unix_micros($tsCol) div 3600000000").as("hr"))
      .groupBy(col("t"), col("hr")).agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)]
  }

  /** Executor-side per-type span cap for the hourly folds: refuses LOUDLY
    * (names the type and its dense span) before the dense grid for an
    * over-wide series is allocated — the task failure carries this
    * [[IllegalArgumentException]] as its cause. */
  private def spanGuard(op: String, t: String, h0: Long, h1: Long,
      maxGridRows: Int): Unit = {
    val span = h1 - h0 + 1L
    if (span > maxGridRows)
      throw new IllegalArgumentException(
        s"$op: type '$t' spans $span dense hours (> maxGridRows=$maxGridRows " +
          "per-type cap) — bucket the type column or split the time range")
  }

  /** Two-sided CUSUM control chart over per-type hourly volumes — the
    * mean-SHIFT-onset detector beside [[ewmaAnomaly]] (point breaks),
    * [[hourlySpikes]] (window breaks) and [[burstDetect]] (regime decode):
    * CUSUM accumulates small sustained deviations that never individually
    * break a threshold, catching slow drifts days before a point alarm.
    * S⁺_t = max(0, S⁺_{t−1} + x_t·1000 − μ_milli − k_milli) and the
    * mirrored S⁻ for drops, flag +1/−1 while the side exceeds
    * h = `hFactor`·μ_milli (signed — the outage-vs-surge rule). Slack
    * k = μ_milli div `kDiv` (classic k ≈ shift/2). All integer milli
    * units: +, −, max only — no division in the recurrence, so the fold
    * hash-matches its recursive-CTE twin exactly.
    *
    * Same per-type executor-fold contract as [[ewmaAnomaly]]/
    * [[burstDetect]] (shared [[hourlyGrid]] front half): one type-keyed
    * shuffle, sequential state folds inside the type's task, per-type
    * dense-span cap refused loudly FROM the fold task (named IAE cause;
    * see [[ewmaAnomaly]]), row order partition-dependent. Output
    * (event_type, hr, n, s_plus_milli, s_minus_milli, flag). */
  def cusumShift(events: DataFrame, typeCol: String, tsCol: String,
      kDiv: Long = 4L, hFactor: Long = 4L,
      maxGridRows: Int = 2000000): DataFrame = {
    require(kDiv >= 1, "kDiv must be positive")
    require(hFactor >= 1, "hFactor must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = hourlyGrid(events, typeCol, tsCol, maxGridRows)
    hourly.groupByKey(_._1).flatMapGroups { (t, it) =>
      val rs = it.map(r => (r._2, r._3)).toArray
      val byHr = rs.toMap
      val (h0, h1) = (rs.iterator.map(_._1).min, rs.iterator.map(_._1).max)
      spanGuard("cusumShift", t, h0, h1, maxGridRows)
      val xs = (h0 to h1).map(hr => byHr.getOrElse(hr, 0L))
      val muM = xs.sum * 1000L / xs.length
      val kM = muM / kDiv
      val hM = hFactor * muM
      var sp = 0L
      var sm = 0L
      xs.iterator.zipWithIndex.map { case (x, i) =>
        sp = math.max(0L, sp + x * 1000L - muM - kM)
        sm = math.max(0L, sm + muM - kM - x * 1000L)
        val flag = if (sp > hM) 1L else if (sm > hM) -1L else 0L
        (t, h0 + i, x, sp, sm, flag)
      }
    }.toDF("event_type", "hr", "n", "s_plus_milli", "s_minus_milli", "flag")
  }

  /** Kleinberg-style burst detection over per-type hourly volumes: a
    * 2-state (base rate λ0, burst rate `burstFactor`·λ0) Viterbi decode
    * under Poisson negative log-likelihood — the INTERVAL-level burst
    * labeling [[hourlySpikes]]' pointwise flags can't give (a 6-hour surge
    * is ONE burst, not six flags, because entering the burst state pays
    * `gammaMicro` once). Every cost is exact integer micro-nats:
    * c_q(x) = λq_milli·1000 − x·(qln(λq_milli) − qln(1000)) — plain
    * integer +/−/× and comparisons, NO division anywhere, so the decode
    * is bit-identical across engines (ties break toward the base state,
    * the smallest-start convention). λ0_milli = max(1, total·1000 div
    * span) per type.
    *
    * Same per-type executor-fold contract as [[ewmaAnomaly]] (shared
    * [[hourlyGrid]] front half): the Viterbi decode is sequential per
    * series, so it folds inside the type's task after one type-keyed
    * shuffle; per-type dense-span cap refused loudly FROM the fold task
    * (named IAE cause), row order partition-dependent. Output
    * (event_type, hr, n, state), state 1 = inside a burst. */
  def burstDetect(events: DataFrame, typeCol: String, tsCol: String,
      burstFactor: Long = 3L, gammaMicro: Long = 3000000L,
      maxGridRows: Int = 2000000): DataFrame = {
    require(burstFactor >= 2, "burst rate must exceed the base rate")
    require(gammaMicro >= 0, "gammaMicro must be nonnegative")
    val spark = events.sparkSession
    import spark.implicits._
    def qlnL(y: Long): Long = math.floor(math.log(y.toDouble) * 1e6 + 0.5).toLong
    val qln1000 = qlnL(1000L)
    val hourly = hourlyGrid(events, typeCol, tsCol, maxGridRows)
    hourly.groupByKey(_._1).flatMapGroups { (t, it) =>
      val rsArr = it.map(r => (r._2, r._3)).toArray
      val byHr = rsArr.toMap
      val (h0, h1) = (rsArr.iterator.map(_._1).min, rsArr.iterator.map(_._1).max)
      spanGuard("burstDetect", t, h0, h1, maxGridRows)
      val xs = (h0 to h1).map(hr => byHr.getOrElse(hr, 0L)).toArray
      val T = xs.length
      val lam0 = math.max(1L, xs.sum * 1000L / T)
      val lam1 = burstFactor * lam0
      val (w0, w1) = (qlnL(lam0) - qln1000, qlnL(lam1) - qln1000)
      def c0(x: Long) = lam0 * 1000L - x * w0
      def c1(x: Long) = lam1 * 1000L - x * w1
      val v0 = new Array[Long](T); val v1 = new Array[Long](T)
      val f0 = new Array[Int](T); val f1 = new Array[Int](T)
      v0(0) = c0(xs(0)); v1(0) = gammaMicro + c1(xs(0))
      for (i <- 1 until T) {
        f0(i) = if (v0(i - 1) <= v1(i - 1)) 0 else 1
        v0(i) = math.min(v0(i - 1), v1(i - 1)) + c0(xs(i))
        f1(i) = if (v0(i - 1) + gammaMicro <= v1(i - 1)) 0 else 1
        v1(i) = math.min(v0(i - 1) + gammaMicro, v1(i - 1)) + c1(xs(i))
      }
      val states = new Array[Long](T)
      states(T - 1) = if (v0(T - 1) <= v1(T - 1)) 0L else 1L
      for (i <- T - 1 to 1 by -1)
        states(i - 1) = if (states(i) == 0L) f0(i).toLong else f1(i).toLong
      (0 until T).iterator.map(i => (t, h0 + i, xs(i), states(i)))
    }.toDF("event_type", "hr", "n", "state")
  }
}
