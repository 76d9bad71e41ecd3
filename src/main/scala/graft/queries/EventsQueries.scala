package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnels, cohorts, rolling features, decay, transitions, spikes, baskets, drift monitors.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait EventsQueries extends QueryHelpers {

  protected def eventsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "events_seq_patterns" -> ((s, dir) => {
      // gapped sequential patterns (PrefixSpan's length-2 core): users who
      // did type_a strictly before SOME later type_b, any gap — collapsed
      // to per-(user, type) first/last timestamps so the join is the
      // type-domain square per user, never the event square
      graft.operators.Behavior.seqPatterns(
        events(s, dir), "user_id", "event_type", "ts", minSupport = 2L)
        .orderBy(col("type_a"), col("type_b"))
    }),


    "drift_topk_churn" -> ((s, dir) => {
      // head-of-vocabulary churn between two corpus snapshots (doc_id
      // parity split): which top-20 tokens entered/left/moved — the
      // editorial drift axis PSI/KS can't see; ranks fully tie-broken
      val docs = t(s, dir, "documents")
      def cnt(d: DataFrame): DataFrame =
        d.select(explode(TextFns.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("w"))
      graft.operators.Drift.topkChurn(
          cnt(docs.filter(col("doc_id") % 2 === 0)),
          cnt(docs.filter(col("doc_id") % 2 === 1)), "tok", "w", k = 20)
        .orderBy(col("key"))
    }),


    "events_growth_accounting" -> ((s, dir) => {
      // weekly user-lifecycle ledger: new / retained / resurrected per
      // active week plus churn out of the prior week — the two accounting
      // identities (active = new+ret+res; ret(w)+churn(w) = active(w−1))
      // are spec-pinned; weeks are epoch-µs div 7 days, calendar-free
      graft.operators.Behavior.growthAccounting(events(s, dir), "user_id", "ts")
        .orderBy(col("week"))
    }),


    "events_ewma_anomaly" -> ((s, dir) => {
      // per-type hourly EWMA baseline (α=0.3 in per-mille, exact integer
      // milli-units) with ±2× signed break flags after a 3-hour burn-in;
      // the recursion runs driver-side over the metadata-sized hourly
      // aggregate (pcaPower contract), oracle = recursive CTE
      graft.operators.Behavior.ewmaAnomaly(events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("hr"))
    }),


    "events_journey_pairs" -> ((s, dir) => {
      // behavioral twins over a SCREENING COHORT (user_id < 400 — the
      // flagged subset a fraud/bot review actually scans; an all-pairs
      // edit-distance sweep at threshold ~len/2 is quadratic by nature, so
      // the operator is pointed at cohorts, not populations): first-24-event
      // sequences within 11 edits, length-band blocked + SALTED (uniform
      // lengths are one band = one hot key), exact levenshtein verify
      graft.operators.Behavior.journeyPairs(
        events(s, dir).filter(col("user_id") < 400),
        "user_id", "event_type", "ts", "event_id",
        maxDist = 11, maxLen = 24)
        .orderBy(col("user_a"), col("user_b"))
    }),

    "events_stickiness" -> ((s, dir) => {
      // DAU/MAU engagement ratio per day, 1e-6 fixed point — exact distinct
      // counts at this scale, the HLL family is the approximate drop-in
      graft.operators.Behavior.stickiness(events(s, dir), "user_id", "ts")
        .orderBy(col("day"))
    }),

    "events_markov_steady" -> ((s, dir) => {
      // long-run behavior mix: 3 power-iteration rounds of pi <- pi*P over
      // the tie-broken transition matrix — where the population settles if
      // today's behavior persists; matrix is metadata, iteration is driver
      // math, oracle is 3 unrolled SQL rounds
      graft.operators.Behavior.markovSteadyState(
        events(s, dir), "user_id", "event_type", "ts", "event_id", rounds = 3)
        .orderBy(col("state"))
    }),

    "events_funnel_latency" -> ((s, dir) => {
      // the funnel's other axis: stage-to-stage conversion latency in
      // integer µs — count, doubled-median, p90, max per stage
      graft.operators.Behavior.funnelLatency(
        events(s, dir), "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    }),

    "events_forecast_anomaly" -> ((s, dir) => {
      // seasonal-naive monitoring: hourly volume vs the same hour yesterday,
      // flagged outside a robust median ± 3·MAD band (all-BIGINT x2 trick);
      // signed flags — a drop is not a surge
      graft.operators.Behavior.forecastAnomaly(events(s, dir), "ts")
        .orderBy(col("hour"))
    }),

    "events_rfm" -> ((s, dir) => {
      // RFM customer-value segmentation: per-user recency/frequency/monetary
      // metrics scored 1-3 by BIGINT tertiles (bit-exact percentiles),
      // segment = r*100 + f*10 + m — one groupBy(user) pass, no window
      graft.operators.Behavior.rfm(events(s, dir), "user_id", "ts", "value")
        .orderBy(col("user_id"))
    }),

    "events_cohort_ltv" -> ((s, dir) => {
      // cohort LTV curve: first-event-day cohorts, cumulative purchase
      // cents per (cohort, age) and micro-cents per user — the money axis
      // of the retention triangle
      graft.operators.Behavior.cohortLtv(events(s, dir), "user_id", "ts",
        "value", "event_type", "purchase")
        .orderBy(col("cohort_day"), col("age_days"))
    }),

    "events_ab_test" -> ((s, dir) => {
      // experiment readout: md5-parity variant assignment, view-exposed /
      // purchase-converted cells, two-proportion chi-square as an
      // IEEE-bit-identical double over BIGINT cells (fixed op order)
      graft.operators.Behavior.abTest(events(s, dir), "user_id", "event_type",
        "view", "purchase")
    }),

    "events_survival_km" -> ((s, dir) => {
      // Kaplan-Meier time-to-purchase curve: days from first event to first
      // purchase, right-censored at a 5-day horizon — per-event-time risk
      // sets + 1e-6 fixed-point log-survival, the censoring-correct
      // conversion-latency curve a plain histogram biases
      graft.operators.Behavior.survivalKm(events(s, dir), "user_id", "ts",
        "event_type", "purchase", horizonDays = 5)
        .orderBy(col("t_days"))
    }),

    "events_value_mad" -> ((s, dir) => {
      // robust dispersion: median + MAD per type, both carried x2 so every
      // percentile runs on BIGINT inputs (the r5 bit-parity precedent)
      graft.operators.Behavior.valueMad(events(s, dir), "event_type", "value")
        .orderBy(col("event_type"))
    }),

    "drift_cramers_v" -> ((s, dir) => {
      // Cramer's V over the chi2 fixture: the size-free effect measure —
      // chi2 scales with n, V in [0,1] compares across corpus sizes
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.cramersV(docs, cur, "n_chars", width = 50L, buckets = 12)
    }),


    "drift_chi2" -> ((s, dir) => {
      // χ² homogeneity over the same re-curation and buckets as drift_psi:
      // the significance test beside the practitioner index
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.chi2Of(docs, cur, "n_chars", width = 50L, buckets = 12)
    }),

    "events_value_outliers" -> ((s, dir) => {
      // per-type value anomalies via the sqrt-free z-test ((x-mean)^2 vs
      // z^2 * variance, all integer cents / dollar^2 units)
      graft.operators.Behavior.valueOutliers(
        events(s, dir), "event_id", "event_type", cents(col("value")))
        .select(col("id").as("event_id"), col("g").as("event_type"),
          col("xc").as("value_c"), col("dev_c"), col("is_outlier"))
        .orderBy(col("event_id"))
    }),


    "funnel_stages" -> ((s, dir) => {
      // strict-sequence conversion funnel view -> click -> purchase: per
      // user, each stage's earliest qualifying timestamp and how far they got
      graft.operators.Behavior.funnel(
        events(s, dir), "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .select(col("user").as("user_id"), col("ts_0").as("ts_view"),
          col("ts_1").as("ts_click"), col("ts_2").as("ts_purchase"),
          col("stage_reached"))
        .orderBy(col("user_id"))
    }),


    "funnel_stages_windowed" -> ((s, dir) => {
      // conversion-window funnel: each stage must land within 24 hours of
      // the previous one — the form a marketing/product funnel actually uses
      graft.operators.Behavior.funnel(
        events(s, dir), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxGap = Some("24 HOURS"))
        .select(col("user").as("user_id"), col("ts_0").as("ts_view"),
          col("ts_1").as("ts_click"), col("ts_2").as("ts_purchase"),
          col("stage_reached"))
        .orderBy(col("user_id"))
    }),


    "funnel_summary" -> ((s, dir) => {
      graft.operators.Behavior.funnelSummary(
        events(s, dir), "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    }),


    "events_decayed_value" -> ((s, dir) => {
      // recency-weighted user value: exponential half-life decay as a
      // LITERAL quantized weight table (same longs embedded in the oracle
      // SQL), so no runtime pow enters the compared result
      graft.operators.Behavior.decayedValue(
        events(s, dir), "user_id", "ts", cents(col("value")), halfLifeDays = 7.0)
        .select(col("user").as("user_id"), col("score_scaled"), col("score"))
        .orderBy(col("user_id"))
    }),


    "events_top_paths" -> ((s, dir) => {
      // journey path mining: most common 3-step event sequences; one window
      // serves both lead offsets, top-k is TakeOrdered
      graft.operators.Behavior.topPaths(
        events(s, dir), "user_id", "event_type", "ts", "event_id", k = 20)
    }),


    "events_transitions" -> ((s, dir) => {
      // first-order journey transitions: P(next event type | current), lag
      // windows per user with (ts, event_id) tie-broken ordering
      graft.operators.Behavior.transitionMatrix(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    }),


    "cohort_retention" -> ((s, dir) => {
      // classic retention triangle: cohort = first-activity day, retained at
      // offset d iff any event on cohort_day + d
      graft.operators.Behavior.retention(events(s, dir), "user_id", "ts")
        // DATE surfaces as python-object in the compare; timestamp is typed
        .withColumn("cohort_day", col("cohort_day").cast("timestamp"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),


    "events_rolling_7d" -> ((s, dir) => {
      // trailing-7-day activity features per user-day: daily aggregate
      // first, RANGE-frame window over the collapsed rows second
      graft.operators.Behavior.rollingDaily(
        events(s, dir), "user_id", "ts", cents(col("value")), windowDays = 7)
        .select(col("user").as("user_id"), col("day"), col("n_events"),
          col("value_cents"), col("n_events_window"), col("value_cents_window"))
        .orderBy(col("user_id"), col("day"))
    }),


    "basket_part_pairs" -> ((s, dir) => {
      // market-basket association: parts co-ordered more than chance — one
      // self equi-join on the order key (never cartesian), integer counts,
      // lift as a single division chain
      graft.operators.Basket.coOccurrence(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(100)
    }),


    "events_hourly_spikes" -> ((s, dir) => {
      // volume-spike monitor: each (type, hour) count z-tested against its
      // trailing 24 present hours, sqrt-free integer algebra throughout
      graft.operators.Behavior.hourlySpikes(events(s, dir), "ts", "event_type")
        .orderBy(col("hour"), col("event_type"))
    }),


    "drift_embedding_shift" -> ((s, dir) => {
      // embedding-cloud drift after a (deterministic) re-curation: L2 shift
      // between per-dim truncating-integer-mean centroids; sqrt is the one
      // non-integer op and IEEE requires it correctly rounded
      val embs = t(s, dir, "embeddings")
      graft.operators.Drift.embeddingShift(
        embs, embs.filter(col("vec_id") % 3 =!= 0), "embedding")
    }),


    "drift_auc" -> ((s, dir) => {
      // classifier-free two-sample test (C2ST-lite): AUC of a feature
      // separating the reference from the re-curated population — 500000
      // micro = indistinguishable, the one-number drift summary that needs
      // no binning (PSI) and no cumulative pass semantics of its own
      // (pure composition with aucExact over the union)
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Eval.aucExact(
        docs.select(col("n_chars"), lit(0L).as("y"))
          .unionByName(cur.select(col("n_chars"), lit(1L).as("y"))),
        col("n_chars"), col("y"))
    }),


    "eval_auc" -> ((s, dir) => {
      // exact tie-aware ROC AUC: does order value rank purchases above
      // non-purchases? Mann-Whitney over the distinct-value relation —
      // doubles are compared, never accumulated; conc2 carries
      // 2·concordant + ties exactly
      graft.operators.Eval.aucExact(events(s, dir),
        col("value"), (col("event_type") === "purchase").cast("long"))
    }),


    "drift_ks" -> ((s, dir) => {
      // binning-free drift twin of drift_psi: exact two-sample KS distance
      // over the same deterministic re-curation — integer cumulative
      // differences, one final division
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.ksOf(docs, cur, "n_chars")
    }),


    "events_cusum" -> ((s, dir) => {
      // two-sided CUSUM mean-shift chart: sustained small deviations
      // accumulate where point alarms stay silent; pure integer milli
      // recurrence (max/+/- only), recursive-CTE twin
      graft.operators.Behavior.cusumShift(events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("hr"))
    }),


    "events_bursts" -> ((s, dir) => {
      // Kleinberg 2-state burst decode over per-type hourly volumes:
      // interval-level burst labeling (one gamma per burst entry), exact
      // integer Viterbi — the oracle replays forward DP + backtrack as
      // recursive CTEs
      graft.operators.Behavior.burstDetect(events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("hr"))
    }),


    "drift_wasserstein" -> ((s, dir) => {
      // the INTEGRAL drift axis beside drift_ks's max deviation over the
      // same re-curation: exact earth-mover distance — integer numerator
      // over the distinct-value relation, one final IEEE division
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.wasserstein1d(docs, cur, "n_chars")
    }),


    "events_weekly_profile" -> ((s, dir) => {
      // traffic-shape fingerprint: (ISO dow, hour) counts, per-mille share,
      // 2x-uniform peak flags — all integer, the forecastAnomaly baseline
      graft.operators.Behavior.weeklyProfile(events(s, dir), "ts")
        .orderBy(col("dow"), col("hour"))
    }),

    "events_velocity" -> ((s, dir) => {
      // burst detection: per-user MAX event count in any sliding 1-hour
      // window (15-min hops) — the rate signal a polite average hides;
      // hop assignment is pure integer minute arithmetic
      graft.operators.Behavior.burstVelocity(events(s, dir), "user_id", "ts")
        .orderBy(col("user_id"))
    }),

    "events_user_entropy" -> ((s, dir) => {
      // behavioral diversity: per-user event-type Shannon entropy in
      // micro-nats (per-term qln quantization) — the "does one thing"
      // bot signal beside events_interarrival's timing signal
      graft.operators.Behavior.userEntropy(events(s, dir), "user_id", "event_type")
        .orderBy(col("user_id"))
    }),


    "drift_js" -> ((s, dir) => {
      // bounded drift twin of drift_psi: Jensen-Shannon divergence over the
      // same buckets and re-curation — saturates at ln 2 where PSI explodes
      // on zero-overlap buckets; integer k·qln terms, micro-nats out
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.jsDivergence(docs, cur, "n_chars", width = 50L, buckets = 12)
    }),


    "drift_psi" -> ((s, dir) => {
      // distribution-drift check between the corpus and a (deterministic)
      // length-biased re-curation: Population Stability Index over
      // fixed-width n_chars buckets, Laplace-smoothed, integer-exact
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.psiOf(docs, cur, "n_chars", width = 50L, buckets = 12)
    }),


    "drift_psi_by_lang" -> ((s, dir) => {
      // stratified drift: the same re-curation scored per language — the
      // monitor that answers WHICH slice moved, not just whether the mix did
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.psiByGroup(docs, cur, "lang", "n_chars",
        width = 50L, buckets = 12)
        .orderBy(col("lang"))
    }))

  protected def eventsOracles: Map[String, String] = Map(

    // a user exhibits (a, b) iff min ts(a) < max ts(b) — the span collapse
    // makes the pattern join type-domain-sized per user
    "events_seq_patterns" ->
      """WITH spans AS (
        |  SELECT user_id AS u, event_type AS t, min(ts) AS first_ts, max(ts) AS last_ts
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS n_users
        |FROM spans a JOIN spans b
        |  ON a.u = b.u AND a.t <> b.t AND a.first_ts < b.last_ts
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY type_a, type_b""".stripMargin,

    // ranks via fully tie-broken row_number; absent-from-top-k sides
    // normalize to 0 through the full outer join
    "drift_topk_churn" ->
      """WITH tok_old AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents WHERE doc_id % 2 = 0
        |), tok_new AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents WHERE doc_id % 2 = 1
        |), w_o AS (SELECT tok AS key, CAST(count(*) AS BIGINT) AS w FROM tok_old GROUP BY 1),
        |w_n AS (SELECT tok AS key, CAST(count(*) AS BIGINT) AS w FROM tok_new GROUP BY 1),
        |t_o AS (
        |  SELECT key, w AS w_old,
        |    CAST(row_number() OVER (ORDER BY w DESC, key ASC) AS BIGINT) AS rank_old
        |  FROM w_o QUALIFY rank_old <= 20
        |), t_n AS (
        |  SELECT key, w AS w_new,
        |    CAST(row_number() OVER (ORDER BY w DESC, key ASC) AS BIGINT) AS rank_new
        |  FROM w_n QUALIFY rank_new <= 20
        |)
        |SELECT COALESCE(t_o.key, t_n.key) AS key,
        |  COALESCE(w_old, 0) AS w_old, COALESCE(w_new, 0) AS w_new,
        |  COALESCE(rank_old, 0) AS rank_old, COALESCE(rank_new, 0) AS rank_new
        |FROM t_o FULL OUTER JOIN t_n ON t_n.key = t_o.key
        |ORDER BY key""".stripMargin,

    // distinct (user, week) membership sets; churn = active(w−1) ∖
    // active(w), capped at the last observed week; statuses via the
    // first-week join + the week−1 self-join
    "events_growth_accounting" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS w FROM events
        |), firstw AS (SELECT u, min(w) AS w0 FROM active GROUP BY 1),
        |cls AS (
        |  SELECT a.w,
        |    CASE WHEN a.w = f.w0 THEN 'new'
        |         WHEN p.u IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS status
        |  FROM active a JOIN firstw f ON f.u = a.u
        |  LEFT JOIN active p ON p.u = a.u AND p.w = a.w - 1
        |), agg AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(count(*) FILTER (WHERE status = 'new') AS BIGINT) AS n_new,
        |    CAST(count(*) FILTER (WHERE status = 'retained') AS BIGINT) AS n_retained,
        |    CAST(count(*) FILTER (WHERE status = 'resurrected') AS BIGINT) AS n_resurrected
        |  FROM cls GROUP BY 1
        |), churn AS (
        |  SELECT a.w + 1 AS w, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM active a LEFT JOIN active nx ON nx.u = a.u AND nx.w = a.w + 1
        |  WHERE nx.u IS NULL AND a.w + 1 <= (SELECT max(w) FROM active)
        |  GROUP BY 1
        |)
        |SELECT CAST(COALESCE(agg.w, churn.w) AS BIGINT) AS week,
        |  COALESCE(n_active, 0) AS n_active, COALESCE(n_new, 0) AS n_new,
        |  COALESCE(n_retained, 0) AS n_retained,
        |  COALESCE(n_resurrected, 0) AS n_resurrected,
        |  COALESCE(n_churned, 0) AS n_churned
        |FROM agg FULL OUTER JOIN churn ON churn.w = agg.w
        |ORDER BY week""".stripMargin,

    // dense per-type hour grid (missing hours are real zeros), then the
    // EWMA recursion as a recursive CTE — DuckDB // == Scala Long / on
    // the nonneg milli state, so the driver fold hash-matches
    "events_ewma_anomaly" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type AS t, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), bounds AS MATERIALIZED (SELECT t, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
        |g(off) AS (
        |  SELECT CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT off + 1 FROM g WHERE off + 1 <= (SELECT max(h1 - h0) FROM bounds)
        |),
        |grid AS MATERIALIZED (
        |  SELECT b.t, b.h0 + g.off AS hr, g.off AS i, COALESCE(h.n, 0) AS x
        |  FROM bounds b JOIN g ON b.h0 + g.off <= b.h1
        |  LEFT JOIN hourly h ON h.t = b.t AND h.hr = b.h0 + g.off
        |), ew(t, i, hr, x, s_prev, s) AS (
        |  SELECT t, i, hr, x, x * 1000, x * 1000 FROM grid WHERE i = 0
        |  UNION ALL
        |  SELECT g.t, g.i, g.hr, g.x, e.s,
        |    (300 * 1000 * g.x + 700 * e.s) // 1000
        |  FROM ew e JOIN grid g ON g.t = e.t AND g.i = e.i + 1
        |)
        |SELECT t AS event_type, CAST(hr AS BIGINT) AS hr, x AS n,
        |  CAST(s_prev AS BIGINT) AS ewma_prev_milli, CAST(s AS BIGINT) AS ewma_milli,
        |  CAST(CASE WHEN i < 3 THEN 0
        |            WHEN x * 1000 > 2 * s_prev THEN 1
        |            WHEN x * 2000 < s_prev THEN -1 ELSE 0 END AS BIGINT) AS flag
        |FROM ew ORDER BY event_type, hr""".stripMargin,

    // journeys re-derived (ordered initials, first 40 events), pairs via
    // the plain quadratic + exact levenshtein filter — the banding is
    // result-neutral candidate generation
    "events_journey_pairs" ->
      """WITH o AS (
        |  SELECT user_id, substr(event_type, 1, 1) AS c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id < 400
        |), j AS (
        |  SELECT user_id, string_agg(c, '' ORDER BY rn) AS j
        |  FROM o WHERE rn <= 24 GROUP BY 1
        |)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  CAST(levenshtein(a.j, b.j) AS BIGINT) AS dist
        |FROM j a JOIN j b ON a.user_id < b.user_id
        |WHERE levenshtein(a.j, b.j) <= 11
        |ORDER BY user_a, user_b""".stripMargin,

    // month column dropped on the Spark side too; ratio is integer div
    "events_stickiness" ->
      """WITH d AS (
        |  SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS dau
        |  FROM events GROUP BY 1
        |), m AS (
        |  SELECT date_trunc('month', ts) AS month, count(DISTINCT user_id) AS mau
        |  FROM events GROUP BY 1
        |)
        |SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau,
        |  CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_micro
        |FROM d JOIN m ON date_trunc('month', d.day) = m.month
        |ORDER BY day""".stripMargin,

    // three unrolled pi <- pi*P rounds: 1e-6 fixed-point probabilities,
    // order-free integer sums, one truncating // per state per round;
    // no-incoming states kept at 0 via the states left join
    "events_markov_steady" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), pairs AS (
        |  SELECT from_type, to_type, count(*) AS n_ab
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, CAST(sum(n_ab) AS BIGINT) AS n_a FROM pairs GROUP BY 1
        |), p AS (
        |  SELECT pairs.from_type AS f, pairs.to_type AS t2,
        |    CAST(pairs.n_ab * 1000000 // tot.n_a AS BIGINT) AS pm
        |  FROM pairs JOIN tot USING (from_type)
        |), states AS (
        |  SELECT DISTINCT f AS s FROM p UNION SELECT DISTINCT t2 FROM p
        |), kk AS (SELECT CAST(count(*) AS BIGINT) AS c FROM states),
        |pi0 AS (SELECT s, 1000000 // (SELECT c FROM kk) AS v FROM states),
        |m1 AS (
        |  SELECT p.t2 AS s, CAST(sum(pi0.v * p.pm) AS BIGINT) // 1000000 AS v
        |  FROM p JOIN pi0 ON pi0.s = p.f GROUP BY 1
        |),
        |pi1 AS (SELECT states.s, COALESCE(m1.v, 0) AS v FROM states LEFT JOIN m1 USING (s)),
        |m2 AS (
        |  SELECT p.t2 AS s, CAST(sum(pi1.v * p.pm) AS BIGINT) // 1000000 AS v
        |  FROM p JOIN pi1 ON pi1.s = p.f GROUP BY 1
        |),
        |pi2 AS (SELECT states.s, COALESCE(m2.v, 0) AS v FROM states LEFT JOIN m2 USING (s)),
        |m3 AS (
        |  SELECT p.t2 AS s, CAST(sum(pi2.v * p.pm) AS BIGINT) // 1000000 AS v
        |  FROM p JOIN pi2 ON pi2.s = p.f GROUP BY 1
        |),
        |pi3 AS (SELECT states.s, COALESCE(m3.v, 0) AS v FROM states LEFT JOIN m3 USING (s))
        |SELECT s AS state, CAST(v AS BIGINT) AS pi_scaled FROM pi3 ORDER BY state""".stripMargin,

    // funnel latencies: BIGINT µs differences; median via the x2 trick,
    // p90's interpolated double exact on BIGINT inputs (r5 precedent)
    "events_funnel_latency" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_0, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |  GROUP BY 1, 2, 3
        |), lat AS (
        |  SELECT 1 AS stage, 'click' AS stage_name,
        |    epoch_us(ts_1) - epoch_us(ts_0) AS lat_us
        |  FROM s2 WHERE ts_1 IS NOT NULL
        |  UNION ALL
        |  SELECT 2 AS stage, 'purchase' AS stage_name,
        |    epoch_us(ts_2) - epoch_us(ts_1) AS lat_us
        |  FROM s2 WHERE ts_2 IS NOT NULL
        |)
        |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
        |  CAST(count(*) AS BIGINT) AS n_converted,
        |  CAST(quantile_cont(lat_us * 2, 0.5) AS BIGINT) AS median_x2_us,
        |  quantile_cont(lat_us, 0.9) AS p90_us,
        |  CAST(max(lat_us) AS BIGINT) AS max_us
        |FROM lat GROUP BY 1, 2 ORDER BY stage""".stripMargin,

    // seasonal-naive band: err stream BIGINT, doubled-median/MAD trick so
    // every quantile runs on integers; strict > band test on both engines
    "events_forecast_anomaly" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1
        |), e AS (
        |  SELECT a.hour, a.n_events, f.n_events AS forecast,
        |    a.n_events - f.n_events AS err
        |  FROM h a JOIN h f ON a.hour = f.hour + INTERVAL 1 DAY
        |), band AS (
        |  SELECT CAST(quantile_cont(err * 2, 0.5) AS BIGINT) AS median_x2 FROM e
        |), madt AS (
        |  SELECT CAST(quantile_cont(abs(err * 2 - (SELECT median_x2 FROM band)), 0.5) AS BIGINT) AS mad_x2
        |  FROM e
        |)
        |SELECT hour, n_events, forecast, err,
        |  (SELECT median_x2 FROM band) AS median_x2,
        |  (SELECT mad_x2 FROM madt) AS mad_x2,
        |  CAST(CASE
        |    WHEN err * 2 - (SELECT median_x2 FROM band) > 3 * (SELECT mad_x2 FROM madt) THEN 1
        |    WHEN (SELECT median_x2 FROM band) - err * 2 > 3 * (SELECT mad_x2 FROM madt) THEN -1
        |    ELSE 0 END AS BIGINT) AS flag
        |FROM e ORDER BY hour""".stripMargin,

    // cohort-day cast to TIMESTAMP on both sides (the DATE dtype trap);
    // cumulative over distinct ages — tie-free default frame
    "events_cohort_ltv" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
        |), sz AS (
        |  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1
        |), rev AS (
        |  SELECT f.cohort,
        |    CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS BIGINT) AS age_days,
        |    CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM events e JOIN f USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT rev.cohort, age_days, sz.cohort_size, rev_cents,
        |    CAST(sum(rev_cents) OVER (PARTITION BY rev.cohort ORDER BY age_days) AS BIGINT)
        |      AS cum_rev_cents
        |  FROM rev JOIN sz USING (cohort)
        |)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort_day, age_days, cohort_size,
        |  rev_cents, cum_rev_cents,
        |  CAST((cum_rev_cents // cohort_size) * 1000000
        |    + (cum_rev_cents % cohort_size) * 1000000 // cohort_size AS BIGINT) AS ltv_micro
        |FROM c ORDER BY cohort_day, age_days""".stripMargin,

    // 2x2 cells re-derived; chi2 with IDENTICAL left-associated double
    // parenthesization on both engines (+,-,*,/ are IEEE-correctly-rounded)
    "events_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |  FROM events GROUP BY 1
        |), v AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |    THEN 'A' ELSE 'B' END AS variant, converted
        |  FROM pu WHERE exposed = 1
        |), c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM v
        |)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CAST(conv_a * 1000000 // nullif(n_a, 0) AS BIGINT) AS rate_a_micro,
        |  CAST(conv_b * 1000000 // nullif(n_b, 0) AS BIGINT) AS rate_b_micro,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
        |         AND n_a + n_b - conv_a - conv_b > 0 THEN
        |    (CAST(n_a + n_b AS DOUBLE)
        |      * ((CAST(conv_a AS DOUBLE) * CAST(n_b - conv_b AS DOUBLE))
        |        - (CAST(n_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE)))
        |      * ((CAST(conv_a AS DOUBLE) * CAST(n_b - conv_b AS DOUBLE))
        |        - (CAST(n_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE))))
        |    / (((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |        * CAST(conv_a + conv_b AS DOUBLE))
        |      * CAST(n_a + n_b - conv_a - conv_b AS DOUBLE))
        |  END AS chi2
        |FROM c""".stripMargin,

    // risk sets via a DESC cumulative window over distinct durations; the
    // log-survival as cumulative qln sums with null poisoning at S = 0
    "events_survival_km" ->
      """WITH pu AS (
        |  SELECT user_id, min(ts) AS first_ts,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
        |  FROM events GROUP BY 1
        |), dur AS (
        |  SELECT
        |    CASE WHEN conv_ts IS NOT NULL
        |           AND date_diff('day', CAST(first_ts AS DATE), CAST(conv_ts AS DATE)) <= 5
        |      THEN date_diff('day', CAST(first_ts AS DATE), CAST(conv_ts AS DATE))
        |      ELSE 5 END AS t,
        |    CASE WHEN conv_ts IS NOT NULL
        |           AND date_diff('day', CAST(first_ts AS DATE), CAST(conv_ts AS DATE)) <= 5
        |      THEN 1 ELSE 0 END AS converted
        |  FROM pu
        |), agg AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n_at, CAST(sum(converted) AS BIGINT) AS d
        |  FROM dur GROUP BY 1
        |), risk AS (
        |  SELECT t, CAST(sum(n_at) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk, d FROM agg
        |), ev AS (
        |  SELECT t, n_risk, d,
        |    CASE WHEN n_risk > d THEN
        |      CAST(floor(ln(n_risk - d) * 1e6 + 0.5) AS BIGINT)
        |        - CAST(floor(ln(n_risk) * 1e6 + 0.5) AS BIGINT) END AS term
        |  FROM risk WHERE d > 0
        |)
        |SELECT CAST(t AS BIGINT) AS t_days, n_risk, d AS d_events,
        |  CASE WHEN sum(CASE WHEN term IS NULL THEN 1 ELSE 0 END) OVER (ORDER BY t) > 0
        |       THEN NULL
        |       ELSE CAST(sum(term) OVER (ORDER BY t) AS BIGINT) END AS km_log_scaled
        |FROM ev ORDER BY t_days""".stripMargin,

    // RFM: all three metrics BIGINT, tertile thresholds via quantile_cont
    // (bit-parity with Spark percentile on BIGINT), strict > assignment
    "events_rfm" ->
      """WITH pu AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
        |  FROM events GROUP BY 1
        |), anch AS (SELECT max(epoch_us(ts)) AS a FROM events),
        |pd AS (
        |  SELECT user_id, ((SELECT a FROM anch) - last_us) // 86400000000 AS recency_days,
        |    frequency, monetary_cents
        |  FROM pu
        |), t AS (
        |  SELECT
        |    quantile_cont(recency_days, 0.3333333333333333) AS r1,
        |    quantile_cont(recency_days, 0.6666666666666666) AS r2,
        |    quantile_cont(frequency, 0.3333333333333333) AS f1,
        |    quantile_cont(frequency, 0.6666666666666666) AS f2,
        |    quantile_cont(monetary_cents, 0.3333333333333333) AS m1,
        |    quantile_cont(monetary_cents, 0.6666666666666666) AS m2
        |  FROM pd
        |), scored AS (
        |  SELECT user_id, recency_days, frequency, monetary_cents,
        |    4 - (1 + CASE WHEN recency_days > (SELECT r1 FROM t) THEN 1 ELSE 0 END
        |           + CASE WHEN recency_days > (SELECT r2 FROM t) THEN 1 ELSE 0 END) AS r_score,
        |    1 + CASE WHEN frequency > (SELECT f1 FROM t) THEN 1 ELSE 0 END
        |      + CASE WHEN frequency > (SELECT f2 FROM t) THEN 1 ELSE 0 END AS f_score,
        |    1 + CASE WHEN monetary_cents > (SELECT m1 FROM t) THEN 1 ELSE 0 END
        |      + CASE WHEN monetary_cents > (SELECT m2 FROM t) THEN 1 ELSE 0 END AS m_score
        |  FROM pd
        |)
        |SELECT user_id, recency_days, frequency, monetary_cents,
        |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment
        |FROM scored ORDER BY user_id""".stripMargin,


    "events_value_mad" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents FROM events
        |), med AS (
        |  SELECT event_type, CAST(quantile_cont(cents * 2, 0.5) AS BIGINT) AS median_x2
        |  FROM e GROUP BY 1
        |)
        |SELECT e.event_type, med.median_x2,
        |  quantile_cont(abs(e.cents * 2 - med.median_x2), 0.5) AS mad_x2
        |FROM e JOIN med USING (event_type) GROUP BY 1, 2 ORDER BY 1""".stripMargin,


    "events_value_outliers" ->
      """WITH b AS (
        |  SELECT event_id AS id, event_type AS g,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS xc FROM events
        |), m AS (
        |  SELECT g, count(*) AS n, CAST(sum(xc) AS BIGINT) // count(*) AS mean_c
        |  FROM b GROUP BY 1
        |), d AS (
        |  SELECT b.id, b.g, b.xc, b.xc - m.mean_c AS dev_c,
        |    (b.xc - m.mean_c) * (b.xc - m.mean_c) // 10000 AS dev_d2
        |  FROM b JOIN m USING (g)
        |), v AS (
        |  SELECT g, CAST(sum(dev_d2) AS BIGINT) // count(*) AS var_d2 FROM d GROUP BY 1
        |)
        |SELECT d.id AS event_id, d.g AS event_type, d.xc AS value_c, d.dev_c,
        |  CAST(CASE WHEN d.dev_d2 > 9 * v.var_d2 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM d JOIN v USING (g) ORDER BY event_id""".stripMargin,


    "funnel_stages" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_0, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |  GROUP BY 1, 2, 3
        |)
        |SELECT u AS user_id, ts_0 AS ts_view, ts_1 AS ts_click, ts_2 AS ts_purchase,
        |  CAST(1 + CASE WHEN ts_1 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN ts_2 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage_reached
        |FROM s2 ORDER BY user_id""".stripMargin,


    "funnel_stages_windowed" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |    AND e.ts <= s0.ts_0 + INTERVAL 24 HOURS
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_0, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |    AND e.ts <= s1.ts_1 + INTERVAL 24 HOURS
        |  GROUP BY 1, 2, 3
        |)
        |SELECT u AS user_id, ts_0 AS ts_view, ts_1 AS ts_click, ts_2 AS ts_purchase,
        |  CAST(1 + CASE WHEN ts_1 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN ts_2 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage_reached
        |FROM s2 ORDER BY user_id""".stripMargin,


    "funnel_summary" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |  CAST(count(*) AS BIGINT) AS n_users FROM s2
        |UNION ALL SELECT 2, 'click', CAST(count(ts_1) AS BIGINT) FROM s2
        |UNION ALL SELECT 3, 'purchase', CAST(count(ts_2) AS BIGINT) FROM s2
        |ORDER BY stage""".stripMargin,


    // the decay weight table is generated from the SAME Scala constants the
    // Spark plan embeds — the curve is data, not computation, in both engines
    "events_decayed_value" ->
      s"""WITH w AS (
         |  SELECT [${graft.operators.Behavior.decayWeights(7.0,
              graft.operators.Behavior.defaultMaxAge(7.0)).mkString(", ")}] AS wts
         |), ref AS (
         |  SELECT max(CAST(ts AS DATE)) AS ref_day FROM events
         |)
         |SELECT e.user_id,
         |  CAST(sum(CAST(floor(e.value*100 + 0.5) AS BIGINT)
         |    * w.wts[least(ref.ref_day - CAST(e.ts AS DATE),
         |        ${graft.operators.Behavior.defaultMaxAge(7.0)}) + 1]) AS BIGINT) AS score_scaled,
         |  CAST(CAST(sum(CAST(floor(e.value*100 + 0.5) AS BIGINT)
         |    * w.wts[least(ref.ref_day - CAST(e.ts AS DATE),
         |        ${graft.operators.Behavior.defaultMaxAge(7.0)}) + 1]) AS BIGINT) AS DOUBLE)
         |    / 1e9 / 100.0 AS score
         |FROM events e, ref, w
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    "events_top_paths" ->
      """WITH seq3 AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3
        |  FROM events
        |)
        |SELECT step1, step2, step3, count(*) AS n_paths
        |FROM seq3 WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""".stripMargin,


    "events_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), pairs AS (
        |  SELECT from_type, to_type, count(*) AS n_ab
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, CAST(sum(n_ab) AS BIGINT) AS n_a FROM pairs GROUP BY 1
        |)
        |SELECT p.from_type, p.to_type, p.n_ab, t.n_a,
        |  CAST(p.n_ab AS DOUBLE) / t.n_a AS p
        |FROM pairs p JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,


    "cohort_retention" ->
      """WITH c AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
        |)
        |SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
        |  CAST(a.act_day - c.cohort_day AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM c JOIN a USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "events_rolling_7d" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day, n_events, value_cents,
        |  CAST(sum(n_events) OVER w AS BIGINT) AS n_events_window,
        |  CAST(sum(value_cents) OVER w AS BIGINT) AS value_cents_window
        |FROM daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY day - DATE '1970-01-01'
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,


    "basket_part_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |n AS (SELECT count(DISTINCT b) AS n FROM bi),
        |ic AS (SELECT i, count(*) AS n_i FROM bi GROUP BY 1),
        |p AS (
        |  SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        |  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT p.item_a, p.item_b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
        |  CAST((SELECT n FROM n) AS DOUBLE) * p.n_ab / ia.n_i / ib.n_i AS lift
        |FROM p JOIN ic ia ON ia.i = p.item_a JOIN ic ib ON ib.i = p.item_b
        |ORDER BY lift DESC, item_a, item_b LIMIT 100""".stripMargin,


    "events_hourly_spikes" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), win AS (
        |  SELECT hour, event_type, n,
        |    count(*) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS m,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s,
        |    sum(n * n) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS q
        |  FROM hourly
        |)
        |SELECT hour, event_type, n, CAST(COALESCE(m, 0) AS BIGINT) AS m,
        |  CAST(CASE WHEN m >= 6 AND (m*n - s) * (m*n - s) > 9 * (m*q - s*s)
        |            THEN CASE WHEN m*n - s > 0 THEN 1 WHEN m*n - s < 0 THEN -1 ELSE 0 END
        |            ELSE 0 END AS BIGINT) AS spike
        |FROM win ORDER BY hour, event_type""".stripMargin,


    "drift_embedding_shift" ->
      """WITH b AS (
        |  SELECT [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), c AS (
        |  SELECT [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings WHERE vec_id % 3 != 0
        |), bm AS (
        |  SELECT d.range AS d, CAST(sum(qv[d.range + 1]) AS BIGINT) // count(*) AS m1
        |  FROM b CROSS JOIN range(0, 64) d GROUP BY 1
        |), cm AS (
        |  SELECT d.range AS d, CAST(sum(qv[d.range + 1]) AS BIGINT) // count(*) AS m2
        |  FROM c CROSS JOIN range(0, 64) d GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_dims,
        |  CAST(sum((m1 - m2) * (m1 - m2)) AS BIGINT) AS shift_sq_scaled,
        |  sqrt(CAST(CAST(sum((m1 - m2) * (m1 - m2)) AS BIGINT) AS DOUBLE)) / 1000000.0 AS shift_l2
        |FROM bm JOIN cm USING (d)""".stripMargin,


    // aucExact over base(y=0) ∪ re-curated(y=1) on n_chars — same
    // distinct-score machinery as eval_auc, drift populations from drift_ks
    "drift_auc" ->
      """WITH u AS (
        |  SELECT n_chars AS s, 0 AS y FROM documents
        |  UNION ALL
        |  SELECT n_chars AS s, 1 AS y FROM documents
        |  WHERE n_chars >= 150 OR doc_id % 3 = 0
        |), g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS np,
        |    CAST(count(*) - sum(y) AS BIGINT) AS nn
        |  FROM u GROUP BY 1
        |), c AS (
        |  SELECT np, nn,
        |    COALESCE(sum(nn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM g
        |), agg AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
        |    CAST(sum(np * (2 * cumneg + nn)) AS BIGINT) AS conc2
        |  FROM c
        |)
        |SELECT n_pos, n_neg, conc2,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST((conc2 // (2 * n_pos * n_neg)) * 1000000
        |            + ((conc2 % (2 * n_pos * n_neg)) * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
        |  END AS auc_micro
        |FROM agg""".stripMargin,


    // AUC = (2·concordant + ties) / (2·n_pos·n_neg) over the distinct-score
    // relation; cumneg = negatives strictly below via the 1-PRECEDING frame;
    // auc_micro through the exact nonneg decomposition (r11 pattern)
    "eval_auc" ->
      """WITH g AS (
        |  SELECT value AS s,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(count(*) - sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nn
        |  FROM events GROUP BY 1
        |), c AS (
        |  SELECT np, nn,
        |    COALESCE(sum(nn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM g
        |), agg AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
        |    CAST(sum(np * (2 * cumneg + nn)) AS BIGINT) AS conc2
        |  FROM c
        |)
        |SELECT n_pos, n_neg, conc2,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST((conc2 // (2 * n_pos * n_neg)) * 1000000
        |            + ((conc2 % (2 * n_pos * n_neg)) * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
        |  END AS auc_micro
        |FROM agg""".stripMargin,


    "drift_ks" ->
      """WITH b AS (SELECT n_chars AS v FROM documents),
        |c AS (SELECT n_chars AS v FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0),
        |u AS (
        |  SELECT v, CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(c2) AS BIGINT) AS c2 FROM (
        |    SELECT v, 1 AS c1, 0 AS c2 FROM b
        |    UNION ALL SELECT v, 0 AS c1, 1 AS c2 FROM c
        |  ) q GROUP BY 1
        |), cum AS (
        |  SELECT v,
        |    sum(c1) OVER (ORDER BY v) AS cum1,
        |    sum(c2) OVER (ORDER BY v) AS cum2,
        |    sum(c1) OVER () AS n1,
        |    sum(c2) OVER () AS n2
        |  FROM u
        |)
        |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
        |  CAST(max(abs(n2*cum1 - n1*cum2)) AS BIGINT) AS d_num,
        |  CAST(max(abs(n2*cum1 - n1*cum2)) AS DOUBLE)
        |    / CAST(max(n1) * max(n2) AS DOUBLE) AS ks_d
        |FROM cum""".stripMargin,


    "events_cusum" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type AS t, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), bounds AS MATERIALIZED (SELECT t, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
        |g(off) AS (
        |  SELECT CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT off + 1 FROM g WHERE off + 1 <= (SELECT max(h1 - h0) FROM bounds)
        |),
        |grid AS MATERIALIZED (
        |  SELECT b.t, b.h0 + g.off AS hr, g.off AS i, COALESCE(h.n, 0) AS x
        |  FROM bounds b JOIN g ON b.h0 + g.off <= b.h1
        |  LEFT JOIN hourly h ON h.t = b.t AND h.hr = b.h0 + g.off
        |), mu AS MATERIALIZED (
        |  SELECT t, CAST(sum(x) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT) AS mu_m
        |  FROM grid GROUP BY 1
        |), cs(t, i, hr, x, sp, sm) AS (
        |  SELECT g.t, g.i, g.hr, g.x,
        |    greatest(0, g.x * 1000 - m.mu_m - m.mu_m // 4),
        |    greatest(0, m.mu_m - m.mu_m // 4 - g.x * 1000)
        |  FROM grid g JOIN mu m ON m.t = g.t WHERE g.i = 0
        |  UNION ALL
        |  SELECT g.t, g.i, g.hr, g.x,
        |    greatest(0, c.sp + g.x * 1000 - m.mu_m - m.mu_m // 4),
        |    greatest(0, c.sm + m.mu_m - m.mu_m // 4 - g.x * 1000)
        |  FROM cs c JOIN grid g ON g.t = c.t AND g.i = c.i + 1
        |  JOIN mu m ON m.t = g.t
        |)
        |SELECT c.t AS event_type, CAST(c.hr AS BIGINT) AS hr, c.x AS n,
        |  CAST(c.sp AS BIGINT) AS s_plus_milli, CAST(c.sm AS BIGINT) AS s_minus_milli,
        |  CAST(CASE WHEN c.sp > 4 * m.mu_m THEN 1
        |            WHEN c.sm > 4 * m.mu_m THEN -1 ELSE 0 END AS BIGINT) AS flag
        |FROM cs c JOIN mu m ON m.t = c.t
        |ORDER BY event_type, hr""".stripMargin,


    "events_bursts" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type AS t, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), bounds AS MATERIALIZED (SELECT t, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
        |g(off) AS (
        |  SELECT CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT off + 1 FROM g WHERE off + 1 <= (SELECT max(h1 - h0) FROM bounds)
        |),
        |grid AS MATERIALIZED (
        |  SELECT b.t, b.h0 + g.off AS hr, g.off AS i, COALESCE(h.n, 0) AS x
        |  FROM bounds b JOIN g ON b.h0 + g.off <= b.h1
        |  LEFT JOIN hourly h ON h.t = b.t AND h.hr = b.h0 + g.off
        |), w AS MATERIALIZED (
        |  SELECT t, lam0, 3 * lam0 AS lam1,
        |    CAST(floor(ln(lam0) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(1000) * 1e6 + 0.5) AS BIGINT) AS w0,
        |    CAST(floor(ln(3 * lam0) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(1000) * 1e6 + 0.5) AS BIGINT) AS w1
        |  FROM (SELECT t, greatest(1, CAST(sum(x) AS BIGINT) * 1000
        |          // CAST(count(*) AS BIGINT)) AS lam0 FROM grid GROUP BY 1)
        |), dp(t, i, hr, x, v0, v1, f0, f1) AS (
        |  SELECT g.t, g.i, g.hr, g.x,
        |    w.lam0 * 1000 - g.x * w.w0,
        |    3000000 + w.lam1 * 1000 - g.x * w.w1,
        |    0, 0
        |  FROM grid g JOIN w ON w.t = g.t WHERE g.i = 0
        |  UNION ALL
        |  SELECT g.t, g.i, g.hr, g.x,
        |    least(d.v0, d.v1) + w.lam0 * 1000 - g.x * w.w0,
        |    least(d.v0 + 3000000, d.v1) + w.lam1 * 1000 - g.x * w.w1,
        |    CASE WHEN d.v0 <= d.v1 THEN 0 ELSE 1 END,
        |    CASE WHEN d.v0 + 3000000 <= d.v1 THEN 0 ELSE 1 END
        |  FROM dp d JOIN grid g ON g.t = d.t AND g.i = d.i + 1
        |  JOIN w ON w.t = g.t
        |), last AS (SELECT t, max(i) AS imax FROM dp GROUP BY 1),
        |bt(t, i, state) AS (
        |  SELECT d.t, d.i, CASE WHEN d.v0 <= d.v1 THEN 0 ELSE 1 END
        |  FROM dp d JOIN last l ON l.t = d.t AND l.imax = d.i
        |  UNION ALL
        |  SELECT b.t, b.i - 1, CASE WHEN b.state = 0 THEN d.f0 ELSE d.f1 END
        |  FROM bt b JOIN dp d ON d.t = b.t AND d.i = b.i
        |  WHERE b.i >= 1
        |)
        |SELECT d.t AS event_type, CAST(d.hr AS BIGINT) AS hr, d.x AS n,
        |  CAST(b.state AS BIGINT) AS state
        |FROM dp d JOIN bt b ON b.t = d.t AND b.i = d.i
        |ORDER BY event_type, hr""".stripMargin,


    "drift_wasserstein" ->
      """WITH b AS (SELECT n_chars AS v FROM documents),
        |c AS (SELECT n_chars AS v FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0),
        |u AS (
        |  SELECT v, CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(c2) AS BIGINT) AS c2 FROM (
        |    SELECT v, 1 AS c1, 0 AS c2 FROM b
        |    UNION ALL SELECT v, 0 AS c1, 1 AS c2 FROM c
        |  ) q GROUP BY 1
        |), cum AS (
        |  SELECT v,
        |    sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
        |    sum(c1) OVER () AS n1,
        |    sum(c2) OVER () AS n2,
        |    COALESCE(lead(v) OVER (ORDER BY v) - v, 0) AS gap
        |  FROM u
        |)
        |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
        |  CAST(sum(abs(n2*cum1 - n1*cum2) * gap) AS BIGINT) AS w1_num,
        |  CAST(sum(abs(n2*cum1 - n1*cum2) * gap) AS DOUBLE)
        |    / CAST(max(n1) * max(n2) AS DOUBLE) AS w1
        |FROM cum""".stripMargin,


    "drift_cramers_v" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |b AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_base
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1
        |), j AS (
        |  SELECT bks.bucket, coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM bks LEFT JOIN b USING (bucket) LEFT JOIN c USING (bucket)
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_cur) AS BIGINT) AS tc FROM j
        |), terms AS (
        |  SELECT tb, tc,
        |    CAST(floor(
        |      (CAST(n_base AS DOUBLE) * CAST(tc AS DOUBLE) - CAST(n_cur AS DOUBLE) * CAST(tb AS DOUBLE))
        |      * (CAST(n_base AS DOUBLE) * CAST(tc AS DOUBLE) - CAST(n_cur AS DOUBLE) * CAST(tb AS DOUBLE))
        |      / (CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE) * CAST(n_base + n_cur AS DOUBLE))
        |      * 1e6 + 0.5) AS BIGINT) AS qterm
        |  FROM j, tot WHERE n_base + n_cur > 0 AND tb > 0 AND tc > 0
        |)
        |SELECT tb AS n_base, tc AS n_cur,
        |  CAST(sum(qterm) AS BIGINT) AS chi2_scaled,
        |  sqrt(CAST(CAST(sum(qterm) AS BIGINT) AS DOUBLE) / 1e6
        |    / CAST(tb + tc AS DOUBLE)) AS cramers_v
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "drift_chi2" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |b AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_base
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1
        |), j AS (
        |  SELECT bks.bucket, coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM bks LEFT JOIN b USING (bucket) LEFT JOIN c USING (bucket)
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_cur) AS BIGINT) AS tc FROM j
        |), terms AS (
        |  SELECT tb, tc,
        |    CAST(floor(
        |      (CAST(n_base AS DOUBLE) * CAST(tc AS DOUBLE) - CAST(n_cur AS DOUBLE) * CAST(tb AS DOUBLE))
        |      * (CAST(n_base AS DOUBLE) * CAST(tc AS DOUBLE) - CAST(n_cur AS DOUBLE) * CAST(tb AS DOUBLE))
        |      / (CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE) * CAST(n_base + n_cur AS DOUBLE))
        |      * 1e6 + 0.5) AS BIGINT) AS qterm
        |  FROM j, tot WHERE n_base + n_cur > 0 AND tb > 0 AND tc > 0
        |)
        |SELECT tb AS n_base, tc AS n_cur, count(*) - 1 AS dof,
        |  CAST(sum(qterm) AS BIGINT) AS chi2_scaled,
        |  CAST(CAST(sum(qterm) AS BIGINT) AS DOUBLE) / 1e6 AS chi2
        |FROM terms GROUP BY 1, 2""".stripMargin,

    // DuckDB isodow == the Spark dayofweek remap by construction
    "events_weekly_profile" ->
      """WITH c AS (
        |  SELECT isodow(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT CAST(dow AS BIGINT) AS dow, hour, n,
        |  CAST(n * 1000 // (SELECT total FROM t) AS BIGINT) AS share_permille,
        |  CAST(CASE WHEN n * 168 >= 2 * (SELECT total FROM t) THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_peak
        |FROM c ORDER BY dow, hour""".stripMargin,

    // hop-window assignment re-derived in integer minutes; earliest-peak
    // tiebreak via (n DESC, wstart ASC)
    "events_velocity" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 60000000 AS em FROM events
        |), hops AS (
        |  SELECT user_id, (em // 15 - j.range) * 15 AS wstart
        |  FROM e CROSS JOIN range(0, 4) j
        |  WHERE em < (em // 15 - j.range) * 15 + 60
        |    AND em >= (em // 15 - j.range) * 15
        |), w AS (
        |  SELECT user_id, wstart, CAST(count(*) AS BIGINT) AS n FROM hops GROUP BY 1, 2
        |), p AS (
        |  SELECT user_id, wstart, n,
        |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, wstart ASC) AS rk
        |  FROM w
        |)
        |SELECT user_id, CAST(wstart AS BIGINT) AS peak_window_start_min, n AS peak_n
        |FROM p WHERE rk = 1 ORDER BY user_id""".stripMargin,

    // char-entropy pattern lifted to event types: per-term qln, one
    // truncating division into micro-nats
    "events_user_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_c
        |  FROM events GROUP BY 1, 2
        |), a AS (
        |  SELECT user_id, CAST(sum(n_c) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(n_c * CAST(floor(ln(n_c) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM c GROUP BY 1
        |)
        |SELECT user_id, n_events, n_types,
        |  CAST((n_events * CAST(floor(ln(n_events) * 1e6 + 0.5) AS BIGINT) - s)
        |    // n_events AS BIGINT) AS entropy_micro
        |FROM a ORDER BY user_id""".stripMargin,

    // same clamped bucket frame as drift_psi; per-bucket integer
    // a*(qln(2aB) - qln(aB + bA)) terms, three truncating divisions
    "drift_js" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |b AS (
        |  SELECT greatest(least(n_chars // 50, 11), 0) AS bucket, count(*) AS n
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT greatest(least(n_chars // 50, 11), 0) AS bucket, count(*) AS n
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1
        |), f AS (
        |  SELECT bks.bucket,
        |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
        |  FROM bks LEFT JOIN b ON b.bucket = bks.bucket
        |  LEFT JOIN c ON c.bucket = bks.bucket
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS ta, CAST(sum(n_cur) AS BIGINT) AS tb FROM f
        |), terms AS (
        |  SELECT (SELECT ta FROM tot) AS ta, (SELECT tb FROM tot) AS tb,
        |    CASE WHEN n_base > 0 THEN n_base *
        |      (CAST(floor(ln(n_base * (SELECT tb FROM tot) * 2) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(n_base * (SELECT tb FROM tot) + n_cur * (SELECT ta FROM tot)) * 1e6 + 0.5) AS BIGINT))
        |      ELSE 0 END AS term_a,
        |    CASE WHEN n_cur > 0 THEN n_cur *
        |      (CAST(floor(ln(n_cur * (SELECT ta FROM tot) * 2) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(n_base * (SELECT tb FROM tot) + n_cur * (SELECT ta FROM tot)) * 1e6 + 0.5) AS BIGINT))
        |      ELSE 0 END AS term_b
        |  FROM f
        |)
        |SELECT ta AS n_base, tb AS n_cur,
        |  CAST((sum(term_a) // ta + sum(term_b) // tb) // 2 AS BIGINT) AS jsd_micro
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "drift_psi" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |b AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_base
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1
        |), j AS (
        |  SELECT bks.bucket, coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM bks LEFT JOIN b USING (bucket) LEFT JOIN c USING (bucket)
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_cur) AS BIGINT) AS tc FROM j
        |), terms AS (
        |  SELECT tb, tc,
        |    CAST(floor(ln(CAST(n_base + 1 AS DOUBLE) * CAST(tc + 12 AS DOUBLE)
        |      / (CAST(n_cur + 1 AS DOUBLE) * CAST(tb + 12 AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS qln,
        |    CAST(floor((CAST(n_base + 1 AS DOUBLE) / CAST(tb + 12 AS DOUBLE)
        |      - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 12 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS qpq
        |  FROM j, tot
        |)
        |SELECT tb AS n_base, tc AS n_cur,
        |  CAST(sum(qpq * qln) AS BIGINT) AS psi_scaled,
        |  CAST(CAST(sum(qpq * qln) AS BIGINT) AS DOUBLE) / 1e15 AS psi
        |FROM terms GROUP BY 1, 2""".stripMargin,


    "drift_psi_by_lang" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |gs AS (
        |  SELECT DISTINCT lang FROM documents
        |  UNION
        |  SELECT DISTINCT lang FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0
        |),
        |frame AS (SELECT gs.lang, bks.bucket FROM gs CROSS JOIN bks),
        |b AS (
        |  SELECT lang, greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_base
        |  FROM documents GROUP BY 1, 2
        |), c AS (
        |  SELECT lang, greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1, 2
        |), j AS (
        |  SELECT frame.lang, frame.bucket,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM frame LEFT JOIN b USING (lang, bucket) LEFT JOIN c USING (lang, bucket)
        |), tot AS (
        |  SELECT lang, CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_cur) AS BIGINT) AS tc FROM j GROUP BY 1
        |), terms AS (
        |  SELECT j.lang, tot.tb, tot.tc,
        |    CAST(floor(ln(CAST(n_base + 1 AS DOUBLE) * CAST(tc + 12 AS DOUBLE)
        |      / (CAST(n_cur + 1 AS DOUBLE) * CAST(tb + 12 AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS qln,
        |    CAST(floor((CAST(n_base + 1 AS DOUBLE) / CAST(tb + 12 AS DOUBLE)
        |      - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 12 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS qpq
        |  FROM j JOIN tot USING (lang)
        |)
        |SELECT lang, tb AS n_base, tc AS n_cur,
        |  CAST(sum(qpq * qln) AS BIGINT) AS psi_scaled,
        |  CAST(CAST(sum(qpq * qln) AS BIGINT) AS DOUBLE) / 1e15 AS psi
        |FROM terms GROUP BY 1, 2, 3 ORDER BY lang""".stripMargin)
}
