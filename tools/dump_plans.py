"""Dump formatted physical plans of the headline queries to
BENCH/PLANS.md — the human-readable companion to tests/test_plans.py's
assertions (pushdown, partial+final agg, single exchanges, broadcast,
codegen). Regenerate after plan-affecting changes:

    python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from tits_spark.session import get_spark

    spark = get_spark("dump-plans", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[tuple[str, str, str]] = []

    def add(name: str, note: str, df) -> None:
        sections.append((name, note, plan_of(df)))

    add(
        "rollup_1m (q_rollup_1m)",
        "ONE exchange; partial+final HashAggregate (partial_min_by etc. "
        "= map-side combine for every kept aggregate); scan reads only "
        "the 3 needed columns.",
        E.q_rollup_1m(spark, SF),
    )
    add(
        "acf_band (declarative kernel ACF)",
        "The theta range-join is rewritten as a bucketed EQUI-join + "
        "filter: no BroadcastNestedLoopJoin / CartesianProduct anywhere.",
        E.q_acf_band(spark, SF),
    )
    add(
        "gorilla compress_partitions",
        "One repartition-by-key exchange, then MapInPandas (batched "
        "cross-group encoder); no further shuffle.",
        __import__("tits_spark.compression.gorilla", fromlist=["compress_partitions"]).compress_partitions(
            spark.read.parquet(f"{SF}/events.parquet").select(
                F.col("user_id").alias("key"), "ts", "value"
            )
        ),
    )
    add(
        "media_features (binary multimodal path)",
        "Map-only: scan -> project -> MapInPandas -> explode. Zero "
        "exchanges.",
        E.q_media_features(spark, SF),
    )
    add(
        "d32_roundtrip (quantum decimal parse->print)",
        "Pure column algebra inside WholeStageCodegen ('*' nodes); no "
        "Python eval, no exchange.",
        E.q_d32_roundtrip(spark, SF),
    )
    add(
        "cosine_topk (brute-force ANN baseline)",
        "Query side broadcast; JVM-side higher-order-function dot "
        "product (no Python in the hot path).",
        E.q_cosine_topk(spark, SF),
    )
    add(
        "tpch_q5 (star join)",
        "All dimension joins are BroadcastHashJoin (no SortMergeJoin, "
        "the fact side never shuffles for a join); the single shuffle "
        "exchange is the final group-by.",
        E.q_tpch_q5(spark, SF),
    )
    add(
        "pack_chunks (two-phase distributed prefix sum)",
        "The per-row running-total window is partitioned BY BUCKET "
        "(parallel); the only global window runs on the n_buckets-row "
        "aggregate, and the bucket offsets come back via "
        "BroadcastHashJoin — no single-partition pass over the table.",
        E.q_pack_chunks(spark, SF),
    )
    add(
        "stratified_sample (deterministic per-stratum top-k)",
        "One window exchange keyed by the stratum; the sample predicate "
        "is pure column arithmetic inside codegen (no sampler state, "
        "partition-layout-invariant).",
        E.q_stratified_sample(spark, SF),
    )
    # one min-label propagation round of dedup_clusters, built exactly
    # as the loop body in operators/dedup.py builds it (the real loop
    # localCheckpoints between rounds, which would hide the round plan
    # behind ExistingRDD scans)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    one_round = (
        labels.unionByName(
            edges.join(labels.withColumnRenamed("node", "src"), "src").select(
                F.col("dst").alias("node"), "label"
            )
        )
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    add(
        "dedup_clusters (one min-label propagation round)",
        "Per-round plan of the connected-components loop: shuffle hash "
        "equi-join edges-to-labels + one partial+final min aggregate; "
        "localCheckpoint between rounds keeps the executed plan "
        "constant-size across iterations.",
        one_round,
    )
    add(
        "twa (LOCF time-weighted mean per bucket)",
        "ONE exchange total (the per-key lead window); the bucket split "
        "is a generator explode inside codegen and the final partial+"
        "final HashAggregate reuses no extra shuffle beyond the group-by.",
        E.q_twa(spark, SF),
    )
    add(
        "counter_rate (reset-aware PromQL increase)",
        "Same single-window shape as twa: one exchange for the per-key "
        "lag, then partial+final aggregation onto buckets.",
        E.q_counter_rate(spark, SF),
    )
    add(
        "pii_scrub (chained regex redaction)",
        "Map-only: zero exchanges, the whole pattern chain is one "
        "codegen'd projection over the scan.",
        E.q_pii_scrub(spark, SF),
    )
    add(
        "unigram_logprob (single-pass corpus LM scoring)",
        "The corpus text is tokenized/exploded ONCE; per-doc (token, k) "
        "partial-aggregates map-side before the first shuffle; the "
        "vocab-sized count table joins back by token and the 1-row "
        "total arrives via broadcast.",
        E.q_unigram_logprob(spark, SF),
    )
    add(
        "substr_dedup (ExactSubstr span removal)",
        "No window on the hot gram key: canonical election is a "
        "partial+final min-over-struct HashAggregate; the only windows "
        "run per-DOC (island merge), and the candidate join is a hash "
        "equi-join on gram. No cartesian anywhere.",
        E.q_substr_dedup(spark, SF),
    )
    add(
        "funnel (ordered 3-step progression)",
        "Each stage shuffles only its own pre-filtered event type "
        "(partial min map-side), chained by user-keyed equi-joins.",
        E.q_funnel(spark, SF),
    )

    add(
        "matrix_profile (blocked-GEMM subsequence search)",
        "Numbered repartition feeds FlatMapGroupsInPandas with NO "
        "second exchange (the hash distribution satisfies the grouped "
        "UDF); the explicit partition count is exempt from AQE's "
        "byte-based coalescing, which would otherwise serialize the "
        "CPU-bound stage onto one task.",
        E.q_matrix_profile(spark, SF),
    )
    add(
        "dtw (SAX-bucketed DTW similarity)",
        "Candidate pairs come from a hash EQUI-join on the SAX prefix "
        "(never a cartesian); the unbanded DP runs vectorized across "
        "pairs in MapInPandas.",
        E.q_dtw(spark, SF),
    )
    add(
        "bucket_quantiles (histogram tier cascade)",
        "Raw is scanned once into 1m histograms (partial+final count), "
        "the 1h merge aggregates the histogram only, and both quantile "
        "windows partition by bucket — no SinglePartition window.",
        E.q_bucket_quantiles(spark, SF),
    )
    add(
        "active_users (HLL register cascade)",
        "Register build: one exchange with partial_max map-side "
        "combine; the 1m->1h merge and the estimate aggregate the "
        "<= buckets x 256-row register table, never the items.",
        E.q_active_users(spark, SF),
    )
    add(
        "trend (Mann-Kendall / Theil-Sen grouped kernel)",
        "Same numbered-repartition + FlatMapGroupsInPandas shape as "
        "matrix_profile; quadratic work stays inside the per-key "
        "kernel, parallel across keys.",
        E.q_trend(spark, SF),
    )
    add(
        "gaps + uptime (silence intervals)",
        "One lag window keyed by the series; the uptime summary is a "
        "partial+final HashAggregate over the same exchange.",
        E.q_uptime(spark, SF),
    )
    add(
        "point_in_interval (keyed bucketized range join)",
        "The BETWEEN range join rewritten as explode-to-buckets + "
        "EQUI-join on (bucket, entity key): no CartesianProduct / "
        "BroadcastNestedLoopJoin; folding the entity key into the join "
        "key keeps same-hour strangers from colliding.",
        E.q_point_in_interval(spark, SF),
    )
    add(
        "pettitt (rank changepoint)",
        "Four windows (value-rank, tie-count, time-cumsum, argmax "
        "pick) all cluster on the series key -> ONE exchange total; "
        "exact integer midrank arithmetic end to end.",
        E.q_pettitt(spark, SF),
    )
    add(
        "realized_vol (log-return continuous aggregate)",
        "lag window + 1m partial+final agg + 1h cascade merge: three "
        "exchanges, each carrying less data than the last; every tier "
        "column is a sum/min/max so the cascade is exact.",
        E.q_realized_vol(spark, SF),
    )
    add(
        "data_profile_approx (sketch-mode profile)",
        "String columns skip the exact-distinct expand entirely: a "
        "column-pruned second scan stacks (col, value) map-side, the "
        "HLL register aggregate bounds the exchange at n_cols x 4096 "
        "rows, and the estimates broadcast-join back. No full-value "
        "shuffle at any input size.",
        E.q_data_profile_approx(spark, SF),
    )
    add(
        "moments (4th-order integer-moment aggregate)",
        "ONE partial+final hash aggregate: five decimal(38,0) power "
        "sums per key; skew/kurt/JB are scalar expressions over the "
        "aggregate output — no second pass, no window.",
        E.q_moments(spark, SF),
    )
    add(
        "cube_rollup (grouping sets)",
        "Spark cube(): one Expand (4 grouping sets) into one "
        "partial+final aggregate — a single exchange for all subtotal "
        "levels.",
        E.q_cube_rollup(spark, SF),
    )
    add(
        "vwap (bucket aggregate + cumulative window)",
        "The bucket aggregate and the running-VWAP window cluster on "
        "the same group key: agg exchange + window exchange, the "
        "window running over the bucket table (bounded by buckets, "
        "not rows).",
        E.q_vwap(spark, SF),
    )
    add(
        "bloom (register build + broadcast probe)",
        "Register build: one map-side-combined bit_or exchange bounded "
        "at groups x m/32 rows; the probe broadcasts the register "
        "table — shuffle-free on the sketch side.",
        E.q_bloom(spark, SF),
    )
    add(
        "ols_trend (integer-moment least squares)",
        "Tiny min-timestamp aggregate broadcast back for the per-key "
        "time rebase, then ONE partial+final moment aggregate; the fit "
        "is scalar arithmetic on the aggregate row.",
        E.q_ols_trend(spark, SF),
    )
    add(
        "stochastic (bar-window indicator stack)",
        "Hourly tier aggregate + per-key ordered windows (extrema "
        "copies, short %D average, cumulative OBV) — tier exchange + "
        "one window exchange, everything else is column algebra.",
        E.q_stochastic(spark, SF),
    )
    add(
        "atr_rsi (bar indicators off the OHLC tier)",
        "Tier agg exchange + one per-key window exchange; indicators "
        "never read raw (open/high/low/close are tier columns).",
        E.q_atr_rsi(spark, SF),
    )
    add(
        "cross_rank (per-bucket cross-section)",
        "groupBy (key, bucket) then a window partitioned by bucket — "
        "partition count = number of time buckets, no SinglePartition.",
        E.q_cross_rank(spark, SF),
    )
    add(
        "decompose (classical seasonal decomposition)",
        "Gapfill spine + centered-MA window + two phase aggregates, "
        "all clustered on the series key; seasonal step is exact "
        "integer micro-unit arithmetic (no lattice rounding).",
        E.q_decompose(spark, SF),
    )

    add(
        "mood_cp (Mood scale changepoint)",
        "Like pettitt: all windows cluster on the series key -> ONE "
        "exchange; squared-centered-midrank arithmetic stays integer "
        "until the final standardization expression.",
        E.q_mood(spark, SF),
    )
    add(
        "corr_matrix (all-pairs bucket-aligned Pearson)",
        "Self EQUI-join on the time bucket (per-bucket key count "
        "squared, never total keys squared); DECIMAL moment sums; no "
        "cartesian product anywhere.",
        E.q_corr_matrix(spark, SF),
    )
    add(
        "winsorized (type-1 clip bounds)",
        "One window chain (count + rank + picked order statistics) "
        "plus one hash agg, all clustered on the key.",
        E.q_winsorized(spark, SF),
    )
    add(
        "ljung_box / arch_test (ACF whiteness family)",
        "Extends the band-join ACF plan with one more keyed aggregate; "
        "no new shuffle shape.",
        E.q_ljung_box(spark, SF),
    )
    add(
        "kalman (gap-aware local-level filter)",
        "Sequential per-series scan: numbered repartition on key + one "
        "grouped Arrow UDF (the holt shape); no second exchange.",
        E.q_kalman(spark, SF),
    )
    add(
        "allan (dyadic Allan variance cascade)",
        "ONE raw scan builds the base bins; every octave re-aggregates "
        "the previous (rollup-cascade shape); decimal(38,0) sums of "
        "quantized squares.",
        E.q_allan(spark, SF),
    )
    add(
        "iact (integrated autocorrelation time)",
        "Lag pairing is an EXPLODE of k=1..20 + one hash equi-join on "
        "(key, rn) — never a range join; decimal numerator/denominator "
        "sums, one double division per key.",
        E.q_iact(spark, SF),
    )
    add(
        "triangles (degree-oriented triangle count)",
        "Chain-graph edges (bounded degree by construction), wedge "
        "equi-join bounded by out-degrees, closing-edge probe — no "
        "cartesian product anywhere.",
        E.q_triangles(spark, SF),
    )
    add(
        "segreg (two-piece structural break)",
        "O(n)-per-key candidate evaluation: prefix + total integer "
        "moments in ONE ordered window pass, then a per-key argmin — "
        "no candidate self-join.",
        E.q_segreg(spark, SF),
    )
    add(
        "weighted_sample (Efraimidis-Spirakis top-k)",
        "Global mode plans TakeOrderedAndProject (per-partition heaps "
        "+ single merge), then ranks only the k-row frame.",
        E.q_weighted_sample(spark, SF),
    )
    add(
        "event_study (superposed-epoch composite)",
        "Anchors explode a bounded ±k offset lattice and equi-join the "
        "hourly bins; exact cent sums, one division per offset.",
        E.q_event_study(spark, SF),
    )
    add(
        "tpch_q1 (pricing summary)",
        "Zero joins; ONE exchange (final agg) after map-side combine; "
        "shipdate predicate pushed to the parquet scan; all money sums "
        "on integer lattices (charge in decimal(38,0)).",
        E.q_tpch_q1(spark, SF),
    )
    add(
        "tpch_q8 (market share)",
        "Every dimension broadcast; ASIA-customer EXISTS is a LeftSemi "
        "broadcast; numerator+denominator exact e-4 integers, one "
        "division per year — one shuffle total.",
        E.q_tpch_q8(spark, SF),
    )
    add(
        "tpch_q17 (small-quantity threshold)",
        "Per-part avg joined back over a persisted line frame (both "
        "consumers read InMemoryTableScan — the fact scan runs once); "
        "integer-cleared compare 5*q*n < sum_q.",
        E.q_tpch_q17(spark, SF),
    )
    add(
        "tpch_q21 (waiting suppliers)",
        "EXISTS / NOT EXISTS pair folded into ONE partitioned window "
        "over the per-(order,supplier) reduction — two shuffles, no "
        "order-grain join back, no correlated rescan.",
        E.q_tpch_q21(spark, SF),
    )
    add(
        "hy_cov (Hayashi-Yoshida asynchronous covariance)",
        "The quadratic interval-overlap sum telescopes into two as-of "
        "alignments (union-LOCF windows on the key) — NO range join, "
        "no cartesian, exact decimal(38,0) increment products; the "
        "overlap-pair count falls out of tick row-numbers.",
        E.q_hy_cov(spark, SF),
    )
    add(
        "hy_lead_lag (HRY shift-lattice scan)",
        "Bounded theta lattice explodes the ALREADY-REDUCED interval "
        "frame (raw scan runs once); windows partition by (key, theta); "
        "best lag is argmax |cov_q| — an exact integer compare.",
        E.q_hy_lead_lag(spark, SF),
    )
    add(
        "granger (1-lag Granger F-test)",
        "Shared LOCF bucket grid (bounded spine explode + two "
        "equi-joins + one (key) window pass); regression moments are "
        "ONE partial+final hash agg in decimal(38,0) — the F statistic "
        "is pure projection arithmetic after the single shuffle.",
        E.q_granger(spark, SF),
    )
    add(
        "transfer_entropy (binary TE both directions)",
        "Same shared grid; BOTH directions come from ONE 16-cell "
        "conditional-sum hash agg per key (partial+final) — no second "
        "shuffle, no per-direction rescan; the ln chains are "
        "projection-only.",
        E.q_transfer_entropy(spark, SF),
    )
    add(
        "coint_eg (Engle-Granger cointegration)",
        "Same shared one-scan grid; static OLS and Dickey-Fuller pair "
        "moments are conditional sums in ONE hash agg (residual sums "
        "expanded onto the exact integer lattice) — the two-step never "
        "re-scans; alpha/beta/gamma/t are projection arithmetic.",
        E.q_coint_eg(spark, SF),
    )

    add(
        "kendall_tau (tau-b / gamma / Somers' D on the grid)",
        "Same shared one-scan grid: ONE raw scan, zero joins, two "
        "exchanges total — the grouped Arrow UDF (Knight O(n log n) "
        "merge-sort discordance count) reuses the grid window's "
        "hashpartitioning(key) and adds only a Sort; tau/gamma/D are "
        "projection arithmetic over the exact integer surface.",
        E.q_kendall_tau(spark, SF),
    )

    add(
        "seasonal_mk (Hirsch-Slack seasonal Mann-Kendall)",
        "One raw scan, zero joins, three bounded exchanges: daily "
        "last-in-bucket partial aggregate, per-(key, season) rows into "
        "the Knight merge-count Arrow UDF, then 7-rows-per-key partial "
        "sums; Z is projection arithmetic over exact int64 S / var18.",
        E.q_seasonal_mk(spark, SF),
    )

    add(
        "wilcoxon_sr (paired signed-rank test)",
        "Fully declarative past the shared grid: one scan, zero joins, "
        "TWO exchanges total — the midrank windows (rank + tie count) "
        "and the final partial+final aggregate all ride the grid's "
        "hashpartitioning(key); zero Python nodes anywhere.",
        E.q_wilcoxon_sr(spark, SF),
    )

    add(
        "pair_robust (Hodges-Lehmann + Qn, pairwise order statistics)",
        "ONE scan, ONE exchange, one grouped Arrow UDF: the k-th "
        "pairwise sum/difference is selected by value-space binary "
        "search with a two-pointer count (O(n log n log V) per key) — "
        "the O(n^2) pair join exists only in the DuckDB oracle.",
        E.q_pair_robust(spark, SF),
    )

    add(
        "extremal_index (Ferro-Segers exceedance clustering)",
        "Top-k rank prune pushes a map-side WindowGroupLimit BELOW the "
        "single key exchange (only ~k rows per key per input partition "
        "shuffle); the gap window and the partial+final aggregate ride "
        "the same partitioning. No join, no Python.",
        E.q_extremal_index(spark, SF),
    )

    add(
        "block_bootstrap (deterministic circular block bootstrap CI)",
        "The resampled series is never materialized: each block is <= 2 "
        "wrap segments, each segment two signed prefix-sum endpoint "
        "lookups, so the lattice is ~4B/L rows per data row and joins "
        "the PERSISTED prefix frame by equi-key (one parquet scan total "
        "— three InMemoryTableScans). CI bounds are copied integer "
        "order statistics; Knuth-hash starts make the whole thing a "
        "pure function of the data at any parallelism.",
        E.q_block_bootstrap(spark, SF),
    )

    add(
        "friedman (weekday-effect complete-block rank test)",
        "One scan, TWO exchanges: the (key, day) daily partial "
        "collapses raw turns to key-days, then ONE key exchange that "
        "the span windows, the bounded zero-fill Generate, the "
        "(key, blk) rank windows and both final aggregates all ride "
        "(hashpartitioning(key) satisfies every downstream "
        "clustering). No join, no Python.",
        E.q_friedman(spark, SF),
    )

    add(
        "energy_dist (Szekely-Rizzo two-sample energy distance)",
        "ONE scan, ONE key exchange: the side-major rank (per-side rank "
        "= global row number minus the x-count offset), cumulative "
        "straddle counts, gap lead and the final aggregate all ride "
        "hashpartitioning(key). All three pairwise |diff| sums are "
        "exact order-statistic identities — the O(n^2) pair joins "
        "exist only in the oracle.",
        E.q_energy_dist(spark, SF),
    )

    add(
        "rayleigh (circular time-of-day uniformity)",
        "One scan, one partial+final hash aggregate around a single "
        "exchange — no window, no join, no UDF: the cheapest plan "
        "shape in the repo (map-side combine does nearly all work).",
        E.q_rayleigh(spark, SF),
    )

    add(
        "hhi_hourly (Herfindahl-Hirschman bucket concentration)",
        "Two partial+final hash aggregates — (bucket, key) then "
        "(bucket) — two exchanges, zero windows/joins/UDFs: a bucket's "
        "cross-section is an AGGREGATE, so there is no single-task "
        "bucket bottleneck at any key cardinality.",
        E.q_hhi_hourly(spark, SF),
    )

    add(
        "gpd_tail (peaks-over-threshold GPD fit, PWM)",
        "hill_tail's top-k shape: the rank filter plans a map-side "
        "WindowGroupLimit BELOW the single key exchange, so the "
        "aggregate input is (k+1) rows per key regardless of input "
        "size; the final groupBy(key) reuses the window partitioning "
        "— one exchange total, no joins.",
        E.q_gpd_tail(spark, SF),
    )

    add(
        "kpss (level-stationarity on the LOCF grid)",
        "One raw scan, zero joins, TWO exchanges — both the grid's: "
        "the per-key total, the cumulative partial-sum window, the 8 "
        "Bartlett lag columns and the final aggregate all ride "
        "hashpartitioning(key). All moments in decimal(38,0).",
        E.q_kpss(spark, SF),
    )

    add(
        "bns_jumps (RV vs bipower-variation jump share)",
        "Dedup (key,us) aggregate, then both window lags and the final "
        "groupBy ride one hashpartitioning(key) — two exchanges, no "
        "join, no UDF; both sums exact int64.",
        E.q_bns_jumps(spark, SF),
    )

    add(
        "tail_dep (upper/lower tail dependence on the xy grid)",
        "The granger grid's one-scan/two-exchange shape; both rank "
        "windows, the order-statistic threshold broadcast window and "
        "the count aggregate all reuse hashpartitioning(key) — no "
        "further exchange, all surfaces exact integer counts.",
        E.q_tail_dep(spark, SF),
    )

    add(
        "croston (intermittent-demand SES pair)",
        "The (key, bucket) demand aggregate collapses the raw stream "
        "MAP-SIDE to the sparse skeleton before one numbered key "
        "repartition into the grouped Arrow UDF — two exchanges, no "
        "join; the recursion state is O(1) per key.",
        E.q_croston(spark, SF),
    )

    add(
        "prominence (top-k peak prominence)",
        "Dedup aggregate + one numbered key repartition into the O(n) "
        "monotonic-stack Arrow UDF (<= k rows out per key); the O(n^2) "
        "nearest-higher/base joins exist only in the DuckDB oracle.",
        E.q_prominence(spark, SF),
    )

    add(
        "lo_rs (Lo modified R/S long-range dependence)",
        "kpss's grid/residual/Bartlett machinery with a max-min range "
        "aggregate instead of the cumulative square sum — one scan, "
        "two exchanges, no join/UDF; V = 3*R'/sqrt(den) over two "
        "exact integers.",
        E.q_lo_rs(spark, SF),
    )

    add(
        "var_backtest (Kupiec POF, 99% VaR)",
        "ONE scan, ZERO joins: the estimation-half rank rides a "
        "boolean-first window sort (est rows order before test rows), "
        "so the threshold is a windowed max on the same "
        "hashpartitioning(key) — the branch + broadcast-join "
        "formulation this replaced cost two scans and five exchanges.",
        E.q_var_backtest(spark, SF),
    )

    add(
        "garch / acd (recursive volatility & duration filters)",
        "Dedup (key,us) aggregate -> numbered key repartition -> one "
        "grouped Arrow UDF with O(1) recursion state; the recursive-"
        "CTE oracles replay the identical float64 trees.",
        E.q_garch(spark, SF),
    )

    add(
        "kuiper (circular ECDF uniformity)",
        "One exchange: row_number + both cleared-denominator BIGINT "
        "maxima + the final agg all cluster on hash(key); no float "
        "until the single V division.",
        E.q_kuiper(spark, SF),
    )

    add(
        "chi2_indep (type x hour independence + Cramer's V)",
        "ONE full-data shuffle (the joint count); the marginal windows "
        "and finalize run on the collapsed lattice bounded by "
        "keys x types x 24 — the telescoped identity keeps empty cells "
        "out of the plan entirely. No join.",
        E.q_chi2_indep(spark, SF),
    )

    add(
        "anova_weekday / brown_forsythe (balanced one-way pair)",
        "The (key, day) partial collapses the raw stream before the "
        "bounded gap explode; two exchanges, no join, cleared integer "
        "algebra exact because the complete-week spine makes every "
        "group the same size by construction. BF adds one (key,trt) "
        "window pair riding the group exchange.",
        E.q_anova(spark, SF),
    )

    add(
        "page_trend (monotone intra-day ordering)",
        "friedman's spine at hour grain: (key, hour) partial -> gap "
        "explode -> one block-rank window -> one agg; two exchanges, "
        "position-weighted doubled midranks exact int64.",
        E.q_page_trend(spark, SF),
    )

    add(
        "hac_trend (Newey-West robust trend)",
        "kpss's contract: the LOCF grid costs two exchanges and the "
        "regression sums, row_number, cent-quantized residual and the "
        "L=8 Bartlett lag fold all reuse hash(key); decimal lattice "
        "end-to-end, no join, no UDF.",
        E.q_hac_trend(spark, SF),
    )

    add(
        "burrows_delta (stylometric distance)",
        "tf and marker cells persisted (corpus tokenized once); top-K "
        "markers and the K-row stats frame broadcast back; the "
        "absent-word telescope's Z0 is a 1-row constant, so no doc x K "
        "zero-fill grid and no doc x doc pair exist anywhere.",
        E.q_burrows_delta(spark, SF),
    )

    add(
        "cochran_q / mcnemar (binary blocked & paired tests)",
        "Cochran: the row-total square sum telescopes onto the cells "
        "(sum rb*x == sum rb^2), so the per-block aggregate + join-back "
        "don't exist — two exchanges, all on hash(key). McNemar: one "
        "(key, day) partial with conditional half-day maxima, one "
        "(key) agg — no window, no join.",
        E.q_cochran_q(spark, SF),
    )

    add(
        "moran_gaps (Poissonness of inter-arrivals)",
        "One exchange: lag() and the hash agg ride hash(key); per-gap "
        "floor-1e9 log terms summed as BIGINT, zero gaps counted out.",
        E.q_moran_gaps(spark, SF),
    )

    add(
        "readability (Flesch / FK grade)",
        "Scan -> project, ZERO exchanges: three exact regexp counts "
        "and two fixed double trees per row — the cheapest operator "
        "class in the repo (quality_features' shape).",
        E.q_readability(spark, SF),
    )

    add(
        "label_coherence (embedding-cluster audit)",
        "posexplode -> (label,pos) centroid sums (exact int lattice) "
        "-> equi-join back -> per-vec + per-label aggregates; float "
        "components quantized before any aggregation, so no "
        "order-dependent float sum exists; no cartesian, no UDF.",
        E.q_label_coherence(spark, SF),
    )

    add(
        "gk_gamma (ordinal association lattice)",
        "Copied quartile thresholds ride the (key) window chain; the "
        "raw collapses to <= 96 cells/key which are PERSISTED (one "
        "scan, four InMemoryTableScan consumers); the only join is the "
        "cell cross capped at 96^2/2 pairs per key; ties from "
        "marginals, no pair enumeration.",
        E.q_gk_gamma(spark, SF),
    )

    add(
        "christoffersen / cliffs_delta (backtest + effect size)",
        "Christoffersen: var_backtest's boolean-first window chain + "
        "one lag window + transition agg, all on hash(key) — ONE scan, "
        "ZERO joins. Cliff's delta: one raw shuffle to the (key, "
        "value) tie grid, dominance counts via two cumulative windows "
        "on the grid, decimal products — no join.",
        E.q_christoffersen(spark, SF),
    )

    add(
        "diebold_mariano / risk_ratios (hourly grid + daily closes)",
        "DM: hac_trend's plan class — one scan, the LOCF grid "
        "exchanges, the Bartlett(8) lag fold and final agg on "
        "hash(key). Risk ratios: raw -> observed-day arg-max closes "
        "in one hash agg, lag + running-peak windows, final agg — one "
        "scan, zero joins.",
        E.q_diebold_mariano(spark, SF),
    )

    add(
        "sampen / yules_k / ari_cl (template join + zero-shuffle text)",
        "SampEn: day-span-bounded spine, copied-IQR tolerance, ONE "
        "template self-join (span^2/2 fan-out). Yule's K: the sorted-"
        "array 2r-1 telescope keeps sum m^2 inside one Project — ZERO "
        "exchanges, like ari_cl's pure-integer centigrade lattice.",
        E.q_sampen(spark, SF),
    )

    add(
        "logrank / bh_fdr / chow (survival test, FDR cross-section, break)",
        "Log-rank: survival's grid shape, cohort-partitioned windows "
        "on distinct durations, floor-quantized E/V lattices, no join "
        "beyond the spine. BH: global rank over the ONE-row-per-key "
        "statistic frame (marked bounded; ~1e8-key bound documented). "
        "Chow: the LOCF grid + one window chain + one agg, F from "
        "three cleared-SSE decimals.",
        E.q_bh_fdr(spark, SF),
    )

    add(
        "page_hinkley / ww_runs / lepage / good_turing",
        "PH: dedup agg + index/cumsum/running-min windows on "
        "hash(key), one scan, alarm filter at the end. WW: one lag "
        "window over the (cents, us) merged order. Lepage: the tie "
        "grid + cumulative window. Good-Turing: term-count shuffle -> "
        "tiny n_r histogram -> lead window + 1-row broadcast.",
        E.q_page_hinkley(spark, SF),
    )

    add(
        "conv_stats / hoeffding / k_anonymity",
        "Conversation stats: one (conv)-window chain + one hash agg; "
        "digest = one agg with an in-agg sorted fold. Hoeffding: raw "
        "-> observed-day close pairs (span-bounded), rank windows, "
        "ONE span^2 self-join for the dominance counts. k-anonymity: "
        "raw -> bounded QI class lattice, rank window + final agg on "
        "the lattice only.",
        E.q_hoeffding(spark, SF),
    )

    add(
        "benford_audit / cvm / cucconi / bws / conover / mood_median / "
        "quade / brunner_munzel / jonckheere / tool_loops / isotonic / "
        "gev_shape",
        "Benford: raw -> (key,d) digit lattice -> pivot agg, no join. "
        "CvM: two rank windows whose (key,a) partition refines (key) "
        "-> one agg, no join. Tool loops: one (conv)-window chain -> "
        "run/lattice aggs -> per-conv equi-joins. Isotonic: raw "
        "aggregated to the <=24-row hourly lattice BEFORE the bounded "
        "self-join; suffix-min window + max agg on the lattice only. "
        "GEV: block-max hash agg -> (key) rank window -> cleared-PWM "
        "agg, one exchange. Cucconi: ONE rank window + agg. "
        "Jonckheere: tie grid -> pivoted 6-daypart cumsum window -> "
        "one agg, no joins.",
        E.q_isotonic(spark, SF),
    )

    out = ["# BENCH/PLANS — formatted physical plans of headline queries\n"]
    out.append(
        "Generated by `python tools/dump_plans.py` (sf0.001 inputs; plan\n"
        "shapes are scale-invariant). Each property shown here is also\n"
        "asserted in `tests/test_plans.py`.\n"
    )
    for name, note, plan in sections:
        plan = plan.strip()
        # keep the operator tree + first node details; the full dump of
        # expression-heavy plans runs to megabytes
        if len(plan) > 6000:
            plan = plan[:6000] + "\n... (truncated; run tools/dump_plans.py for full output)"
        out.append(f"\n## {name}\n\n{note}\n\n```\n{plan}\n```\n")
    (REPO / "BENCH" / "PLANS.md").write_text("".join(out))
    print(f"wrote BENCH/PLANS.md ({sum(len(p) for _, _, p in sections)} chars of plans)")


if __name__ == "__main__":
    main()
