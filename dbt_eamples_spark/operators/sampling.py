"""Sampling & distribution operators for training-data curation
(SURVEY.md §2.11 EXT): build eval/dev splits and inspect value
distributions at corpus scale.

Both are deterministic — sampling keyed on a content hash, binning
on fixed arithmetic — so results are reproducible run-to-run and
bit-identical to the DuckDB oracle (a `rand()`-based sample would be
neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table

STRATUM_N = 20  # docs kept per language stratum

HIST_LO = 0.0
HIST_WIDTH = 50_000.0
HIST_BINS = 12


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-stratum sample of documents, stratified by
    language: rank docs inside each stratum by a deterministic
    content hash (md5 of doc_id) and keep the first STRATUM_N.

    This is the eval-set construction shape: per-language quotas
    regardless of the corpus' language skew. A plain ``rate %``
    sample would keep the skew; a ``rand()`` sample would not be
    reproducible.

    Scale: a bare ``Window.partitionBy(lang)`` funnels each stratum
    through ONE task — with a handful of languages over 100 TB that
    is a straggler by construction. Two-phase instead (the
    similarity ``_topk`` shape): phase 1 reduces every input
    partition to its local STRATUM_N smallest hash keys per lang
    (map-side ``min_by``-style aggregate over (lang, partition-id) —
    hash-uniform key, no skew), phase 2 ranks only the surviving
    ≤ STRATUM_N·P rows with the exact per-lang window. Identical
    output to the single window (total order on (hkey, doc_id)),
    asserted in tests."""
    docs = load_table(spark, sf_dir, "documents")
    hkey = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    keyed = docs.select("doc_id", "lang", hkey.alias("hkey"))
    local = (
        keyed.withColumn("pid", F.spark_partition_id())
        .groupBy("lang", "pid")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("hkey", "doc_id"))),
                1,
                STRATUM_N,
            ).alias("cands")
        )
        .select("lang", F.explode("cands").alias("c"))
        .select("lang", F.col("c.hkey").alias("hkey"), F.col("c.doc_id").alias("doc_id"))
    )
    w = Window.partitionBy("lang").orderBy(F.asc("hkey"), F.asc("doc_id"))
    return (
        local.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= STRATUM_N)
        .select("doc_id", "lang", "sample_rank")
    )


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: 12 bins of 50k with an
    overflow bin — the distribution-inspection pass run before
    choosing filter thresholds on a new corpus.

    Binning is pure arithmetic (``least(floor((x-lo)/width), last)``)
    so it map-side combines into at most HIST_BINS rows per task —
    the shuffle carries bins, not values, which is what makes
    distribution scans free at 100 TB (contrast exact percentiles,
    which buffer every value; see ``agg_approx_percentiles``)."""
    o = load_table(spark, sf_dir, "orders")
    bin_id = F.least(
        F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(HIST_WIDTH)),
        F.lit(HIST_BINS - 1),
    ).cast("bigint")
    return (
        o.select(bin_id.alias("bin_id"), "o_totalprice")
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .select(
            "bin_id",
            (F.lit(HIST_LO) + F.col("bin_id") * F.lit(HIST_WIDTH)).alias("bin_lo"),
            "n_orders",
            "bin_min",
            "bin_max",
        )
    )


EQUI_DEPTH_BUCKETS = 8


def agg_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals — the
    optimizer statistic real engines keep (ANALYZE histograms):
    bucket boundaries at the exact k/8 quantiles, then one bucketing
    pass counting rows per bucket.

    Two-pass shape: the exact percentile aggregate produces ONE row
    of boundaries (broadcast back — no driver collect), then the
    bucketing pass is pure arithmetic that map-side combines into at
    most 8 rows per task. The boundary doubles are identical across
    engines (agg_percentiles proves exact-percentile parity), so the
    `<=` bucket comparisons are engine-exact. The exact-percentile
    first pass buffers values per group at scale — for 100 TB swap
    in percentile_approx (the agg_approx_percentiles pattern); the
    bucketing pass is scale-free either way."""
    o = load_table(spark, sf_dir, "orders")
    qs = [i / EQUI_DEPTH_BUCKETS for i in range(1, EQUI_DEPTH_BUCKETS)]
    bounds = o.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])).alias(
            "bounds"
        )
    )
    # bucket = #boundaries strictly below the value (0..7)
    bucket = F.aggregate(
        F.col("bounds"),
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col("o_totalprice") > b, 1).otherwise(0),
    )
    return (
        o.select("o_totalprice")
        .crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic downsampling: keep each doc
    with probability equal to its quality score, decided by a
    content-independent hash coin — the importance-sampling pass
    that biases a training mix toward higher-quality text while
    staying fully reproducible (same corpus → same sample, any
    partitioning, any engine; a `rand()` Bernoulli is neither
    reproducible nor oracle-checkable).

    The coin is u = md5(doc_id)[:15 hex] / 2^60 ∈ [0,1): u derives
    from an exact 60-bit integer, so its double value is
    bit-identical across engines and the keep decision u < quality
    is engine-exact. Narrow map + filter, zero shuffles."""
    from dbt_eamples_spark.operators.text import _quality_frame

    q = _quality_frame(load_table(spark, sf_dir, "documents"))
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    )
    return (
        q.select(
            "doc_id",
            "quality_score",
            F.round(u, 6).alias("coin"),
            (u < F.col("quality_score")).alias("keep"),
        )
        .filter(F.col("keep"))
        .select("doc_id", "quality_score", "coin")
    )


SPLIT_TRAIN = 0.8
SPLIT_VAL = 0.9  # (train, val] then test


def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment — the one
    split every training pipeline needs to be REPRODUCIBLE and
    leakage-free: the assignment derives from md5(doc_id) alone
    (the sample_quality_weighted hash coin), so it is stable across
    runs, partitionings, engines, and corpus growth (a doc keeps its
    split when new docs arrive — `rand()` splits reshuffle
    everything, silently leaking test docs into training). Zero
    shuffles: a narrow map the scan absorbs at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    )
    split = (
        F.when(u < SPLIT_TRAIN, "train")
        .when(u < SPLIT_VAL, "validation")
        .otherwise("test")
    )
    return docs.select(
        "doc_id", F.round(u, 6).alias("coin"), split.alias("split")
    )


def sample_source_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (the mT5/Pile mixing
    pass): downsample each source so kept volume is proportional to
    n_s^alpha, flattening the source distribution toward uniform
    without discarding small sources. With alpha = 0.5 the keep rate
    is sqrt(n_min/n_s) (=1 for the smallest source), decided per doc
    by the module's md5 hash coin — deterministic across runs,
    partitionings, and engines.

    alpha is pinned at 0.5 deliberately: IEEE-754 requires sqrt (and
    division) to be CORRECTLY ROUNDED, so sqrt(n_min/n_s) is
    bit-identical in the JVM and DuckDB, making the coin < rate
    decision engine-exact. A general-alpha pow(n_min/n_s, 1-alpha)
    is NOT guaranteed correctly rounded by either libm or Math.pow —
    a production deployment choosing alpha = 0.7 accepts a ~1-ulp
    rate wobble (odds ~2^-52 per doc of flipping a decision), which
    is fine operationally but not for a bit-exact oracle.

    Scale: the per-source count table is |sources| rows (broadcast
    back); the corpus streams once through a broadcast join +
    filter. One shuffle (the source count), the same shape at
    100 TB.

    Fixture enrichment: the synthetic corpus is EXACTLY uniform
    across its 20 sources (25 docs each at sf0.01), which makes
    every keep rate 1.0 and the pass a no-op — so the driver query
    rebalances a deterministic SKEWED regrouping instead:
    source_bin = floor(sqrt(doc_id)) yields group sizes 1, 3, 5, ...
    (exact in both engines — integer-to-double conversion and sqrt
    are correctly rounded, floor at a perfect square is exact), so
    rates genuinely vary and the keep decision is exercised for
    real."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("s"),
            F.floor(F.sqrt(F.col("doc_id").cast("double"))).cast("long"),
        ).alias("source_bin"),
    )
    counts = docs.groupBy("source_bin").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    nmin = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "source_bin",
        "n_docs",
        F.sqrt(F.col("n_min") / F.col("n_docs")).alias("keep_rate"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    )
    return (
        docs.join(F.broadcast(rates), "source_bin")
        .select(
            "doc_id",
            "source_bin",
            "n_docs",
            "keep_rate",
            F.round(u, 6).alias("coin"),
            (u < F.col("keep_rate")).alias("keep"),
        )
        .filter(F.col("keep"))
        .select("doc_id", "source_bin", "n_docs", "keep_rate", "coin")
    )


# alpha for the generalized temperature pass, as a DYADIC rational
# k/2^m: alpha = 1/4 (close to mT5's 0.3 operating point), so the
# keep-rate exponent 1-alpha = 3/4 composes from sqrt chains.
TEMP_ALPHA_NUM = 1
TEMP_ALPHA_LOG2_DEN = 2


def dyadic_pow_col(x, num: int, log2_den: int):
    """x^(num/2^log2_den) for x >= 0 as a product of chained square
    roots: x^(3/4) = sqrt(x) * sqrt(sqrt(x)), etc. IEEE-754 requires
    sqrt and multiply to be CORRECTLY ROUNDED, so this composed
    expression yields the bit-identical double on any conforming
    engine (JVM, DuckDB) — unlike libm/Math.pow, which carries no
    such guarantee (the sample_source_temperature docstring's
    general-alpha caveat, resolved for dyadic alphas). Factors
    multiply most-significant bit first; the oracle must spell the
    same order."""
    out = None
    cur = x
    for i in range(1, log2_den + 1):
        cur = F.sqrt(cur)
        if (num >> (log2_den - i)) & 1:
            out = cur if out is None else out * cur
    if out is None:  # num == 0 -> x^0
        return F.lit(1.0)
    return out


def dyadic_pow_sql(x: str, num: int, log2_den: int) -> str:
    """The DuckDB spelling of :func:`dyadic_pow_col` — same sqrt
    chain, same multiplication order, hence the same bits."""
    out = None
    cur = x
    for i in range(1, log2_den + 1):
        cur = f"sqrt({cur})"
        if (num >> (log2_den - i)) & 1:
            out = cur if out is None else f"{out} * {cur}"
    return out if out is not None else "1.0"


def sample_source_temperature_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature rebalancing at a GENERAL (dyadic) alpha — the
    operating-point dial `sample_source_temperature` pins at 0.5:
    kept volume ∝ n_s^alpha with alpha = TEMP_ALPHA_NUM/2^
    TEMP_ALPHA_LOG2_DEN = 0.25, a stronger flatten (nearer mT5's
    0.3) than the sqrt pass. keep_rate = (n_min/n_s)^(1-alpha)
    composes from IEEE-exact sqrt chains (:func:`dyadic_pow_col`),
    so the coin < rate decision stays bit-exact cross-engine — the
    property a plain pow() cannot give. Same skewed
    floor(sqrt(doc_id)) fixture regrouping, md5 hash coin, one
    shuffle + broadcast rate table as the alpha=0.5 pass."""
    exp_num = (1 << TEMP_ALPHA_LOG2_DEN) - TEMP_ALPHA_NUM  # 1 - alpha
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("s"),
            F.floor(F.sqrt(F.col("doc_id").cast("double"))).cast("long"),
        ).alias("source_bin"),
    )
    counts = docs.groupBy("source_bin").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    nmin = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "source_bin",
        "n_docs",
        dyadic_pow_col(
            F.col("n_min") / F.col("n_docs"),
            exp_num,
            TEMP_ALPHA_LOG2_DEN,
        ).alias("keep_rate"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        / F.lit(float(1 << 60))
    )
    return (
        docs.join(F.broadcast(rates), "source_bin")
        .select(
            "doc_id",
            "source_bin",
            "n_docs",
            F.round("keep_rate", 6).alias("keep_rate"),
            F.round(u, 6).alias("coin"),
            (u < F.col("keep_rate")).alias("keep"),
        )
        .filter(F.col("keep"))
        .select("doc_id", "source_bin", "n_docs", "keep_rate", "coin")
    )


# Count-min sketch geometry: d independent md5-derived rows of w
# counters. Collision overcount at this (w, n_keys) operating point
# is audited in the output (est - exact >= 0 always, by CMS theory).
CMS_D = 4
CMS_W = 512
CMS_TOP_K = 20


def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via an explicit count-min sketch: build the
    d×w counter grid over event user_ids, then report the top-k
    users by their CMS estimate (min over the d rows) NEXT TO their
    exact counts, so the sketch's one-sided error is visible
    (``overcount = est - exact``, provably ≥ 0).

    Why a sketch when Spark can count exactly? At 100 TB the exact
    per-key count of a high-cardinality key is a corpus-sized
    shuffle, while the CMS grid is d·w counters PER PARTITION,
    map-side-combined into one tiny frame (here 4·512 longs) — the
    standard streaming answer (Cormode & Muthukrishnan 2005). The
    probe side here scans all distinct keys to make the audit
    oracle-checkable; production probes only suspect keys.

    Determinism: row hashes are md5-derived 60-bit ints mod w —
    the repo's engine-portable hash-coin convention — so grid and
    estimates are bit-identical on any engine. All outputs bigint.

    Scale shape: grid = one narrow d-explode + hash-agg (map-side
    combine ends at 2048 groups); probe = distinct pass + broadcast
    join against the 2048-row grid; final cut compiles to
    TakeOrderedAndProject. No corpus-sized shuffle except the one
    distinct pass the audit itself requires."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    j = F.explode(F.array([F.lit(i) for i in range(CMS_D)])).alias("j")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("j"), F.col("user_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    ).alias("bucket")
    grid = (
        ev.select("user_id", j)
        .select("j", bucket)
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("exact")
    )
    probes = exact.select("user_id", "exact", j).select(
        "user_id", "exact", "j", bucket
    )
    est = (
        probes.join(F.broadcast(grid), ["j", "bucket"])
        .groupBy("user_id", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    return (
        est.select(
            "user_id", "est", "exact", (F.col("est") - F.col("exact")).alias("overcount")
        )
        .orderBy(F.desc("est"), F.asc("user_id"))
        .limit(CMS_TOP_K)
    )


FIXED_SAMPLE_K = 200


def sample_fixed_size_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform corpus sample, reproducibly: order docs by
    md5(doc_id) and keep the first k — the deterministic stand-in
    for reservoir sampling (same k docs on every run, any
    partitioning, any engine; a true reservoir is run-dependent and
    a `rand()` threshold can't hit k exactly).

    Scale shape: compiles to TakeOrderedAndProject — each partition
    keeps its local k smallest hashes and the driver merges p·k
    candidate rows; no global sort, no full shuffle. This is the
    eval-set / spot-check sampler for a 100 TB corpus: k rows out,
    one scan, stable under corpus growth for the surviving prefix."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", "source", "n_chars", h.alias("h"))
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .limit(FIXED_SAMPLE_K)
    )


PER_GROUP_K = 20


def sample_fixed_size_per_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-k-PER-STRATUM reproducible sample: within every
    source, keep the k docs with the smallest md5(doc_id) — the
    per-group twin of `sample_fixed_size_hash` and the balanced
    eval-set builder a curator actually wants (a global k-sample
    mirrors the corpus mix, so dominant sources drown small ones; k
    per source gives every stratum equal representation regardless
    of size, with `sample_stratified` covering the
    proportional-rate middle ground).

    Scale shape: one hash-partition exchange on ``source`` feeding a
    rank window whose state is a row counter; with AQE a skewed
    stratum is a split-able partition, never a buffer (no
    collect_list). Output ≤ k·|sources| rows. Same determinism
    argument as the global sampler: md5 order statistics are
    engine-, run- and partitioning-independent."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PER_GROUP_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            "h",
            F.col("rk").cast("long").alias("rk"),
        )
    )


# sketch size. Estimator safety: the numerator (K-1)·2^60 is a
# DOUBLE (~7.3e19, fine for a float), and hk >= K-1 (the K-th
# smallest of K distinct non-negative hashes), so
# floor(num / hk) <= 2^60 — comfortably inside int64.
KMV_K = 64


def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event type, plus
    the MERGED all-types sketch — the third sketch family next to
    CMS (counts) and HLL (`agg_approx_distinct`): keep the K
    smallest md5 hash values of the key; the K-th smallest estimates
    the density, est = (K−1)·2^60 / h_K (Bar-Yossef et al. 2002).
    Unlike HLL the estimator here is engine-DETERMINISTIC (md5
    order statistics, no accumulator-order dependence), so the
    sketch itself is oracle-checkable — and KMV sketches MERGE
    losslessly: the ``__all__`` row ranks the UNION OF THE PER-TYPE
    SKETCHES (≤ |types|·K rows), never the corpus, because a
    globally-K-smallest key is necessarily K-smallest within every
    type that contains it. That 320-row global window is the
    documented bounded-slice pattern; the corpus-sized path would be
    re-ranking all keys.

    Output per group: exact distinct count (audit), sketch estimate,
    and the sketch fill m (m < K means the sketch saw every key and
    est == m exactly).

    Scale shape: ONE distinct pass (the only corpus-sized shuffle,
    checkpointed, consumed by sketch + both audits); per-type
    ranking windows run over distinct keys; every aggregate
    map-side combines. At 100 TB you ship the K-row sketches, not
    the keys — the merge row is exactly that reduction."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    return kmv_sketch_report(pairs)


def kmv_sketch_report(raw_pairs: DataFrame) -> DataFrame:
    """Core KMV pipeline over an arbitrary distinct (event_type,
    user_id) frame — factored out so property tests can drive it
    with generated sets and assert EXACT equality against a pure
    python md5-order-statistics reference (the determinism claim as
    a contract, like pagerank_fixed_point)."""
    pairs = raw_pairs.localCheckpoint(eager=True)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("event_type").orderBy(F.asc("h"), F.asc("user_id"))
    kept = (
        pairs.select("event_type", "user_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .localCheckpoint(eager=True)  # feeds per-type aggs AND the merge
    )

    est = F.when(F.col("m") < KMV_K, F.col("m")).otherwise(
        F.floor(F.lit(float((KMV_K - 1) * (1 << 60))) / F.col("hk")).cast("long")
    )

    exact = pairs.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact")
    )
    per_type = (
        kept.groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count("*").cast("long").alias("m"))
        .join(F.broadcast(exact), "event_type")
        .select("event_type", "exact", est.alias("est"), "m")
    )

    # sketch merge: K smallest distinct hashes across the per-type
    # sketches == the union sketch (bounded |types|·K-row window)
    mw = Window.orderBy(F.asc("h"), F.asc("user_id"))
    merged_kept = (
        kept.select("user_id", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") <= KMV_K)
    )
    all_exact = pairs.agg(
        F.countDistinct("user_id").cast("long").alias("exact")
    )
    merged = (
        merged_kept.agg(
            F.max("h").alias("hk"), F.count("*").cast("long").alias("m")
        )
        .crossJoin(F.broadcast(all_exact))
        .select(
            F.lit("__all__").alias("event_type"), "exact", est.alias("est"), "m"
        )
    )
    return per_type.unionByName(merged)


NEYMAN_TOTAL_K = 120  # total sample budget allocated across strata


def sample_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Variance-optimal stratified sample (Neyman 1934): a fixed
    total budget of ``NEYMAN_TOTAL_K`` docs is split across source
    strata proportionally to N_h·S_h (stratum size × stratum std of
    n_chars), then filled per stratum by smallest md5(doc_id) —
    the estimator-variance-minimizing allocation for estimating a
    corpus mean, and the third allocation policy next to
    equal-per-group (sample_fixed_size_per_group) and proportional
    (sample_stratified): high-variance strata earn more budget
    because uniform rows there are worth more.

    Engine-exact allocation: N_h·S_h = √(N_h·Σx² − (Σx)²) — the
    n² denominators cancel, so the weight is ONE sqrt of an exact
    decimal(38,0) moment expression, re-quantized to int64 at 1e-6
    (`round(sqrt·1e6)`), after which the total Σw is an exact
    integer fold and each stratum's quota is one double division +
    half-up round, identical trees in both engines. Rounded quotas
    need not sum to exactly K (documented; largest-remainder
    correction is a client choice), and every nonempty stratum
    keeps at least 1 row. The fill is the md5 order-statistic
    recipe — engine/run/partitioning independent.

    Plan: one source-keyed moment fold to ≤|sources| rows → the
    quota table is catalog-bounded → BROADCAST back onto the doc
    scan feeding the per-stratum rank window (one source exchange,
    row-counter state, AQE-splittable). Output ≈ K rows. Two scans
    of the doc table, no corpus-sized intermediate at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = F.col("n_chars").cast("long")
    mom = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum(dec(x)).alias("s"),
        F.sum(dec(x) * dec(x)).alias("ss"),
    )
    nsh = F.sqrt(
        (dec(F.col("nh")) * F.col("ss") - F.col("s") * F.col("s"))
        .cast("double")
    )
    qw = mom.select(
        "source",
        "nh",
        F.round(nsh * 1e6).cast("long").alias("qw"),
    )
    tot = qw.agg(F.sum(dec(F.col("qw"))).alias("qtot"))
    alloc = qw.crossJoin(F.broadcast(tot)).select(
        "source",
        "nh",
        F.greatest(
            F.lit(1),
            F.round(
                F.lit(NEYMAN_TOTAL_K)
                * F.col("qw").cast("double")
                / F.col("qtot").cast("double")
            ).cast("long"),
        ).alias("alloc"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    ranked = docs.select(
        "doc_id", "source", "n_chars", h.alias("h")
    ).withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("rk") <= F.col("alloc"))
        .select(
            "source",
            "alloc",
            F.col("rk").cast("long").alias("samp_rank"),
            "doc_id",
            "n_chars",
        )
        .orderBy("source", "samp_rank")
    )


RESERVOIR_K = 100


def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k WEIGHTED sample without replacement via the
    Efraimidis–Spirakis order statistic (2006): each doc draws the
    key −ln(u)/w (u = the md5 hash coin, w = quality score) and the
    k SMALLEST keys win — inclusion probability ∝ weight, one pass,
    no replacement, and (unlike sequential reservoir algorithms)
    fully order-independent, so the same k docs come out of any
    partitioning or engine. This is the exactly-k twin of
    `sample_quality_weighted`'s Bernoulli pass (that one's output
    size drifts with the score distribution; a training-mix builder
    usually needs k exact).

    Engine-exact: u derives from an exact 60-bit integer (+1 so
    u ∈ (0,1] — ln(0) guard); ln(u) is pre-rounded 6dp (JVM vs libm
    1-ulp drift), the division of two exact-input doubles is
    correctly rounded, and the (key, doc_id) order is total.
    Zero-weight docs are excluded up front (their key is +inf —
    never sampled, but an engine-dependent inf/nan ordering is not
    worth trusting).

    Scale shape: narrow map + TakeOrderedAndProject — per-partition
    k-heaps, driver merges p·k rows; no global sort, no shuffle."""
    from dbt_eamples_spark.operators.text import _quality_frame

    q = _quality_frame(load_table(spark, sf_dir, "documents"))
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(float(1 << 60))
    key = -F.round(F.log(u), 6) / F.col("quality_score")
    return (
        q.filter(F.col("quality_score") > 0)
        .select(
            "doc_id",
            "quality_score",
            F.round(key, 6).alias("es_key"),
        )
        .orderBy(F.asc("es_key"), F.asc("doc_id"))
        .limit(RESERVOIR_K)
    )
