"""Mergeable sketches for frontier telemetry: HyperLogLog cardinality,
count-min frequency, rendezvous (HRW) shard assignment.

Why a crawl engine needs these at 10^10-URL scale: the scheduler keeps
running per-host tallies (distinct URLs discovered per host, fetch-traffic
heavy hitters to drive salting width, a stable host→worker mapping so
politeness state never migrates on cluster resize). Exact per-host
`count(distinct url)` over the whole frontier is a full shuffle of every
URL; the sketches below reduce each question to a FIXED-size state that
map-side combines — the shuffle carries registers/cells (KiB), not keys.

Reference anchor: the reference tracks exact seen-sets in SQLite
(db/migrator visibility is total at its single-node scale); sketching is
the north rule's scale extension, so semantics are pinned by DuckDB
oracles replaying the identical integer program (`hll_distinct`,
`cms_hot_hosts`, `hrw_shards` in queries.py).

Determinism discipline (the lm_score micro-nat lesson): every shuffled or
aggregated quantity is an INTEGER. The portable hash is
:func:`sampling.selector` (golden-ratio LCG over p = 2^31−1, intermediates
< 2^62 so ANSI-safe); register ranks come from `length(bin(x))` (identical
in Spark and DuckDB); the only float op is ONE final division per group —
never a float sum whose order the engine picks. Production callers with
string keys hash through xxhash64 first (`portable=False` keeps the same
plan shape); the LCG path exists so the oracle can replay bit-for-bit.

- HyperLogLog: Flajolet/Fuchs/Gandouet/Meunier 2007 (the m·α_m·harmonic
  estimator); stochastic averaging over m = 2^b registers.
- Count-min: Cormode/Muthukrishnan 2005 (est ≥ true; ≤ true + εN w.p.
  1−δ, ε = e/w, δ = e^−d).
- Rendezvous hashing: Thaler/Ravishankar 1998 — highest-random-weight
  argmax gives minimal disruption on resize (only moves keys TO a new
  shard, ~1/(W+1) of them).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from starchart_spark.operators.sampling import P31, selector

HASH_BITS = 31  # selector() output is uniform over [0, 2^31 - 1)


def _hash31(key_col: str, salt: int, portable: bool) -> Column:
    """31-bit row hash: quadratic-mixed LCG (portable mode, integer keys)
    or xxhash64 folded to 31 bits (production mode, any key type).

    HLL reads the hash's BITS (bucket = low bits, ρ = leading zeros of the
    rest), so the affine :func:`sampling.selector` alone is not enough —
    its bucket/rest bit planes are correlated over sequential keys and ρ
    drifts off geometric (caught by test_hll_accuracy: +70% bias). The
    squaring step breaks the affine structure; see :func:`_salted_hash`.
    """
    if portable:
        from starchart_spark.operators.sampling import _A, _SALT_STEP

        x = F.pmod(F.col(key_col) + F.lit(salt * _SALT_STEP), F.lit(P31))
        return F.pmod(F.pmod(x * x, F.lit(P31)) * F.lit(_A) + x, F.lit(P31))
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(P31))


# --------------------------------------------------------------------------
# HyperLogLog


def hll_alpha(m: int) -> float:
    """Bias-correction constant α_m (HLL paper, m ≥ 128 closed form)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    b: int = 12,
    portable: bool = False,
    salt: int = 0,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., bucket, rho).

    bucket = h mod m indexes the register; rho = leading-zero rank of the
    remaining ``HASH_BITS − b`` bits + 1, via ``length(bin(rest))`` — an
    exact integer both engines agree on (no float log2 whose boundary
    rounding could differ). The groupBy max is Spark's cheapest aggregate:
    map-side partial max means the exchange carries ≤ m rows per group per
    task regardless of input size — THE reason this beats exact distinct
    at 10^10 URLs.
    """
    m = 1 << b
    rest_bits = HASH_BITS - b
    h = _hash31(key_col, salt, portable)
    keyed = df.select(
        *group_cols,
        F.pmod(h, F.lit(m)).alias("bucket"),
        # h div m, expressed as subtract-low-bits-then-exact-divide so the
        # identical spelling runs in DuckDB (whose // differs on negatives;
        # h ≥ 0 here, but keep one canonical form)
        ((h - F.pmod(h, F.lit(m))) / F.lit(m)).cast("long").alias("__rest"),
    )
    rho = F.when(F.col("__rest") == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(F.col("__rest")))
    )
    regs = keyed.withColumn("rho", rho.cast("int")).drop("__rest")
    return regs.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_sum(
    registers: DataFrame, group_cols: Sequence[str] = (), b: int = 12
) -> DataFrame:
    """Fold registers to the per-group integer harmonic core:
    (group_cols..., present, s_int) with

        s_int = Σ_present 2^(RMAX − ρ_j) + (m − present)·2^RMAX,
        RMAX = HASH_BITS − b + 1

    — the HLL denominator Σ 2^(−M_j) scaled by 2^RMAX so it is an EXACT
    long (≤ m·2^RMAX ≤ 2^32 at b=12): distributed summation order cannot
    perturb it. `shiftleft` is plain long arithmetic in both engines.
    """
    m = 1 << b
    rmax = HASH_BITS - b + 1
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("present"),
            # 2^(RMAX − ρ) as a right shift of the constant (the Python
            # shiftleft API takes only literal bit counts)
            F.sum(
                F.expr(f"shiftright(CAST({1 << rmax} AS BIGINT), rho)")
            ).alias("__s_present"),
        )
        .select(
            *group_cols,
            F.col("present").cast("long").alias("present"),
            (
                F.col("__s_present")
                + (F.lit(m) - F.col("present")) * F.lit(1 << rmax)
            ).alias("s_int"),
        )
    )


def hll_estimate(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    b: int = 12,
    portable: bool = False,
    salt: int = 0,
) -> DataFrame:
    """Per-group distinct estimate: (group_cols..., est double).

    Raw estimator α_m·m²·2^RMAX / s_int (ONE float division over two
    exact integers); small-range linear-counting correction
    m·ln(m / zeros) when E ≤ 2.5m and zeros > 0 (the paper's switch).
    Relative error ≈ 1.04/√m (±1.6% at b=12). The `ln` lives only here —
    the driver-gated query emits the integer core + raw estimate instead,
    so oracle hashing never depends on libm rounding.
    """
    return hll_estimate_from_registers(
        hll_registers(df, key_col, group_cols, b, portable, salt), group_cols, b
    )


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: Sequence[str] = (), b: int = 12
) -> DataFrame:
    """Estimate from an existing (possibly max-folded) register table —
    the read side of an incrementally maintained register log (the engine's
    ``host_hll`` ledger appends per-batch registers; fold with a
    groupBy max first if the input has several rows per bucket)."""
    m = 1 << b
    rmax = HASH_BITS - b + 1
    alpha = hll_alpha(m)
    s = hll_sum(registers, group_cols, b)
    raw = F.lit(alpha * m * m * float(1 << rmax)) / F.col("s_int").cast("double")
    zeros = F.lit(m) - F.col("present")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return s.select(*group_cols, corrected.alias("est"))


# --------------------------------------------------------------------------
# Count-min sketch


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 8192,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Count-min sketch as a (row, cell, cnt) table, d·w cells total.

    One explode of a d-literal array (map-side combine collapses the d×
    blow-up to ≤ d·w rows per task before the exchange), one groupBy —
    the sketch is FIXED size however large the input: at 10^10 URLs the
    shuffle moves d·w ≈ 32k longs. ``weight_col``: count that column's
    integer sum instead of row occurrences (e.g. bytes fetched per host).
    """
    rows = F.array(*[F.lit(i) for i in range(d)])
    wexpr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    cells = df.select(
        F.explode(rows).alias("row"), F.col(key_col).alias("__k"), wexpr.alias("__w")
    ).select(
        "row",
        F.pmod(_salted_hash("__k", "row", portable), F.lit(w)).alias("cell"),
        "__w",
    )
    return cells.groupBy("row", "cell").agg(F.sum("__w").alias("cnt"))


def _salted_hash(key_col: str, salt_col: str, portable: bool) -> Column:
    """Column-salted hash with a QUADRATIC mixing step:

        x = (key + salt·C) mod p ;   h = (x² mod p)·A + x  mod p

    A purely affine salted LCG — ``((key + salt·C)·A + B) mod p`` — is
    linear in the salt: the d draws are SHIFTS of one hash (two keys
    colliding in one CMS row collide in all d; HRW winner probabilities
    become the gap lengths of a fixed arithmetic progression instead of
    1/n — caught by test_hrw_balance). Squaring makes the per-salt offset
    key-dependent (a quadratic permutation polynomial mod p); x < 2^31 so
    x² < 2^62 stays ANSI-safe, and the identical arithmetic runs in
    DuckDB. Uniformity/independence are asserted empirically (CMS bound,
    HRW balance + disruption tests)."""
    if portable:
        from starchart_spark.operators.sampling import _A, _SALT_STEP

        x = F.pmod(
            F.col(key_col) + F.col(salt_col) * F.lit(_SALT_STEP), F.lit(P31)
        )
        return F.pmod(F.pmod(x * x, F.lit(P31)) * F.lit(_A) + x, F.lit(P31))
    return F.pmod(F.xxhash64(F.col(key_col), F.col(salt_col)), F.lit(P31))


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 8192,
    portable: bool = False,
    out_col: str = "est",
) -> DataFrame:
    """Point-estimate each key: min over the d cells it hashes to.

    The sketch is ≤ d·w rows — ALWAYS broadcast (that fixed bound is the
    point of the sketch); absent cells read 0. Output: keys' columns +
    ``out_col`` (bigint, ≥ the true count by construction).
    """
    rows = F.array(*[F.lit(i) for i in range(d)])
    probes = keys.select(
        F.col(key_col).alias("__k"), F.explode(rows).alias("row")
    ).select("__k", "row", F.pmod(_salted_hash("__k", "row", portable), F.lit(w)).alias("cell"))
    est = (
        probes.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
    return keys.join(est, keys[key_col] == est["__k"]).drop("__k")


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    candidates: DataFrame | None = None,
    d: int = 4,
    w: int = 8192,
    portable: bool = False,
) -> DataFrame:
    """Keys whose estimated frequency ≥ threshold: (key, est).

    ``candidates`` bounds the probe set (e.g. the host dim the scheduler
    already materializes); default probes the distinct keys — fine when
    the key domain is the O(hosts) dim, NOT for raw-URL domains (pass an
    explicit candidate dim there). One-sided guarantee: no true heavy
    hitter is missed (est ≥ true); false positives ≤ εN overshoot.
    """
    sketch = cms_build(df, key_col, d, w, portable=portable)
    if candidates is None:
        candidates = df.select(key_col).distinct()
    looked = cms_lookup(sketch, candidates, key_col, d, w, portable)
    return looked.filter(F.col("est") >= F.lit(threshold))


# --------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment


def hrw_assign(
    hosts: DataFrame,
    n_shards: int,
    key_col: str = "host_key",
    portable: bool = False,
    out_col: str = "shard",
) -> DataFrame:
    """Stable host→shard map: shard = argmax_s hash(host, s).

    Why not ``pmod(hash, n)``: modulo remaps ~(n−1)/n of all hosts when n
    changes — every politeness token bucket, robots cache and rate state
    migrates. HRW moves only ~1/(n+1) of hosts, all TO the new shard
    (property asserted in tests). Plan: broadcast cross join against an
    n-row literal shard dim, then ONE max aggregate over the encoded key
    ``score·n + (n−1−shard)`` — exact long (score < 2^31, n ≤ 2^20), ties
    impossible by construction, decode is integer arithmetic. No window,
    no sort: map-side max makes the exchange O(distinct hosts).
    """
    spark = hosts.sparkSession
    shards = spark.range(n_shards).select(F.col("id").cast("int").alias("__s"))
    enc = (
        hosts.crossJoin(F.broadcast(shards))
        .select(
            *hosts.columns,
            (
                _salted_hash(key_col, "__s", portable) * F.lit(n_shards)
                + (F.lit(n_shards - 1) - F.col("__s"))
            ).alias("__enc"),
        )
        .groupBy(*hosts.columns)
        .agg(F.max("__enc").alias("__enc"))
    )
    return enc.select(
        *hosts.columns,
        (F.lit(n_shards - 1) - F.pmod(F.col("__enc"), F.lit(n_shards)))
        .cast("int")
        .alias(out_col),
    )





# --------------------------------------------------------------------------
# Log2 histogram (mergeable quantile telemetry)


def log2_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Mergeable per-group latency/size histogram with power-of-two
    buckets: (group_cols..., hbucket, cnt) where

        hbucket = 0 for v ≤ 0, else bit-length(v) = floor(log2 v) + 1

    via ``length(bin(v))`` — the same exact-integer rank primitive the HLL
    registers use, identical in DuckDB. Fixed size (≤ 64 buckets per
    group), merges by summing counts, and any quantile of the original
    distribution is answered to within the bucket's 2× value bound —
    the standard log-histogram guarantee (HdrHistogram's coarsest tier).
    Per-host fetch-latency telemetry at 10^10 fetches shuffles ≤ 64 longs
    per host, not samples.
    """
    v = F.col(value_col).cast("long")
    hb = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v))).cast("int")
    return (
        df.select(*group_cols, hb.alias("hbucket"))
        .groupBy(*group_cols, "hbucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantile(
    hist: DataFrame,
    q_permille: int,
    group_cols: Sequence[str] = (),
    out_col: str = "q_upper",
) -> DataFrame:
    """Per-group quantile estimate from a :func:`log2_histogram`:
    the UPPER bound (2^hbucket − 1) of the first bucket whose running
    count reaches ceil(q·N) — true quantile ∈ (upper/2, upper], the 2×
    bound. ``q_permille`` keeps the rank threshold integer (999 = p99.9):
    rank = (N·q + 999) div 1000 — no float comparisons anywhere, so the
    estimate is a pure integer function of the histogram on any engine.

    Shape: one window cumsum over ≤ 64 rows per group + one min aggregate
    — the window partition is a GROUP's histogram, never row-scale data
    (contrast percentile_approx, which shuffles samples).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("hbucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = hist.groupBy(*group_cols).agg(F.sum("cnt").alias("__n"))
    cumd = hist.withColumn("__cum", F.sum("cnt").over(w))
    # ungrouped: the total is a 1-row scalar — broadcast cross join (an
    # empty-key equi-join is not a join)
    cum = (
        cumd.join(tot, list(group_cols))
        if group_cols
        else cumd.crossJoin(F.broadcast(tot))
    )
    rank = F.expr(f"(__n * {q_permille} + 999) div 1000")
    hit = cum.filter(F.col("__cum") >= rank)
    return hit.groupBy(*group_cols).agg(
        (
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(min(hbucket) AS INT))")
            - F.lit(1)
        ).alias(out_col)
    )


# --------------------------------------------------------------------------
# Theta / bottom-k distinct sketch — the set-ALGEBRA sketch
#
# HLL answers |A| but cannot answer |A ∩ B|: its registers carry no key
# sample. The theta sketch (Dasgupta/Lang/Rhodes/Thaler, "Data Sketching
# with Theta", systems form of the KMV/bottom-k estimator) keeps the k
# smallest hash values — a uniform SAMPLE of the key space below a
# threshold theta — so union, intersection and difference of URL-seen
# ledgers (URLs seen by BOTH forge shards, URLs new to this epoch vs the
# last, overlap between two hosts' outlink sets) all reduce to set ops on
# tiny samples. The reference's single-node SQLite seen-set answers these
# with exact joins; at 10^10 URLs per ledger the sketch answers them from
# ~KiB of state.
#
# Scale/determinism shape (same discipline as the HLL section): the
# distributed stage is a BUCKETED min — groupBy(group, h mod B) min(h) —
# whose map-side combine bounds the exchange to ≤ B longs per group per
# task regardless of input size, and which MERGES exactly (min of mins).
# The k-smallest selection runs at estimate time over ≤ B register rows
# per group, never over raw keys. This "min per bucket first" form is the
# one-permutation-hashing variant of bottom-k: a handful of the true k
# smallest values can be masked by a smaller same-bucket value (expected
# masked ≈ k²/2B; ~0.8% at the k=256/B=16384 defaults — inside the
# estimator's own 1/√k ≈ 6% noise, asserted empirically in
# tests/test_sketch.py). Every shuffled quantity is an integer; the one
# float division per group happens after aggregation.


THETA_K = 256
THETA_BUCKETS = 16384


def theta_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    buckets: int = THETA_BUCKETS,
    portable: bool = False,
    salt: int = 0,
) -> DataFrame:
    """Per-group register table (group_cols..., bucket, minh): the minimum
    31-bit key hash per hash-bucket. Fixed size (≤ ``buckets`` rows per
    group), map-side combinable (min), and exactly mergeable — the
    registers of A ∪ B are elementwise min(regs(A), regs(B)), asserted
    bit-equal in tests. All set operations below consume this table."""
    h = _hash31(key_col, salt, portable)
    keyed = df.select(
        *group_cols,
        F.pmod(h, F.lit(buckets)).alias("bucket"),
        h.alias("minh"),
    )
    return keyed.groupBy(*group_cols, "bucket").agg(F.min("minh").alias("minh"))


def theta_merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Union of two sketches = min per (group, bucket) — the register
    table of the UNION stream, exactly (min is associative/commutative/
    idempotent, so merge order and partitioning are irrelevant)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.min("minh").alias("minh"))
    )


def _theta_sample(
    regs: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """k smallest DISTINCT register values per group, ranked. Distinct
    because KMV's order statistics are over the set of hash VALUES (two
    buckets can hold equal minh only via a 31-bit collision of distinct
    keys; deduping is the replayable choice). The window partition is a
    group's register table (≤ buckets rows), never raw keys."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("minh") if group_cols else Window.orderBy("minh")
    vals = regs.select(*group_cols, "minh").distinct()
    return vals.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def _theta_stats(
    regs: DataFrame, group_cols: Sequence[str], k: int, prefix: str = ""
) -> DataFrame:
    """(group..., {prefix}n_kept, {prefix}theta): theta = k-th smallest
    register value, or P31 (exhaustive: every distinct hash is in the
    sample) when fewer than k registers exist."""
    s = _theta_sample(regs, group_cols, k)
    return s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(f"{prefix}n_kept"),
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("minh"))), F.lit(P31)
        ).alias(f"{prefix}theta"),
    )


def theta_estimate(
    regs: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = THETA_K,
) -> DataFrame:
    """Per-group distinct estimate from a register table:
    (group_cols..., n_kept, theta, est).

    Full sketch (theta < P31): est = (k−1)·P31 / theta — the unbiased KMV
    estimator (k-th order statistic of n uniforms on [0,P31) sits at
    ≈ k·P31/n). Exhaustive sketch (theta = P31): est = n_kept exactly.
    n_kept and theta are exact integers; est is the single float division.
    """
    st = _theta_stats(regs, group_cols, k)
    exhaustive = F.col("theta") == F.lit(P31)
    est = F.when(exhaustive, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(P31)) / F.col("theta").cast("double")
    )
    return st.select(*group_cols, "n_kept", "theta", est.alias("est"))


def _join_groups(a: DataFrame, b: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    if group_cols:
        return a.join(b, list(group_cols))
    return a.crossJoin(F.broadcast(b))


def theta_intersect(
    regs_a: DataFrame,
    regs_b: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = THETA_K,
) -> DataFrame:
    """Intersection estimate |A ∩ B| per group from two register tables
    built with the SAME (buckets, salt, portable):
    (group_cols..., matches, theta, est_inter).

    Standard theta-sketch intersection: common theta = min(theta_A,
    theta_B); matches = |{h ∈ sample_A ∩ sample_B : h < theta}| (strict —
    a full sketch's k-th value is its threshold, not a sample member);
    est = matches · P31 / theta. When BOTH sketches are exhaustive
    (theta = P31) every common hash is retained and est = matches exactly
    — the small-scale regime the driver oracle pins, while the pytest
    accuracy test covers the sampled regime.
    """
    sa = _theta_sample(regs_a, group_cols, k).withColumnRenamed("rn", "__rn_a")
    sb = _theta_sample(regs_b, group_cols, k).select(*group_cols, "minh")
    ta = _theta_stats(regs_a, group_cols, k, prefix="a_")
    tb = _theta_stats(regs_b, group_cols, k, prefix="b_")
    th = _join_groups(ta, tb, group_cols).select(
        *group_cols,
        F.least(F.col("a_theta"), F.col("b_theta")).alias("theta"),
    )
    common = sa.join(sb, [*group_cols, "minh"]).select(*group_cols, "minh")
    kept = _join_groups(common, th, group_cols).filter(
        (F.col("minh") < F.col("theta")) | (F.col("theta") == F.lit(P31))
    )
    # groups where the samples share nothing still need a 0-row: left join
    # back onto the theta dim (grouped), or a global agg — which always
    # yields exactly one row, even over empty input — cross-joined
    # (ungrouped). No driver action either way.
    if group_cols:
        counted = kept.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("matches")
        )
        out = th.join(counted, list(group_cols), "left")
    else:
        counted = kept.agg(F.count(F.lit(1)).alias("matches"))
        out = th.crossJoin(F.broadcast(counted))
    matches = F.coalesce(F.col("matches"), F.lit(0)).cast("long")
    est = F.when(F.col("theta") == F.lit(P31), matches.cast("double")).otherwise(
        matches.cast("double") * F.lit(float(P31)) / F.col("theta").cast("double")
    )
    return out.select(
        *group_cols, matches.alias("matches"), "theta", est.alias("est_inter")
    )


def theta_difference(
    regs_a: DataFrame,
    regs_b: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = THETA_K,
) -> DataFrame:
    """|A \\ B| estimate per group: est(A) − est(A ∩ B), floored at 0 —
    the epoch-delta question ("URLs seen this crawl cycle but not last")
    answered from two KiB-scale ledgers instead of a full anti-join."""
    ea = theta_estimate(regs_a, group_cols, k).select(
        *group_cols, F.col("est").alias("__est_a")
    )
    ei = theta_intersect(regs_a, regs_b, group_cols, k).select(
        *group_cols, F.col("est_inter").alias("__est_i")
    )
    joined = _join_groups(ea, ei, group_cols)
    return joined.select(
        *group_cols,
        F.greatest(
            F.col("__est_a") - F.col("__est_i"), F.lit(0.0)
        ).alias("est_diff"),
    )
