"""Mergeable cardinality sketches (HyperLogLog) as pure JVM column algebra.

The reference counts collection membership by materializing every item and
grouping (stacbuilder/builder.py:733 logs per-10,000-item progress; the
GeodataframeExporter dumps full item sets to disk to inspect them).  At
10^12 images an exact COUNT(DISTINCT) is a full shuffle of the distinct keys;
the catalog statistics a user actually wants ("how many distinct scenes /
captions / perceptual hashes does this collection hold?") tolerate ~1.6%
error, which an HLL sketch with m=4096 registers delivers from a
constant-size, algebraically mergeable state.

Design (100 TB shape):
- registers are a ``(group_keys..., bucket, register)`` table of at most
  ``m`` rows per group — ``groupBy().max()`` computes them with map-side
  partial aggregation, so the shuffle carries at most ``m`` rows per group
  per input partition, never the raw keys;
- merge across groups IS ``max()`` again (register-wise), so rollups
  (tile -> collection -> catalog) and incremental maintenance (new batch ->
  max-merge with stored registers) are one aggregate each, exactly like the
  algebraic extent merges in ``operators.grouping.incremental_extents``;
- the hash is murmur3's ``fmix32`` finalizer over the two 32-bit halves of
  the key, cross-coupled — exact integer arithmetic both engines replay
  bit-for-bit (tests/test_parity_rowsonly.py): XOR/shift are native int64
  ops, and the 32-bit wraparound multiplies split the constant at 16 bits so
  every product stays < 2^49 (ANSI-safe).  An affine hash mod 2^31-1 was
  measured first and left +/-6% lattice bias in the bucket occupancy of the
  structured phash keys; fmix32 sits at the Poisson expectation;
- rho (leading-zero rank of the 32-bit ``a`` lane) comes from
  ``length(bin(a))`` — both engines print minimal binary strings, so the
  count is exact, never ``log2`` floating-point;
- the harmonic estimate divides a Python-literal constant by an exactly
  computed int64 (register sum pre-scaled by 2^33 so every term is an
  integer; the total is <= 4096 * 2^33 = 2^45), one IEEE double division
  both engines round identically.

The estimator is Flajolet et al.'s HLL (AoFA 2007): harmonic mean of
register loads with the small-range linear-counting correction.  The two
``ln()``-bearing output columns are the only place cross-engine bit-equality
is not guaranteed (libm may differ by 1 ulp); the parity test compares them
at +/-1 after the e3 floor and everything else exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P_BITS = 12
M_REG = 1 << P_BITS  # 4096 registers -> ~1.04/sqrt(m) = 1.6% std error
RHO_MAX = 33  # leading-zero rank of a 32-bit lane, +1, w=0 -> 33
SCALE_BITS = RHO_MAX  # sum(2^(SCALE_BITS - reg)) stays integral for reg >= 1
ALPHA = 0.7213 / (1.0 + 1.079 / M_REG)  # alpha_m for m >= 128
# harmonic numerator: alpha * m^2 * 2^SCALE_BITS, one Python double literal
# shared with the DuckDB oracle so both engines divide the same constant
HARMONIC_NUM = ALPHA * M_REG * M_REG * float(1 << SCALE_BITS)
M32 = 1 << 32
FMIX_C1, FMIX_C2 = 0x85EBCA6B, 0xC2B2AE35


def _mul32(x: Column, c: int) -> Column:
    """(x * c) mod 2^32 for 0 <= x < 2^32 without int64 overflow: split the
    constant at 16 bits so both partial products stay below 2^49."""
    cl, ch = c & 0xFFFF, c >> 16
    return F.pmod(x * F.lit(cl) + F.pmod(x * F.lit(ch), F.lit(1 << 16)) * F.lit(1 << 16), F.lit(M32))


def fmix32(x: Column) -> Column:
    """murmur3 32-bit finalizer, exact int64 column arithmetic."""
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = _mul32(x, FMIX_C1)
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = _mul32(x, FMIX_C2)
    return x.bitwiseXOR(F.shiftright(x, 16))


def hll_lanes(key: Column) -> tuple[Column, Column]:
    """Two cross-coupled 32-bit hash lanes of a non-negative int64 key:
    ``a = fmix32(lo)``, ``b = fmix32(hi XOR a)``. The (a, b) pair spans the
    full 64-bit input, so distinct keys collide with probability ~n^2/2^64,
    not n^2/2^32."""
    lo = F.pmod(key, F.lit(M32))
    hi = F.shiftright(key, 32)
    a = fmix32(lo)
    b = fmix32(hi.bitwiseXOR(a))
    return a, b


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """Per-group HLL register table: (group_cols..., bucket, register).

    At most ``M_REG`` rows per group regardless of input size; the
    ``groupBy().max()`` runs with map-side partial aggregation so raw keys
    never shuffle. Output IS the sketch state: store it, union it with a
    later batch's registers and ``hll_merge`` — max() — to maintain counts
    incrementally without rescanning history. ``key_col`` must be a
    non-negative int64 (hash strings upstream first).
    """
    a, b = hll_lanes(F.col(key_col))
    bucket = F.pmod(b, F.lit(M_REG))
    rho = F.when(a == 0, F.lit(RHO_MAX)).otherwise(
        F.lit(RHO_MAX) - F.length(F.bin(a))
    )
    return (
        # NULL keys are excluded, matching COUNT(DISTINCT) semantics — left
        # in, a NULL-register row would inflate n_present while contributing
        # nothing to s_present, silently biasing the estimate upward
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches to a coarser grouping: register-wise max. Algebraic —
    merging (collection, tile) sketches up to collection is EXACTLY the
    sketch that would have been built from the raw rows (max is associative,
    commutative, idempotent), which tests/test_sketches.py asserts."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Emits exact integer sketch state plus the two estimator branches:
    - ``s_scaled``: sum over all m registers of 2^(SCALE_BITS - register)
      (absent registers count as 2^SCALE_BITS), an exact int64 <= 2^45;
    - ``v_zero``: number of empty registers;
    - ``est_harmonic_e3``: floor(1000 * alpha * m^2 * 2^33 / s_scaled);
    - ``est_linear_e3``: floor(1000 * m * ln(m / v_zero)) when v_zero > 0
      (the small-range correction), else NULL;
    - ``est_e3``: the standard selector — linear when v_zero > 0 and the
      harmonic estimate is below 2.5m, else harmonic.
    """
    per_group = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_present"),
        # shiftleft by a COLUMN needs the SQL form (the pyspark wrapper only
        # accepts a literal shift amount)
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({SCALE_BITS} - register as int))")
        ).alias("s_present"),
    )
    s_scaled = (
        F.col("s_present")
        + (F.lit(M_REG) - F.col("n_present")) * F.lit(1 << SCALE_BITS)
    ).alias("s_scaled")
    out = per_group.select(
        *group_cols,
        s_scaled,
        (F.lit(M_REG) - F.col("n_present")).alias("v_zero"),
    )
    harmonic = F.floor(F.lit(1000.0) * F.lit(HARMONIC_NUM) / F.col("s_scaled"))
    linear = F.when(
        F.col("v_zero") > 0,
        F.floor(
            F.lit(1000.0 * M_REG)
            * F.log(F.lit(float(M_REG)) / F.col("v_zero").cast("double"))
        ),
    )
    use_linear = (F.col("v_zero") > 0) & (
        harmonic <= F.lit(int(2.5 * M_REG * 1000))
    )
    return out.select(
        *group_cols,
        "s_scaled",
        "v_zero",
        harmonic.alias("est_harmonic_e3"),
        linear.alias("est_linear_e3"),
        F.when(use_linear, linear).otherwise(harmonic).alias("est_e3"),
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """One-shot estimate: registers -> estimate, single shuffle pair whose
    exchanged rows are bounded by m per group per input partition."""
    return hll_estimate(hll_registers(df, group_cols, key_col), group_cols)


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency statistics (the sum-merge sibling of
# the HLL's max-merge). The reference has no frequency surface at all — it
# logs per-10,000-item progress counts (stacbuilder/builder.py:733) and
# nothing else; the catalogue question "which scenes / perceptual hashes
# recur most, and roughly how often?" needs per-key counts over 10^12 rows,
# where an exact groupBy on the raw key shuffles every distinct key. The CMS
# register table is d x w cells regardless of input size: partial-aggregated
# map-side, summed across batches/partitions/days, and point-queried with a
# guaranteed one-sided error (est >= true; est <= true + eps*N w.h.p. —
# Cormode & Muthukrishnan, J.Alg 2005).
# ---------------------------------------------------------------------------

CMS_D = 4  # lanes (delta = e^-d ~ 1.8%)
CMS_W = 2048  # buckets per lane (eps = e/w ~ 0.13% of total mass)
# lane seeds: arbitrary distinct 32-bit odd constants (golden ratio, murmur3
# finalizer constants, splitmix64 increment low word)
CMS_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x7F4A7C15)


def cms_lane_bucket(key: Column, seed: int, w: int = CMS_W) -> Column:
    """Bucket of a non-negative int64 key in one seeded lane: the fmix32
    cross-coupled pair from the HLL hash, seeded by XOR on the low lane.
    Exact int64 column algebra — replayed bit-for-bit in DuckDB."""
    lo = F.pmod(key, F.lit(M32)).bitwiseXOR(F.lit(seed))
    a = fmix32(lo)
    b = fmix32(F.shiftright(key, 32).bitwiseXOR(a))
    return F.pmod(b, F.lit(w))


def cms_registers(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group CMS register table: (group_cols..., lane, bucket, cnt).

    At most ``CMS_D * CMS_W`` rows per group regardless of input size; the
    lane expansion is a JVM inline explode (no shuffle) and the
    ``groupBy().sum()`` partial-aggregates map-side, so the exchange carries
    register cells, never raw keys. NULL keys are excluded (GROUP BY
    semantics). ``weight_col`` counts each row with an int64 weight
    (e.g. byte sizes) instead of 1.
    """
    wcol = F.col(weight_col) if weight_col else F.lit(1).cast("bigint")
    lanes = F.array(
        *[
            F.struct(
                F.lit(i).alias("lane"),
                cms_lane_bucket(F.col(key_col), CMS_SEEDS[i]).alias("bucket"),
            )
            for i in range(CMS_D)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, F.explode(lanes).alias("lb"), wcol.alias("wt"))
        .groupBy(*group_cols, F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches (across batches or to a coarser grouping): cell-wise
    sum. Algebraic — identical to the sketch built from the concatenated
    input (sum is associative/commutative), asserted in tests. NOT
    idempotent (unlike the HLL max-merge): exactly-once delivery matters,
    which the SnapshotStore epoch lineage provides on the streaming path."""
    return registers.groupBy(*group_cols, "lane", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    registers: DataFrame,
    keys: DataFrame,
    group_cols: list[str],
    key_col: str,
) -> DataFrame:
    """Point-query estimates: min over the ``CMS_D`` lane cells of each key.

    ``keys`` is a (group_cols..., key_col) frame — candidate keys are always
    dimension-sized (a sample, a watchlist, yesterday's heavy hitters), so
    the join is keys x (d cells each) against a register table bounded by
    d*w rows per group; AQE picks the strategy. A key hitting an absent cell
    estimates 0 (left join + coalesce) — correct: absent cell means no mass
    landed there."""
    expanded = keys.select(
        *group_cols,
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("lane"),
                        cms_lane_bucket(F.col(key_col), CMS_SEEDS[i]).alias("bucket"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("lb"),
    ).select(*group_cols, key_col, "lb.lane", "lb.bucket")
    j = expanded.join(registers, [*group_cols, "lane", "bucket"], "left")
    return j.groupBy(*group_cols, key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias("est_cnt")
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch: mergeable distribution statistics. Completes
# the algebraic-state family (extents: min/max, HLL: distinct, CMS:
# frequency) with quantiles: the register table is at most n_bins rows per
# group, sum-mergeable across batches/epochs, and any quantile is answered
# read-side with error bounded by ONE BIN WIDTH — deterministic, not
# probabilistic. An exact distributed quantile (sort or quantile_cont) is a
# full shuffle of the value column at 10^12 rows; percentile_approx is
# neither mergeable-as-a-table nor engine-replayable. All arithmetic is
# int64 (ceil-rank selection, integer bin edges), so DuckDB replays the
# whole chain value-exactly.
# ---------------------------------------------------------------------------


def hist_registers(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """Per-group histogram register table: (group_cols..., bin, cnt).

    ``val_col`` must be integer-valued; values are clamped into [lo, hi)
    BEFORE binning (out-of-range mass lands in the edge bins, the standard
    saturating histogram), which also keeps the bin arithmetic on
    non-negative operands where Spark ``div`` == DuckDB ``//``. NULLs are
    excluded. Caller bound: ``(hi - lo) * n_bins < 2^63``.
    """
    if hi <= lo or n_bins <= 0:
        raise ValueError(f"need hi > lo and n_bins > 0, got [{lo}, {hi}) x {n_bins}")
    return (
        df.where(F.col(val_col).isNotNull())
        .select(
            *group_cols,
            F.expr(
                f"(least(greatest(cast({val_col} as bigint), {lo}), {hi - 1})"
                f" - {lo}) * {n_bins} div {hi - lo}"
            ).alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histograms (across batches or to a coarser grouping):
    bin-wise sum — algebraic, identical to the histogram of the
    concatenated input."""
    return registers.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    registers: DataFrame,
    group_cols: list[str],
    qs_e6: list[int],
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """Quantile brackets from a register table.

    For each group and each requested quantile ``q_e6`` (parts-per-million),
    selects the first bin whose cumulative count reaches the ceil-rank
    ``max(1, ceil(n * q_e6 / 1e6))`` — the standard lower-quantile
    definition, so the TRUE q-quantile of the underlying values lies inside
    the returned ``[bin_lo, bin_hi)`` bracket (tests pin this against
    numpy on the raw data). Output: group_cols..., q_e6, n, bin, bin_lo,
    bin_hi. The cumulative window runs over at most ``n_bins`` rows per
    group — dimension-sized, reusing the registers' own partitioning.
    """
    from pyspark.sql import Window

    qs = sorted(set(int(q) for q in qs_e6))
    if not qs or qs[0] < 0 or qs[-1] > 1_000_000:
        raise ValueError(f"qs_e6 must be within [0, 1e6], got {qs_e6}")
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = registers.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*[F.col(c) for c in group_cols]).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qdf = registers.sparkSession.createDataFrame(
        [(q,) for q in qs], "q_e6 bigint"
    )
    target = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr("(n * q_e6 + 999999) div 1000000"),
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("cum") >= target)
        .groupBy(*group_cols, "q_e6", "n")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        *group_cols,
        "q_e6",
        "n",
        "bin",
        F.expr(f"{lo} + (bin * {hi - lo}) div {n_bins}").alias("bin_lo"),
        F.expr(f"{lo} + ((bin + 1) * {hi - lo}) div {n_bins}").alias("bin_hi"),
    )
