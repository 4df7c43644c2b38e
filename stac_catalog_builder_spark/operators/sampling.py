"""Deterministic sampling / splitting / mixing for training-data pipelines.

Every operator here is HASH-based, not RNG-based, which is the property a
10^12-row training pipeline actually needs:

- **reproducible**: the assignment of a row depends only on its key (plus an
  explicit salt), never on partitioning, task retries, or Spark's
  per-partition RNG seeds (``DataFrame.sample`` draws a different sample
  after a repartition or a speculative re-execution — unusable for
  train/test hygiene);
- **resumable**: re-running an incremental ingest assigns new rows to the
  same splits without re-reading old ones;
- **shuffle-free**: split/sample/mixture are pure map-side filters — zero
  exchanges at any scale, fully codegen'd (no UDFs).

The hash is a murmur-style finalizer over pure int64 arithmetic in a 2^31
bucket space — fold the key to 31 bits, ``b = ((k + salt) * scramble) mod
2^31``, then an xor-shift + multiply diffusion step — engine-independent
(the same expression is replayed in DuckDB by the tests). The 31-bit space
and 31-bit odd constants keep every product < 2^62, so Spark's ANSI mode
cannot overflow. The xor-shift steps matter: an affine-only scramble maps a
salt change to a CONSTANT bucket offset, so two salts would produce almost
identical splits. String keys are first folded to int64 via ``xxhash64``
(Spark-side only; tests pin determinism, not cross-engine parity, for
string keys).

Reference parity: the reference has no sampling surface (its pipeline is
exhaustive per-file ETL); this extends the engine's training-data-pipeline
operators (SURVEY.md §2's beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCRAMBLE = 1640531527  # |-2^32/phi| as a 31-bit odd constant
_MIX = 2146121005  # 0x7FEB352D, hash-prospector 31-bit mix constant
_MOD = 2**31


def _bucket(key_col: Column, salt: int) -> Column:
    """Deterministic uniform bucket in [0, 2^31) from an integer (or
    integer-castable) key. String keys fold through xxhash64 first.

    ``salt`` is folded to the 2^31 bucket space first (identity for
    0 <= salt < 2^31): the headroom bound is ``(k + salt) * _SCRAMBLE``
    < 2^63, and with k < 2^31 that only holds for salts below ~3.4e9 —
    larger salts would hit Spark's ANSI overflow error mid-query."""
    # try_cast, not cast: ANSI mode (Spark 4 default) ERRORS on a
    # non-numeric string instead of returning NULL
    k = F.coalesce(key_col.try_cast("bigint"), F.xxhash64(key_col))
    k = F.pmod(F.shiftright(k, 31).bitwiseXOR(k), F.lit(_MOD))
    b = F.pmod((k + F.lit(int(salt) % _MOD)) * F.lit(_SCRAMBLE), F.lit(_MOD))
    b = F.pmod(b.bitwiseXOR(F.shiftright(b, 16)) * F.lit(_MIX), F.lit(_MOD))
    return b.bitwiseXOR(F.shiftright(b, 13))


def dataset_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default) by
    hashing its key — one withColumn, no shuffle, stable across runs,
    retries, and repartitioning. ``weights`` need not sum to 1 (they are
    normalized); boundaries are exact integer thresholds on the 2^31 bucket
    space so the expression is engine-independent."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights:
        raise ValueError("weights must be non-empty")
    bad = {n: w for n, w in weights.items() if not float(w) > 0.0}
    if bad:
        # a zero/negative weight would silently produce a duplicate or
        # decreasing threshold — an empty split plus misallocated mass
        raise ValueError(f"split weights must be > 0: {bad}")
    total = float(sum(weights.values()))
    b = _bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        thresh = int(acc * _MOD)
        cond = b < F.lit(thresh)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    key_col: str = "doc_id",
    group_col: str = "group_id",
    weights: dict[str, float] | None = None,
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Group-aware deterministic split: every member of a duplicate GROUP
    lands in the SAME split, because the hash key is the group id, not the
    row key. Splitting rows independently leaks near-duplicates across
    train/test — exactly the contamination the dedup pipeline exists to
    prevent (``graph.dedup_groups``'s ``group_id`` output is this input).
    Rows absent from ``groups`` fall back to their own key (singleton
    semantics, consistent with dedup_groups labeling every doc).

    One equi-join on the key — inherent, the label must attach — then the
    same shuffle-free integer-threshold expression as ``dataset_split``.
    Output: df columns + ``group_col`` (NULL for ungrouped rows) +
    ``out_col``.
    """
    if group_col in df.columns:
        raise ValueError(f"df already has a '{group_col}' column")
    labeled = df.join(
        groups.select(key_col, group_col).dropDuplicates([key_col]),
        key_col,
        "left",
    )
    keyed = labeled.withColumn(
        "_split_key", F.coalesce(F.col(group_col), F.col(key_col))
    )
    return dataset_split(
        keyed, key_col="_split_key", weights=weights, salt=salt, out_col=out_col
    ).drop("_split_key")


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str | None = None,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key bucket
    falls under ``fraction * 2^31`` for its stratum. A plain map-side filter
    — no shuffle, no RNG; the same keys survive every run. ``fractions`` is
    either one float (uniform) or a per-stratum-value dict (rows of strata
    values absent from the dict are dropped)."""
    b = _bucket(F.col(key_col), salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("strata_col required with per-stratum fractions")
        expr = None
        for value, frac in fractions.items():
            cond = (F.col(strata_col) == F.lit(value)) & (
                b < F.lit(int(float(frac) * _MOD))
            )
            expr = cond if expr is None else expr | cond
        return df.where(expr)
    return df.where(b < F.lit(int(float(fractions) * _MOD)))


def group_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str = "doc_id",
    k: int = 10,
    salt: int = 0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, chosen uniformly and
    deterministically: rank each group's rows by the key scramble and keep
    the first ``k``. This is the distributed, reproducible replacement for
    per-group reservoir sampling — eval-set construction ("5000 images per
    collection"), per-domain inspection samples, few-shot pools — where
    ``stratified_sample``'s rate-based filter cannot promise an exact count
    and an RNG reservoir changes membership on every retry.

    Properties the hash ordering buys for free:

    - **prefix-nested**: the k-sample is a prefix of the (k+m)-sample for
      the same salt, so growing a quota never discards already-selected
      (and possibly already-labelled) rows;
    - **stable**: membership and ranks depend only on (key, salt), never on
      partitioning or task retries;
    - **per-salt independent**: a new salt draws a fresh sample.

    Scalable shape: the rank-``k`` filter over the window compiles to
    ``WindowGroupLimit`` (plan-asserted in tests), so every map task
    forwards at most ``k`` rows per group BEFORE the exchange — a hot group
    contributes O(k * input partitions) rows to its reducer, never its full
    membership, and no task ever holds a group's whole ranking. One
    shuffle, zero UDFs, exactly SQL-replayable (rank == ROW_NUMBER() OVER
    (PARTITION BY group ORDER BY bucket, key), pinned vs DuckDB).

    Keys are assumed unique per group (the shared contract of every
    sampler here); duplicate keys would tie in the order.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        _bucket(F.col(key_col), salt), F.col(key_col)
    )
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= F.lit(int(k))
    )


def upsample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: int = 0,
    copy_col: str = "copy_n",
) -> DataFrame:
    """Deterministic replication at ``rate`` >= 0: every row yields
    ``floor(rate)`` copies plus one more iff its key bucket falls under the
    fractional part — so expected output is exactly ``rate * n`` with the
    same per-key determinism as the samplers (a key's copy count never
    changes across runs or repartitioning). ``copy_col`` numbers the copies
    (0-based) so downstream shuffles/dedups can distinguish them. Map-side
    explode, no shuffle. This is the rate > 1 counterpart of
    ``weighted_mixture`` (which deliberately caps rates at 1)."""
    if rate < 0:
        raise ValueError(f"rate must be >= 0: {rate}")
    whole = int(rate)
    frac = float(rate) - whole
    n_copies = F.lit(whole) + (
        _bucket(F.col(key_col), salt) < F.lit(int(frac * _MOD))
    ).cast("int")
    # sequence(0, n-1) DESCENDS for n=0 (Spark defaults step to -1), which
    # would fabricate copies for dropped rows — route n=0 through an empty
    # array instead (explode emits nothing for it)
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def weighted_mixture(
    sources: dict[str, DataFrame],
    rates: dict[str, float],
    key_col: str = "doc_id",
    salt: int = 0,
    tag_col: str = "source",
) -> DataFrame:
    """Training-data mixing: sample each source at its rate (deterministic,
    per-key) and union with a source tag — the mixture-weights stage of a
    pretraining pipeline. Each source is filtered map-side; the union is a
    plan-level concatenation (no shuffle), so the whole mixture costs one
    pass over each source at any scale. Rates may exceed done-once
    semantics only in [0, 1] — upsampling (rate > 1) needs replication,
    which is a different operator (and a different storage bill)."""
    missing = set(sources) - set(rates)
    if missing:
        raise ValueError(f"no mixture rate for sources: {sorted(missing)}")
    bad = {s: r for s, r in rates.items() if not (0.0 <= float(r) <= 1.0)}
    if bad:
        raise ValueError(f"mixture rates must be in [0, 1]: {bad}")
    import zlib

    out = None
    for name, src in sources.items():
        # distinct salt per source (crc32, NOT Python's run-randomized
        # hash()): a key present in two sources is an independent draw in
        # each, not a correlated one — and the draw is stable across runs.
        # Full 31-bit crc space (collision odds ~2^-31 per source pair);
        # _bucket folds the sum back into its safe headroom
        part = stratified_sample(
            src,
            float(rates[name]),
            key_col=key_col,
            salt=salt + zlib.crc32(name.encode()) % _MOD,
        ).withColumn(tag_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("sources must be non-empty")
    return out


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str = "doc_id",
    alpha: float = 0.5,
    salt: int = 0,
    rate_col: str = "sample_rate",
) -> DataFrame:
    """Temperature-based domain rebalancing: downsample each domain so the
    kept mass follows ``n_d^alpha`` instead of ``n_d`` — the multilingual /
    multi-source temperature sampling rule (alpha=1 keeps the natural
    distribution, alpha=0 equalizes domains). Per-row keep rate is
    ``r_d = (n_min / n_d)^(1 - alpha)`` with ``n_min`` the smallest domain
    count, so the rarest domain keeps everything and larger domains are
    flattened toward it; rates are derived FROM the data (one aggregate),
    not hand-configured like ``weighted_mixture``.

    Scale shape: one map-side-combined ``groupBy(domain).count()`` (output
    is domain-dimension-sized), rates computed on that dim table (the
    ``n_min`` scalar joins back via a single-row broadcast, never a driver
    collect), one broadcast join to attach ``rate_col``, then the same
    shuffle-free deterministic ``_bucket`` filter as ``stratified_sample``.
    The fact table is scanned once and never shuffled.

    Exactness: ``alpha=0.5`` evaluates the rate as ``sqrt(n_min / n_d)`` —
    int64 division then sqrt, both IEEE correctly-rounded, so the kept set
    is bit-identical in any engine (the DuckDB parity test replays it);
    other alphas go through ``pow`` (platform-dependent last bit,
    documented, still deterministic within one engine).
    """
    if not (0.0 <= float(alpha) <= 1.0):
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_nd"))
    nmin = counts.agg(F.min("_nd").alias("_nmin"))
    ratio = F.col("_nmin").cast("double") / F.col("_nd").cast("double")
    rate = (
        F.sqrt(ratio)
        if float(alpha) == 0.5
        else F.pow(ratio, F.lit(1.0 - float(alpha)))
    )
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        domain_col, rate.alias(rate_col)
    )
    keyed = df.join(F.broadcast(rates), domain_col)
    # threshold compare in the double domain: rate * 2^31 is exact-rounded
    # and identical across engines for identical rate doubles
    return keyed.where(
        _bucket(F.col(key_col), salt).cast("double")
        < F.col(rate_col) * F.lit(float(_MOD))
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: int = 0,
    n_blocks: int = 4096,
    out_col: str = "shuffle_pos",
) -> DataFrame:
    """Reproducible global shuffle order: every row gets a dense rank in
    [0, n) under ``(bucket(key), key)`` — the data-order randomization step
    of a pretraining run, made a pure function of the keys. Identical
    across runs, retries, partitionings, and cluster sizes; ``orderBy(
    rand())`` and RDD-shuffle orderings are none of those. ``salt`` selects
    the epoch permutation (salt=epoch gives a fresh order per epoch with
    zero stored state). Keys are assumed unique (every per-key operator
    here shares that contract); duplicate keys would tie in the order.

    Scalable shape — NO global sort: the bucket's high bits define
    ``n_blocks`` contiguous rank ranges, one dimension-sized aggregate
    counts each block, a cumsum over that tiny table (single-partition
    window over <= n_blocks rows, never the fact table) turns counts into
    block offsets, and each row's rank = its block offset + its rank
    WITHIN the block (one fact-table shuffle, on the block key). At 10^12
    rows each block holds ~rows/n_blocks; no task ever sees the global
    order. Exactly SQL-replayable: rank == ROW_NUMBER() OVER (ORDER BY
    bucket, key) - 1 (pinned vs DuckDB in tests).
    """
    if n_blocks < 1 or n_blocks & (n_blocks - 1):
        raise ValueError(f"n_blocks must be a power of two: {n_blocks}")
    from pyspark.sql import Window

    shift = 31 - (n_blocks.bit_length() - 1)
    keyed = df.withColumn("_sb", _bucket(F.col(key_col), salt)).withColumn(
        "_blk", F.shiftright(F.col("_sb"), shift)
    )
    sizes = keyed.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bn"))
    cum = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_blk", F.coalesce(F.sum("_bn").over(cum), F.lit(0)).alias("_off")
    )
    rank_w = Window.partitionBy("_blk").orderBy("_sb", key_col)
    return (
        keyed.join(F.broadcast(offsets), "_blk")
        .withColumn(
            out_col,
            (F.row_number().over(rank_w).cast("bigint") - 1) + F.col("_off"),
        )
        .drop("_sb", "_blk", "_off")
    )


def contrastive_negatives(
    df: DataFrame,
    key_col: str = "doc_id",
    k: int = 4,
    salt: int = 0,
    n_rows: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: pair every
    anchor with the ``k`` rows that FOLLOW it in the salted deterministic
    shuffle order (wrapping at the end) — each anchor gets exactly k
    distinct negatives, never itself, uniformly shuffled, and the whole
    assignment is a pure function of (keys, salt): retries and
    repartitionings reproduce it byte-for-byte, and ``salt`` = epoch
    rotates every anchor's negatives with zero stored state (RNG sampling
    gives none of this). Requires ``k < n``; keys unique (the family
    contract).

    Scale shape: one ``deterministic_shuffle`` rank (see its no-global-sort
    decomposition), a map-side explode of the k offsets, and ONE equi-join
    on the rank — rank is dense and unique, so the join is uniform by
    construction (no skew possible). ``n_rows`` skips the count job when
    the caller has lake statistics (same escape hatch as pack_sequences).

    Output: anchor (key), negative (key), neg_rank in [1, k].
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    ranked = deterministic_shuffle(df.select(key_col), key_col, salt=salt)
    # the rank table is referenced up to three times (count, anchors,
    # negatives); materialize it once instead of re-running the shuffle-rank
    # pipeline per reference (lazy: first action triggers it — the same
    # lineage-truncation pattern as operators/graph.py)
    ranked = ranked.localCheckpoint(eager=False)
    n = int(n_rows) if n_rows is not None else ranked.count()
    if k >= n:
        raise ValueError(f"k must be < n rows: k={k}, n={n}")
    anchors = ranked.select(
        F.col(key_col).alias("anchor"),
        F.col("shuffle_pos").alias("_pos"),
        F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("neg_rank"),
    ).withColumn("_npos", F.pmod(F.col("_pos") + F.col("neg_rank"), F.lit(n)))
    negs = ranked.select(
        F.col(key_col).alias("negative"), F.col("shuffle_pos").alias("_npos")
    )
    return anchors.join(negs, "_npos").select("anchor", "negative", "neg_rank")
