"""Best-scene mosaic selection: per-tile argmax over scene quality.

The standard Earth-observation mosaicking step the reference's catalogue
feeds (one GeoTIFF per tile x period is *chosen*, not averaged, by
cloud-cover / recency rules): for every tile, pick the single best scene —
prefer scenes under the cloud threshold, then lowest cloud cover, then most
recent acquisition, with the scene id as the unique final tiebreak — and
report per-tile candidate statistics alongside the winner.

Reference parity: the reference builds one catalogue item per raster and
leaves best-scene selection to the consumer; this operator is the engine's
first-class version of that consumer step (the same keep-first discipline as
``grouping.first_asset_geometry``, reference builder.py:470-475, but keyed on
spatial tiles and driven by a quality ordering instead of ingest order).

Scale design: implemented as ONE aggregate — ``min_by`` over a packed
ordering struct plus the candidate counters in the same ``groupBy`` — so the
map side reduces every partition to at most one partial row per tile before
the exchange. Nothing but per-tile partials ever shuffles, there is no
window (a ``row_number`` formulation would shuffle every candidate row), and
the result is a dimension-sized table. At 100 TB the shuffle volume is
O(tiles x executors), independent of scene count.

Determinism: the ordering struct ends with the unique scene id, so the
argmin is total and engine-independent; the DuckDB replay in
tests/test_parity_rowsonly.py compares it value-exactly via a ROW_NUMBER
formulation (same total order, different physical plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def best_scene_mosaic(
    df: DataFrame,
    keys: list[str],
    quality_col: str = "cloud",
    time_col: str = "datetime",
    id_col: str = "image_id",
    clear_threshold: int | None = None,
) -> DataFrame:
    """One row per key group: the best scene plus candidate statistics.

    Ordering (ascending, first wins): scenes over ``clear_threshold`` sort
    after scenes under it (a cloudy tile still yields its least-bad scene —
    the "keep the best even if cloudy" mosaic rule), then ``quality_col``
    ascending, then ``time_col`` descending (most recent among equals), then
    ``id_col`` as the unique total-order tiebreak.

    Output: ``keys`` + ``best_<id_col>``, ``best_<quality_col>``,
    ``best_<time_col>``, ``n_candidates``, ``n_clear``, ``min_<quality_col>``.
    """
    q = F.col(quality_col)
    over = (
        (q > F.lit(int(clear_threshold))).cast("int")
        if clear_threshold is not None
        else F.lit(0)
    )
    # timestamp -> negated exact microseconds: struct fields sort ascending,
    # so "most recent first" needs an integer negation, not a DESC flag
    t = F.col(time_col)
    t_ord = -F.unix_micros(t) if dict(df.dtypes)[time_col] == "timestamp" else -t
    order_key = F.struct(
        over.alias("o"), q.alias("q"), t_ord.alias("t"), F.col(id_col).alias("i")
    )
    payload = F.struct(
        F.col(id_col).alias("i"), q.alias("q"), t.alias("t")
    )
    aggs = [
        F.min_by(payload, order_key).alias("_best"),
        F.count(F.lit(1)).alias("n_candidates"),
        F.min(q).alias(f"min_{quality_col}"),
    ]
    if clear_threshold is not None:
        aggs.insert(2, F.sum((1 - over).cast("bigint")).alias("n_clear"))
    out = df.groupBy(*keys).agg(*aggs)
    cols: list[Column] = [F.col(k) for k in keys] + [
        F.col("_best.i").alias(f"best_{id_col}"),
        F.col("_best.q").alias(f"best_{quality_col}"),
        F.col("_best.t").alias(f"best_{time_col}"),
        F.col("n_candidates"),
    ]
    if clear_threshold is not None:
        cols.append(F.col("n_clear"))
    cols.append(F.col(f"min_{quality_col}"))
    return out.select(*cols)
