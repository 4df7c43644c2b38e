"""kNN join: k nearest images per query point (north rule J5).

Two implementations with identical results:

- ``knn_join`` (default): **broadcast + map-side partial top-k**. The query
  set is small (a dimension table); it rides to every task. Each Arrow batch
  computes a (Q x B) haversine matrix in numpy and emits only the per-query
  top-k *of that batch* — so the shuffle carries at most
  ``num_batches * Q * k`` rows regardless of input size (linear scan, no
  crossJoin materialization; at 100 TB this is a single pass over the fact
  table). A final window rank merges the partials exactly.

- ``knn_join_cellring``: hex-cell ring expansion (H3-like k-ring, SURVEY.md
  §2.3 J5) — prunes the scan to candidate cells, iterating rings until the
  k-th distance is provably inside the ring radius (lower bound:
  ``(r-1) * hex_min_width``). Exact, and at scale touches only a tiny
  fraction of the data when a cell index column is available.

The reference has no kNN; its closest machinery is per-group ordering
(stacbuilder/metadata.py:510-532). Rank semantics: ties broken by image_id,
deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import hex_cell_np, hex_kring_np, hex_min_width_deg
from ..functions.geo import haversine_np

_OUT_SCHEMA = "query_id string, image_id string, dist_m double"


def _partial_topk_gen(queries_pdf: pd.DataFrame, k: int):
    q_ids = queries_pdf["query_id"].to_numpy()
    q_lon = queries_pdf["qlon"].to_numpy()
    q_lat = queries_pdf["qlat"].to_numpy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lon = pdf["lon"].to_numpy()
            lat = pdf["lat"].to_numpy()
            ids = pdf["image_id"].to_numpy()
            # (Q, B) distance matrix — vectorized, no per-row Python
            d = haversine_np(lon[None, :], lat[None, :], q_lon[:, None], q_lat[:, None])
            kk = min(k, d.shape[1])
            part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(q_ids, kk),
                "image_id": ids[part.ravel()],
                "dist_m": np.take_along_axis(d, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    return gen


def knn_join(images: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact kNN: (query_id, rank, image_id, dist_m), rank 1..k.

    ``queries`` needs (query_id, qlon, qlat) and must be dimension-sized —
    it is collected once and closed over (equivalent of a broadcast var).
    """
    queries_pdf = queries.select("query_id", "qlon", "qlat").toPandas()
    partials = images.select("image_id", "lon", "lat").mapInPandas(
        _partial_topk_gen(queries_pdf, k), schema=_OUT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m"), F.col("image_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "image_id", "dist_m")
    )


def knn_join_cellring(
    images: DataFrame, queries: DataFrame, k: int, res: int = 7
) -> DataFrame:
    """Exact kNN via hex-cell ring expansion.

    Requires/derives a hex cell column at ``res`` on the fact side; then for
    growing ring radius r, joins images whose cell is in the union of every
    query's r-ring (a broadcast IN-set), ranks, and stops when each query's
    k-th neighbor distance <= the guaranteed minimum distance to any point
    outside its r-ring. Falls back to the full scan for queries that exhaust
    the max radius (near-empty regions).
    """
    queries_pdf = queries.select("query_id", "qlon", "qlat").toPandas()
    q_cells = hex_cell_np(
        queries_pdf["qlon"].to_numpy(), queries_pdf["qlat"].to_numpy(), res
    )
    # conservative: 1 deg latitude = 111,194.9 m; lon shrink <= 1 anyway
    meters_per_deg = 111194.9
    min_width_m = hex_min_width_deg(res) * meters_per_deg * 0.5  # lon-shrink margin

    fact = images.select(
        "image_id",
        "lon",
        "lat",
        F.pandas_udf(  # hex cell of each image, Arrow-batched
            lambda lo, la: pd.Series(hex_cell_np(lo.to_numpy(), la.to_numpy(), res)),
            "bigint",
        )(F.col("lon"), F.col("lat")).alias("cell"),
    )

    pending = dict(zip(queries_pdf["query_id"], range(len(queries_pdf))))
    results: list[pd.DataFrame] = []
    r = 1
    max_r = 64
    while pending and r <= max_r:
        cells = set()
        for qid in pending:
            i = pending[qid]
            cells.update(int(c) for c in hex_kring_np(int(q_cells[i]), r))
        sub_q = queries_pdf[queries_pdf["query_id"].isin(pending)]
        cand = fact.where(F.col("cell").isin(list(cells)))
        topk = (
            cand.mapInPandas(_partial_topk_gen(sub_q, k), schema=_OUT_SCHEMA)
            .toPandas()
        )
        done = []
        for qid in list(pending):
            mine = (topk[topk["query_id"] == qid]
                    .sort_values(["dist_m", "image_id"]).head(k))
            if len(mine) >= k and mine["dist_m"].iloc[-1] <= (r - 1) * min_width_m:
                results.append(mine)
                done.append(qid)
        for qid in done:
            del pending[qid]
        r *= 2
    if pending:  # sparse regions: exact fallback over the full table
        sub_q = queries_pdf[queries_pdf["query_id"].isin(pending)]
        topk = fact.mapInPandas(_partial_topk_gen(sub_q, k), schema=_OUT_SCHEMA).toPandas()
        for qid in pending:
            results.append(
                topk[topk["query_id"] == qid].sort_values(["dist_m", "image_id"]).head(k)
            )
    out = pd.concat(results, ignore_index=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    spark = images.sparkSession
    return spark.createDataFrame(out[["query_id", "rank", "image_id", "dist_m"]])
