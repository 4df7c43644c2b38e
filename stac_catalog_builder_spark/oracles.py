"""DuckDB oracle SQL for the driver's correctness gate.

Each query in ``__spark_entry__.queries()`` has a matching ANSI-SQL string
here that DuckDB runs on the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings). The SQL
mirrors ``synth.py``'s integer-arithmetic derivation bit-for-bit: every float
is produced by the same IEEE ops on the same integers, so value hashes match.

Convention: doubles that pass through transcendental functions are either
excluded from outputs or rank-only; coordinates are emitted as exact
milli/micro-degree BIGINTs via ``FLOOR(x*scale + 0.5)`` (identical doubles in
-> identical ints out, independent of engine rounding modes).
"""

from __future__ import annotations

from .operators.sketches import (
    FMIX_C1 as HLL_FMIX_C1,
    FMIX_C2 as HLL_FMIX_C2,
    HARMONIC_NUM as HLL_HARMONIC_NUM,
    M32 as HLL_M32,
    M_REG as HLL_M_REG,
    RHO_MAX as HLL_RHO_MAX,
    SCALE_BITS as HLL_SCALE_BITS,
)
from .synth import (
    GRID_DLAT,
    GRID_DLON,
    GRID_LAT0,
    GRID_LON0,
    GRID_NX,
)

# --- shared CTE fragments -------------------------------------------------

IMAGES_CTE = """
images AS (
  SELECT
    o_orderkey AS img_key,
    printf('img_%08d', o_orderkey) AS image_id,
    ((o_orderkey * 2654435761) % 4294967296) AS h1,
    ((o_orderkey * 2246822519) % 4294967296) AS h2,
    ((o_orderkey * 2654435761) % 4294967296) * 1048576
      + (((o_orderkey * 2246822519) % 4294967296) % 1048576) AS phash,
    ([240,180,64,256])[CAST(o_orderkey % 4 AS INT) + 1] AS w,
    ([180,120,64,256])[CAST(o_orderkey % 4 AS INT) + 1] AS h,
    (['raw','png'])[CAST(o_orderkey % 2 AS INT) + 1] AS fmt,
    (['2m-temp-monthly','tot-precip-monthly'])[CAST(o_orderkey % 2 AS INT) + 1]
      AS asset_type,
    'observations_' || CAST(o_orderkey // 2 AS VARCHAR) AS item_id,
    CAST(((o_orderkey // 2) // 3) % 2 + 2000 AS INT) AS year,
    CAST((o_orderkey // 2) % 3 + 1 AS INT) AS month,
    make_timestamp(((o_orderkey // 2) // 3) % 2 + 2000,
                   (o_orderkey // 2) % 3 + 1, 1, 0, 0, 0) AS datetime,
    printf('%s observation %04d-%02d over item %d',
           (['2m-temp-monthly','tot-precip-monthly'])[CAST(o_orderkey % 2 AS INT) + 1],
           ((o_orderkey // 2) // 3) % 2 + 2000,
           (o_orderkey // 2) % 3 + 1,
           o_orderkey // 2) AS caption
  FROM orders
)
"""

FOOTPRINTS_CTE = """
footprints AS (
  SELECT *,
    (img_key % 10 < 3) AS is_hot,
    CASE WHEN img_key % 10 < 3
         THEN 4.0  + (h1 % 2000) / 10000.0
         ELSE -180.0 + (h1 % 360000) / 1000.0 END AS lon,
    CASE WHEN img_key % 10 < 3
         THEN 51.0 + (h2 % 2000) / 10000.0
         ELSE -60.0 + (h2 % 120000) / 1000.0 END AS lat
  FROM images
),
fp AS (
  SELECT *,
    lon - w * 0.000125 AS fp_w,
    lon + w * 0.000125 AS fp_e,
    lat - h * 0.000125 AS fp_s,
    lat + h * 0.000125 AS fp_n
  FROM footprints
)
"""

BOUNDARIES_CTE = f"""
boundaries AS (
  SELECT
    'E' || CAST(n_nationkey % {GRID_NX} AS VARCHAR)
        || 'N' || CAST(n_nationkey // {GRID_NX} AS VARCHAR) AS tile_id,
    'coll_' || CAST(n_regionkey AS VARCHAR) AS collection_id,
    {GRID_LON0} + (n_nationkey % {GRID_NX}) * {GRID_DLON} AS bbox_w,
    {GRID_LAT0} + (n_nationkey // {GRID_NX}) * {GRID_DLAT} AS bbox_s,
    {GRID_LON0} + (n_nationkey % {GRID_NX} + 1) * {GRID_DLON} AS bbox_e,
    {GRID_LAT0} + (n_nationkey // {GRID_NX} + 1) * {GRID_DLAT} AS bbox_n
  FROM nation
)
"""

ASSIGNED_CTE = """
assigned AS (
  SELECT f.*, b.tile_id, b.collection_id
  FROM fp f JOIN boundaries b
    ON f.lon >= b.bbox_w AND f.lon < b.bbox_e
   AND f.lat >= b.bbox_s AND f.lat < b.bbox_n
)
"""

KNN_QUERIES_CTE = """
knn_queries AS (
  SELECT
    printf('q_%04d', n_nationkey) AS query_id,
    CASE WHEN n_nationkey % 5 = 0
         THEN 4.0  + ((((n_nationkey+101) * 2654435761) % 4294967296) % 2000) / 10000.0
         ELSE -180.0 + ((((n_nationkey+101) * 2654435761) % 4294967296) % 360000) / 1000.0
    END AS qlon,
    CASE WHEN n_nationkey % 5 = 0
         THEN 51.0 + ((((n_nationkey+101) * 2246822519) % 4294967296) % 2000) / 10000.0
         ELSE -60.0 + ((((n_nationkey+101) * 2246822519) % 4294967296) % 120000) / 1000.0
    END AS qlat
  FROM nation
)
"""


def _micro(expr: str) -> str:
    """Exact micro-degree integer from a double (rounding-mode independent)."""
    return f"CAST(FLOOR(({expr}) * 100000.0 + 0.5) AS BIGINT)"


def _grid_cell_sql(res: int, lon: str = "lon", lat: str = "lat") -> str:
    nx, ny = 2 ** (res + 1), 2**res
    gx = f"LEAST(GREATEST(FLOOR(({lon} + 180.0) / 360.0 * {nx}), 0), {nx - 1})"
    gy = f"LEAST(GREATEST(FLOOR(({lat} + 90.0) / 180.0 * {ny}), 0), {ny - 1})"
    return f"CAST({res} * 4294967296 + {gx} * 65536 + {gy} AS BIGINT)"


def _tile_x_sql(zoom: int, lon: str = "lon") -> str:
    n = 2**zoom
    return f"CAST(LEAST(GREATEST(FLOOR(({lon} + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)"


def _tile_y_sql(zoom: int, lat: str = "lat") -> str:
    n = 2**zoom
    merc = f"LN(TAN(RADIANS({lat})) + 1.0 / COS(RADIANS({lat})))"
    return (
        f"CAST(LEAST(GREATEST(FLOOR((1.0 - {merc} / PI()) / 2.0 * {n}), 0), {n - 1})"
        " AS BIGINT)"
    )


HAVERSINE_SQL = (
    "2.0 * 6371000.0 * ASIN(SQRT(LEAST("
    "POW(SIN((RADIANS({lat2}) - RADIANS({lat1})) / 2), 2)"
    " + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
    " * POW(SIN((RADIANS({lon2}) - RADIANS({lon1})) / 2), 2), 1.0)))"
)


# --- full oracle statements -------------------------------------------------

def sql_footprints() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT image_id, phash, w, h, fmt, caption, is_hot,
       lon, lat, fp_w, fp_s, fp_e, fp_n
FROM fp
"""


def sql_cell_assign() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT image_id,
       {_grid_cell_sql(5)} AS cell_r5,
       {_grid_cell_sql(7)} AS cell_r7,
       {_grid_cell_sql(9)} AS cell_r9
FROM fp
"""


def sql_tile_assign(zoom: int = 6) -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT image_id, {_tile_x_sql(zoom)} AS tile_x, {_tile_y_sql(zoom)} AS tile_y,
       {zoom} AS zoom
FROM fp
"""


def sql_spatial_join() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()}
SELECT image_id, tile_id, collection_id FROM assigned
"""


def sql_extent_by_collection() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()}
SELECT collection_id,
       COUNT(*) AS n_assets,
       {_micro('MIN(fp_w)')} AS ext_w_u,
       {_micro('MIN(fp_s)')} AS ext_s_u,
       {_micro('MAX(fp_e)')} AS ext_e_u,
       {_micro('MAX(fp_n)')} AS ext_n_u,
       CAST(epoch(MIN(datetime)) AS BIGINT) AS dt_min_s,
       CAST(epoch(MAX(datetime)) AS BIGINT) AS dt_max_s
FROM assigned
GROUP BY collection_id
"""


def sql_extent_rollup() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()}
SELECT COALESCE(collection_id, 'ALL') AS collection_id,
       COALESCE(year, -1) AS year,
       COUNT(*) AS n_assets,
       {_micro('MIN(fp_w)')} AS ext_w_u,
       {_micro('MIN(fp_s)')} AS ext_s_u,
       {_micro('MAX(fp_e)')} AS ext_e_u,
       {_micro('MAX(fp_n)')} AS ext_n_u
FROM assigned
GROUP BY ROLLUP(collection_id, year)
"""


def sql_item_grouping() -> str:
    """A1 + A2: group by item_id AND the exact micro-degree bbox tuple — the
    reference splits an item's assets by exact bbox so each STAC item carries
    one geometry (builder.py:780-793)."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT item_id,
       COUNT(*) AS n_assets,
       COUNT(DISTINCT asset_type) AS n_types,
       {_micro('MIN(fp_w)')} AS ext_w_u,
       {_micro('MIN(fp_s)')} AS ext_s_u,
       {_micro('MAX(fp_e)')} AS ext_e_u,
       {_micro('MAX(fp_n)')} AS ext_n_u,
       CAST(epoch(MIN(datetime)) AS BIGINT) AS dt_min_s
FROM fp
GROUP BY item_id, {_micro('fp_w')}, {_micro('fp_s')}, {_micro('fp_e')}, {_micro('fp_n')}
"""


def sql_knn(k: int = 5) -> str:
    hav = HAVERSINE_SQL.format(lat1="q.qlat", lon1="q.qlon", lat2="i.lat", lon2="i.lon")
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {KNN_QUERIES_CTE.strip()},
dists AS (
  SELECT q.query_id, i.image_id, {hav} AS dist_m
  FROM knn_queries q CROSS JOIN fp i
),
ranked AS (
  SELECT query_id, image_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist_m, image_id)
           AS "rank"
  FROM dists
)
SELECT query_id, "rank", image_id FROM ranked WHERE "rank" <= {k}
"""


# ---------------------------------------------------------------------------
# Batch 2: dedup / text / similarity / relational oracles
# ---------------------------------------------------------------------------

def sql_dedup_exact() -> str:
    return """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
)
SELECT md5(text) AS content_hash, MIN(doc_id) AS kept_id, COUNT(*) AS n_dups
FROM corpus GROUP BY md5(text)
"""


def sql_token_stats() -> str:
    return """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       length(text) AS n_chars_measured
FROM documents
"""


def sql_quality_score() -> str:
    return """
WITH q AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         CAST((length(' '||text||' ') - length(replace(' '||text||' ',' the ','')))//5
            + (length(' '||text||' ') - length(replace(' '||text||' ',' a ','')))//3
           AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens,
  CAST(FLOOR((length(text) - n_tokens + 1) * 1000.0 / n_tokens + 0.5) AS BIGINT)
    AS mean_tok_len_x1000,
  CAST(FLOOR(n_distinct * 1000.0 / n_tokens + 0.5) AS BIGINT) AS diversity_x1000,
  CAST(FLOOR(n_stop * 1000.0 / n_tokens + 0.5) AS BIGINT) AS stop_ratio_x1000
FROM q
"""


def sql_lang_id() -> str:
    def occ(m: str) -> str:
        return f"(length(p) - length(replace(p, '{m}', ''))) // {len(m)}"

    return f"""
WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
c AS (
  SELECT doc_id,
    CAST({occ(' the ')} + {occ(' and ')} AS BIGINT) AS score_en,
    CAST({occ(' le ')}  + {occ(' et ')}  AS BIGINT) AS score_fr,
    CAST({occ(' der ')} + {occ(' und ')} AS BIGINT) AS score_de,
    CAST({occ(' el ')}  + {occ(' y ')}   AS BIGINT) AS score_es
  FROM padded
)
SELECT doc_id, score_en, score_fr, score_de, score_es,
  CASE WHEN GREATEST(score_en, score_fr, score_de, score_es) = 0 THEN 'und'
       WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
       WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
       WHEN score_de >= score_es THEN 'de'
       ELSE 'es' END AS lang_pred
FROM c
"""


def sql_repetition_stats() -> str:
    """Top-bigram share per doc (list_zip gives unnamed structs in DuckDB —
    numeric index extraction). Single-token docs have no bigrams and drop
    out on both engines."""
    return """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, z[1] || ' ' || z[2] AS bigram
  FROM toks, UNNEST(list_zip(t[1:len(t)-1], t[2:len(t)])) AS u(z)
),
c AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(MAX(c) AS BIGINT) AS top_bigram_n,
       CAST(FLOOR(MAX(c) * 1000.0 / SUM(c) + 0.5) AS BIGINT) AS top_share_x1000
FROM c GROUP BY doc_id
"""


def sql_doc_length_quantiles() -> str:
    """Spark `percentile` == DuckDB `quantile_cont` (same (n-1)*q linear
    interpolation) — verified bitwise on this corpus."""
    cols = ",\n       ".join(
        f"CAST(FLOOR(quantile_cont(length(text), {q}) * 1000.0 + 0.5) AS BIGINT)"
        f" AS p{int(q * 100)}_x1000"
        for q in (0.1, 0.5, 0.9, 0.99)
    )
    return f"""
SELECT doc_id % 4 AS shard,
       COUNT(*) AS n_docs,
       {cols}
FROM documents
GROUP BY 1
"""


def sql_text_clean() -> str:
    """Mirrors textops.clean_text + q_text_clean's injected PII surface.
    DuckDB regexp_replace needs the 'g' flag for replace-all (Java regex
    replaces all by default)."""
    return """
WITH injected AS (
  SELECT doc_id,
         printf('%s  contact user%d@example.com via https://example.org/d/%d  ',
                text, doc_id, doc_id) AS text
  FROM documents
),
cleaned AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g'),
           '\\s+', ' ', 'g')) AS clean_text
  FROM injected
)
SELECT doc_id, clean_text, CAST(length(clean_text) AS BIGINT) AS n_chars_clean
FROM cleaned
"""


def sql_doc_chunks(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Mirrors textops.chunk_documents: DuckDB 1-based inclusive list slicing
    toks[a : a+chunk-1] == Spark slice(toks, a, chunk) (both truncate at the
    end of the list)."""
    step = chunk_tokens - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
  FROM documents
),
counted AS (
  SELECT doc_id, t,
         GREATEST(CAST(CEIL((n - {overlap}) / CAST({step} AS DOUBLE)) AS BIGINT), 1)
           AS n_chunks
  FROM toks
),
exploded AS (
  SELECT doc_id, t, CAST(u.chunk_idx AS INT) AS chunk_idx
  FROM counted, UNNEST(generate_series(0, n_chunks - 1)) AS u(chunk_idx)
)
SELECT doc_id, chunk_idx,
       len(t[chunk_idx * {step} + 1 : chunk_idx * {step} + {chunk_tokens}])
         AS n_chunk_tokens,
       array_to_string(t[chunk_idx * {step} + 1 : chunk_idx * {step} + {chunk_tokens}], ' ')
         AS chunk_text
FROM exploded
"""


def sql_ngram_jaccard_pairs(max_gap: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.t AS ta, b.t AS tb
  FROM toks a JOIN toks b
    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + {max_gap}
)
SELECT id_a, id_b,
  CAST(FLOOR(1000.0 * len(list_intersect(ta, tb))
             / len(list_distinct(ta || tb)) + 0.5) AS BIGINT) AS jac_x1000
FROM pairs
"""


def sql_ann_cosine_topk(k: int = 5, n_queries: int = 20) -> str:
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]),"
        " (acc, v) -> acc + v)"
    )
    nrm = "sqrt(list_reduce(list_transform({a}, x -> x * x), (acc, v) -> acc + v))"
    cos = (
        dot.format(a="qvec", b="nvec")
        + " / (" + nrm.format(a="qvec") + " * " + nrm.format(a="nvec") + ")"
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {n_queries}
),
f AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nvec FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, {cos} AS cosine
  FROM q CROSS JOIN f WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
           AS "rank"
  FROM scored
)
SELECT query_id, "rank", neighbor_id,
       CAST(FLOOR(cosine * 1000000.0 + 0.5) AS BIGINT) AS cos_x1e6
FROM ranked WHERE "rank" <= {k}
"""


def sql_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_base_cents,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT))
    AS BIGINT) AS sum_disc_cents,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def sql_top_orders(limit: int = 10) -> str:
    return f"""
SELECT l_orderkey,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT))
    AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue_cents DESC, l_orderkey
LIMIT {limit}
"""


def sql_revenue_by_nation() -> str:
    return """
SELECT n_name,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT))
    AS BIGINT) AS revenue_cents,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def sql_events_hourly() -> str:
    return """
SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_x1000,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def sql_sessionize(gap_minutes: int = 30) -> str:
    return f"""
WITH g AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           - CAST(FLOOR(epoch(LAG(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > {gap_minutes * 60} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


def sql_session_windows(gap_minutes: int = 30) -> str:
    """Replicates Spark's session_window(ts, gap) in SQL: sessions merge
    while the inter-event gap is < gap (window end = last event + gap,
    half-open), so a NEW session starts when the microsecond gap >= gap.
    Microsecond-integer comparison = exact in both engines."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
)
SELECT user_id,
       CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_x1000
FROM s GROUP BY user_id, sess
"""


def sql_asof_join() -> str:
    """Backward-inclusive as-of join, checked with DuckDB's NATIVE ASOF
    LEFT JOIN (the Spark side composes union + window forward-fill)."""
    return """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
su AS (
  SELECT user_id, ts, arg_max(value, event_id) AS v
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
),
signups AS (
  SELECT user_id, ts,
         CAST(FLOOR(v * 1000.0 + 0.5) AS BIGINT) AS signup_value_x1000,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS signup_s
  FROM su
)
SELECT p.event_id, p.user_id,
       CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_s,
       s.signup_value_x1000 AS asof_signup_value_x1000,
       s.signup_s AS asof_signup_s
FROM purchases p ASOF LEFT JOIN signups s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def sql_token_topk(k: int = 50) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
r AS (
  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS "rank" FROM c
)
SELECT "rank", token, CAST(n AS BIGINT) AS n FROM r WHERE "rank" <= {k}
"""


# ---------------------------------------------------------------------------
# Batch 4: path parsing / href / tile cover / range join / window oracles
# ---------------------------------------------------------------------------

def sql_pathparse(period: str = "monthly") -> str:
    """Synthetic paths round-trip: build the path from the derived columns,
    parse year/month back with regex, derive period datetimes."""
    assert period == "monthly"
    return f"""
WITH {IMAGES_CTE.strip()},
paths AS (
  SELECT image_id,
         printf('/data/%s/%04d/%s_%04d-%02d.tif',
                asset_type, year, asset_type, year, month) AS asset_path
  FROM images
),
parsed AS (
  SELECT image_id, asset_path,
         CAST(regexp_extract(asset_path, '(\\d{{4}})-(\\d{{2}})\\.tif', 1) AS INT) AS year,
         CAST(regexp_extract(asset_path, '(\\d{{4}})-(\\d{{2}})\\.tif', 2) AS INT) AS month
  FROM paths
)
SELECT image_id, year, month,
  CAST(epoch(make_timestamp(year, month, 1, 0, 0, 0)) AS BIGINT) AS start_s,
  CAST(epoch(make_timestamp(year, month,
       CAST(EXTRACT(day FROM last_day(make_date(year, month, 1))) AS BIGINT),
       23, 59, 59)) AS BIGINT) AS end_s
FROM parsed
"""


def sql_href_rewrite() -> str:
    return f"""
WITH {IMAGES_CTE.strip()},
paths AS (
  SELECT image_id, img_key,
         printf('/data/%s/%04d/%s_%04d-%02d.tif',
                asset_type, year, asset_type, year, month) AS asset_path,
         'E' || CAST(img_key % 30 AS VARCHAR) || 'N' || CAST(img_key % 15 AS VARCHAR)
           AS grid_tile,
         lpad(CAST(img_key % 60 + 1 AS VARCHAR), 2, '0') || 'UFS' AS utm_tile
  FROM images
)
SELECT image_id,
  'https://cdn.example.org/assets/' || substr(asset_path, 7) || '?v=1' AS url,
  's3://my-bucket/catalog/' || substr(asset_path, 2) AS s3_href,
  CAST('326' || lpad(CAST(img_key % 60 + 1 AS VARCHAR), 2, '0') AS INT) AS epsg,
  CAST(regexp_extract(grid_tile, 'E(\\d+)', 1) AS INT) AS tile_e,
  CAST(regexp_extract(grid_tile, 'N(\\d+)', 1) AS INT) AS tile_n
FROM paths
"""


def sql_time_range_join() -> str:
    return """
WITH slots AS (
  SELECT n_nationkey AS slot_id,
         CAST(DATE '2024-01-01' + CAST(n_nationkey AS INT) AS TIMESTAMP) AS slot_start,
         CAST(DATE '2024-01-01' + CAST(n_nationkey + 1 AS INT) AS TIMESTAMP) AS slot_end
  FROM nation
)
SELECT s.slot_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(SUM(CAST(FLOOR(e.value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_x1000
FROM events e JOIN slots s
  ON e.ts >= s.slot_start AND e.ts < s.slot_end
GROUP BY s.slot_id
"""


def sql_first_asset() -> str:
    return f"""
WITH {IMAGES_CTE.strip()},
ranked AS (
  SELECT item_id, image_id,
         row_number() OVER (PARTITION BY item_id ORDER BY image_id) AS rn
  FROM images
)
SELECT item_id, image_id AS first_asset_id FROM ranked WHERE rn = 1
"""


def sql_tile_cover(zoom: int = 8) -> str:
    x0 = _tile_x_sql(zoom, lon="fp_w")
    x1 = _tile_x_sql(zoom, lon="fp_e")
    y0 = _tile_y_sql(zoom, lat="fp_n")  # north edge -> smaller y
    y1 = _tile_y_sql(zoom, lat="fp_s")
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
ranges AS (
  SELECT image_id, {x0} AS x0, {x1} AS x1, {y0} AS y0, {y1} AS y1 FROM fp
)
SELECT r.image_id, tx.tile_x, ty.tile_y, {zoom} AS zoom
FROM ranges r
CROSS JOIN UNNEST(generate_series(r.x0, r.x1)) AS tx(tile_x)
CROSS JOIN UNNEST(generate_series(r.y0, r.y1)) AS ty(tile_y)
"""


def sql_salted_extent() -> str:
    """Same result set as the plain per-collection extent (the salted
    two-phase rewrite is exact) — reuses the collection extent oracle."""
    return sql_extent_by_collection()


# ---------------------------------------------------------------------------
# Batch 6: semi/anti joins, set ops, pivot, footprint-overlap join
# ---------------------------------------------------------------------------

def sql_semi_join() -> str:
    return """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
"""


def sql_anti_join() -> str:
    return """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def sql_set_ops() -> str:
    return """
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0),
b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 5 = 0)
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM a UNION SELECT k FROM b)
UNION ALL
SELECT 'intersect', COUNT(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
UNION ALL
SELECT 'except', COUNT(*) FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def sql_events_pivot() -> str:
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
       {cols}
FROM events
GROUP BY 1
"""


def sql_footprint_overlap_join() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()}
SELECT f.image_id, b.tile_id
FROM fp f JOIN boundaries b
  ON f.fp_w < b.bbox_e AND f.fp_e > b.bbox_w
 AND f.fp_s < b.bbox_n AND f.fp_n > b.bbox_s
"""


def sql_config_join() -> str:
    """J1/P3: asset-type -> asset-config broadcast lookup; unknown types
    dropped (inner semantics, reference builder.py:191-198, 248-251)."""
    return f"""
WITH {IMAGES_CTE.strip()},
asset_config AS (
  SELECT '2m-temp-monthly' AS asset_type, '2m temperature' AS title,
         'image/tiff; application=geotiff' AS media_type
  UNION ALL
  SELECT 'tot-precip-monthly', 'Total precipitation',
         'image/tiff; application=geotiff'
  UNION ALL
  SELECT 'never-produced', 'unused', 'application/x-unknown'
)
SELECT i.image_id, c.title, c.media_type
FROM images i JOIN asset_config c ON i.asset_type = c.asset_type
"""


def sql_bands_explode() -> str:
    """Bands nested-struct rows: the band configs from the collection config
    JSON (mirrored literally here — data/collection-config.json) exploded per
    asset (reference config.py:62-195, metadata.py:152-153)."""
    return f"""
WITH {IMAGES_CTE.strip()}
SELECT image_id, 't2m' AS band_name, 'float32' AS data_type,
       CAST(-9999 AS INT) AS nodata, CAST(1 AS INT) AS band_index
FROM images WHERE asset_type = '2m-temp-monthly'
UNION ALL
SELECT image_id, 'precip', 'float32', CAST(-9999 AS INT), CAST(1 AS INT)
FROM images WHERE asset_type = 'tot-precip-monthly'
UNION ALL
SELECT image_id, 'precip_qa', 'uint8', CAST(255 AS INT), CAST(2 AS INT)
FROM images WHERE asset_type = 'tot-precip-monthly'
"""


def sql_tags_merge() -> str:
    """Tags map merge, exploded: base tags {product_type, fmt, rev} with the
    override {rev: v9, proc: l2a} winning on collision (dict-update
    semantics, reference mapper.py:182)."""
    return f"""
WITH {IMAGES_CTE.strip()}
SELECT image_id, 'product_type' AS tag_key, asset_type AS tag_value FROM images
UNION ALL
SELECT image_id, 'fmt', fmt FROM images
UNION ALL
SELECT image_id, 'rev', 'v9' FROM images
UNION ALL
SELECT image_id, 'proc', 'l2a' FROM images
"""


def sql_datetime_norm() -> str:
    """check_datetime cascade (metadata.py:554-590): per-row string variants
    (ISO-T / naive / bare date) normalized back to UTC timestamps."""
    return f"""
WITH {IMAGES_CTE.strip()},
shifted AS (
  SELECT image_id, img_key,
         datetime + (img_key % 86400) * INTERVAL 1 SECOND AS ts
  FROM images
),
raw AS (
  SELECT image_id,
         CASE WHEN img_key % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
              WHEN img_key % 3 = 1 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
              ELSE strftime(ts, '%Y-%m-%d') END AS raw_str
  FROM shifted
)
SELECT image_id, raw_str,
       CAST(epoch(COALESCE(
         try_strptime(raw_str, '%Y-%m-%dT%H:%M:%S'),
         try_strptime(raw_str, '%Y-%m-%d %H:%M:%S'),
         try_strptime(raw_str, '%Y-%m-%d'))) AS BIGINT) AS norm_s
FROM raw
"""


def sql_tile_topk_density() -> str:
    """W3: per-tile top-3 densest grid cells (skew diagnosis window)."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()},
cellcounts AS (
  SELECT tile_id, {_grid_cell_sql(7)} AS cell, COUNT(*) AS n_images
  FROM assigned GROUP BY 1, 2
),
ranked AS (
  SELECT tile_id, cell, n_images,
         rank() OVER (PARTITION BY tile_id ORDER BY n_images DESC, cell)
           AS "rank"
  FROM cellcounts
)
SELECT tile_id, "rank", cell, n_images FROM ranked WHERE "rank" <= 3
"""


def _micro_dec_sql(expr: str) -> str:
    """Exact 5-decimal string from integer micro-degrees (sign-magnitude) —
    mirrors functions.geo.micro_decimal_str, no float formatting."""
    u = f"CAST(FLOOR(({expr}) * 100000.0 + 0.5) AS BIGINT)"
    return (
        f"(CASE WHEN {u} < 0 THEN '-' ELSE '' END"
        f" || CAST(ABS({u}) // 100000 AS VARCHAR)"
        f" || '.' || lpad(CAST(ABS({u}) % 100000 AS VARCHAR), 5, '0'))"
    )


def sql_footprint_wkt() -> str:
    """bbox -> WKT POLYGON (reference boundingbox.py:95-171), coordinates as
    exact 5-decimal strings built from integer arithmetic."""
    w, s = _micro_dec_sql("fp_w"), _micro_dec_sql("fp_s")
    e, n = _micro_dec_sql("fp_e"), _micro_dec_sql("fp_n")
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT image_id,
  'POLYGON ((' || {w} || ' ' || {s} || ', ' || {e} || ' ' || {s} || ', '
              || {e} || ' ' || {n} || ', ' || {w} || ' ' || {n} || ', '
              || {w} || ' ' || {s} || '))' AS wkt
FROM fp
"""


def sql_offset_limit() -> str:
    """P7/O5: deterministic offset/limit slice (the reference's islice
    partial uploads, upload.py:139-154)."""
    return f"""
WITH {IMAGES_CTE.strip()}
SELECT image_id, item_id FROM images
ORDER BY image_id
LIMIT 200 OFFSET 100
"""


def sql_json_extract() -> str:
    """§2.8 JSON scalar functions: parse the events props payload, aggregate
    the extracted field (reference analogue: to_dict/from_json round-trips,
    builder.py:481, config.py:304-312)."""
    return """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


def sql_image_decode_stats(key_lt: int = 2000) -> str:
    """S2/S3 decode-invariant oracle: the raw/png codecs are LOSSLESS, so the
    decode outcome of every synthetic payload is predictable from first
    principles — decoded dims == (w, h), pixel_ok (exact array equality),
    caption_ok, decode_ok all true. The Spark side actually encodes + decodes
    every payload (mapInPandas, functions/codecs.py); a broken codec flips
    pixel_ok/px_w and hash-mismatches. mean/std stats stay pytest-verified
    (the raster synth uses transcendental exp + PCG noise — not SQL).
    Reference analogue: per-file metadata extraction + validation
    (metadata.py:199-236, mapper.py:157-164)."""
    return f"""
WITH {IMAGES_CTE.strip()}
SELECT image_id, fmt,
       CAST(w AS INT) AS px_w, CAST(h AS INT) AS px_h,
       TRUE AS pixel_ok, TRUE AS caption_ok, TRUE AS decode_ok,
       CASE fmt WHEN 'raw' THEN 'image/x-raw' WHEN 'png' THEN 'image/png'
            ELSE 'application/octet-stream' END AS media_type
FROM images WHERE img_key < {key_lt}
"""


def sql_ann_quantized_topk(k: int = 5, n_queries: int = 20) -> str:
    """Int8-quantization + exact re-rank oracle: replicates
    similarity.quantize_embeddings bit-for-bit (per-vector max-abs/127 scale,
    floor(x/scale + 0.5) tinyint codes, float32 dequantize), then the same
    left-fold cosine top-k as sql_ann_cosine_topk over the DEQUANTIZED
    corpus vs the original float queries."""
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]),"
        " (acc, v) -> acc + v)"
    )
    nrm = "sqrt(list_reduce(list_transform({a}, x -> x * x), (acc, v) -> acc + v))"
    cos = (
        dot.format(a="qvec", b="nvec")
        + " / (" + nrm.format(a="qvec") + " * " + nrm.format(a="nvec") + ")"
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {n_queries}
),
scaled AS (
  SELECT vec_id AS neighbor_id, embedding,
         greatest(
           list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                       (acc, v) -> greatest(acc, v)),
           1e-30) / 127.0 AS q_scale
  FROM embeddings
),
f AS (
  SELECT neighbor_id,
         CAST(list_transform(embedding,
           x -> CAST(CAST(CAST(FLOOR(CAST(x AS DOUBLE) / q_scale + 0.5) AS TINYINT)
                          AS DOUBLE) * q_scale AS FLOAT)) AS DOUBLE[]) AS nvec
  FROM scaled
),
scored AS (
  SELECT query_id, neighbor_id, {cos} AS cosine
  FROM q CROSS JOIN f WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
           AS "rank"
  FROM scored
)
SELECT query_id, "rank", neighbor_id,
       CAST(FLOOR(cosine * 1000000.0 + 0.5) AS BIGINT) AS cos_x1e6
FROM ranked WHERE "rank" <= {k}
"""


def sql_collection_summary() -> str:
    """U4: per-collection set-dedup summary lists (reference
    terracatalog.py:139,157 list(set(platforms))/list(set(instruments)),
    sorted for determinism). Emitted as comma-joined strings, matching the
    Spark side: the driver canonicalizer cannot hash list cells
    (VERDICT r3 #1), so neither side may emit array columns."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()}
SELECT collection_id,
       array_to_string(list_sort(list_distinct(list(asset_type))), ',') AS instruments,
       array_to_string(list_sort(list_distinct(list(fmt))), ',') AS platforms,
       COUNT(*) AS n_assets
FROM assigned
GROUP BY collection_id
"""


def sql_precision_round() -> str:
    """P10: resolution-derived rounding (reference mapper.py:130-139).
    decimals = abs(floor(log10(res * 0.001))); scale = 10^decimals;
    rounded = floor(x * scale + 0.5) / scale. The res values put log10 at
    x.60 (mid-decade), so Spark/DuckDB libm ULP differences cannot flip the
    floor; every downstream op is identical IEEE arithmetic."""
    res = "0.00025 * POW(10.0, CAST(img_key % 3 AS DOUBLE))"
    scale = f"POW(10.0, ABS(FLOOR(LOG10(ABS(({res}) * 0.001)))))"
    rnd = "FLOOR(({x}) * ({s}) + 0.5) / ({s})"
    lon_r = rnd.format(x="lon", s=scale)
    lat_r = rnd.format(x="lat", s=scale)
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT image_id,
       CAST(img_key % 3 AS INT) AS res_decade,
       CAST(FLOOR(({lon_r}) * 1e9 + 0.5) AS BIGINT) AS lon_r_e9,
       CAST(FLOOR(({lat_r}) * 1e9 + 0.5) AS BIGINT) AS lat_r_e9
FROM fp
"""


# ---------------------------------------------------------------------------
# Hex (H3-like) and S2-style cell encoders as exact SQL replays (round 5).
# Promotes the last two rows-only cell entries to value-exact checks: the
# numpy kernels in functions/cells.py are pure IEEE arithmetic (sqrt(3) is
# correctly rounded in both engines, np.rint == round_even), so DuckDB can
# reproduce every cell id bit-for-bit. The S2 replay additionally leans on
# cos/sin agreeing between numpy and libm on this platform; a disagreement
# would only matter within ~1 ulp of a 2^-30 ST bucket boundary
# (~1e-10/row) and would surface as a test failure, not silent error.
# ---------------------------------------------------------------------------

_D2R = repr(3.141592653589793 / 180.0)
_S2_SMAX = 1 << 30


def _hex_ctes(res: int, tag: str) -> str:
    """CTE chain replaying functions/cells.py::hex_cell_np at ``res`` over
    the fp table: axial projection (identical IEEE op order), cube rounding
    via round_even (== np.rint half-to-even), packed id assembly."""
    s = repr(45.0 / 2**res)  # power-of-2 quotient: exact in both engines
    return f"""
{tag}_0 AS (SELECT image_id, (sqrt(3.0)/3.0 * lon - lat/3.0) / {s} AS qf,
                   (2.0/3.0 * lat) / {s} AS rf FROM fp),
{tag}_1 AS (SELECT image_id, qf, rf, -qf - rf AS sf,
                   round_even(qf,0) AS q0, round_even(rf,0) AS r0 FROM {tag}_0),
{tag}_2 AS (SELECT *, round_even(sf,0) AS s0 FROM {tag}_1),
{tag}_3 AS (SELECT image_id,
   CASE WHEN abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf)
        THEN -r0-s0 ELSE q0 END AS q,
   CASE WHEN NOT(abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf))
             AND abs(r0-rf) > abs(s0-sf) THEN -q0-s0 ELSE r0 END AS rr
   FROM {tag}_2),
{tag} AS (SELECT image_id,
   CAST({res} AS BIGINT)*{2**52} + (CAST(q AS BIGINT)+{2**25})*{2**26}
     + (CAST(rr AS BIGINT)+{2**25}) AS hex_r{res} FROM {tag}_3)
"""


def sql_hex_cells() -> str:
    """Replay of q_hex_cells (res 7 and 9)."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
{_hex_ctes(7, "h7").strip()}, {_hex_ctes(9, "h9").strip()}
SELECT f.image_id, h7.hex_r7, h9.hex_r9
FROM fp f JOIN h7 ON f.image_id = h7.image_id
          JOIN h9 ON f.image_id = h9.image_id
"""


def _s2_ctes(level: int, tag: str) -> str:
    """CTE chain replaying functions/cells.py::s2_cell_np at ``level``:
    face-cube projection, quadratic ST, the 30-step Hilbert xy->d walk
    UNROLLED (one integer-only CTE per step — engine-independent), and
    two's-complement assembly through HUGEINT (face 4/5 set bit 63)."""
    head = f"""
{tag}_xyz AS (
  SELECT image_id,
    cos(lat * {_D2R}) * cos(lon * {_D2R}) AS x,
    cos(lat * {_D2R}) * sin(lon * {_D2R}) AS y,
    sin(lat * {_D2R}) AS z
  FROM fp),
{tag}_face AS (
  SELECT image_id, x, y, z,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END
         WHEN abs(y) >= abs(z) THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END
         ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS face
  FROM {tag}_xyz),
{tag}_uv AS (
  SELECT image_id, face,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM {tag}_face),
{tag}_st AS (
  SELECT image_id, face,
    CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0*u) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0*u) END AS su,
    CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0*v) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0*v) END AS sv
  FROM {tag}_uv),
{tag}_hb0 AS (
  SELECT image_id, face,
    least(greatest(CAST(trunc(su * {_S2_SMAX}.0) AS BIGINT), 0), {_S2_SMAX - 1}) AS hx,
    least(greatest(CAST(trunc(sv * {_S2_SMAX}.0) AS BIGINT), 0), {_S2_SMAX - 1}) AS hy,
    CAST(0 AS BIGINT) AS d
  FROM {tag}_st)"""
    steps = []
    prev = f"{tag}_hb0"
    for k in range(30):
        s = 1 << (29 - k)
        cur = f"{tag}_hb{k + 1}"
        steps.append(f"""
{cur} AS (
  SELECT image_id, face,
    CASE WHEN (hy & {s}) = 0
         THEN CASE WHEN (hx & {s}) != 0 THEN {s - 1} - hy ELSE hy END
         ELSE hx END AS hx,
    CASE WHEN (hy & {s}) = 0
         THEN CASE WHEN (hx & {s}) != 0 THEN {s - 1} - hx ELSE hx END
         ELSE hy END AS hy,
    d + CAST({s * s} AS BIGINT) * CAST(xor(
          3 * (CASE WHEN (hx & {s}) != 0 THEN 1 ELSE 0 END),
          CASE WHEN (hy & {s}) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM {prev})""")
        prev = cur
    lvl_shift = 2 * (30 - level)
    body_shift = 60 - 2 * level
    tail = f""",
{tag}_out AS (
  SELECT image_id,
    CAST(CASE WHEN vv >= CAST(9223372036854775808 AS HUGEINT)
              THEN vv - CAST(18446744073709551616 AS HUGEINT) ELSE vv END AS BIGINT) AS s2_l{level}
  FROM (
    SELECT image_id,
      CAST(face AS HUGEINT) * CAST(2305843009213693952 AS HUGEINT) +
      CAST((((d >> {lvl_shift}) << 1) | 1) AS HUGEINT) * CAST({2**body_shift} AS HUGEINT) AS vv
    FROM {prev}) t)"""
    return head + "," + ",".join(steps) + tail


def sql_s2_cells() -> str:
    """Replay of q_s2_cells (levels 12 and 20)."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
{_s2_ctes(12, "a").strip()},
{_s2_ctes(20, "b").strip()}
SELECT f.image_id, a_out.s2_l12, b_out.s2_l20
FROM fp f JOIN a_out ON f.image_id = a_out.image_id
          JOIN b_out ON f.image_id = b_out.image_id
"""


def sql_temporal_coverage() -> str:
    """Replay of q_temporal_coverage: per-collection union of acquisition
    intervals via the single-pass running-max fold (gaps-and-islands without
    materializing islands). Every quantity is an exact int64 second count, so
    the comparison is value-exact; the fold is tie-order-invariant for any
    ordering with non-decreasing starts (operators/temporal.py docstring)."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()},
intervals AS (
  SELECT collection_id,
         CAST(epoch(datetime) AS BIGINT) + (img_key % 500) * 3600 AS start_s,
         CAST(epoch(datetime) AS BIGINT) + (img_key % 500) * 3600
           + 1800 + (img_key % 7) * 600 AS end_s
  FROM assigned),
marked AS (
  SELECT collection_id, start_s, end_s,
         MAX(end_s) OVER (PARTITION BY collection_id ORDER BY start_s, end_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM intervals)
SELECT collection_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(CASE WHEN prev_max IS NULL OR start_s > prev_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_islands,
       CAST(SUM(GREATEST(0, end_s - GREATEST(start_s, COALESCE(prev_max, start_s))))
            AS BIGINT) AS coverage_s,
       COALESCE(MAX(CASE WHEN prev_max IS NOT NULL AND start_s > prev_max
                         THEN start_s - prev_max END), 0) AS max_gap_s,
       MIN(start_s) AS t_min_s,
       MAX(end_s) AS t_max_s
FROM marked
GROUP BY collection_id
"""


def _fmix32_sql(inp: str, tag: str) -> str:
    """SELECT-list fragment computing murmur3 fmix32 of ``inp`` into alias
    ``tag`` via DuckDB lateral column references; constants split at 16 bits
    exactly as operators/sketches.py::_mul32 does."""
    c1l, c1h = HLL_FMIX_C1 & 0xFFFF, HLL_FMIX_C1 >> 16
    c2l, c2h = HLL_FMIX_C2 & 0xFFFF, HLL_FMIX_C2 >> 16
    return f"""
    xor({inp}, {inp} >> 16) AS {tag}_x1,
    ({tag}_x1 * {c1l} + (({tag}_x1 * {c1h}) % 65536) * 65536) % {HLL_M32} AS {tag}_x2,
    xor({tag}_x2, {tag}_x2 >> 13) AS {tag}_x3,
    ({tag}_x3 * {c2l} + (({tag}_x3 * {c2h}) % 65536) * 65536) % {HLL_M32} AS {tag}_x4,
    xor({tag}_x4, {tag}_x4 >> 16) AS {tag}"""


def sql_hll_distinct() -> str:
    """Replay of q_hll_distinct: the fmix32 lane hash, the HLL register build
    over (collection, tile), the max-merge to collection, and the estimate —
    bit-for-bit integer arithmetic (operators/sketches.py constants inlined;
    XOR/shift native, 32-bit multiplies split at 16 bits so BIGINT suffices).
    est_linear_e3/est_e3 pass through ln(), where the two engines' libm may
    differ by 1 ulp — the parity test compares those two columns with a +/-1
    tolerance and everything else exactly."""
    harmonic = (
        f"CAST(FLOOR(1000.0 * {HLL_HARMONIC_NUM!r} / s_scaled) AS BIGINT)"
    )
    linear = (
        f"CAST(FLOOR({1000.0 * HLL_M_REG!r} * ln({float(HLL_M_REG)!r} / v_zero))"
        " AS BIGINT)"
    )
    m, rho, p2 = HLL_M_REG, HLL_RHO_MAX, 12  # p2: P_BITS, bucket = low 12 bits
    linear_gate = int(2.5 * HLL_M_REG * 1000)
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()},
hashed AS (
  SELECT collection_id, tile_id,
    phash % {HLL_M32} AS lo,
    phash >> 32 AS hi,{_fmix32_sql("lo", "a")},
    xor(hi, a) AS bx,{_fmix32_sql("bx", "b")}
  FROM assigned),
regs_fine AS (
  SELECT collection_id, tile_id, b % {m} AS bucket,
         MAX(CASE WHEN a = 0 THEN {rho} ELSE {rho} - length(bin(a)) END) AS register
  FROM hashed
  GROUP BY collection_id, tile_id, b % {m}),
regs AS (
  SELECT collection_id, bucket, MAX(register) AS register
  FROM regs_fine
  GROUP BY collection_id, bucket),
est AS (
  SELECT collection_id,
         CAST(COUNT(*) AS BIGINT) AS n_present,
         CAST(SUM(1::BIGINT << ({HLL_SCALE_BITS} - register)) AS BIGINT) AS s_present
  FROM regs
  GROUP BY collection_id),
state AS (
  SELECT collection_id,
         s_present + ({m} - n_present) * (1::BIGINT << {HLL_SCALE_BITS}) AS s_scaled,
         {m} - n_present AS v_zero
  FROM est)
SELECT collection_id, s_scaled, v_zero,
       {harmonic} AS est_harmonic_e3,
       CASE WHEN v_zero > 0 THEN {linear} END AS est_linear_e3,
       CASE WHEN v_zero > 0 AND {harmonic} <= {linear_gate}
            THEN {linear} ELSE {harmonic} END AS est_e3
FROM state
"""


def _quadkey_sql(x: str, y: str, zoom: int) -> str:
    """Unrolled quadkey concat mirroring operators/tiling.py::quadkey_col."""
    digits = [
        f"CAST((({x} >> {i}) & 1) + (({y} >> {i}) & 1) * 2 AS VARCHAR)"
        for i in range(zoom - 1, -1, -1)
    ]
    return " || ".join(digits)


def sql_tile_pyramid(base_zoom: int = 8, levels: tuple[int, ...] = (6, 4)) -> str:
    """Replay of q_tile_pyramid: zoom-N tile counts plus coarser levels
    folded by quadkey prefix truncation — integer/string-exact."""
    coarser = "\nUNION ALL\n".join(
        f"""SELECT {lv} AS zoom, substr(quadkey, 1, {lv}) AS quadkey,
       CAST(SUM(n_images) AS BIGINT) AS n_images
FROM base GROUP BY substr(quadkey, 1, {lv})"""
        for lv in sorted(set(levels), reverse=True)
    )
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
tiles AS (
  SELECT {_tile_x_sql(base_zoom)} AS tile_x, {_tile_y_sql(base_zoom)} AS tile_y
  FROM fp),
base AS (
  SELECT {base_zoom} AS zoom,
         {_quadkey_sql("tile_x", "tile_y", base_zoom)} AS quadkey,
         CAST(COUNT(*) AS BIGINT) AS n_images
  FROM tiles
  GROUP BY 2)
SELECT zoom, quadkey, n_images FROM base
UNION ALL
{coarser}
"""


def sql_compact_cover(res: int = 7, min_res: int = 3) -> str:
    """Replay of q_compact_cover: the quadtree compact cover of each
    boundary bbox — integer ceil/floor-division containment at every level,
    correlated generate_series explodes, parent-not-contained filter —
    bit-exact (all arithmetic on non-negative int64)."""
    nx, ny = 2 ** (res + 1), 2**res
    return f"""
WITH {BOUNDARIES_CTE.strip()},
rect AS (
  SELECT tile_id,
    CAST(LEAST(GREATEST(FLOOR((bbox_w + 180.0) / 360.0 * {nx}), 0), {nx - 1}) AS BIGINT) AS gx0,
    CAST(LEAST(GREATEST(FLOOR((bbox_e + 180.0) / 360.0 * {nx}), 0), {nx - 1}) AS BIGINT) AS gx1,
    CAST(LEAST(GREATEST(FLOOR((bbox_s + 90.0) / 180.0 * {ny}), 0), {ny - 1}) AS BIGINT) AS gy0,
    CAST(LEAST(GREATEST(FLOOR((bbox_n + 90.0) / 180.0 * {ny}), 0), {ny - 1}) AS BIGINT) AS gy1
  FROM boundaries),
levels AS (
  SELECT rect.*, r.res, (1::BIGINT << ({res} - r.res)) AS b
  FROM rect, (SELECT unnest(generate_series({min_res}, {res})) AS res) r),
rng AS (
  SELECT tile_id, res,
         (gx0 + b - 1) // b AS cx0, (gx1 + 1) // b - 1 AS cx1,
         (gy0 + b - 1) // b AS cy0, (gy1 + 1) // b - 1 AS cy1,
         (gx0 + 2 * b - 1) // (2 * b) AS pcx0, (gx1 + 1) // (2 * b) - 1 AS pcx1,
         (gy0 + 2 * b - 1) // (2 * b) AS pcy0, (gy1 + 1) // (2 * b) - 1 AS pcy1
  FROM levels),
cells AS (
  SELECT tile_id, res, pcx0, pcx1, pcy0, pcy1, tx.gx AS gx, ty.gy AS gy
  FROM rng,
       UNNEST(generate_series(cx0, cx1)) AS tx(gx),
       UNNEST(generate_series(cy0, cy1)) AS ty(gy))
SELECT tile_id, res, gx, gy,
       res * 4294967296 + gx * 65536 + gy AS cell
FROM cells
WHERE res = {min_res}
   OR NOT (gx // 2 BETWEEN pcx0 AND pcx1 AND gy // 2 BETWEEN pcy0 AND pcy1)
"""


# --- round-5 continuation: mosaic / geohash / diff / temperature / aspect ---


def sql_best_scene_mosaic(clear_threshold: int = 20) -> str:
    """ROW_NUMBER formulation of operators.mosaic.best_scene_mosaic — same
    total order (over-threshold flag, cloud asc, datetime desc, unique id),
    different physical plan (the engine uses a min_by aggregate)."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {BOUNDARIES_CTE.strip()},
{ASSIGNED_CTE.strip()},
scored AS (SELECT *, CAST(h1 % 101 AS INT) AS cloud FROM assigned),
ranked AS (
  SELECT tile_id, collection_id, image_id, cloud, datetime,
    ROW_NUMBER() OVER (
      PARTITION BY tile_id, collection_id
      ORDER BY CASE WHEN cloud > {clear_threshold} THEN 1 ELSE 0 END,
               cloud, datetime DESC, image_id) AS rn,
    COUNT(*) OVER (PARTITION BY tile_id, collection_id) AS n_candidates,
    SUM(CASE WHEN cloud <= {clear_threshold} THEN 1 ELSE 0 END)
      OVER (PARTITION BY tile_id, collection_id) AS n_clear,
    MIN(cloud) OVER (PARTITION BY tile_id, collection_id) AS min_cloud
  FROM scored)
SELECT tile_id, collection_id, image_id AS best_image_id, cloud AS best_cloud,
       datetime AS best_datetime, n_candidates,
       CAST(n_clear AS BIGINT) AS n_clear, min_cloud
FROM ranked WHERE rn = 1
"""


def _geohash_sql(precision: int, lon: str = "lon", lat: str = "lat") -> str:
    """The same unrolled shift/mask geohash as functions.cells.geohash_col."""
    total = 5 * precision
    lon_bits, lat_bits = (total + 1) // 2, total // 2
    nx, ny = 2**lon_bits, 2**lat_bits
    xi = (
        f"CAST(LEAST(GREATEST(FLOOR(({lon} + 180.0) / 360.0 * {nx}), 0),"
        f" {nx - 1}) AS BIGINT)"
    )
    yi = (
        f"CAST(LEAST(GREATEST(FLOOR(({lat} + 90.0) / 180.0 * {ny}), 0),"
        f" {ny - 1}) AS BIGINT)"
    )
    chars = []
    for c in range(precision):
        terms = []
        for t in range(5):
            j = 5 * c + t
            src, bits = (xi, lon_bits) if j % 2 == 0 else (yi, lat_bits)
            terms.append(f"(({src} >> {bits - 1 - j // 2}) & 1) * {1 << (4 - t)}")
        val = " + ".join(terms)
        chars.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST({val} AS INT) + 1, 1)"
        )
    return " || ".join(chars)


def sql_geohash_cells() -> str:
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}
SELECT image_id,
       {_geohash_sql(5)} AS gh5,
       {_geohash_sql(3)} AS gh3
FROM fp
"""


def sql_catalog_diff() -> str:
    """Full-outer-join snapshot diff replay (operators.diff.snapshot_diff)."""
    return f"""
WITH {IMAGES_CTE.strip()},
old AS (
  SELECT image_id, fmt, caption, w, h FROM images WHERE img_key % 19 <> 3),
new AS (
  SELECT image_id,
         CASE WHEN img_key % 13 = 0 THEN 'webp' ELSE fmt END AS fmt,
         caption, w, h
  FROM images WHERE img_key % 17 <> 5)
SELECT COALESCE(n.image_id, o.image_id) AS image_id,
       CASE WHEN o.image_id IS NULL THEN 'added'
            WHEN n.image_id IS NULL THEN 'removed'
            WHEN NOT (o.fmt IS NOT DISTINCT FROM n.fmt
                  AND o.caption IS NOT DISTINCT FROM n.caption
                  AND o.w IS NOT DISTINCT FROM n.w
                  AND o.h IS NOT DISTINCT FROM n.h) THEN 'changed'
       END AS change_type,
       n.fmt AS fmt, n.caption AS caption, n.w AS w, n.h AS h
FROM old o FULL OUTER JOIN new n ON o.image_id = n.image_id
WHERE CASE WHEN o.image_id IS NULL THEN 'added'
           WHEN n.image_id IS NULL THEN 'removed'
           WHEN NOT (o.fmt IS NOT DISTINCT FROM n.fmt
                 AND o.caption IS NOT DISTINCT FROM n.caption
                 AND o.w IS NOT DISTINCT FROM n.w
                 AND o.h IS NOT DISTINCT FROM n.h) THEN 'changed'
      END IS NOT NULL
"""


def _bucket31_sql(key: str, salt: int) -> str:
    """operators.sampling._bucket replayed as one scalar expression (the key
    is assumed a non-negative BIGINT; string keys are Spark-side only)."""
    from .operators.sampling import _MIX, _MOD, _SCRAMBLE

    k = f"(((xor(({key}) >> 31, ({key})) % {_MOD}) + {_MOD}) % {_MOD})"
    b1 = f"((({k}) + {int(salt) % _MOD}) * {_SCRAMBLE}) % {_MOD}"
    b2 = f"(xor(({b1}), ({b1}) >> 16) * {_MIX}) % {_MOD}"
    return f"xor(({b2}), ({b2}) >> 13)"


def sql_temperature_sample(salt: int = 11) -> str:
    """alpha=0.5 temperature resampling replay: rate = sqrt(n_min / n_d)
    (int64 division + sqrt, both IEEE correctly-rounded -> engine-exact)."""
    from .operators.sampling import _MOD

    dom = (
        "CASE WHEN img_key % 2 = 1 THEN 'd0'"
        " WHEN img_key % 4 = 2 THEN 'd1'"
        " WHEN img_key % 8 = 4 THEN 'd2' ELSE 'd3' END"
    )
    return f"""
WITH {IMAGES_CTE.strip()},
doms AS (SELECT img_key, {dom} AS domain FROM images),
counts AS (SELECT domain, COUNT(*) AS n_total FROM doms GROUP BY domain),
rates AS (
  SELECT domain, n_total,
         SQRT((SELECT MIN(n_total) FROM counts) * 1.0 / n_total) AS sample_rate
  FROM counts),
kept AS (
  SELECT d.domain
  FROM doms d JOIN rates r ON d.domain = r.domain
  WHERE ({_bucket31_sql('d.img_key', salt)}) * 1.0 < r.sample_rate * {float(_MOD)})
SELECT r.domain, r.n_total,
       COALESCE(k.n_kept, 0) AS n_kept, r.sample_rate
FROM rates r
LEFT JOIN (SELECT domain, COUNT(*) AS n_kept FROM kept GROUP BY domain) k
  ON r.domain = k.domain
"""


def sql_aspect_buckets(
    buckets: list[tuple[str, int, int]], batch_size: int, salt: int
) -> str:
    """Aspect-bucket batching replay: argmin over the bucket dim by the
    integer-cross-product ratio distance, then ROW_NUMBER per bucket over
    (scramble, key) — the block decomposition in the engine reconstructs
    exactly this total order (same proof shape as deterministic_shuffle)."""
    rows = ", ".join(f"('{b}', {w}, {h})" for b, w, h in buckets)
    return f"""
WITH {IMAGES_CTE.strip()},
buckets (bucket_id, bucket_w, bucket_h) AS (VALUES {rows}),
dists AS (
  SELECT i.img_key, i.image_id, i.w, i.h, b.bucket_id, b.bucket_w, b.bucket_h,
    GREATEST(i.w * b.bucket_h, b.bucket_w * i.h) * 1.0
      / LEAST(i.w * b.bucket_h, b.bucket_w * i.h) AS dist,
    ROW_NUMBER() OVER (PARTITION BY i.img_key ORDER BY
      GREATEST(i.w * b.bucket_h, b.bucket_w * i.h) * 1.0
        / LEAST(i.w * b.bucket_h, b.bucket_w * i.h), b.bucket_id) AS brn
  FROM images i CROSS JOIN buckets b),
assigned AS (SELECT * FROM dists WHERE brn = 1),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY bucket_id
      ORDER BY ({_bucket31_sql('img_key', salt)}), img_key) - 1 AS rk,
    COUNT(*) OVER (PARTITION BY bucket_id) AS btotal
  FROM assigned)
SELECT image_id, bucket_id, bucket_w, bucket_h,
       rk // {int(batch_size)} AS batch_idx,
       CAST(rk % {int(batch_size)} AS INT) AS pos_in_batch
FROM ranked
WHERE rk < (btotal // {int(batch_size)}) * {int(batch_size)}
"""


def sql_footprint_iou(
    min_iou_pct: int = 50, scale: int = 40_000, cell_micro: int = 2_600
) -> str:
    """Replay of operators/overlap.py::footprint_iou_pairs: micro-lattice
    quantization (identical IEEE add/mul/floor), grid-cell explode
    (DuckDB range() is exclusive-high, matching Spark sequence's inclusive
    stop at (hi-1)+1), the canonical-cell single-report predicate, and the
    cross-multiplied integer IoU threshold.  All arithmetic is int64 on
    non-negative operands, where DuckDB // == Spark div."""
    c = int(cell_micro)
    s = float(scale)
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
boxes AS (
  SELECT image_id AS fid,
    CAST(FLOOR((fp_w + 180.0) * {s} + 0.5) AS BIGINT) AS xw,
    CAST(FLOOR((fp_e + 180.0) * {s} + 0.5) AS BIGINT) AS xe,
    CAST(FLOOR((fp_s + 90.0) * {s} + 0.5) AS BIGINT) AS ys,
    CAST(FLOOR((fp_n + 90.0) * {s} + 0.5) AS BIGINT) AS yn
  FROM fp
),
pos AS (SELECT * FROM boxes WHERE xe > xw AND yn > ys),
cells AS (
  SELECT p.*, gx.cx AS cx, gy.cy AS cy
  FROM pos p,
       UNNEST(range(p.xw // {c}, (p.xe - 1) // {c} + 1)) AS gx(cx),
       UNNEST(range(p.ys // {c}, (p.yn - 1) // {c} + 1)) AS gy(cy)
)
SELECT a.fid AS id_a, b.fid AS id_b,
  (LEAST(a.xe, b.xe) - GREATEST(a.xw, b.xw))
    * (LEAST(a.yn, b.yn) - GREATEST(a.ys, b.ys)) AS inter,
  (a.xe - a.xw) * (a.yn - a.ys) + (b.xe - b.xw) * (b.yn - b.ys)
    - (LEAST(a.xe, b.xe) - GREATEST(a.xw, b.xw))
      * (LEAST(a.yn, b.yn) - GREATEST(a.ys, b.ys)) AS uni,
  (inter * 100000) // uni AS iou_e5
FROM cells a JOIN cells b
  ON a.cx = b.cx AND a.cy = b.cy AND a.fid < b.fid
WHERE GREATEST(a.xw, b.xw) < LEAST(a.xe, b.xe)
  AND GREATEST(a.ys, b.ys) < LEAST(a.yn, b.yn)
  AND a.cx = GREATEST(a.xw, b.xw) // {c}
  AND a.cy = GREATEST(a.ys, b.ys) // {c}
  AND inter * 100 >= {int(min_iou_pct)} * uni
"""


def sql_cms_heavy_hitters() -> str:
    """Replay of q_cms_heavy_hitters: the seeded fmix32 lane hash (constants
    from operators/sketches.py::CMS_SEEDS), register build (lane, bucket,
    cnt), min-over-lanes point estimates for the heavy candidate keys, and
    the exact counts they are compared against — all int64, value-exact."""
    from .operators.sketches import CMS_SEEDS, CMS_W

    lane_rows = ", ".join(f"({i}, {CMS_SEEDS[i]})" for i in range(len(CMS_SEEDS)))
    return f"""
WITH {IMAGES_CTE.strip()},
keyed AS (
  SELECT CASE WHEN phash % 4 < 2 THEN phash % 97 ELSE phash END AS k
  FROM images
),
lanes(lane, seed) AS (VALUES {lane_rows}),
hashed AS (
  SELECT l.lane, d.k,
    xor(d.k % {HLL_M32}, l.seed) AS lo,{_fmix32_sql("lo", "a")},
    xor(d.k >> 32, a) AS bx,{_fmix32_sql("bx", "b")},
    b % {CMS_W} AS bucket
  FROM keyed d, lanes l
),
regs AS (
  SELECT lane, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY lane, bucket
),
cand AS (SELECT DISTINCT k FROM keyed WHERE k < 97),
cand_cells AS (
  SELECT l.lane, c.k,
    xor(c.k % {HLL_M32}, l.seed) AS lo,{_fmix32_sql("lo", "a")},
    xor(c.k >> 32, a) AS bx,{_fmix32_sql("bx", "b")},
    b % {CMS_W} AS bucket
  FROM cand c, lanes l
),
est AS (
  SELECT cc.k, MIN(COALESCE(r.cnt, 0)) AS est_cnt
  FROM cand_cells cc LEFT JOIN regs r USING (lane, bucket)
  GROUP BY cc.k
),
exact AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM keyed WHERE k < 97 GROUP BY k
)
SELECT e.k, e.exact_cnt, s.est_cnt
FROM exact e JOIN est s ON e.k = s.k
"""


def sql_catalog_merge() -> str:
    """Oracle for q_catalog_merge: DuckDB computes the TARGET snapshot
    directly (no join replay) — equality with the engine's
    snapshot_apply(old, snapshot_diff(old, new)) output proves the
    MERGE roundtrip identity."""
    return f"""
WITH {IMAGES_CTE.strip()}
SELECT image_id,
       CASE WHEN img_key % 13 = 0 THEN 'webp' ELSE fmt END AS fmt,
       CASE WHEN img_key % 23 = 1 THEN NULL ELSE caption END AS caption,
       w, h
FROM images
WHERE img_key % 17 <> 5
"""


def sql_hist_quantiles(
    lo: int = 0, hi: int = 128, n_bins: int = 64,
    qs: tuple[int, ...] = (250_000, 500_000, 900_000, 990_000),
) -> str:
    """Replay of q_hist_quantiles: saturating bin assignment, bin-wise
    counts, cumulative window, ceil-rank selection and integer bin edges —
    all int64 on non-negative operands (DuckDB // == Spark div). Window and
    plain SUMs are cast from HUGEINT back to BIGINT."""
    q_rows = ", ".join(f"({q})" for q in qs)
    span = hi - lo
    return f"""
WITH {IMAGES_CTE.strip()},
vals AS (SELECT asset_type, length(caption) AS v FROM images),
regs AS (
  SELECT asset_type,
         (LEAST(GREATEST(CAST(v AS BIGINT), {lo}), {hi - 1}) - {lo})
           * {n_bins} // {span} AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals WHERE v IS NOT NULL GROUP BY asset_type, bin
),
cum AS (
  SELECT asset_type, bin,
         CAST(SUM(cnt) OVER (PARTITION BY asset_type ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY asset_type) AS BIGINT) AS n
  FROM regs
),
qs(q_e6) AS (VALUES {q_rows}),
hit AS (
  SELECT asset_type, CAST(q_e6 AS BIGINT) AS q_e6, n, MIN(bin) AS bin
  FROM cum, qs
  WHERE cum >= GREATEST(1, (n * q_e6 + 999999) // 1000000)
  GROUP BY asset_type, q_e6, n
)
SELECT asset_type, q_e6, n, bin,
       {lo} + (bin * {span}) // {n_bins} AS bin_lo,
       {lo} + ((bin + 1) * {span}) // {n_bins} AS bin_hi
FROM hit
"""


def sql_focal_density(res: int = 6, radius: int = 1) -> str:
    """Replay of q_focal_density: identical IEEE cell assignment (the
    grid_cell_col formula inlined as gx/gy directly — the engine unpacks the
    same values from the packed cell id), scatter explode with wrap-x /
    clamp-y, and the one-pass own+focal aggregate. DuckDB % can return
    negatives, so wrap is ((x % nx) + nx) % nx (Spark pmod)."""
    nx, ny = 2 ** (res + 1), 2**res
    r = int(radius)
    win = f"{2 * r + 1} * (LEAST(ty + {r}, {ny - 1}) - GREATEST(ty - {r}, 0) + 1)"
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
cellxy AS (
  SELECT
    CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {nx}), 0), {nx - 1}) AS BIGINT) AS gx,
    CAST(LEAST(GREATEST(FLOOR((lat + 90.0) / 180.0 * {ny}), 0), {ny - 1}) AS BIGINT) AS gy
  FROM fp
),
dens AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS cnt FROM cellxy GROUP BY gx, gy),
scat AS (
  SELECT (((d.gx + sx.dx) % {nx}) + {nx}) % {nx} AS tx,
         d.gy + sy.dy AS ty, d.cnt, sx.dx, sy.dy
  FROM dens d,
       UNNEST(range(-{r}, {r + 1})) AS sx(dx),
       UNNEST(range(-{r}, {r + 1})) AS sy(dy)
  WHERE d.gy + sy.dy >= 0 AND d.gy + sy.dy < {ny}
),
agg AS (
  SELECT tx, ty,
         CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN cnt ELSE 0 END) AS BIGINT) AS cnt,
         CAST(SUM(cnt) AS BIGINT) AS focal_cnt
  FROM scat GROUP BY tx, ty
)
SELECT tx AS gx, ty AS gy, cnt, focal_cnt,
       CAST({win} AS BIGINT) AS n_window,
       (focal_cnt * 1000) // ({win}) AS focal_mean_e3
FROM agg
"""


def sql_revisit_stats(res: int = 4) -> str:
    """Replay of q_revisit_stats: identical IEEE cell assignment, epoch
    seconds as CAST(FLOOR(epoch(ts)) AS BIGINT) (== Spark unix_timestamp),
    lag-window consecutive gaps, and the telescoped integer mean."""
    nx, ny = 2 ** (res + 1), 2**res
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
cellxy AS (
  SELECT
    CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {nx}), 0), {nx - 1}) AS BIGINT) AS gx,
    CAST(LEAST(GREATEST(FLOOR((lat + 90.0) / 180.0 * {ny}), 0), {ny - 1}) AS BIGINT) AS gy,
    CAST(FLOOR(epoch(datetime)) AS BIGINT) AS t_s
  FROM fp
),
gapped AS (
  SELECT gx, gy, t_s,
         t_s - LAG(t_s) OVER (PARTITION BY gx, gy ORDER BY t_s) AS gap_s
  FROM cellxy
)
SELECT gx, gy,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       MAX(t_s) - MIN(t_s) AS span_s,
       MIN(gap_s) AS min_gap_s,
       MAX(gap_s) AS max_gap_s,
       CASE WHEN COUNT(*) > 1
            THEN (MAX(t_s) - MIN(t_s)) // (COUNT(*) - 1) END AS mean_gap_s
FROM gapped
GROUP BY gx, gy
"""


def sql_corpus_overlap() -> str:
    """Replay of q_corpus_overlap: the 63-bit fmix32 lane hash, per-group
    bottom-k (k=1024) registers, union-sketch reconstruction per group pair,
    and the overlap estimates. Everything is exact int64 except the kth-min
    union estimator — one shared-literal-over-int64 division + floor both
    engines round identically (operators/sketches.py::kmv_pair_overlap)."""
    from .operators.sketches import KMV_EST_NUM, KMV_K

    return f"""
WITH {IMAGES_CTE.strip()},
keyed AS (
  SELECT asset_type || '_' || CAST(year AS VARCHAR) AS g,
         CASE WHEN img_key % 5 < 3 THEN img_key // 12
              ELSE 1000000 + img_key END AS k
  FROM images
),
hashed AS (
  SELECT g,
    k % {HLL_M32} AS lo,{_fmix32_sql("lo", "a")},
    xor(k >> 32, a) AS bx,{_fmix32_sql("bx", "b")},
    a * 2147483648 + (b >> 1) AS hv
  FROM keyed
),
dedup AS (SELECT DISTINCT g, hv FROM hashed),
regs AS (
  SELECT g, hv FROM (
    SELECT g, hv, ROW_NUMBER() OVER (PARTITION BY g ORDER BY hv) AS rn
    FROM dedup) WHERE rn <= {KMV_K}
),
grp AS (SELECT DISTINCT g FROM regs),
pairs AS (
  SELECT a.g AS ga, b.g AS gb FROM grp a, grp b WHERE a.g < b.g
),
sides AS (
  SELECT p.ga, p.gb, r.hv, 1 AS ia, 0 AS ib
  FROM pairs p JOIN regs r ON r.g = p.ga
  UNION ALL
  SELECT p.ga, p.gb, r.hv, 0, 1
  FROM pairs p JOIN regs r ON r.g = p.gb
),
merged AS (
  SELECT ga, gb, hv, MAX(ia) AS ia, MAX(ib) AS ib
  FROM sides GROUP BY ga, gb, hv
),
topk AS (
  SELECT * FROM (
    SELECT ga, gb, hv, ia, ib,
           ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY hv) AS rn
    FROM merged) WHERE rn <= {KMV_K}
),
agg AS (
  SELECT ga, gb,
         CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(ia * ib) AS BIGINT) AS n_common,
         MAX(hv) AS union_kth
  FROM topk GROUP BY ga, gb
)
SELECT ga, gb, k_used, n_common,
       n_common * 1000000 // k_used AS jaccard_e6,
       CASE WHEN k_used < {KMV_K} THEN k_used * 1000
            ELSE CAST(FLOOR({KMV_EST_NUM!r} / CAST(union_kth AS DOUBLE)) AS BIGINT)
            END AS est_union_e3,
       CASE WHEN k_used < {KMV_K} THEN k_used * 1000
            ELSE CAST(FLOOR({KMV_EST_NUM!r} / CAST(union_kth AS DOUBLE)) AS BIGINT)
            END * n_common // k_used AS est_inter_e3
FROM agg
"""


def sql_hilbert_index(order: int = 8) -> str:
    """Replay of q_hilbert_index: identical IEEE grid-cell assignment, then
    the Hilbert xy->d recurrence as a recursive CTE — one iteration per bit
    plane carrying (x, y, d), the masked-rotation variant of
    functions/cells.py::hilbert_d_col so every intermediate is a
    non-negative BIGINT in both engines."""
    n = 1 << order
    return f"""
WITH RECURSIVE {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
pts AS (
  SELECT image_id,
    CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT) AS gx,
    CAST(LEAST(GREATEST(FLOOR((lat + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT) AS gy
  FROM fp
),
hil AS (
  SELECT image_id, gx, gy, gx AS x, gy AS y,
         CAST(0 AS BIGINT) AS d, {order - 1} AS i
  FROM pts
  UNION ALL
  SELECT image_id, gx, gy,
    CASE WHEN ((y >> i) & 1) = 1 THEN x & ((1::BIGINT << i) - 1)
         WHEN ((x >> i) & 1) = 1
           THEN (1::BIGINT << i) - 1 - (y & ((1::BIGINT << i) - 1))
         ELSE y & ((1::BIGINT << i) - 1) END AS x,
    CASE WHEN ((y >> i) & 1) = 1 THEN y & ((1::BIGINT << i) - 1)
         WHEN ((x >> i) & 1) = 1
           THEN (1::BIGINT << i) - 1 - (x & ((1::BIGINT << i) - 1))
         ELSE x & ((1::BIGINT << i) - 1) END AS y,
    d + (1::BIGINT << i) * (1::BIGINT << i)
      * CAST(xor(CASE WHEN ((x >> i) & 1) = 1 THEN 3 ELSE 0 END,
                 (y >> i) & 1) AS BIGINT) AS d,
    i - 1 AS i
  FROM hil WHERE i >= 0
)
SELECT image_id, gx, gy, d AS hkey
FROM hil WHERE i = -1
"""


def sql_spatial_clusters(res: int = 6, min_pts: int = 3) -> str:
    """Replay of q_spatial_clusters: identical IEEE cell assignment, core
    selection, half-neighborhood edge join (wrap-x, clamp-y),
    recursive-CTE min-label connected components, and min-cluster border
    adoption — exact int64 end to end."""
    nx, ny = 2 ** (res + 1), 2**res
    half = ", ".join(f"({dx}, {dy})" for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1)))
    all8 = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    )
    return f"""
WITH RECURSIVE {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
cellxy AS (
  SELECT
    CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {nx}), 0), {nx - 1}) AS BIGINT) AS cx,
    CAST(LEAST(GREATEST(FLOOR((lat + 90.0) / 180.0 * {ny}), 0), {ny - 1}) AS BIGINT) AS cy
  FROM fp
),
counts AS (
  SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_points, cy * {nx} + cx AS cell
  FROM cellxy GROUP BY cx, cy
),
core AS (SELECT * FROM counts WHERE n_points >= {min_pts}),
offs(dx, dy) AS (VALUES {half}),
edges AS (
  SELECT c.cell AS u, n.cell AS v
  FROM core c CROSS JOIN offs o
  JOIN core n ON n.cx = (c.cx + o.dx + {nx}) % {nx} AND n.cy = c.cy + o.dy
),
sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
lab(node, label) AS (
  SELECT cell, cell FROM core
  UNION
  SELECT s.v, l.label FROM sym s JOIN lab l ON l.node = s.u
),
comp AS (SELECT node, MIN(label) AS component FROM lab GROUP BY node),
core_lab AS (
  SELECT c.cell, c.cx, c.cy, c.n_points,
         COALESCE(p.component, c.cell) AS cluster, TRUE AS is_core
  FROM core c LEFT JOIN comp p ON p.node = c.cell
),
offs8(dx, dy) AS (VALUES {all8}),
border AS (
  SELECT nc.cell, nc.cx, nc.cy, nc.n_points,
         MIN(cl.cluster) AS cluster, FALSE AS is_core
  FROM counts nc CROSS JOIN offs8 o
  JOIN core_lab cl
    ON cl.cx = (nc.cx + o.dx + {nx}) % {nx} AND cl.cy = nc.cy + o.dy
  WHERE nc.n_points < {min_pts}
  GROUP BY nc.cell, nc.cx, nc.cy, nc.n_points
)
SELECT cell, cx, cy, n_points, cluster, is_core FROM core_lab
UNION ALL
SELECT cell, cx, cy, n_points, cluster, is_core FROM border
"""


def sql_patch_grid(patch: int = 64, stride: int = 48) -> str:
    """Replay of q_patch_grid: per-axis start lists (aligned grid + tail,
    list_distinct), the row-major patch_id, and the exact integer
    pixel->geo affine on the micro-degree lattice."""
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
base AS (
  SELECT image_id, w, h,
    CAST(FLOOR((fp_w + 180.0) * 40000.0 + 0.5) AS BIGINT) AS xw,
    CAST(FLOOR((fp_e + 180.0) * 40000.0 + 0.5) AS BIGINT) AS xe,
    CAST(FLOOR((fp_s +  90.0) * 40000.0 + 0.5) AS BIGINT) AS ys,
    CAST(FLOOR((fp_n +  90.0) * 40000.0 + 0.5) AS BIGINT) AS yn
  FROM fp
  WHERE img_key % 5 = 0 AND w >= {patch} AND h >= {patch}
),
axes AS (
  SELECT *,
    list_sort(list_distinct(
      list_append(
        list_transform(generate_series(0, (w - {patch}) // {stride}),
                       i -> i * {stride}),
        w - {patch}))) AS xs,
    list_sort(list_distinct(
      list_append(
        list_transform(generate_series(0, (h - {patch}) // {stride}),
                       i -> i * {stride}),
        h - {patch}))) AS ys_arr
  FROM base
),
yrows AS (
  SELECT image_id, w, h, xw, xe, ys, yn, xs, len(xs) AS nx_p,
         ys_arr[u.yi] AS py, u.yi AS yi
  FROM axes, UNNEST(generate_series(1, len(ys_arr))) AS u(yi)
),
cells AS (
  SELECT image_id, w, h, xw, xe, ys, yn, nx_p,
         py, yi, xs[v.xi] AS px, v.xi AS xi
  FROM yrows, UNNEST(generate_series(1, len(xs))) AS v(xi)
)
SELECT image_id,
       CAST((yi - 1) * nx_p + (xi - 1) AS BIGINT) AS patch_id,
       CAST(px AS INT) AS px,
       CAST(py AS INT) AS py,
       xw + px * (xe - xw) // w AS g_w_u,
       xw + (px + {patch}) * (xe - xw) // w AS g_e_u,
       yn - (py + {patch}) * (yn - ys) // h AS g_s_u,
       yn - py * (yn - ys) // h AS g_n_u
FROM cells
"""


def sql_gap_fill(step_s: int = 21600) -> str:
    """Replay of q_gap_fill: second-truncated dedup (max value per tied
    second), the aligned tick grid, and the (ts, side)-ordered
    last-IGNORE-NULLS forward fill — int64 everywhere except the carried
    DOUBLE value, which passes through both engines unchanged."""
    return f"""
WITH obs AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t_s,
         MAX(value) AS v
  FROM events GROUP BY event_type, CAST(FLOOR(epoch(ts)) AS BIGINT)
),
rng AS (
  SELECT event_type,
         ((MIN(t_s) + {step_s} - 1) // {step_s}) * {step_s} AS a,
         (MAX(t_s) // {step_s}) * {step_s} AS b
  FROM obs GROUP BY event_type
),
ticks AS (
  SELECT event_type, u.t AS t_s
  FROM rng, UNNEST(generate_series(a, b, {step_s})) AS u(t)
  WHERE a <= b
),
unioned AS (
  SELECT event_type, t_s, 0 AS side, v, t_s AS src_ts FROM obs
  UNION ALL
  SELECT event_type, t_s, 1, NULL, NULL FROM ticks
),
filled AS (
  SELECT event_type, t_s, side,
         LAST_VALUE(v IGNORE NULLS) OVER w AS value,
         LAST_VALUE(src_ts IGNORE NULLS) OVER w AS src_ts
  FROM unioned
  WINDOW w AS (PARTITION BY event_type ORDER BY t_s, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, t_s AS tick_s, value, t_s - src_ts AS age_s
FROM filled WHERE side = 1
"""


def sql_moment_stats() -> str:
    """Replay of q_moment_stats: exact int64 power sums per (asset_type,
    fmt) over caption lengths, mean/variance as the same fixed-point
    integer divisions."""
    return f"""
WITH {IMAGES_CTE.strip()},
vals AS (SELECT asset_type, fmt, CAST(length(caption) AS BIGINT) AS v FROM images),
regs AS (
  SELECT asset_type, fmt,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2,
         MIN(v) AS vmin, MAX(v) AS vmax
  FROM vals GROUP BY asset_type, fmt
)
SELECT asset_type, fmt, n, s1, s2, vmin, vmax,
       1000 * s1 // n AS mean_e3,
       1000 * (n * s2 - s1 * s1) // (n * n) AS var_e3
FROM regs
"""


def sql_group_sample(k: int = 7, salt: int = 3) -> str:
    """Replay of q_group_sample: ROW_NUMBER per (lang, source) ordered by
    the 31-bit key scramble, keep rank <= k — exact int64 end to end."""
    return f"""
SELECT doc_id, lang, source, n_chars,
       CAST(rn AS INT) AS sample_rank
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang, source
           ORDER BY ({_bucket31_sql('doc_id', salt)}), doc_id) AS rn
  FROM documents
)
WHERE rn <= {int(k)}
"""


def sql_scd2_history() -> str:
    """Replay of q_scd2_history: the 3-version synthetic reprocessing
    history, change-point detection via null-safe lag compares, interval
    close via lead — exact int/string end to end."""
    return f"""
WITH {IMAGES_CTE.strip()},
hist AS (
  SELECT image_id, CAST(v AS INT) AS v,
    CAST(phash % 100
         + CASE WHEN v >= 1 AND img_key % 3 = 0 THEN 7 ELSE 0 END
         + CASE WHEN v >= 2 AND img_key % 4 = 0 THEN 11 ELSE 0 END AS INT)
      AS cloud_pct,
    CASE WHEN v >= 1 AND img_key % 5 = 0
         THEN 'reprocessed' ELSE 'published' END AS status
  FROM images, UNNEST([0, 1, 2]) AS u(v)
),
marked AS (
  SELECT image_id, v, cloud_pct, status,
         ROW_NUMBER() OVER w AS rn,
         LAG(cloud_pct) OVER w AS pc,
         LAG(status) OVER w AS ps
  FROM hist WINDOW w AS (PARTITION BY image_id ORDER BY v)
),
starts AS (
  SELECT image_id, v, cloud_pct, status FROM marked
  WHERE rn = 1 OR cloud_pct IS DISTINCT FROM pc OR status IS DISTINCT FROM ps
)
SELECT image_id, v AS valid_from,
       LEAD(v) OVER w2 AS valid_to,
       LEAD(v) OVER w2 IS NULL AS is_current,
       cloud_pct, status
FROM starts WINDOW w2 AS (PARTITION BY image_id ORDER BY v)
"""


def _hex12_sql(h: str) -> str:
    """First 12 hex digits of a sha256 string as int64 (unrolled positional
    parse — exact, both engines)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1) * {16 ** (12 - i)}"
        for i in range(1, 13)
    )
    return f"CAST({terms} AS BIGINT)"


def sql_fixity_audit() -> str:
    """Replay of q_fixity_audit: the sha256 canonical serialization
    (NULL -> chr(0), fields joined on chr(31)) and both combining lanes —
    the sum lane reduced mod 2^61-1 from DuckDB's HUGEINT SUM, the xor
    lane via bit_xor. Exact end to end."""
    from .operators.sketches import FIXITY_P

    canon = (
        "COALESCE(CAST(image_id AS VARCHAR), chr(0)) || chr(31) || "
        "COALESCE(CAST(caption AS VARCHAR), chr(0)) || chr(31) || "
        "COALESCE(CAST(w AS VARCHAR), chr(0)) || chr(31) || "
        "COALESCE(CAST(h AS VARCHAR), chr(0))"
    )
    return f"""
WITH {IMAGES_CTE.strip()},
lanes AS (
  SELECT asset_type, fmt, {_hex12_sql(f"sha256({canon})")} AS lane
  FROM images
)
SELECT asset_type, fmt,
       COUNT(*) AS n_items,
       CAST(SUM(lane) % {FIXITY_P} AS BIGINT) AS fixity_sum,
       bit_xor(lane) AS fixity_xor
FROM lanes GROUP BY asset_type, fmt
"""


def sql_union_area(scale: int = 40_000, cell_micro: int = 2_600) -> str:
    """Replay of operators/overlap.py::footprint_union_area: micro-lattice
    quantization, per-group coordinate DISTINCT, grid-cell explode + clip,
    x-slab decomposition via lead(), the span join, and the running-max
    y-union fold (the interval_coverage fold) — all int64 on non-negative
    operands, value-exact."""
    c = int(cell_micro)
    s = float(scale)
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()},
raw AS (
  SELECT asset_type,
    CAST(FLOOR((fp_w + 180.0) * {s} + 0.5) AS BIGINT) AS xw,
    CAST(FLOOR((fp_e + 180.0) * {s} + 0.5) AS BIGINT) AS xe,
    CAST(FLOOR((fp_s + 90.0) * {s} + 0.5) AS BIGINT) AS ys,
    CAST(FLOOR((fp_n + 90.0) * {s} + 0.5) AS BIGINT) AS yn
  FROM fp
  WHERE CAST(FLOOR((fp_e + 180.0) * {s} + 0.5) AS BIGINT)
          > CAST(FLOOR((fp_w + 180.0) * {s} + 0.5) AS BIGINT)
    AND CAST(FLOOR((fp_n + 90.0) * {s} + 0.5) AS BIGINT)
          > CAST(FLOOR((fp_s + 90.0) * {s} + 0.5) AS BIGINT)
),
stats AS (
  SELECT asset_type, COUNT(*) AS n_boxes,
         (MAX(xe) - MIN(xw)) * (MAX(yn) - MIN(ys)) AS hull_area
  FROM raw GROUP BY asset_type
),
boxes AS (SELECT DISTINCT * FROM raw),
clipped AS (
  SELECT asset_type, gx.cx AS cx, gy.cy AS cy,
         GREATEST(xw, gx.cx * {c}) AS bxw,
         LEAST(xe, (gx.cx + 1) * {c}) AS bxe,
         GREATEST(ys, gy.cy * {c}) AS bys,
         LEAST(yn, (gy.cy + 1) * {c}) AS byn
  FROM boxes,
       UNNEST(range(xw // {c}, (xe - 1) // {c} + 1)) AS gx(cx),
       UNNEST(range(ys // {c}, (yn - 1) // {c} + 1)) AS gy(cy)
),
events AS (
  SELECT DISTINCT asset_type, cx, cy, x FROM (
    SELECT asset_type, cx, cy, bxw AS x FROM clipped
    UNION ALL
    SELECT asset_type, cx, cy, bxe AS x FROM clipped
  )
),
slabs AS (
  SELECT asset_type, cx, cy, x AS sx1,
         LEAD(x) OVER (PARTITION BY asset_type, cx, cy ORDER BY x) AS sx2
  FROM events
  QUALIFY sx2 IS NOT NULL
),
covered AS (
  SELECT s.asset_type, s.cx, s.cy, s.sx1, s.sx2, b.bys, b.byn,
         MAX(b.byn) OVER (PARTITION BY s.asset_type, s.cx, s.cy, s.sx1, s.sx2
                          ORDER BY b.bys, b.byn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM slabs s
  JOIN clipped b
    ON s.asset_type = b.asset_type AND s.cx = b.cx AND s.cy = b.cy
   AND b.bxw <= s.sx1 AND b.bxe >= s.sx2
),
folded AS (
  SELECT asset_type, cx, cy, sx1, sx2,
         SUM(GREATEST(0, byn - GREATEST(bys, COALESCE(prev_max, bys)))) AS ylen
  FROM covered GROUP BY asset_type, cx, cy, sx1, sx2
),
area AS (
  SELECT asset_type, CAST(SUM(ylen * (sx2 - sx1)) AS BIGINT) AS union_area
  FROM folded GROUP BY asset_type
)
SELECT st.asset_type, st.n_boxes,
       COALESCE(a.union_area, 0) AS union_area, st.hull_area
FROM stats st LEFT JOIN area a ON st.asset_type = a.asset_type
"""


def sql_radius_join(radius_m: float = 120_000.0) -> str:
    """Replay of q_radius_join as the brute cross join + exact haversine
    predicate (the grid-bucketed candidates must find the IDENTICAL pair
    set), dist floored to mm."""
    hav = HAVERSINE_SQL.format(
        lat1="q.qlat", lon1="q.qlon", lat2="i.lat", lon2="i.lon"
    )
    return f"""
WITH {IMAGES_CTE.strip()}, {FOOTPRINTS_CTE.strip()}, {KNN_QUERIES_CTE.strip()}
SELECT q.query_id, i.image_id,
       CAST(FLOOR(({hav}) * 1000.0 + 0.5) AS BIGINT) AS dist_mm
FROM knn_queries q CROSS JOIN fp i
WHERE ({hav}) <= {float(radius_m)}
"""


def sql_inverted_postings(min_df: int = 3, max_df: int = 2000) -> str:
    """Replay of q_inverted_postings: whitespace split (empty terms
    dropped), tf per (term, doc), df per term, min/max_df prune — exact
    int64 end to end."""
    return f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf GROUP BY term
  HAVING COUNT(*) >= {int(min_df)} AND COUNT(*) <= {int(max_df)}
)
SELECT t.term, d.df, t.doc_id, t.tf
FROM tf t JOIN dfreq d USING (term)
"""


def sql_contrastive_negatives(k: int = 4, salt: int = 2) -> str:
    """Replay of q_contrastive_negatives: the shuffle rank (ROW_NUMBER over
    the 31-bit scramble) + wrap-offset self-join — exact int64."""
    from .operators.sampling import _MOD

    return f"""
WITH ranked AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (
           ORDER BY ({_bucket31_sql('doc_id', salt)}), doc_id) - 1 AS BIGINT)
           AS pos
  FROM documents
),
n AS (SELECT COUNT(*) AS n FROM ranked),
anchors AS (
  SELECT r.doc_id AS anchor, r.pos, d.neg_rank,
         (r.pos + d.neg_rank) % (SELECT n FROM n) AS npos
  FROM ranked r, UNNEST(range(1, {int(k)} + 1)) AS d(neg_rank)
)
SELECT a.anchor, g.doc_id AS negative, CAST(a.neg_rank AS INT) AS neg_rank
FROM anchors a JOIN ranked g ON a.npos = g.pos
"""


def sql_equi_depth(
    lo: int = 0, hi: int = 4096, n_bins: int = 512, n_buckets: int = 4
) -> str:
    """Replay of q_equi_depth: histogram registers over n_chars, ceil-rank
    threshold bins per (lang), UPPER bin edges as thresholds, and the
    value >= threshold bucket count — exact int64 end to end."""
    span = hi - lo
    qs = [i * 1_000_000 // n_buckets for i in range(1, n_buckets)]
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
WITH regs AS (
  SELECT lang,
         (LEAST(GREATEST(CAST(n_chars AS BIGINT), {lo}), {hi - 1}) - {lo})
           * {n_bins} // {span} AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY lang, bin
),
cum AS (
  SELECT lang, bin,
         CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM regs
),
qs(q_e6) AS (VALUES {q_rows}),
hit AS (
  SELECT lang, CAST(q_e6 AS BIGINT) AS q_e6, MIN(bin) AS bin
  FROM cum, qs
  WHERE cum >= GREATEST(1, (n * q_e6 + 999999) // 1000000)
  GROUP BY lang, q_e6
),
ths AS (
  SELECT lang, {lo} + ((bin + 1) * {span}) // {n_bins} AS th FROM hit
)
SELECT d.doc_id, d.lang, d.n_chars,
       CAST(COALESCE(SUM(CASE WHEN d.n_chars >= t.th THEN 1 ELSE 0 END), 0)
            AS INT) AS bucket
FROM documents d JOIN ths t ON d.lang = t.lang
GROUP BY d.doc_id, d.lang, d.n_chars
"""
