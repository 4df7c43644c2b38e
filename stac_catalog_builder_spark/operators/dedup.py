"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the ``documents`` table, scale-shaped for 100 TB:

- **exact**: md5-hash groupBy (one shuffle on the hash — never on the text;
  map-side partial agg collapses duplicates before the exchange).
- **minhash LSH**: shingle -> minhash signature (Arrow pandas UDF) -> band
  keys -> explode -> *equi-join on band bucket* (the only shuffle is on small
  band keys; candidate verification is per-pair and local).
- **simhash**: 64-bit near-dup sketch; Hamming-ball candidates via 4x16-bit
  block keys (pigeonhole: hamming<=3 pairs share at least one exact block).
- **n-gram Jaccard**: exact token-set similarity for candidate verification
  (pure JVM array ops: split/array_distinct/array_intersect — no UDF).
- **embedding cosine**: random-hyperplane LSH buckets, within-bucket
  verification (see operators/similarity.py for the ANN search variants).

Reference parity: the reference's only dedup is drop-first-by-product-id
(stacbuilder/terracatalog.py:617-619) == ``dedup_exact`` on a key column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashes import (
    NUM_PERM,
    hyperplane_sketch,
    minhash_bands,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
)


def dedup_exact(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: one row per distinct content hash with the kept
    representative (min key — deterministic 'first wins', the reference's
    keep='first' at terracatalog.py:617-619) and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(key_col))
        .groupBy("content_hash")
        .agg(F.min(key_col).alias("kept_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def with_minhash(df: DataFrame, text_col: str = "text", bands: int = 16) -> DataFrame:
    """Add minhash band-bucket keys (array) — Arrow-batched, no per-row Python
    at the Spark level (numpy per doc inside the batch)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bandkeys(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: minhash_bands(minhash_signature(t or ""), bands).tolist()
        )

    return df.withColumn("band_keys", bandkeys(F.col(text_col)))


def minhash_candidate_pairs(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text", bands: int = 16
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b): docs sharing >=1 band bucket.

    Plan shape: explode(band_keys) -> self equi-join on the bucket ->
    distinct pair. The shuffle key is the band bucket (small), never the
    text; skewed buckets (boilerplate-heavy corpora) are handled by AQE
    skew-join since this is a plain equi-join.
    """
    b = (
        with_minhash(df.select(key_col, text_col), text_col, bands)
        .select(key_col, F.explode("band_keys").alias("bucket"))
    )
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(right, "bucket")
        .where(F.col(f"l.{key_col}") < F.col(f"r.{key_col}"))
        .select(
            F.col(f"l.{key_col}").alias("id_a"), F.col(f"r.{key_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact whitespace-token Jaccard for candidate pairs — verification stage
    after LSH. Pure JVM array functions; docs join is two broadcast-or-shuffle
    hash joins on the id."""
    toks = docs.select(
        F.col(key_col),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("toks"),
    )
    return (
        pairs.join(toks.withColumnRenamed(key_col, "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
        .join(toks.withColumnRenamed(key_col, "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("toks_a", "toks_b"))
                / F.size(F.array_union("toks_a", "toks_b"))
            ).alias("jaccard"),
        )
    )


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: simhash64((t or "").split(" ")))

    return df.withColumn("simhash", sh(F.col(text_col)))


def simhash_candidate_pairs(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup candidates with Hamming distance <= 3: by pigeonhole, such
    pairs agree exactly on >=1 of the 4 16-bit blocks -> equi-join per block,
    verify with bit_count (JVM)."""
    sh = with_simhash(df.select(key_col, text_col), text_col).select(key_col, "simhash")
    blocks = sh.select(
        key_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(key_col, "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(r, ["blk", "val"])
        .where(F.col(f"l.{key_col}") < F.col(f"r.{key_col}"))
        .select(
            F.col(f"l.{key_col}").alias("id_a"),
            F.col(f"r.{key_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .distinct()
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprint (min 8-gram hash)."""

    @F.pandas_udf(T.LongType())
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: rolling_fingerprint(t or ""))

    return df.withColumn("fingerprint", fp(F.col(text_col)))


def embedding_neardup_pairs(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
) -> DataFrame:
    """Embedding near-duplicates: hyperplane-LSH bucket, verify cosine within
    bucket. Bucket join is an equi-join (shuffle on 2^n_planes keys)."""

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(np.asarray).to_numpy())
        return pd.Series(hyperplane_sketch(m, n_planes))

    b = emb.select(key_col, vec_col, bucket(F.col(vec_col)).alias("bucket"))
    l, r = b.alias("l"), b.alias("r")
    dot = F.aggregate(
        F.zip_with(
            F.col(f"l.{vec_col}"),
            F.col(f"r.{vec_col}"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(f"{side}.{vec_col}"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return (
        l.join(r, "bucket")
        .where(F.col(f"l.{key_col}") < F.col(f"r.{key_col}"))
        .select(
            F.col(f"l.{key_col}").alias("id_a"),
            F.col(f"r.{key_col}").alias("id_b"),
            (dot / (norm("l") * norm("r"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
