"""Portable deterministic hashing kernels for dedup / fingerprinting.

Pure numpy/stdlib — the same values everywhere (no JVM/xxhash dependency), so
pytest oracles can recompute them. Used by operators/dedup.py via Arrow
pandas UDFs.

Design notes for 100 TB scale: everything here is per-row bounded work (a few
hundred shingles x 64 permutations in int64 numpy), no cross-row state; the
heavy lifting (candidate pair generation) happens in Spark via band-bucket
equi-joins, not in Python.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE31 = (1 << 31) - 1  # modulus: products of two <2^31 values fit int64
SHINGLE_BASE = 257

# Deterministic permutation parameters (seeded once, module-level: identical
# on driver and every executor).
_rng = np.random.default_rng(42)
NUM_PERM = 64
MINHASH_A = _rng.integers(1, MERSENNE31, NUM_PERM, dtype=np.int64)
MINHASH_B = _rng.integers(0, MERSENNE31, NUM_PERM, dtype=np.int64)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-gram (character shingle) hashes of a string, int64 in
    [0, 2^31). Vectorized: sliding windows dotted with base powers mod p."""
    raw = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(raw) < k:
        raw = np.pad(raw, (0, k - len(raw)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(raw.astype(np.int64), k)
    powers = np.array(
        [pow(SHINGLE_BASE, k - 1 - i, MERSENNE31) for i in range(k)], dtype=np.int64
    )
    return np.unique((win * powers).sum(axis=1) % MERSENNE31)


def minhash_signature(text: str, k: int = 5, num_perm: int = NUM_PERM) -> np.ndarray:
    """MinHash signature (num_perm int64 values) over char k-shingles."""
    sh = char_shingle_hashes(text, k)
    # (S, P) permuted values; min over shingles per permutation
    vals = (sh[:, None] * MINHASH_A[None, :num_perm] + MINHASH_B[None, :num_perm]) % (
        MERSENNE31
    )
    return vals.min(axis=0)


def minhash_bands(sig: np.ndarray, bands: int) -> np.ndarray:
    """Fold a signature into ``bands`` band-bucket keys (int64): docs sharing
    any band key are LSH candidates."""
    rows = len(sig) // bands
    out = np.empty(bands, dtype=np.int64)
    for b in range(bands):
        acc = np.int64(b + 1)
        for v in sig[b * rows : (b + 1) * rows]:
            acc = (acc * SHINGLE_BASE + np.int64(v)) % MERSENNE31
        out[b] = acc + b * MERSENNE31  # disjoint key space per band
    return out


def token_hash64(token: str) -> int:
    """Stable 64-bit token hash (blake2b truncation)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8", "ignore"), digest_size=8).digest(),
        "big",
        signed=True,
    )


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token list: sign of per-bit weight sums."""
    if not tokens:
        return 0
    hs = np.array([token_hash64(t) for t in tokens], dtype=np.int64).view(np.uint64)
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    weights = np.where(bits == 1, 1, -1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if weights[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def rolling_fingerprint(text: str, k: int = 8) -> int:
    """Document fingerprint: minimum k-gram rolling hash (1-perm MinHash) —
    stable under small edits away from the minimizing window."""
    return int(char_shingle_hashes(text, k).min())


def hyperplane_sketch(vecs: np.ndarray, n_planes: int = 16, seed: int = 7) -> np.ndarray:
    """Random-hyperplane LSH bucket ids for rows of ``vecs`` (N, D):
    sign-bit sketch packed into int64. Cosine-similar vectors collide."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((vecs.shape[1], n_planes))
    bits = (vecs @ planes) > 0
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    return (bits.astype(np.int64) * weights[None, :]).sum(axis=1)
