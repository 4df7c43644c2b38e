"""WebDataset-style training shard sink: byte-deterministic tar shards.

Training loaders stream samples from posix tar shards (the WebDataset /
TFRecord delivery shape) — sequential reads, one shard per worker, no
per-sample object-store round trips. The reference has no analogue (it
saves one JSON item per file, stacbuilder/builder.py:512-519 — exactly the
small-file pattern shard packing exists to avoid at 10^12 samples).

Design (100 TB shape):
- **Deterministic assignment**: shard = hash(key) mod n_shards (the same
  31-bit scramble the split/sampling family uses) — stable under retries
  and repartitioning, and any sample's shard is computable without a
  manifest lookup. ``n_shards`` comes from lake statistics (rows x avg
  payload / budget), scaling shard count with the data so no shard
  outgrows an executor — the same discipline as ``packing.pack_sequences``.
- **One shuffle**: repartition by shard id; each task builds its shards'
  tars in memory (bounded by the shard budget) and writes them itself —
  executors write shards directly, nothing funnels through the driver.
- **Byte-determinism**: members are sorted by key and every tar header is
  normalized (mtime=0, uid/gid=0, no uname) — re-running the sink emits
  byte-identical shards, which is what makes the idempotent commit below
  sound (tests assert identical bytes across runs).
- **Exactly-once resume**: shards land under a temp name and move into
  place atomically (os.replace); a shard whose final file already exists
  with the expected sha256 is skipped, so a partially-failed job re-run
  rewrites only the missing shards. The returned manifest (one row per
  shard: members, bytes, sha256, skipped) is the lineage/metrics row the
  north rule asks of every sink (cf. sources/checkpoint.SnapshotStore).

Each sample is stored as ``<key>.<payload_ext>`` plus ``<key>.json``
holding the metadata columns — the WebDataset convention (sample =
same-stem members).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import _bucket


def shard_id_col(key, n_shards: int):
    """Deterministic shard id in [0, n_shards) for a key column."""
    return F.pmod(_bucket(key, salt=0), F.lit(n_shards))


def _tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """A normalized (byte-deterministic) uncompressed tar of (name, data)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "image_id",
    payload_col: str = "bytes",
    payload_ext: str = "img",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as ``shard-%05d.tar`` files under ``out_dir`` and return
    the shard manifest DataFrame (shard_id, n_members, tar_bytes, sha256,
    skipped). See the module docstring for the determinism/resume contract.
    """
    meta_cols = meta_cols or []
    os.makedirs(out_dir, exist_ok=True)
    keyed = df.select(
        F.col(key_col).cast("string").alias("_key"),
        F.col(payload_col).alias("_payload"),
        *[F.col(c) for c in meta_cols],
        shard_id_col(F.col(key_col), n_shards).alias("_shard"),
    ).repartition(n_shards, "_shard")

    ext = payload_ext

    def build(rows):
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["_shard"], []).append(r)
        for shard, items in by_shard.items():
            items.sort(key=lambda r: r["_key"])
            members: list[tuple[str, bytes]] = []
            for r in items:
                members.append((f"{r['_key']}.{ext}", bytes(r["_payload"])))
                meta = {c: r[c] for c in meta_cols}
                members.append(
                    (
                        f"{r['_key']}.json",
                        json.dumps(meta, sort_keys=True, default=str).encode(),
                    )
                )
            blob = _tar_bytes(members)
            sha = hashlib.sha256(blob).hexdigest()
            final = Path(out_dir) / f"shard-{shard:05d}.tar"
            skipped = False
            if final.exists() and hashlib.sha256(final.read_bytes()).hexdigest() == sha:
                skipped = True  # exactly-once: already committed, bytes match
            else:
                tmp = final.with_suffix(f".tar.tmp.{os.getpid()}")
                tmp.write_bytes(blob)
                os.replace(tmp, final)  # atomic commit
            yield (int(shard), len(items), len(blob), sha, skipped)

    manifest = keyed.rdd.mapPartitions(
        lambda it: build(r.asDict() for r in it)
    ).toDF("shard_id int, n_members int, tar_bytes int, sha256 string, skipped boolean")
    # mapPartitions (not mapInPandas) is deliberate: payloads are opaque
    # variable-length binaries streamed straight into the tar writer — there
    # is no vectorizable math, and Arrow batching would only copy the bytes
    # an extra time. This is the documented last-resort recipe (c).
    return manifest


def read_webdataset_shards(
    spark, in_dir: str, payload_ext: str = "img"
) -> DataFrame:
    """Read a WebDataset shard directory back into rows — the import half
    of the shard round trip (migrating a tar-delivered training corpus
    INTO the lakehouse, or auditing what a sink emitted).

    Distributed shape: ``binaryFile`` lists and reads the tars (one row
    per shard, executors fetch their own files — the driver never touches
    payload bytes), and a per-partition tar walk reassembles same-stem
    members into samples. A shard is parsed entirely by one task, which is
    exactly the sink's budget contract (``n_shards`` sized so a shard fits
    an executor); tasks scale with shard count, the same parallelism the
    training loader itself gets. mapPartitions, not mapInPandas, for the
    same reason as the sink: opaque variable-length binaries, no
    vectorizable math, Arrow would copy the bytes once more.

    Output: key, payload (binary), meta_json (the sample's ``.json``
    member, verbatim), shard_id. Round-trip fidelity (payload bytes +
    metadata + shard assignment) is pytest-pinned against the sink.
    """
    import io
    import tarfile

    files = spark.read.format("binaryFile").load(
        str(Path(in_dir) / "shard-*.tar")
    )

    def parse(rows):
        for r in rows:
            shard = int(Path(r.path).stem.rsplit("-", 1)[1])
            with tarfile.open(fileobj=io.BytesIO(bytes(r.content))) as tf:
                samples: dict[str, dict[str, bytes]] = {}
                for m in tf.getmembers():
                    stem, _, suffix = m.name.rpartition(".")
                    samples.setdefault(stem, {})[suffix] = tf.extractfile(m).read()
            for stem in sorted(samples):
                d = samples[stem]
                yield (
                    stem,
                    bytearray(d.get(payload_ext, b"")),
                    d.get("json", b"{}").decode(),
                    shard,
                )

    return (
        files.select("path", "content")
        .rdd.mapPartitions(parse)
        .toDF("key string, payload binary, meta_json string, shard_id int")
    )
