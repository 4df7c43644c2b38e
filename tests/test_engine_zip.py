"""engine.zip staleness guard.

``spark-submit --py-files engine.zip`` (jobs/flagship_job.py) ships the
package to executors; a zip built before the latest source edits silently
runs OLD code on the cluster while local tests pass on new code. This pins
every packaged module to its on-disk bytes — when it fails, rebuild with:

    cd /root/repo && rm engine.zip && \
        zip -rq engine.zip stac_catalog_builder_spark -x "*__pycache__*"
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_engine_zip_matches_source_tree():
    # engine.zip is force-tracked past .gitignore; if it is ever missing,
    # fail with the rebuild command instead of a bare FileNotFoundError
    assert (REPO / "engine.zip").exists(), (
        "engine.zip missing — rebuild: cd /root/repo && "
        'zip -rq engine.zip stac_catalog_builder_spark -x "*__pycache__*"'
    )
    zf = zipfile.ZipFile(REPO / "engine.zip")
    packaged = {
        i.filename: i for i in zf.infolist() if i.filename.endswith(".py")
    }
    on_disk = {
        str(p.relative_to(REPO)): p
        for p in (REPO / "stac_catalog_builder_spark").rglob("*.py")
        if "__pycache__" not in p.parts
    }
    missing = sorted(set(on_disk) - set(packaged))
    assert not missing, f"modules missing from engine.zip (rebuild it): {missing}"
    stale = [
        name
        for name, p in on_disk.items()
        if zf.read(name) != p.read_bytes()
    ]
    assert not stale, f"engine.zip is STALE for (rebuild it): {sorted(stale)}"
    extra = sorted(set(packaged) - set(on_disk))
    assert not extra, f"engine.zip ships deleted modules (rebuild it): {extra}"
