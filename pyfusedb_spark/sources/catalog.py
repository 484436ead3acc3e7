"""Iceberg-semantics manifest layer: atomic snapshot commits + resume.

No Iceberg jars are available in this sandbox (no network to Maven
Central), so we implement the *semantics* the north rule needs — per-
partition posting-segment manifests (term range, doc count, bytes, sha256
lineage, per-stage metrics) committed transactionally, and kill-resume
that skips committed segments — in plain Python over Parquet directories:

    <root>/
      tf/bucket=K/*.parquet          stage-1 term-frequency rows
      doc_stats/*.parquet            (doc_id, doc_len, sha256[, norm])
      index/bucket=K/*.parquet       encoded posting chunks
      lexicon/*.parquet              (term, df, n_postings)
      _manifests/<key>.json          one manifest per committed unit
      _manifests/snapshot.json       atomic snapshot listing all manifests
      stats.json                     global stats (N, avgdl, config)

Commit protocol: data is written to ``<dir>.tmp-<nonce>`` and atomically
``os.replace``d into place, then the manifest JSON is written tmp+rename,
then snapshot.json is rewritten tmp+rename. A killed build leaves either
no manifest (unit re-runs) or a complete one (unit is skipped) — the
reference's temp-file rename dance (``app/InvertedIndex.py:283-296``)
generalized to a transactional catalog. Keep this interface thin so real
Iceberg ``writeTo(...).append()`` can slot in when jars are available.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def write_json_atomic(path: str, payload: dict) -> None:
    """tmp + os.replace JSON write — readers never observe a torn file.

    Used for stats.json (rewritten per streaming micro-batch while a
    held-open FuseIndex re-reads it on every search) and any other
    sidecar JSON that has live readers."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


class ManifestCatalog:
    def __init__(self, root: str):
        self.root = root
        self.mdir = os.path.join(root, "_manifests")
        os.makedirs(self.mdir, exist_ok=True)

    # -- atomic file helpers ------------------------------------------------
    def _write_json_atomic(self, path: str, payload: dict) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    @staticmethod
    def staging_dir(final_dir: str) -> str:
        return f"{final_dir}.tmp-{uuid.uuid4().hex[:8]}"

    @staticmethod
    def promote_dir(staging: str, final_dir: str) -> None:
        """Atomically move a finished staging dir into place (and drop
        any orphaned sibling stagings from earlier killed attempts —
        they'd otherwise match `dir/*/*.parquet` globs and double-count)."""
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)
        os.replace(staging, final_dir)
        prefix = os.path.basename(final_dir) + ".tmp-"
        parent = os.path.dirname(final_dir) or "."
        for name in os.listdir(parent):
            if name.startswith(prefix):
                shutil.rmtree(os.path.join(parent, name), ignore_errors=True)

    @staticmethod
    def clean_orphan_staging(root: str) -> None:
        """Remove every `*.tmp-*` staging dir under root (recursive one
        level into hive dirs). Called on build resume BEFORE any stage
        reads/aggregates — a killed run's leftovers must not be scanned."""
        if not os.path.isdir(root):
            return
        for dirpath, dirnames, _files in os.walk(root):
            for d in list(dirnames):
                if ".tmp-" in d:
                    shutil.rmtree(os.path.join(dirpath, d), ignore_errors=True)
                    dirnames.remove(d)

    # -- manifests ------------------------------------------------------------
    def manifest_path(self, key: str) -> str:
        return os.path.join(self.mdir, f"{key}.json")

    def is_committed(self, key: str) -> bool:
        p = self.manifest_path(key)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        data_dir = m.get("data_dir")
        return data_dir is None or os.path.exists(data_dir)

    def read_manifest(self, key: str) -> dict | None:
        if not self.is_committed(key):
            return None
        with open(self.manifest_path(key)) as f:
            return json.load(f)

    def commit(self, key: str, manifest: dict) -> None:
        """Commit one unit (a bucket segment / a stage) + refresh snapshot."""
        self._write_json_atomic(self.manifest_path(key), manifest)
        self._refresh_snapshot()

    def uncommit(self, key: str) -> None:
        p = self.manifest_path(key)
        if os.path.exists(p):
            os.remove(p)
        self._refresh_snapshot()

    def _refresh_snapshot(self) -> None:
        keys = sorted(
            f[:-5] for f in os.listdir(self.mdir) if f.endswith(".json") and f != "snapshot.json"
        )
        manifests = {}
        for k in keys:
            try:
                with open(self.manifest_path(k)) as f:
                    manifests[k] = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
        self._write_json_atomic(
            os.path.join(self.mdir, "snapshot.json"),
            {"snapshot_of": keys, "manifests": manifests},
        )

    def snapshot(self) -> dict:
        p = os.path.join(self.mdir, "snapshot.json")
        if not os.path.exists(p):
            return {"snapshot_of": [], "manifests": {}}
        with open(p) as f:
            return json.load(f)
