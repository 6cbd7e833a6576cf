"""Per-stage Parquet checkpoints with lineage manifests.

BASELINE.json north_star: "Every stage checkpoints per-partition
Parquet with lineage manifests and metrics so runs resume
mid-pipeline."  The reference has nothing comparable † (jobs restart
from scratch; SURVEY.md §4) — this is an engine addition.

Layout:  <root>/<stage>/part-*.parquet  +  <root>/<stage>/_MANIFEST.json
Manifest: {stage, fingerprint, code_version, row_count, wall_time_s,
metrics, created_at}.  A stage is skipped on rerun iff its manifest
exists and its fingerprint (hash of input fingerprints + stage params +
code version) matches; writes go to a temp dir renamed into place so a
killed run never leaves a half-written checkpoint that validates.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

import ray.data

CODE_VERSION = "engine/1"


def fingerprint_of(*parts) -> str:
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()


class CheckpointManager:
    """Stage-level resume.  ``enabled=False`` (root=None) degrades to
    pass-through execution with the same code path."""

    def __init__(self, root: str | None):
        self.root = root
        if root:
            os.makedirs(root, exist_ok=True)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "_MANIFEST.json")

    def load_manifest(self, stage: str) -> dict | None:
        try:
            with open(self._manifest_path(stage)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def run_stage(self, stage: str, fingerprint: str,
                  fn: Callable[[], "ray.data.Dataset"],
                  metrics: dict | None = None) -> "ray.data.Dataset":
        """Return the stage's Dataset, reading the checkpoint when its
        manifest validates, else computing + persisting it."""
        if not self.root:
            return fn()
        man = self.load_manifest(stage)
        sdir = self.stage_dir(stage)
        if man and man.get("fingerprint") == fingerprint \
                and man.get("code_version") == CODE_VERSION:
            return ray.data.read_parquet(sdir)
        t0 = time.monotonic()
        ds = fn()
        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
        ds.write_parquet(tmp)
        wall = time.monotonic() - t0
        os.rename(tmp, sdir)
        out = ray.data.read_parquet(sdir)
        manifest = {
            "stage": stage,
            "fingerprint": fingerprint,
            "code_version": CODE_VERSION,
            "row_count": out.count(),
            "wall_time_s": round(wall, 3),
            "metrics": metrics or {},
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=1)
        return out
