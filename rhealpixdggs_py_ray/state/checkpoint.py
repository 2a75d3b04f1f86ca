"""Per-partition checkpoint manifest: resumable pipelines with lineage
and metrics.

Ray Data gives task-level retries within one run but nothing across
runs (SURVEY.md §4), so the engine adds an explicit layer:

- the input file list is split into P partitions (key ranges of the
  input layout);
- each partition runs as its own internally-parallel sub-pipeline whose
  output lands in ``out/part=<i>/`` via an atomic tmp-dir rename;
- a manifest JSON per partition records lineage (input fragments,
  engine-config hash, code version) and metrics (rows in/out, wall
  seconds);
- a resumed run lists manifests, verifies the config hash, skips
  completed partitions, and processes only the remainder.

Killing a run after >=1 partition and re-running produces byte-identical
sorted output (FIXTURES.md §3 invariant 3); tests/test_ray_pipelines.py
exercises exactly that.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass


def _config_hash(payload) -> str:
    return hashlib.sha256(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()[:16]


def _prewarm_fs_probe() -> None:
    """Ray Data's path resolution probes ``fsspec.implementations.http``
    on every read/write (ray/data/datasource/path_util.py
    ``_is_http_filesystem``).  With aiohttp absent that import fails
    every time; two driver threads racing the failed import hit
    CPython's partial-module window and see ``ImportError: cannot
    import name 'HTTPFileSystem'`` — which Ray's ``except
    ModuleNotFoundError`` does NOT catch, killing one partition.  Probe
    once here and, when the import can never succeed, cache the
    conclusion as a sentinel module whose ``HTTPFileSystem`` nothing is
    an instance of, so concurrent dataset construction never re-runs
    the failing import."""
    import sys

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import types

        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — isinstance() is always False
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = m
    except Exception:
        pass


@dataclass
class CheckpointedRun:
    """Drives a partitioned, resumable pipeline run.

    ``pipeline_fn(input_files: list[str], out_dir: str) -> dict`` runs
    one partition's (internally parallel) Dataset pipeline, writes its
    output under ``out_dir`` and returns metrics ({"rows_out": n, ...}).
    """

    out_root: str
    config_payload: dict

    def _manifest_path(self, i: int) -> str:
        return os.path.join(self.out_root, f"part={i:05d}.manifest.json")

    def completed_partitions(self) -> dict[int, dict]:
        if not os.path.isdir(self.out_root):
            return {}
        chash = _config_hash(self.config_payload)
        done = {}
        for f in os.listdir(self.out_root):
            if not f.endswith(".manifest.json"):
                continue
            try:
                with open(os.path.join(self.out_root, f)) as fh:
                    m = json.load(fh)
            except (OSError, json.JSONDecodeError):
                # truncated/corrupt manifest (crash mid-publish before
                # manifests became atomic) => treat partition as not done
                continue
            if m.get("config_hash") == chash and m.get("status") == "complete":
                done[m["partition"]] = m
        return done

    def run(self, partitions: list[list[str]], pipeline_fn,
            max_concurrent: int | None = None) -> dict:
        """Process all partitions, skipping completed ones.  Returns a
        summary with per-partition metrics (fresh + reused).

        Pending partitions run CONCURRENTLY from driver threads (each
        Dataset pipeline gets its own streaming executor, so two
        partitions' stages interleave on the cluster instead of running
        back-to-back); publication stays per-partition atomic — each
        thread renames only its own tmp dir and writes only its own
        manifest, so a kill mid-run still leaves byte-identical
        resumable state."""
        os.makedirs(self.out_root, exist_ok=True)
        chash = _config_hash(self.config_payload)
        done = self.completed_partitions()
        summary = {"reused": sorted(done), "fresh": [], "metrics": dict(done)}

        def _one(i: int) -> dict:
            files = partitions[i]
            part_dir = os.path.join(self.out_root, f"part={i:05d}")
            tmp_dir = part_dir + ".tmp"
            if os.path.isdir(tmp_dir):
                shutil.rmtree(tmp_dir)  # incomplete previous attempt
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
            os.makedirs(tmp_dir)
            t0 = time.perf_counter()
            metrics = pipeline_fn(files, tmp_dir) or {}
            os.rename(tmp_dir, part_dir)  # atomic publish
            manifest = {
                "partition": i,
                "status": "complete",
                "config_hash": chash,
                "config": self.config_payload,
                "input_fragments": files,
                "wall_seconds": round(time.perf_counter() - t0, 4),
                **metrics,
            }
            # atomic manifest publish: a crash mid-write must leave
            # either no manifest or a complete one, never truncated JSON
            mp = self._manifest_path(i)
            with open(mp + ".tmp", "w") as fh:
                json.dump(manifest, fh, indent=1)
            os.rename(mp + ".tmp", mp)
            return manifest

        pending = [i for i in range(len(partitions)) if i not in done]
        if pending:
            from concurrent.futures import ThreadPoolExecutor

            _prewarm_fs_probe()

            workers = max(1, min(max_concurrent or 4, len(pending)))
            with ThreadPoolExecutor(max_workers=workers) as ex:
                for i, manifest in zip(pending, ex.map(_one, pending)):
                    summary["fresh"].append(i)
                    summary["metrics"][i] = manifest
        return summary
