"""Cohort batch runtime — the Dask replacement.

The reference fans a per-knee delayed DAG (segment ∥ register -> warp ->
thickness) out to cloud GPU workers via Dask's TCP scheduler
(dask_processing.py, DaskComputationCoiled.ipynb), re-downloading models per
task and with no recompute avoidance (SURVEY.md §5). Here the dynamic task
DAG collapses into a static compiled per-knee pipeline plus a simple,
fault-tolerant work queue:

  * a JSON manifest records per-item status (done/failed + error) — a
    restarted run skips completed items (the reference's planned-but-missing
    Dagster recompute avoidance);
  * items are processed by a user pipeline callable; failures are caught,
    recorded, and do not kill the run;
  * multi-host fan-out: each host claims items by index stride
    (host_id, n_hosts from jax.distributed when initialized — cohort items
    ride DCN only as file paths, results stay host-local);
  * per-stage wall times are recorded per item (the reference's only timing
    was a notebook %%time, SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json
import time
import traceback
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence


@dataclasses.dataclass
class CohortManifest:
    """Resumable run state, persisted as JSON after every item."""

    path: Path
    items: Dict[str, dict] = dataclasses.field(default_factory=dict)

    @classmethod
    def open(cls, path) -> "CohortManifest":
        path = Path(path)
        if path.exists():
            with open(path) as f:
                return cls(path=path, items=json.load(f))
        return cls(path=path)

    def is_done(self, key: str) -> bool:
        return self.items.get(key, {}).get("status") == "done"

    def mark(self, key: str, status: str, **info) -> None:
        self.items[key] = {"status": status, "time": time.time(), **info}
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(self.items, f, indent=1)
        tmp.replace(self.path)

    def summary(self) -> dict:
        counts: Dict[str, int] = {}
        for v in self.items.values():
            counts[v["status"]] = counts.get(v["status"], 0) + 1
        return counts


def _host_info():
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001
        return 0, 1


class CohortRunner:
    """Run a pipeline over a cohort of items with resume + failure isolation.

    pipeline: Callable[(item) -> dict of result metadata (json-serializable)].
    Heavy outputs (probmaps, meshes) should be written to disk by the
    pipeline; the returned metadata lands in the manifest.
    """

    def __init__(
        self,
        pipeline: Callable[[Any], dict],
        manifest_path="cohort_manifest.json",
        max_retries: int = 1,
        verbose: bool = True,
    ):
        self.pipeline = pipeline
        self.manifest = CohortManifest.open(manifest_path)
        self.max_retries = max_retries
        self.verbose = verbose

    def run(self, items: Sequence[Any], keys: Optional[Sequence[str]] = None) -> dict:
        keys = list(keys) if keys is not None else [str(i) for i in items]
        host, n_hosts = _host_info()
        for idx, (key, item) in enumerate(zip(keys, items)):
            if idx % n_hosts != host:
                continue
            if self.manifest.is_done(key):
                if self.verbose:
                    print(f"[cohort] skip (done): {key}")
                continue
            attempts = self.manifest.items.get(key, {}).get("attempts", 0)
            t0 = time.time()
            try:
                result = self.pipeline(item)
                self.manifest.mark(
                    key,
                    "done",
                    seconds=time.time() - t0,
                    attempts=attempts + 1,
                    result=result,
                )
                if self.verbose:
                    print(f"[cohort] done: {key} ({time.time() - t0:.1f}s)")
            except Exception as e:  # noqa: BLE001 — isolate item failures
                status = "failed" if attempts + 1 > self.max_retries else "retry"
                self.manifest.mark(
                    key,
                    status,
                    seconds=time.time() - t0,
                    attempts=attempts + 1,
                    error=f"{type(e).__name__}: {e}",
                    trace=traceback.format_exc(limit=8),
                )
                if self.verbose:
                    print(f"[cohort] {status}: {key}: {e}")
        return self.manifest.summary()
