"""Cohort batch runtime — the Dask replacement.

The reference fans a per-knee delayed DAG (segment ∥ register -> warp ->
thickness) out to cloud GPU workers via Dask's TCP scheduler
(dask_processing.py, DaskComputationCoiled.ipynb), re-downloading models per
task and with no recompute avoidance (SURVEY.md §5). Here the dynamic task
DAG collapses into a static compiled per-knee pipeline plus a simple,
fault-tolerant work queue:

  * an append-only JSONL manifest records per-item status (done/failed +
    error) — a restarted run skips completed items (the reference's
    planned-but-missing Dagster recompute avoidance). Each host appends to
    its OWN shard file (`<name>.h<id>.jsonl`) and reads merge all shards, so
    N concurrent writers on a shared filesystem never clobber each other
    (the round-1 read-modify-rewrite JSON design lost cross-host updates);
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
    """Resumable run state, persisted after every item.

    On disk: one append-only JSONL shard per host (`<name>.h<id>.jsonl`,
    one `{"key": ..., "status": ..., "time": ...}` record per line; last
    record per key wins). A host only ever appends to its own shard —
    single-`write` + O_APPEND, so concurrent hosts on a shared filesystem
    cannot lose each other's updates. A legacy single-JSON manifest at
    `path` is read as the baseline if present (round-1 format).
    """

    path: Path
    host: int = 0
    items: Dict[str, dict] = dataclasses.field(default_factory=dict)

    @classmethod
    def open(cls, path, host: Optional[int] = None) -> "CohortManifest":
        path = Path(path)
        if host is None:
            host, _ = _host_info()
        m = cls(path=path, host=host)
        m.reload()
        return m

    def _shard_paths(self) -> List[Path]:
        return sorted(self.path.parent.glob(self.path.name + ".h*.jsonl"))

    def _own_shard(self) -> Path:
        return self.path.parent / f"{self.path.name}.h{self.host}.jsonl"

    def reload(self) -> None:
        """Merge the legacy JSON baseline + every host's shard; the newest
        record per key (by timestamp, ties to later shard lines) wins."""
        items: Dict[str, dict] = {}
        if self.path.exists():
            with open(self.path) as f:
                items.update(json.load(f))
        for shard in self._shard_paths():
            with open(shard) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    key = rec.pop("key")
                    if key not in items or rec.get("time", 0) >= items[key].get("time", 0):
                        items[key] = rec
        self.items = items

    def is_done(self, key: str) -> bool:
        return self.items.get(key, {}).get("status") == "done"

    def mark(self, key: str, status: str, **info) -> None:
        rec = {"status": status, "time": time.time(), **info}
        self.items[key] = rec
        self.path.parent.mkdir(parents=True, exist_ok=True)
        line = json.dumps({"key": key, **rec}) + "\n"
        with open(self._own_shard(), "a") as f:
            f.write(line)
            f.flush()

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
        host: Optional[int] = None,
        n_hosts: Optional[int] = None,
    ):
        """host / n_hosts override jax.distributed's process index/count —
        for external schedulers (SLURM array jobs) and tests."""
        auto_host, auto_n = _host_info()
        self.host = auto_host if host is None else host
        self.n_hosts = auto_n if n_hosts is None else n_hosts
        self.pipeline = pipeline
        self.manifest = CohortManifest.open(manifest_path, host=self.host)
        self.max_retries = max_retries
        self.verbose = verbose

    def run(self, items: Sequence[Any], keys: Optional[Sequence[str]] = None) -> dict:
        keys = list(keys) if keys is not None else [str(i) for i in items]
        host, n_hosts = self.host, self.n_hosts
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
        # pick up every host's records before summarizing
        self.manifest.reload()
        return self.manifest.summary()
