"""Multi-host cohort manifest safety: concurrent writers on a shared
filesystem must not lose each other's updates (VERDICT round-1 weak #4)."""

import json
import subprocess
import sys
import threading
from pathlib import Path

from oai_analysis_2_tpu.parallel.cohort import CohortManifest, CohortRunner


class TestManifestShards:
    def test_concurrent_writers_no_lost_updates(self, tmp_path):
        """N threads, each with its own host shard, hammer the same manifest
        path; the merged view must contain every record."""
        path = tmp_path / "manifest.json"
        n_hosts, per_host = 4, 50

        def writer(host):
            m = CohortManifest.open(path, host=host)
            for i in range(per_host):
                m.mark(f"h{host}_i{i}", "done", seconds=0.01)

        threads = [threading.Thread(target=writer, args=(h,)) for h in range(n_hosts)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        merged = CohortManifest.open(path)
        assert len(merged.items) == n_hosts * per_host
        assert all(v["status"] == "done" for v in merged.items.values())
        assert merged.summary() == {"done": n_hosts * per_host}

    def test_latest_record_wins(self, tmp_path):
        path = tmp_path / "manifest.json"
        m0 = CohortManifest.open(path, host=0)
        m1 = CohortManifest.open(path, host=1)
        m0.mark("x", "retry")
        m1.mark("x", "done")
        merged = CohortManifest.open(path)
        assert merged.items["x"]["status"] == "done"

    def test_legacy_json_baseline(self, tmp_path):
        """A round-1 single-JSON manifest is read as the baseline and shard
        records override it."""
        path = tmp_path / "manifest.json"
        path.write_text(json.dumps({"a": {"status": "done", "time": 1.0},
                                    "b": {"status": "failed", "time": 1.0}}))
        m = CohortManifest.open(path, host=0)
        assert m.is_done("a") and not m.is_done("b")
        m.mark("b", "done")
        merged = CohortManifest.open(path)
        assert merged.is_done("b")


class TestTwoProcessCohort:
    def test_two_processes_share_manifest(self, tmp_path):
        """Two real OS processes run disjoint strides of one cohort against
        the same manifest directory; the merged manifest sees all items done
        exactly once."""
        script = tmp_path / "worker.py"
        script.write_text(
            "import sys, json, faulthandler\n"
            "faulthandler.dump_traceback_later(120, exit=True)\n"  # self-report hangs
            "sys.path.insert(0, {root!r})\n"
            "from oai_analysis_2_tpu.parallel.cohort import CohortRunner\n"
            "host = int(sys.argv[1])\n"
            "done = []\n"
            "def pipe(item):\n"
            "    done.append(item)\n"
            "    return {{'item': item}}\n"
            "r = CohortRunner(pipe, manifest_path={mani!r}, verbose=False,\n"
            "                 host=host, n_hosts=2, claim_ttl=30.0,\n"
            "                 poll_seconds=0.2)\n"
            "summary = r.run([f'knee{{i}}' for i in range(10)])\n"
            "print(json.dumps({{'host': host, 'processed': done}}))\n".format(
                root=str(Path(__file__).resolve().parent.parent),
                mani=str(tmp_path / "manifest.json"),
            )
        )
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(h)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for h in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                for q in procs:  # collect both workers' state for diagnosis
                    q.kill()
                diags = [q.communicate() for q in procs]
                raise AssertionError(
                    f"worker timed out; stderr dumps: {diags!r}"
                ) from None
            assert p.returncode == 0, err
            outs.append(json.loads(out.strip().splitlines()[-1]))

        processed = {o["host"]: set(o["processed"]) for o in outs}
        # disjoint strides, full coverage
        assert processed[0] & processed[1] == set()
        assert processed[0] | processed[1] == {f"knee{i}" for i in range(10)}

        merged = CohortManifest.open(tmp_path / "manifest.json")
        assert merged.summary() == {"done": 10}

    def test_resume_skips_other_hosts_work(self, tmp_path):
        """After host 0 finishes its stride, a rerun covering ALL items (one
        host) must skip host 0's completed ones."""
        path = tmp_path / "manifest.json"
        # static striding pins host 0 to items 0,2,4 (under the default
        # dynamic claiming a lone host would drain the whole queue)
        r0 = CohortRunner(
            lambda i: {}, manifest_path=path, verbose=False, host=0, n_hosts=2,
            scheduling="static",
        )
        r0.run([f"k{i}" for i in range(6)])

        calls = []
        r_all = CohortRunner(
            lambda i: calls.append(i) or {}, manifest_path=path, verbose=False, host=0, n_hosts=1
        )
        summary = r_all.run([f"k{i}" for i in range(6)])
        assert calls == ["k1", "k3", "k5"]
        assert summary == {"done": 6}
