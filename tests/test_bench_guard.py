"""Outage-robustness of the driver entry points (bench.py + __graft_entry__).

Round-4 failure mode: the remote-TPU tunnel died and (a) bench.py's fallback ladder
re-exec'd into a backend init that hung until the driver timeout (BENCH_r04 rc:124),
(b) dryrun_multichip probed the parent's dead backend before deciding to re-exec on
CPU (MULTICHIP_r04 rc:124). The contract under test: backend/tunnel failures produce
a structured error JSON and a fast non-zero exit; the multichip dryrun NEVER touches
the parent process's backend.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


# The real r4 traceback tail (BENCH_r04.json) — must classify as a backend failure.
_R4_TAIL = (
    "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE: "
    "TPU backend setup/compile error (Unavailable)."
)


class TestFailureClassification:
    def test_r4_tunnel_death_is_backend_failure(self):
        assert bench._is_backend_failure(_R4_TAIL)

    def test_unavailable_is_backend_failure(self):
        assert bench._is_backend_failure("jax.errors.JaxRuntimeError: UNAVAILABLE: x")

    def test_oom_is_mode_failure_not_backend(self):
        # RESOURCE_EXHAUSTED must go to the fallback ladder, not fail-fast
        assert not bench._is_backend_failure(
            "XlaRuntimeError: RESOURCE_EXHAUSTED: Out of memory allocating 2.1G"
        )

    def test_shape_error_is_mode_failure(self):
        assert not bench._is_backend_failure(
            "TypeError: dot_general requires contracting dimensions to match"
        )


class TestBackendProbe:
    def _force_probe(self, monkeypatch):
        # conftest pins JAX_PLATFORMS=cpu which (correctly) skips the probe;
        # simulate the driver's TPU env for these tests
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.delenv("BENCH_NO_PROBE", raising=False)

    def test_probe_skipped_on_cpu(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        # would hang if not skipped
        bench._probe_backend(timeout_s=1, code="import time; time.sleep(30)")

    def test_probe_healthy(self, monkeypatch, capsys):
        self._force_probe(monkeypatch)
        bench._probe_backend(timeout_s=30, code="print('probe-ok fake')")
        assert "probe OK" in capsys.readouterr().err

    def test_probe_hang_exits_fast_with_structured_json(self, monkeypatch, capsys):
        self._force_probe(monkeypatch)
        with pytest.raises(SystemExit) as ei:
            bench._probe_backend(timeout_s=2, code="import time; time.sleep(60)")
        assert ei.value.code == 3
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["error"] == "backend_unavailable"
        assert rec["where"] == "probe"
        assert rec["value"] is None

    def test_probe_unavailable_exits_with_structured_json(self, monkeypatch, capsys):
        self._force_probe(monkeypatch)
        code = (
            "import sys; sys.stderr.write(\"RuntimeError: Unable to initialize "
            "backend 'axon': UNAVAILABLE\\n\"); sys.exit(1)"
        )
        with pytest.raises(SystemExit) as ei:
            bench._probe_backend(timeout_s=30, code=code)
        assert ei.value.code == 3
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["error"] == "backend_unavailable"
        assert "UNAVAILABLE" in rec["detail"]


class TestDryrunNeverTouchesParentBackend:
    def test_reexecs_cpu_virtual_mesh_without_parent_device_probe(self, monkeypatch):
        """dryrun_multichip must decide to re-exec WITHOUT calling jax.devices() in
        the parent (that call hangs forever on a dead tunnel — MULTICHIP_r04)."""
        import subprocess

        import __graft_entry__ as ge

        monkeypatch.delenv("_ZOOMEARTH_DRYRUN_CHILD", raising=False)
        calls = {}

        def fake_run(cmd, env=None, cwd=None, **kw):
            calls["cmd"] = cmd
            calls["env"] = env

            class R:
                returncode = 0

            return R()

        monkeypatch.setattr(subprocess, "run", fake_run)
        # poison the parent backend: any devices() probe fails the test
        import jax

        def boom(*a, **kw):
            raise AssertionError("parent backend touched by dryrun_multichip")

        monkeypatch.setattr(jax, "devices", boom)
        ge.dryrun_multichip(8)
        assert calls["env"]["_ZOOMEARTH_DRYRUN_CHILD"] == "1"
        assert "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
        code = calls["cmd"][-1]
        assert "jax.config.update('jax_platforms', 'cpu')" in code
        assert "dryrun_multichip(8)" in code


class TestBenchDriverEndToEnd:
    def test_tiny_bench_pair_mode_emits_timing_checks(self, tmp_path):
        """Drive bench.py's shipping mode (pair + prefix-KV waves) end-to-end at
        tiny scale in a subprocess: rc 0, one parseable JSON line, timing
        self-checks present. Guards the bench driver itself — the r4 pair/prefix
        machinery's only other at-scale exercise is the TPU bench."""
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.update({
            "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
            "JAX_COMPILATION_CACHE_DIR": os.path.join(repo, "tests", ".jax_cache"),
            "BENCH_TINY": "1", "BENCH_BATCH": "4", "BENCH_WAVES": "2",
            "BENCH_S1_NEW": "8", "BENCH_S2_NEW": "6", "BENCH_TILE_PX": "150",
        })
        env.pop("XLA_FLAGS", None)  # single-device CPU, not the 8-device test mesh
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, timeout=540, env=env, cwd=repo,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert rec["unit"] == "queries/sec/chip" and rec["value"] > 0
        assert "pair-pipelined" in rec["metric"]
        assert "timing_checks" in rec
        assert "ladder" not in proc.stderr  # no fallback rung fired


def test_entry_is_backend_free():
    """entry() must construct its (fn, args) WITHOUT touching any device backend
    (numpy leaves only): with a dead TPU tunnel even a jnp.zeros would hang the
    driver's compile-check before it applies its own timeout handling."""
    import numpy as np

    import __graft_entry__ as ge

    fn, args = ge.entry()
    import jax

    leaves = jax.tree.leaves(args)
    assert leaves, "no example args"
    assert all(isinstance(l, np.ndarray) for l in leaves), {
        type(l) for l in leaves if not isinstance(l, np.ndarray)}


class TestFallbackLadderChain:
    def test_ladder_descends_to_non_pipelined_rung(self, tmp_path):
        """With every pipelined rung forced to fail, the ladder must walk
        prefix+pair -> pair -> plain-pipelined -> NON-PIPELINED (the r3
        driver-captured configuration) and still emit a valid JSON line."""
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.update({
            "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
            "JAX_COMPILATION_CACHE_DIR": os.path.join(repo, "tests", ".jax_cache"),
            "BENCH_TINY": "1", "BENCH_FORCE_FAIL": "pipeline",
            "BENCH_WAVES": "2", "BENCH_S1_NEW": "8", "BENCH_S2_NEW": "6",
            "BENCH_TILE_PX": "150", "BENCH_BATCH": "4",
        })
        env.pop("XLA_FLAGS", None)
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, timeout=540, env=env, cwd=repo,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert proc.stderr.count("retrying one rung down") == 3
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert "pipelined" not in rec["metric"]
        assert rec["value"] > 0
