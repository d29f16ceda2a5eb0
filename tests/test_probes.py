"""Backend probe registry (utils/probes): measured per-backend decisions
replacing round-3's frozen A/B constants (VERDICT r3 item 5)."""

import json
import os

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.utils import probes


def test_snapshot_structure_and_caching(tmp_path, monkeypatch):
    """snapshot() returns every probe + decision; values memoize to disk
    under the backend fingerprint."""
    monkeypatch.setenv("HOME", str(tmp_path))
    probes._CACHE.clear()
    snap = probes.snapshot()
    for key in ("fingerprint", "matmul_tflops", "link_bandwidth_MBps",
                "link_latency_ms", "gather_strategy", "stepfit_chunk",
                "v8_chunk", "timetrace_prefetch"):
        assert key in snap, key
    path = probes._cache_path(probes.backend_fingerprint())
    assert os.path.exists(path)
    with open(path) as fh:
        disk = json.load(fh)
    assert disk["matmul_tflops_v2"] == pytest.approx(
        snap["matmul_tflops"], abs=5e-4)
    # Second call must come from the memo (no new measurement): poison
    # the measuring function and require the cached value.
    monkeypatch.setattr(probes, "_probe",
                        lambda name, fn: probes._CACHE[
                            probes.backend_fingerprint()][name])
    assert probes.matmul_tflops() == pytest.approx(snap["matmul_tflops"],
                                                   abs=5e-4)


def test_cpu_backend_keeps_safe_chunks(monkeypatch):
    """The CPU backend never probes big chunks (it is the host-fallback
    platform; a 65536-row score matrix is ~1.6 GB of scratch there)."""
    called = []
    monkeypatch.setattr(probes, "compile_ok",
                        lambda name, **kw: called.append(name) or True)
    assert probes.stepfit_chunk() == 2048
    assert probes.v8_chunk() == 32768
    assert called == []


def test_probes_off_mode(monkeypatch):
    monkeypatch.setenv("FSIA_PROBES", "off")
    assert probes.gather_strategy() == "gather"
    assert probes.stepfit_chunk() == 2048
    assert probes.v8_chunk() == 32768
    assert probes.timetrace_prefetch() is False


def test_decision_thresholds(monkeypatch):
    """Decision logic against synthetic probe values (no device work)."""
    monkeypatch.setattr(probes, "_is_cpu", lambda: False)
    monkeypatch.setattr(probes, "matmul_tflops", lambda: 30.0)
    assert probes.gather_strategy() == "onehot"
    monkeypatch.setattr(probes, "matmul_tflops", lambda: 0.3)
    assert probes.gather_strategy() == "gather"
    monkeypatch.setattr(probes, "compile_ok", lambda name, **kw: True)
    monkeypatch.setattr(probes, "measured_rates", lambda name, **kw: None)
    assert probes.stepfit_chunk() == 4096
    assert probes.v8_chunk() == 65536
    monkeypatch.setattr(probes, "compile_ok", lambda name, **kw: False)
    assert probes.stepfit_chunk() == 2048
    assert probes.v8_chunk() == 32768
    monkeypatch.setattr(probes, "link_bandwidth_MBps", lambda: 900.0)
    assert probes.timetrace_prefetch() is True
    monkeypatch.setattr(probes, "link_bandwidth_MBps", lambda: 70.0)
    assert probes.timetrace_prefetch() is False


def test_compile_probe_subprocess_failure_is_contained(monkeypatch,
                                                       tmp_path):
    """A probe whose child crashes (the real failure mode: compiler
    SIGABRT) must record False without taking the caller down."""
    monkeypatch.setenv("HOME", str(tmp_path))
    probes._CACHE.clear()
    monkeypatch.setitem(probes._COMPILE_PROBES, "crashy",
                        "import os; os.abort()")
    assert probes.compile_ok("crashy", timeout_s=120) is False


def test_compile_probe_ready_marker_caching(monkeypatch, tmp_path):
    """Ready-then-crash caches False (a real verdict on the shape); a
    child that never gets a device is NOT cached (transient environment
    failure — e.g. losing the single-tunneled-chip race)."""
    monkeypatch.setenv("HOME", str(tmp_path))
    probes._CACHE.clear()
    monkeypatch.setattr(probes, "_PROBE_PRELUDE",
                        "print('PROBE_BACKEND_READY')\n")
    monkeypatch.setitem(probes._COMPILE_PROBES, "ready_crash",
                        "import os; os.abort()")
    assert probes.compile_ok("ready_crash", timeout_s=120) is False
    cached = probes._load(probes.backend_fingerprint())
    key = [k for k in cached if k.startswith("ready_crash@")]
    assert key and cached[key[0]] is False

    monkeypatch.setattr(probes, "_PROBE_PRELUDE", "import os; os.abort()\n")
    monkeypatch.setitem(probes._COMPILE_PROBES, "no_device", "pass")
    assert probes.compile_ok("no_device", timeout_s=120) is False
    assert not any(k.startswith("no_device")
                   for k in probes._load(probes.backend_fingerprint()))


def test_link_probes_are_session_scoped(tmp_path, monkeypatch):
    """Link bandwidth/latency are SESSION properties (VERDICT r4 item 5):
    measured per process, never persisted, and stale pre-split disk
    entries are ignored — a slow-phase measurement can no longer freeze
    timetrace_prefetch for later sessions."""
    monkeypatch.setenv("HOME", str(tmp_path))
    probes._CACHE.clear()
    probes._SESSION.clear()
    # A pre-split cache carrying frozen link numbers must be ignored.
    fp = probes.backend_fingerprint()
    os.makedirs(os.path.dirname(probes._cache_path(fp)), exist_ok=True)
    with open(probes._cache_path(fp), "w") as fh:
        json.dump({"link_bandwidth_MBps": 99999.0,
                   "link_latency_s": 1e-9,
                   "matmul_tflops": 1.23}, fh)
    loaded = probes._load(fp)
    assert "link_bandwidth_MBps" not in loaded
    assert "link_latency_s" not in loaded
    assert loaded["matmul_tflops"] == 1.23  # backend props survive

    # Session measurement memoizes in-process, and never lands on disk.
    probes._SESSION["link_bandwidth_MBps"] = 42.0
    assert probes.link_bandwidth_MBps() == 42.0
    snap_keys = probes._load(fp)
    assert "link_bandwidth_MBps" not in snap_keys
    # refresh_session drops it so the next call re-measures.
    probes.refresh_session()
    assert "link_bandwidth_MBps" not in probes._SESSION


def test_snapshot_labels_provenance(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    probes._CACHE.clear()
    probes._SESSION.clear()
    snap = probes.snapshot()
    assert snap["link_source"] == "session"
    assert snap["matmul_tflops_source"] in ("measured-now", "disk-cache")
    assert "fetch_bandwidth_MBps" in snap
    # A second process-alike (fresh _CACHE, same disk) reports disk-cache.
    probes._CACHE.clear()
    probes._FRESH.clear()
    snap2 = probes.snapshot()
    assert snap2["matmul_tflops_source"] == "disk-cache"


def test_upload_group_items_sizing(monkeypatch):
    """Group sizing from the session link: groups grow until per-group
    upload time dominates latency, capped to keep 2 groups in flight,
    rounded to a mesh multiple; off-mode/CPU keep the static default."""
    monkeypatch.setattr(probes, "_is_cpu", lambda: False)
    monkeypatch.setattr(probes, "link_latency_s", lambda: 0.05)
    monkeypatch.setattr(probes, "link_bandwidth_MBps", lambda: 60.0)
    # 0.5 MB frames (the zstack shape): 4*0.05*60/0.5 = 24 frames.
    assert probes.upload_group_items(0.5, 1, 64) == 24
    # Mesh multiple rounding.
    assert probes.upload_group_items(0.5, 8, 64) % 8 == 0
    # 2-in-flight cap: a 32-frame stack caps at ceil(32/2)=16.
    assert probes.upload_group_items(0.5, 1, 32) == 16
    # 4 MB fields (config 4): 4*0.05*60/4 = 3 -> floor 8 wins.
    assert probes.upload_group_items(4.0, 1, 32) == 8
    # Tiny latency: floor wins.
    monkeypatch.setattr(probes, "link_latency_s", lambda: 1e-5)
    assert probes.upload_group_items(0.5, 1, 64) == 8
    # off-mode: static default, no link measurement.
    monkeypatch.setenv("FSIA_PROBES", "off")
    monkeypatch.setattr(probes, "link_latency_s",
                        lambda: (_ for _ in ()).throw(AssertionError))
    assert probes.upload_group_items(0.5, 4, 64) == 8


def test_measured_chunk_tier_decisions(monkeypatch):
    """The measured 4096-vs-8192 tier (VERDICT r4 item 6): the bigger
    chunk must WIN the throughput A/B by >5%, not merely compile; a
    failed/absent measurement keeps the compile-gated default."""
    monkeypatch.setattr(probes, "_is_cpu", lambda: False)
    monkeypatch.setattr(probes, "compile_ok", lambda name, **kw: True)
    monkeypatch.setattr(probes, "measured_rates",
                        lambda name, **kw: {"4096": 100.0, "8192": 120.0})
    assert probes.stepfit_chunk() == 8192
    assert probes.detect_chunk() == 8192
    monkeypatch.setattr(probes, "measured_rates",
                        lambda name, **kw: {"4096": 100.0, "8192": 103.0})
    assert probes.stepfit_chunk() == 4096  # a tie is not a win
    monkeypatch.setattr(probes, "measured_rates", lambda name, **kw: None)
    assert probes.stepfit_chunk() == 4096
    assert probes.detect_chunk() == 4096
    monkeypatch.setattr(probes, "compile_ok", lambda name, **kw: False)
    assert probes.stepfit_chunk() == 2048
    assert probes.detect_chunk() == 2048


def test_measured_rates_subprocess_and_caching(tmp_path, monkeypatch):
    """measured_rates: a real child emits PROBE_RESULT json (cached); a
    ready-then-crash child caches None; a no-device child is transient."""
    monkeypatch.setenv("HOME", str(tmp_path))
    probes._CACHE.clear()
    # Trivial prelude: the real one initializes a jax backend in the
    # child, which can take minutes through an unhealthy device tunnel —
    # the real-prelude integration is covered by the compile-probe tests.
    monkeypatch.setattr(probes, "_PROBE_PRELUDE",
                        "print('PROBE_BACKEND_READY')\n")
    monkeypatch.setitem(
        probes._MEASURE_PROBES, "fake_rates",
        "import json\n"
        "print('PROBE_RESULT ' + json.dumps({'4096': 10.0, '8192': 20.0}))\n"
        "print('PROBE_OK')\n")
    got = probes.measured_rates("fake_rates", timeout_s=120)
    assert got == {"4096": 10.0, "8192": 20.0}
    cached = probes._load(probes.backend_fingerprint())
    assert any(k.startswith("fake_rates@") for k in cached)

    monkeypatch.setitem(probes._MEASURE_PROBES, "crash_rates",
                        "import os; os.abort()")
    assert probes.measured_rates("crash_rates", timeout_s=120) is None
    cached = probes._load(probes.backend_fingerprint())
    key = [k for k in cached if k.startswith("crash_rates@")]
    assert key and cached[key[0]] is None  # real verdict: cached

    monkeypatch.setattr(probes, "_PROBE_PRELUDE", "import os; os.abort()\n")
    monkeypatch.setitem(probes._MEASURE_PROBES, "nodev_rates", "pass")
    assert probes.measured_rates("nodev_rates", timeout_s=120) is None
    assert not any(k.startswith("nodev_rates@")
                   for k in probes._load(probes.backend_fingerprint()))


def test_upload_group_items_capped_at_workload(monkeypatch):
    """The latency-derived group size must never exceed the workload
    itself (review r5): a tiny stack on a high-latency link would
    otherwise pad to a giant repeated-frame group, multiplying upload
    bytes and compiling a one-off inflated shape."""
    monkeypatch.setattr(probes, "_is_cpu", lambda: False)
    monkeypatch.setattr(probes, "link_latency_s", lambda: 0.05)
    monkeypatch.setattr(probes, "link_bandwidth_MBps", lambda: 60.0)
    # 0.016 MB frames: unbounded g would be 750.
    assert probes.upload_group_items(0.016, 1, 12) == 12
    assert probes.upload_group_items(0.016, 8, 12) == 16  # mesh multiple
    assert probes.upload_group_items(0.016, 1, 1) == 1


def test_probe_children_never_fork_grandchildren(monkeypatch, tmp_path):
    """Reentrancy guard (review r5): inside a probe child, decision
    functions return safe defaults without spawning (the chisq probe
    body calls chi_squared_fit_batch, whose engine=None path consults
    the registry — unguarded, that forked grandchildren until the
    parent's timeout)."""
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("FSIA_PROBE_CHILD", "1")
    probes._CACHE.clear()
    spawned = []
    monkeypatch.setattr(probes.subprocess, "run",
                        lambda *a, **k: spawned.append(1))
    assert probes.measured_rates("chisq_engine_rates") is None
    assert probes.compile_ok("stepfit_compile_4096") is False
    assert spawned == []


def test_measured_rates_off_mode(monkeypatch):
    monkeypatch.setenv("FSIA_PROBES", "off")
    spawned = []
    monkeypatch.setattr(probes.subprocess, "run",
                        lambda *a, **k: spawned.append(1))
    assert probes.measured_rates("chisq_engine_rates") is None
    assert probes.chisq_engine_rates() is None
    assert spawned == []
