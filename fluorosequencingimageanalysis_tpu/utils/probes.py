"""Measured per-backend probe registry for performance dispatch.

Round 3 froze several A/B decisions to the bench chip's pathologies
(stepfit chunk cap 2048, v8 scoring chunk 32768, timetrace prefetch off,
XLA-gather patch extraction) with "re-measure before re-applying" notes.
This registry replaces the frozen constants with MEASURED probes, cached
on disk per backend fingerprint, so a production deployment gets the
decisions for ITS hardware without reading a doc:

- ``matmul_tflops``: latency-differenced chained f32/HIGHEST matmuls
  (the gather-strategy probe, ops/candidates.measured_mxu_tflops — a
  single matmul per dispatch would measure the tunnel's round-trip
  latency, not the MXU; DESIGN 31);
- ``link_bandwidth_MBps`` / ``link_latency_s``: one 8 MB upload and the
  median tiny-fetch round trip;
- ``compile_ok(<kernel>@<shape>)``: can this backend's compiler build a
  bigger-chunk program at all? Probed in a SUBPROCESS with a timeout —
  the failure modes are a compiler SIGABRT (stepfit at 4096 rows on the
  bench chip) and a >9-minute hang (v8 at 65536 rows), neither of which
  may take the calling process down. A successful probe compile lands in
  the persistent XLA cache, so production pays it once.

Decisions (each cites the A/B that set its threshold):

- ``gather_strategy()``: 'onehot' above 5 TFLOP/s measured (DESIGN 18);
- ``stepfit_chunk()``: 4096 when the fused CK+sliding-t kernel compiles
  there, else 2048 (DESIGN 14: 4096 SIGABRTs the bench backend);
- ``v8_chunk()``: 65536 when _score_batch compiles there, else 32768
  (DESIGN 8: an earlier backend phase hung >9 min on the 65536 compile;
  throughput rises with chunk size);
- ``detect_chunk()``: 4096 when the exhaustive driver's chunked
  extraction/fit programs compile there, else 2048 (DESIGN 20);
- ``timetrace_prefetch()``: True on >= 400 MB/s links (DESIGN 16: on the
  ~30-90 MB/s serial tunnel, prefetch contends with result fetches and
  measured 15-30% SLOWER; on PCIe/local-HBM links it hides the movie
  upload).

Decisions NOT in the registry because the losing implementation was
removed after its A/B: registration FFT pairing vs hoist (DESIGN 19 —
XLA CSEs the duplicate FFTs, so the hoist can only lose) and sigma-clip
masked reductions vs the prefix-sum form (DESIGN 19b). Both defaults
are backend-independent no-regret choices, not tunnel-specific tuning.

Round 5 splits the registry into BACKEND properties and SESSION
properties. Compile-sanity verdicts and matmul TFLOP/s are properties of
the hardware + compiler — legitimately stable under the backend
fingerprint, disk-cached. Link bandwidth/latency are properties of THIS
process's moment: the tunnel's bandwidth swings several-fold between
health phases (bench.py's measured record), so a slow-phase measurement
must never freeze ``timetrace_prefetch`` for every later session. Link
probes are therefore memoized in-process only (never written to disk;
stale link keys in pre-split disk caches are ignored on load), and
``snapshot()`` labels every value ``disk-cache`` / ``measured-now`` /
``session`` so a recorded run shows exactly what was fresh.

``FSIA_PROBES=off`` disables everything (conservative static defaults);
``FSIA_PROBES=refresh`` re-measures, ignoring the disk cache. Probes are
lazy: nothing runs until a decision is first requested.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

import numpy as np

logger = logging.getLogger(__name__)
logger.addHandler(logging.NullHandler())

_CACHE: dict = {}          # in-process memo {fingerprint: dict}
_TRANSIENT_FAILED: set = set()  # (fingerprint, probe): no-device children
_SESSION: dict = {}        # per-PROCESS measurements (never on disk)
_FRESH: set = set()        # backend-probe names measured THIS process

# Session-scoped (per-process) probe names: these measure the link's
# CURRENT health phase, which is not a backend property — a pre-split
# disk cache may still carry them; they are ignored on load.
_SESSION_KEYS = ("link_bandwidth_MBps", "link_latency_s",
                 "fetch_bandwidth_MBps")

_STEPFIT_BIG_CHUNK = 4096
_STEPFIT_SAFE_CHUNK = 2048
_V8_BIG_CHUNK = 65536
_V8_SAFE_CHUNK = 32768
_PREFETCH_MIN_MBPS = 400.0


def _mode() -> str:
    return os.environ.get("FSIA_PROBES", "").strip().lower()


def backend_fingerprint() -> str:
    """Stable id for the probe cache: platform + device kind + count."""
    import jax

    devs = jax.devices()
    kind = devs[0].device_kind if devs else "none"
    return f"{jax.default_backend()}-{kind}-{len(devs)}".replace(" ", "_")


def _cache_path(fp: str) -> str:
    d = os.path.join(os.path.expanduser("~"), ".cache", "fluoro_tpu_probes")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, fp + ".json")


def _load(fp: str) -> dict:
    if fp in _CACHE:
        return _CACHE[fp]
    data = {}
    if _mode() != "refresh":
        try:
            with open(_cache_path(fp)) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            data = {}
    # Session properties must not be resurrected from pre-split caches.
    data = {k: v for k, v in data.items() if k not in _SESSION_KEYS}
    _CACHE[fp] = data
    return data


def _store(fp: str, data: dict) -> None:
    _CACHE[fp] = data
    try:
        tmp = _cache_path(fp) + f".{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
        os.replace(tmp, _cache_path(fp))
    except OSError:  # read-only home: in-process memo still applies
        pass


def _probe(name: str, fn):
    """Memoized BACKEND probe: run fn() once per backend fingerprint,
    persist the result to disk (hardware/compiler properties only)."""
    fp = backend_fingerprint()
    data = _load(fp)
    if name not in data:
        value = fn()
        data[name] = value
        _FRESH.add(name)
        _store(fp, data)
        logger.info("probe[%s] %s = %r", fp, name, value)
    return data[name]


def _session_probe(name: str, fn):
    """Memoized SESSION probe: run fn() once per process, never persisted
    — the measured quantity (link health) varies between sessions."""
    if name not in _SESSION:
        _SESSION[name] = fn()
        logger.info("session probe %s = %r", name, _SESSION[name])
    return _SESSION[name]


def refresh_session() -> None:
    """Drop this process's session measurements (the next decision
    re-measures). For long-lived processes that outlive a link phase."""
    _SESSION.clear()


# ---------------------------------------------------------------------------
# raw probes
# ---------------------------------------------------------------------------

def matmul_tflops() -> float:
    from ..ops.candidates import measured_mxu_tflops

    # v2 key: the round-1..4 probe measured one matmul per dispatch,
    # which on tunneled backends recorded the LINK latency as ~0.5-0.7
    # "TFLOP/s" (freezing gather_strategy='gather' on fast MXUs). The
    # latency-differenced probe is a different measurement; old cached
    # values must not serve it. A degenerate measurement (0.0: timing
    # jitter swallowed the chain twice) stays session-local — the next
    # process re-measures instead of inheriting a frozen failure.
    fp = backend_fingerprint()
    data = _load(fp)
    if "matmul_tflops_v2" in data:
        return float(data["matmul_tflops_v2"])
    value = float(measured_mxu_tflops())
    if value > 0.0:
        data["matmul_tflops_v2"] = value
        _FRESH.add("matmul_tflops_v2")
        _store(fp, data)
    return value


def link_bandwidth_MBps() -> float:
    """Host->device upload bandwidth of THIS process's link phase
    (session-scoped: measured once per process, never disk-cached)."""
    def run():
        import jax

        host = np.zeros(8 * 1024 * 1024 // 2, np.uint16)  # 8 MB
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            x = jax.device_put(host)
            np.asarray(x[:1])
            dt = time.perf_counter() - t0
            if i:  # first round pays allocator warmup
                best = min(best, dt)
            del x
        return 8.0 / best

    return float(_session_probe("link_bandwidth_MBps", run))


def fetch_bandwidth_MBps() -> float:
    """Device->host fetch bandwidth of THIS process's link phase
    (session-scoped). Measured separately from upload because serial
    tunnels are often asymmetric — the round-5 zstack diagnosis found
    fetch 3-5x slower than upload in some phases, making result-fetch
    bytes the binding resource for fetch-heavy configs."""
    def run():
        import jax
        import jax.numpy as jnp

        x = jax.device_put(jnp.zeros(8 * 1024 * 1024 // 2, jnp.uint16))
        np.asarray(x[:1])  # materialize on device
        best = float("inf")
        for i in range(3):
            # Fresh buffer each round: jax.Array caches its host copy,
            # so re-fetching the same array times a memcpy, not the link.
            y = x + jnp.uint16(i)
            np.asarray(y[:1])
            t0 = time.perf_counter()
            np.asarray(y)
            dt = time.perf_counter() - t0
            if i:
                best = min(best, dt)
            del y
        return 8.0 / best

    return float(_session_probe("fetch_bandwidth_MBps", run))


def link_latency_s() -> float:
    """Per-round-trip link latency of THIS process's link phase
    (session-scoped)."""
    def run():
        import jax
        import jax.numpy as jnp

        x = jax.device_put(jnp.zeros((8,), jnp.float32))
        np.asarray(x)  # warm
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(x + 0)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    return float(_session_probe("link_latency_s", run))


_PROBE_PRELUDE = """
import numpy as np
import jax, jax.numpy as jnp
np.asarray(jax.device_put(jnp.ones((8,), jnp.float32)) + 1)
print("PROBE_BACKEND_READY", flush=True)
"""

_COMPILE_PROBES = {
    # name -> python body run in a fresh subprocess; it must COMPILE the
    # real kernel at the contested shape and print PROBE_OK. The shared
    # prelude prints PROBE_BACKEND_READY once the child has a working
    # device — a crash BEFORE that marker is an environment failure
    # (e.g. losing the race for a single tunneled chip against the
    # parent), not a verdict on the shape, and is never cached.
    "stepfit_compile_4096": """
import numpy as np
import jax.numpy as jnp
from fluorosequencingimageanalysis_tpu.ops import stepfit_batch as sb
# (4096, 110): the bench workload's exact LANE-UNALIGNED shape — the one
# that crashed the round-3 backend (a (4096, 128) aligned probe compiled
# fine there, so aligned success does not predict the real program).
x = jnp.asarray(np.zeros((4096, 110), np.float32))
out = sb._ck_and_masks(x, window_lengths=(2, 4, 8, 16), window_radius=6,
                       p_threshold=0.01)
np.asarray(out[1][:1, :1])
print("PROBE_OK")
""",
    "detect_compile_4096": """
import numpy as np
import jax.numpy as jnp
from fluorosequencingimageanalysis_tpu.ops.candidates import (
    candidate_maps_batch, extract_candidates_chunk)
from fluorosequencingimageanalysis_tpu.models.detect import (
    _fit_chunk_packed)
# The exhaustive driver's ACTUAL per-chunk programs at 4096 (the
# monolithic detect_and_fit_batch at 4096 crashes for its own reasons —
# the K x K NMS is host-side on the chunked path and must not veto it).
img = np.random.default_rng(0).normal(400, 8, (1, 512, 512))
# Same pallas gating as the production driver (detect_and_fit_exhaustive):
# probing the pallas kernel on a non-TPU accelerator would fail for the
# wrong reason and freeze a false verdict for that backend.
import jax
use_pallas = jax.default_backend() in ("tpu", "axon")
# Probe the SAME gather strategy production resolves (round-5 probe fix
# flipped fast-MXU backends to 'onehot'; a 'gather'-variant verdict must
# not gate the onehot program production actually runs).
from fluorosequencingimageanalysis_tpu.ops.candidates import (
    resolve_gather_strategy)
gs = resolve_gather_strategy("auto")
cms = candidate_maps_batch(jnp.asarray(img.astype(np.float32)),
                           use_pallas=use_pallas)
excluded = jnp.zeros((1, 512 * 512), bool)
hs, ws, valid, rem, _ = extract_candidates_chunk(cms, excluded, 4096, 2.0)
pack = _fit_chunk_packed(jnp.asarray(img.astype(np.float32)), hs, ws,
                         valid, num_iters=60, gather_strategy=gs)
np.asarray(pack[:1, :1, :1])
print("PROBE_OK")
""",
    "v8_compile_65536": """
import numpy as np
import jax.numpy as jnp
from fluorosequencingimageanalysis_tpu.ops.lognormal import (
    _score_batch, sequence_table)
tab = jnp.asarray(sequence_table(12, 5, False))
li = jnp.zeros((65536, 12), jnp.float32)
ca = jnp.zeros((65536, 12), bool)
out = _score_batch(li, ca, tab, jnp.zeros((5,), jnp.float32), 0.2, 3.0,
                   True)
np.asarray(out[0][:1])
print("PROBE_OK")
""",
}


_MEASURE_PROBES = {
    # name -> python body run in a fresh subprocess; it must TIME the
    # real kernel at the contested chunk sizes and print one line
    # "PROBE_RESULT {json}". Crashes/timeouts are absorbed like
    # compile probes; a no-device child is transient (not cached).
    "stepfit_chunk_rates": """
import json, time
import numpy as np
import jax.numpy as jnp
from fluorosequencingimageanalysis_tpu.ops import stepfit_batch as sb
x = jnp.asarray(np.zeros((8192, 110), np.float32))
rates = {}
for chunk in (4096, 8192):
    def run():
        outs = []
        for lo in range(0, 8192, chunk):
            outs.append(sb._ck_and_masks(x[lo:lo + chunk],
                                         window_lengths=(2, 4, 8, 16),
                                         window_radius=6,
                                         p_threshold=0.01))
        for o in outs:
            np.asarray(o[1][:1, :1])  # 1-elt barrier per dispatch
    run()  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rates[str(chunk)] = 8192.0 / best
print("PROBE_RESULT " + json.dumps(rates))
print("PROBE_OK")
""",
    "chisq_engine_rates": """
# v3: explicit engines (engine=None would re-enter chisq_engine() ->
# measured_rates() in this CHILD and fork grandchildren recursively)
import json, time
import numpy as np
rng = np.random.default_rng(0)
N, T = 512, 100
traces = np.zeros((N, T))
for i in range(N):
    nsteps = int(rng.integers(0, 4))
    drops = np.sort(rng.choice(np.arange(4, T - 4), nsteps, replace=False))
    level = float(nsteps + 1)
    tr = np.full(T, level)
    for d in drops:
        level -= 1.0
        tr[d:] = level
    traces[i] = tr * 2500 + rng.normal(0, 300, T)
rates = {}
from fluorosequencingimageanalysis_tpu.native import chisqfit as ncf
if ncf.have_native():
    from fluorosequencingimageanalysis_tpu import stepfitting as sf
    sf.chi_squared_fit_batch(traces[:64], num_steps=10,
                             engine="native")  # warm threads
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sf.chi_squared_fit_batch(traces, num_steps=10, engine="native")
        best = min(best, time.perf_counter() - t0)
    rates["native"] = N / best
from fluorosequencingimageanalysis_tpu.ops.chisq_batch_device import (
    chi_squared_fit_device)
chi_squared_fit_device(traces[:64], num_steps=10)  # compile small shape
chi_squared_fit_device(traces, num_steps=10)       # compile + warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    chi_squared_fit_device(traces, num_steps=10)
    best = min(best, time.perf_counter() - t0)
rates["device"] = N / best
print("PROBE_RESULT " + json.dumps(rates))
print("PROBE_OK")
""",
    "detect_chunk_rates": """
import json, time
import numpy as np
import jax, jax.numpy as jnp
from fluorosequencingimageanalysis_tpu.ops.candidates import (
    candidate_maps_batch, extract_candidates_chunk)
from fluorosequencingimageanalysis_tpu.models.detect import (
    _fit_chunk_packed)
img = np.random.default_rng(0).normal(400, 8, (1, 512, 512))
use_pallas = jax.default_backend() in ("tpu", "axon")
imgs = jnp.asarray(img.astype(np.float32))
cms = candidate_maps_batch(imgs, use_pallas=use_pallas)
from fluorosequencingimageanalysis_tpu.ops.candidates import (
    resolve_gather_strategy)
gs = resolve_gather_strategy("auto")  # rate the production program
rates = {}
for chunk in (4096, 8192):
    excluded = jnp.zeros((1, 512 * 512), bool)
    def run():
        hs, ws, valid, rem, _ = extract_candidates_chunk(
            cms, excluded, chunk, 2.0)
        pack = _fit_chunk_packed(imgs, hs, ws, valid, num_iters=60,
                                 gather_strategy=gs)
        np.asarray(pack[:1, :1, :1])
    run()  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rates[str(chunk)] = chunk / best
print("PROBE_RESULT " + json.dumps(rates))
print("PROBE_OK")
""",
}


def measured_rates(name: str, timeout_s: float = 420.0):
    """Subprocess MEASURED probe (memoized per backend): times the real
    kernel at the contested chunk sizes in a child (the bigger shape may
    SIGABRT the compiler — the child absorbs it) and returns the
    {chunk: items_per_sec} dict, or None when the child failed
    (compile crash / timeout / no device — the caller keeps its
    compile-gated default). Rates are COMPUTE throughput (1-element
    fetch barriers), which is backend-stable, unlike link numbers — so
    disk-caching under the backend fingerprint is sound. The round-4
    registry only asked "does the big chunk COMPILE"; this tier answers
    VERDICT r4 item 6's "does it actually HELP"."""
    if _mode() == "off":
        return None
    if os.environ.get("FSIA_PROBE_CHILD"):
        # Reentrancy guard: a probe child whose body reaches a decision
        # function must NOT fork grandchildren (unbounded recursion
        # until the parent's timeout); it gets the safe default,
        # uncached.
        return None
    body = _PROBE_PRELUDE + _MEASURE_PROBES[name]
    import hashlib
    key = f"{name}@{hashlib.sha1(body.encode()).hexdigest()[:8]}"
    fp = backend_fingerprint()
    data = _load(fp)
    if key in data:
        return data[key]
    if (fp, key) in _TRANSIENT_FAILED:
        return None
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["FSIA_PROBE_CHILD"] = "1"
    ready, result = False, None
    try:
        proc = subprocess.run([sys.executable, "-c", body], env=env,
                              capture_output=True, text=True,
                              timeout=timeout_s)
        out = proc.stdout
        ready = "PROBE_BACKEND_READY" in out
        if proc.returncode == 0 and "PROBE_OK" in out:
            for line in out.splitlines():
                if line.startswith("PROBE_RESULT "):
                    result = json.loads(line[len("PROBE_RESULT "):])
        if result is None:
            logger.warning("measured probe %s failed (rc=%s, ready=%s):\n%s",
                           key, proc.returncode, ready,
                           (out + proc.stderr)[-1500:])
    except subprocess.TimeoutExpired as e:
        ready = "PROBE_BACKEND_READY" in (
            (e.stdout or b"").decode(errors="replace")
            if isinstance(e.stdout, bytes) else (e.stdout or ""))
        logger.warning("measured probe %s timed out after %.0fs (ready=%s)",
                       key, timeout_s, ready)
    except OSError as e:
        logger.warning("measured probe %s could not spawn: %s", key, e)
    if result is not None or ready:
        # ready-but-crashed children are a real verdict on the shape:
        # cache None so production never re-pays the crash.
        data[key] = result
        _store(fp, data)
        logger.info("probe[%s] %s = %r", fp, key, result)
        return result
    _TRANSIENT_FAILED.add((fp, key))
    return None


def compile_ok(name: str, timeout_s: float = 240.0) -> bool:
    """Subprocess compile-sanity probe (memoized per backend).

    True iff the contested-shape program compiles AND runs within the
    timeout in a child process. The child absorbs compiler crashes the
    parent must survive; three outcomes:

    - PROBE_OK printed                     -> True, cached;
    - backend came up (PROBE_BACKEND_READY) but the compile crashed or
      timed out                            -> False, cached (a real
      verdict on the shape);
    - the child never got a device (e.g. lost the race for a single
      tunneled chip against the parent)    -> False for THIS call, NOT
      cached — the next process retries instead of freezing a transient
      environment failure into the per-backend cache.
    """
    if os.environ.get("FSIA_PROBE_CHILD"):
        # Reentrancy guard (see measured_rates): probe children never
        # fork grandchildren; safe default, uncached.
        return False
    body = _PROBE_PRELUDE + _COMPILE_PROBES[name]
    # Key the verdict by the probe BODY too: editing a probe (e.g.
    # changing the contested shape) must invalidate the cached verdict.
    import hashlib
    name = f"{name}@{hashlib.sha1(body.encode()).hexdigest()[:8]}"
    fp = backend_fingerprint()
    data = _load(fp)
    if name in data:
        return bool(data[name])
    if (fp, name) in _TRANSIENT_FAILED:
        # A no-device child outcome earlier THIS process: don't re-spawn
        # a jax subprocess (seconds each, up to timeout_s on a hang) on
        # every chunk-decision call — the condition (e.g. the parent
        # holding a single tunneled chip) persists for the process
        # lifetime. The next process retries fresh.
        return False
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["FSIA_PROBE_CHILD"] = "1"
    ready = False
    try:
        proc = subprocess.run([sys.executable, "-c", body], env=env,
                              capture_output=True, text=True,
                              timeout=timeout_s)
        out = proc.stdout
        ready = "PROBE_BACKEND_READY" in out
        ok = proc.returncode == 0 and "PROBE_OK" in out
        if not ok:
            logger.warning("compile probe %s failed (rc=%s, ready=%s):\n%s",
                           name, proc.returncode, ready,
                           (out + proc.stderr)[-1500:])
    except subprocess.TimeoutExpired as e:
        ready = "PROBE_BACKEND_READY" in (
            (e.stdout or b"").decode(errors="replace")
            if isinstance(e.stdout, bytes) else (e.stdout or ""))
        ok = False
        logger.warning("compile probe %s timed out after %.0fs (ready=%s)",
                       name, timeout_s, ready)
    except OSError as e:
        # Spawn failure (fork/exec denied, interpreter missing): an
        # environment failure like the no-device case, not a verdict on
        # the shape — fall through to the uncached transient path so
        # production chunk-decision callers get the safe default instead
        # of a crash.
        ready, ok = False, False
        logger.warning("compile probe %s could not spawn: %s", name, e)
    if ok or ready:
        data[name] = bool(ok)
        _store(fp, data)
        logger.info("probe[%s] %s = %r", fp, name, bool(ok))
        return bool(ok)
    logger.warning("compile probe %s: child had no working device; "
                   "using the safe default WITHOUT caching (memoized "
                   "for this process only)", name)
    _TRANSIENT_FAILED.add((fp, name))
    return False


# ---------------------------------------------------------------------------
# decisions
# ---------------------------------------------------------------------------

def gather_strategy() -> str:
    """'onehot' on full-speed MXU hardware, 'gather' elsewhere
    (bit-exact either way — DESIGN 18). The CPU backend short-circuits
    to 'gather' without measuring, like the chunk decisions — it is the
    host-fallback platform, XLA-CPU matmul rates never clear the
    threshold, and the probe is real matmul time."""
    from ..ops.candidates import ONEHOT_MIN_TFLOPS

    if _mode() == "off" or _is_cpu():
        return "gather"
    return ("onehot" if matmul_tflops() >= ONEHOT_MIN_TFLOPS else "gather")


def _is_cpu() -> bool:
    import jax

    return jax.default_backend() == "cpu"


_MEASURED_CHUNK_MARGIN = 1.05  # the bigger chunk must WIN, not tie


def stepfit_chunk() -> int:
    """Row cap per fused CK+sliding-t dispatch. Results are
    chunk-invariant (CI-tested), so this is pure performance dispatch.
    The CPU backend keeps the safe default without probing — it is the
    host-fallback platform, not a deployment target, and bigger chunks
    only trade memory for nothing there.

    Two probed tiers: compile-sanity at 4096 (the r3 bench backend
    SIGABRTs there), then a MEASURED 4096-vs-8192 throughput A/B
    (measured_rates) — 8192 only wins when it is actually faster by
    >5%, not merely compilable (VERDICT r4 item 6)."""
    if _mode() == "off" or _is_cpu():
        return _STEPFIT_SAFE_CHUNK
    if not compile_ok("stepfit_compile_4096"):
        return _STEPFIT_SAFE_CHUNK
    rates = measured_rates("stepfit_chunk_rates")
    if (rates and rates.get("8192") and rates.get("4096")
            and rates["8192"] > _MEASURED_CHUNK_MARGIN * rates["4096"]):
        return 8192
    return _STEPFIT_BIG_CHUNK


def v8_chunk() -> int:
    """Trace rows per v8 scoring dispatch (throughput rises with chunk
    size; results are chunk-invariant). CPU keeps the safe default — a
    65536-row score matrix is ~1.6 GB of host scratch for no speedup."""
    if _mode() == "off" or _is_cpu():
        return _V8_SAFE_CHUNK
    return (_V8_BIG_CHUNK if compile_ok("v8_compile_65536")
            else _V8_SAFE_CHUNK)


_DETECT_BIG_CHUNK = 4096
_DETECT_SAFE_CHUNK = 2048


def detect_chunk() -> int:
    """Candidate-chunk size for the exhaustive detection driver
    (models/detect.detect_and_fit_exhaustive): 4096 where the
    single-image detect program compiles there (halves the extraction/
    fit rounds per image), 2048 where it SIGABRTs (the bench backend —
    models/detect docstrings, DESIGN 20). Chunked results are
    chunk-size-invariant (parity-tested), so this is pure performance
    dispatch. Above the compile gate sits the MEASURED 4096-vs-8192 A/B
    (measured_rates): 8192 only wins when actually >5% faster
    (VERDICT r4 item 6)."""
    if _mode() == "off" or _is_cpu():
        return _DETECT_SAFE_CHUNK
    if not compile_ok("detect_compile_4096"):
        return _DETECT_SAFE_CHUNK
    rates = measured_rates("detect_chunk_rates")
    if (rates and rates.get("8192") and rates.get("4096")
            and rates["8192"] > _MEASURED_CHUNK_MARGIN * rates["4096"]):
        return 8192
    return _DETECT_BIG_CHUNK


_GROUP_LATENCY_MULT = 4.0   # per-group transfer time >= 4x link latency
_GROUP_FLOOR_ITEMS = 8


def upload_group_items(item_mb: float, n_dev: int, total: int,
                       floor: int = _GROUP_FLOOR_ITEMS) -> int:
    """Items (frames/fields) per pipelined host->device upload group.

    Replaces the frozen group-size constants (zstack g=8, experiment
    group_fields=8 — the reference's analog is the candidate-count load
    balancer, pflib.py:1000-1111, which sized work per process instead
    of per transfer). Sizing rule from the SESSION link measurements:
    per-group upload time must be at least ``_GROUP_LATENCY_MULT`` x the
    round-trip latency (the round-5 zstack diagnosis: 4.2 MB groups on a
    50 ms tunnel paid ~4 latencies over a 0.3 s transfer, ~half the
    upload wall clock), while keeping >= 2 groups in flight when the
    workload allows so upload still overlaps compute. Rounded up to a
    mesh-axis multiple so every dispatch hits one compiled program.
    """
    if _mode() == "off" or _is_cpu():
        g = max(floor, n_dev)
    else:
        lat = link_latency_s()
        bw = link_bandwidth_MBps()
        g = int(np.ceil(_GROUP_LATENCY_MULT * lat * bw /
                        max(item_mb, 1e-6)))
        g = max(g, floor, n_dev)
        two_groups = -(-total // 2)  # ceil: the 2-in-flight cap
        if two_groups >= max(floor, n_dev):
            g = min(g, two_groups)
    # Never exceed the workload itself (rounded up to the mesh): the
    # latency-derived g is unbounded, and a tiny stack padded to it
    # would multiply upload bytes and compile a one-off inflated shape.
    cap = total + (-total) % max(n_dev, 1)
    if cap >= max(n_dev, 1):
        g = min(g, cap)
    g += (-g) % max(n_dev, 1)
    return g


_CHISQ_DEVICE_MARGIN = 1.2  # device must beat the bit-exact core clearly


def chisq_engine_rates():
    """Guarded access to the native-vs-device Kerssemakers A/B rates
    (None in off-mode, on the CPU backend, and on backends whose probe
    failed)."""
    if _mode() == "off" or _is_cpu():
        return None
    return measured_rates("chisq_engine_rates")


def chisq_engine() -> str:
    """Kerssemakers batch engine: 'native' (the C++ core, bit-equal to
    the host oracle) or 'device' (ops/chisq_batch_device — the same
    chain as one jitted [N, T] program; equal in exact arithmetic, may
    diverge on last-ulp-tied split decisions). The device engine is
    chosen only when the measured A/B (VERDICT r4 item 8) shows it
    >= 1.2x faster on this backend — exactness wins anything close. The
    CPU "backend" is the native core's own platform; no probe there."""
    rates = chisq_engine_rates()
    if (rates and rates.get("device") and rates.get("native")
            and rates["device"] > _CHISQ_DEVICE_MARGIN * rates["native"]):
        return "device"
    return "native"


def timetrace_prefetch() -> bool:
    """Upload-ahead for run_timetraces: wins on fast links, loses on
    serial tunnels (DESIGN 16's measured A/B). CPU keeps the safe
    default without probing — its "link" is a host memcpy, and
    prefetch there only doubles peak movie memory."""
    if _mode() == "off" or _is_cpu():
        return False
    return link_bandwidth_MBps() >= _PREFETCH_MIN_MBPS


def snapshot() -> dict:
    """All probe values + decisions (bench.py emits this next to
    link_MBps so recorded runs carry their backend calibration). Every
    measured value is labeled by provenance: ``disk-cache`` (a backend
    property loaded from a previous process), ``measured-now`` (a backend
    property measured and cached this process) or ``session`` (a
    per-process link measurement that is never disk-cached)."""
    tf = round(matmul_tflops(), 3)
    snap = {
        "fingerprint": backend_fingerprint(),
        "matmul_tflops": tf,
        "matmul_tflops_source": ("measured-now"
                                 if "matmul_tflops_v2" in _FRESH
                                 else "disk-cache"),
        "link_bandwidth_MBps": round(link_bandwidth_MBps(), 1),
        "fetch_bandwidth_MBps": round(fetch_bandwidth_MBps(), 1),
        "link_latency_ms": round(link_latency_s() * 1e3, 2),
        "link_source": "session",
        "gather_strategy": gather_strategy(),
        "stepfit_chunk": stepfit_chunk(),
        "v8_chunk": v8_chunk(),
        "detect_chunk": detect_chunk(),
        "chisq_engine": chisq_engine(),
        "timetrace_prefetch": timetrace_prefetch(),
    }
    return snap
