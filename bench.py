#!/usr/bin/env python
"""Benchmarks: the detect step AND the full experiment, per chip.

Prints one JSON line per metric; the driver parses the LAST one (the
headline). Round 5 instrumentation contract: every transfer-bound line
carries its exact ``transfer_ledger`` (uploads / dispatches / fetches +
bytes each way) and a ``stages_sec`` floor decomposition priced at the
per-direction link bandwidths measured at that line's own moment
(``measure_link``: the tunnel is asymmetric and swings between health
phases), with ``residual_sec`` explicit — a value move between rounds is
attributable to link vs pipeline from the artifact alone. CPU
denominators record their best-of-2 spread. The zstack line uses the
lean keep-first fetch; the sim line fetches uint16 fixed-point
intensities over pipelined reps; the chisq line reports the measured
native-vs-device engine rates from the probe registry.

  {"metric": "experiment_fields_per_sec", ...}        <- config 4 (full
      multi-field multi-cycle experiment: registration + detect/fit +
      tracking + trace interpolation + categories + track-photometries
      rows, via api.Pipeline.run_experiment at 32 fields x 8 cycles,
      ~2k spots/field, raw uint16 frames)
  {"metric": "zstack_frames_per_sec", ...}            <- config 2 (z/time
      stack: per-frame SExtractor mesh background estimation +
      subtraction + batched multi-spot PSF fits, via
      api.Pipeline.run_zstack at 32 512x512 uint16 frames)
  {"metric": "stepfit_traces_per_sec", ...}           <- config 3 (the
      timetrace step-fitting chain: Chung-Kennedy + sliding-t + refit +
      t-test merge, 4096 traces x 100 frames)
  {"metric": "timetrace_traces_per_sec", ...}         <- movie front door
      (run_timetrace: detect + lax.scan LC tracking + photometry +
      batched step fits on a 24-frame 512x512 movie)
  {"metric": "sim_molecules_per_sec", ...}            <- config 5, MC
      simulation half (batched dye-count + photometry simulation, 1e5
      molecules of a 2-color 18-mer at the CLI-default model)
  {"metric": "v8_traces_per_sec", ...}                <- config 5,
      inference half (v8 lognormal fluor counting, 1e5 traces x 6,188
      sequences at the reference's cost-warning shape n_cycles=12,
      max_fluors=5)
  {"metric": "fields_per_sec_per_chip", ...}          <- headline (align +
      detect + fit + photometry through the sharded experiment step)

vs_baseline for both is the speedup over a measured in-process CPU
equivalent of the reference pipeline (scipy median filter + correlation +
per-candidate bounded least-squares for detect, /root/reference/
pflib.py:284-520; plus NumPy greedy tracking and a per-spot-per-frame
Python photometry loop for the experiment path, /root/reference/
flexlibrary.py:679-1027, 2755-2892). The CPU tracking stand-in is our own
vectorized host tracker — 50-100x faster than the reference's per-pixel
object-grid walk — so the experiment ratio is a conservative
underestimate.
"""

import json
import time

import numpy as np


def make_stack(F, C, H=512, W=512, spots_per_field=200, seed=0):
    rng = np.random.default_rng(seed)
    stack = rng.normal(400.0, 8.0, (F, C, H, W)).astype(np.float32)
    hh, ww = np.indices((H, W)).astype(np.float32)
    for f in range(F):
        coords = rng.integers(8, H - 8, (spots_per_field, 2))
        amps = rng.uniform(1500, 4000, spots_per_field)
        field = np.zeros((H, W), np.float32)
        for (h, w), a in zip(coords, amps):
            lo_h, hi_h = max(0, h - 6), min(H, h + 7)
            lo_w, hi_w = max(0, w - 6), min(W, w + 7)
            field[lo_h:hi_h, lo_w:hi_w] += a * np.exp(
                -(((hh[lo_h:hi_h, lo_w:hi_w] - h) ** 2) +
                  ((ww[lo_h:hi_h, lo_w:hi_w] - w) ** 2)) / (2 * 1.3 ** 2))
        for c in range(C):
            stack[f, c] += field
    return stack


def _device_selftest():
    """Fail loudly if the device pipeline is numerically wrong, so the
    throughput number can never come from a broken kernel. Checks the
    fused Pallas candidate map against the jnp recipe and the batched LM
    against planted ground truth, on-device."""
    import jax.numpy as jnp
    from fluorosequencingimageanalysis_tpu.ops.candidates import (
        DEFAULT_CORRELATION_MATRIX, find_candidates_batch, HashableArray)
    from fluorosequencingimageanalysis_tpu.ops.lm import fit_gaussians_batched

    rng = np.random.default_rng(42)
    imgs = rng.normal(400.0, 8.0, (2, 256, 256)).astype(np.float32)
    hh, ww = np.indices((256, 256)).astype(np.float32)
    truth = [(40.3, 60.6), (128.4, 200.2), (200.6, 90.4)]
    for h, w in truth:
        imgs[:, :, :] += 2500.0 * np.exp(
            -(((hh - h) ** 2) + ((ww - w) ** 2)) / (2 * 1.3 ** 2))[None]
    hk = HashableArray(np.asarray(DEFAULT_CORRELATION_MATRIX, np.float32))
    x = jnp.asarray(imgs)
    out_p = find_candidates_batch(x, correlation_matrix=hk,
                                  max_candidates=256, use_pallas=True)
    out_j = find_candidates_batch(x, correlation_matrix=hk,
                                  max_candidates=256, use_pallas=False)
    set_p = set(zip(np.asarray(out_p[0])[0][np.asarray(out_p[2])[0]].tolist(),
                    np.asarray(out_p[1])[0][np.asarray(out_p[2])[0]].tolist()))
    set_j = set(zip(np.asarray(out_j[0])[0][np.asarray(out_j[2])[0]].tolist(),
                    np.asarray(out_j[1])[0][np.asarray(out_j[2])[0]].tolist()))
    overlap = len(set_p & set_j) / max(len(set_p | set_j), 1)
    assert overlap > 0.95, f"pallas/jnp candidate sets diverge: {overlap}"

    patch = imgs[0, 38:43, 58:63]
    params, _ = fit_gaussians_batched(jnp.asarray(patch[None]), num_iters=60)
    p = np.asarray(params[0])
    # agpy axis quirk (reproduced exactly, see ops/gaussian.py): at theta=0
    # p[2] is the COLUMN-grid center and p[3] the ROW-grid center. The spot
    # sits at local (row 2.3, col 2.6) in this 5x5 patch.
    assert abs(p[2] - 2.6) < 0.1 and abs(p[3] - 2.3) < 0.1, \
        f"LM center off: {(p[2], p[3])}"
    assert abs(p[1] - 2500.0) / 2500.0 < 0.05, f"LM amplitude off: {p[1]}"


def bench_tpu(stack, iters=5):
    import jax
    import jax.numpy as jnp
    from fluorosequencingimageanalysis_tpu.parallel.mesh import (
        make_mesh, shard_fields, experiment_step_sharded)
    _device_selftest()

    def force(out):
        # block_until_ready is unreliable through the remote-device tunnel;
        # a host transfer of one element is the only trustworthy barrier.
        np.asarray(out["photometry"]).ravel()[:1]

    # Resolve the patch-gather strategy through the probe registry like
    # every Pipeline path does ('onehot' on real-MXU hardware — the
    # round-5 latency-differenced probe measures 33 TFLOP/s on the bench
    # chip, where the old one-matmul probe read the tunnel latency as
    # 0.7 and froze 'gather'; the measured A/B: onehot +26% on the
    # detect program).
    from fluorosequencingimageanalysis_tpu.ops.candidates import (
        resolve_gather_strategy)
    gs = resolve_gather_strategy("auto")
    mesh = make_mesh(len(jax.devices()))
    x = shard_fields(jnp.asarray(stack), mesh)
    with mesh:
        # upsample_factor=20 is the reference experiment configuration
        # (flexlibrary.py:1735-1739).
        out = experiment_step_sharded(x, mesh, max_candidates=2048,
                                      num_iters=40, upsample_factor=20,
                                      gather_strategy=gs)
        force(out)  # compile + warm
        # Best of two timed rounds: each dispatch still traverses the
        # tunnel, so one mid-loop link stall would otherwise poison the
        # whole mean (measured: 310 vs 464 fields/s across phases of a
        # single session).
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = experiment_step_sharded(x, mesh,
                                              max_candidates=2048,
                                              num_iters=40,
                                              upsample_factor=20,
                                              gather_strategy=gs)
            force(out)
            dt = min(dt, (time.perf_counter() - t0) / iters)
    n_images = stack.shape[0] * stack.shape[1]
    n_chips = len(jax.devices())
    return n_images / dt / n_chips, out


def bench_cpu_reference(image, max_fits=None):
    """CPU reference: the scipy-equivalent of pflib.find_peptides.

    max_fits caps the measured per-candidate fit loop; the total is scaled
    linearly to the full candidate count (the loop is embarrassingly
    linear — one independent bounded least-squares per candidate).
    """
    from scipy.ndimage import median_filter
    from scipy.signal import correlate
    from scipy.optimize import least_squares

    kernel = np.array([[-5935, -5935, -5935, -5935, -5935],
                       [-5935, 8027, 8027, 8027, -5935],
                       [-5935, 8027, 30742, 8027, -5935],
                       [-5935, 8027, 8027, 8027, -5935],
                       [-5935, -5935, -5935, -5935, -5935]], dtype=np.float64)
    img = image.astype(np.float64)
    t0 = time.perf_counter()
    mf = img - np.minimum(median_filter(img, 5, mode="reflect"), img)
    cm = np.maximum(correlate(mf, kernel, mode="same"), 0)
    thr = cm.mean() + 2 * cm.std()
    mask = np.zeros(img.shape, bool)
    mask[2:-2, 2:-2] = cm[2:-2, 2:-2] >= thr
    cands = np.argwhere(mask)
    detect_dt = time.perf_counter() - t0

    hh, ww = np.indices((5, 5)).astype(np.float64)

    def model(p):
        return (p[0] + p[1] * np.exp(-(((p[3] - hh) / p[4]) ** 2 +
                                       ((p[2] - ww) / p[5]) ** 2) / 2.0))

    n_total = len(cands)
    to_fit = cands if max_fits is None else cands[:max_fits]
    t0 = time.perf_counter()
    for (h, w) in to_fit:
        sub = img[h - 2:h + 3, w - 2:w + 3]
        med, amax, amean = np.median(sub), sub.max(), sub.mean()
        p0 = np.array([med, amax, 2.5, 2.5, 1.0, 1.0])
        lo = np.array([0, (amax - amean) / 3, 2, 2, 0.75, 0.75])
        hi = np.array([np.inf, np.inf, 3, 3, 2, 2])
        p0 = np.clip(p0, lo, hi)
        least_squares(lambda p: (model(p) - sub).ravel(), p0,
                      bounds=(lo, hi), method="trf", max_nfev=200)
    fit_dt = time.perf_counter() - t0
    if len(to_fit) < n_total:
        fit_dt *= n_total / max(len(to_fit), 1)
    return detect_dt + fit_dt, n_total


def make_experiment_stack(F, C, H=512, W=512, spots_per_field=2000, seed=0):
    """Multi-cycle experiment: persistent spots with per-cycle dropouts and
    integer stage drift (the config-4 workload)."""
    rng = np.random.default_rng(seed)
    hh, ww = np.indices((H, W)).astype(np.float32)
    drift = np.cumsum([[0, 0]] + [[int(rng.integers(-2, 3)),
                                   int(rng.integers(-2, 3))]
                                  for _ in range(C - 1)], axis=0)
    stack = rng.normal(400.0, 6.0, (F, C, H, W)).astype(np.float32)
    for f in range(F):
        pos = rng.uniform(16, H - 16, (spots_per_field, 2)).astype(np.float32)
        amp = rng.uniform(2000, 5000, spots_per_field).astype(np.float32)
        present = rng.random((spots_per_field, C)) < 0.85
        present[:, 0] = True
        for c in range(C):
            hp = pos[present[:, c], 0] - drift[c, 0]
            wp = pos[present[:, c], 1] - drift[c, 1]
            ap = amp[present[:, c]]
            field = np.zeros((H, W), np.float32)
            for h, w, a in zip(hp, wp, ap):
                lo_h, hi_h = max(0, int(h) - 6), min(H, int(h) + 7)
                lo_w, hi_w = max(0, int(w) - 6), min(W, int(w) + 7)
                field[lo_h:hi_h, lo_w:hi_w] += a * np.exp(
                    -(((hh[lo_h:hi_h, lo_w:hi_w] - h) ** 2) +
                      ((ww[lo_h:hi_h, lo_w:hi_w] - w) ** 2)) / (2 * 1.3 ** 2))
            stack[f, c] += field
    return stack


def bench_experiment_tpu(stack, iters=3):
    """Full run_experiment wall-clock (config 4), post-compile.

    Each repetition is timed separately and the fastest is reported:
    the workload is transfer-bound on this link and the tunnel's
    bandwidth swings 2x between health phases, so best-of-N measures
    the pipeline rather than the link's worst moment."""
    from fluorosequencingimageanalysis_tpu.api import Pipeline
    from fluorosequencingimageanalysis_tpu.utils import profiling

    pipe = Pipeline(profile=True)
    kw = dict(max_candidates=4096, max_spots=3072)
    res = pipe.run_experiment(stack, **kw)  # compile + warm
    n_rows = len(res["rows"])
    dt, stages, ledger = float("inf"), {}, {}
    for _ in range(iters):
        profiling.reset_timings()
        profiling.reset_counters()
        t0 = time.perf_counter()
        res = pipe.run_experiment(stack, **kw)
        it_dt = time.perf_counter() - t0
        if it_dt < dt:
            dt = it_dt
            stages = {k: round(v["total"], 4)
                      for k, v in profiling.timings().items()}
            # The exact host<->device round-trip census of the run
            # (DESIGN.md section 15b): uploads / step dispatches /
            # result fetches / photometry hole dispatches + bytes.
            ledger = profiling.counters()
    return stack.shape[0] / dt, n_rows, stages, ledger


def bench_experiment_cpu(stack_field):
    """Measured CPU equivalent of the reference experiment path for ONE
    field: C x (detect+fit), NumPy greedy tracking, per-spot-per-frame
    Python photometry loop. Returns seconds/field."""
    from fluorosequencingimageanalysis_tpu.pipeline.tracking import (
        greedy_particle_tracking)

    C = stack_field.shape[0]
    # Detect + fit: measured on one image (fit loop capped at 400 and
    # scaled linearly), charged per cycle (the reference refits every
    # cycle image).
    fit_dt, n_cand = bench_cpu_reference(stack_field[0], max_fits=400)
    detect_seconds = fit_dt * C

    # Tracking on the thresholded candidate sets (conservative stand-in:
    # our vectorized host tracker vs the reference's object-grid walk).
    from scipy.ndimage import median_filter
    from scipy.signal import correlate

    kernel = np.array([[-5935, -5935, -5935, -5935, -5935],
                       [-5935, 8027, 8027, 8027, -5935],
                       [-5935, 8027, 30742, 8027, -5935],
                       [-5935, 8027, 8027, 8027, -5935],
                       [-5935, -5935, -5935, -5935, -5935]], dtype=np.float64)

    class _S:  # minimal spot record
        __slots__ = ("h", "w")

        def __init__(self, h, w):
            self.h, self.w = int(h), int(w)

    frames = []
    for c in range(C):
        img = stack_field[c].astype(np.float64)
        mf = img - np.minimum(median_filter(img, 5, mode="reflect"), img)
        cm = np.maximum(correlate(mf, kernel, mode="same"), 0)
        thr = cm.mean() + 2 * cm.std()
        mask = np.zeros(img.shape, bool)
        mask[2:-2, 2:-2] = cm[2:-2, 2:-2] >= thr
        # Candidates can violate the tracker's 2px-apart precondition;
        # thin to one per 3x3 cell like real consolidated spots.
        cands = np.argwhere(mask)
        seen = set()
        spots = []
        for h, w in cands:
            key = (h // 3, w // 3)
            if key in seen:
                continue
            seen.add(key)
            spots.append(_S(h, w))
        frames.append(spots)
    t0 = time.perf_counter()
    traces, _ = greedy_particle_tracking(frames,
                                         stack_field.shape[1:],
                                         candidate_radius=2,
                                         use_native=False)
    tracking_seconds = time.perf_counter() - t0

    # TRUE-reference tracking estimate: the vendored oracle
    # (tests/tracking_oracle.py) reproduces flexlibrary.py:679-1027's
    # full-grid object-array walk — the cost the reference actually
    # pays. Timed on the same spot sets.
    import importlib.util as _ilu
    import os as _os
    _spec = _ilu.spec_from_file_location(
        "tracking_oracle",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "tests", "tracking_oracle.py"))
    _oracle = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_oracle)
    t0 = time.perf_counter()
    _oracle.greedy_particle_tracking_oracle(frames, stack_field.shape[1:],
                                            candidate_radius=2)
    oracle_tracking_seconds = time.perf_counter() - t0

    # Photometry: per-(spot, frame) Python mexican hat (crown sum - crown
    # size x brim median on a 19x19 window), the reference's per-call cost.
    H, W = stack_field.shape[1:]
    t0 = time.perf_counter()
    n_phot = 0
    for trace in traces:
        for c, s in enumerate(trace):
            if s is None or not (9 <= s.h < H - 9 and 9 <= s.w < W - 9):
                continue
            win = stack_field[c][s.h - 9:s.h + 10, s.w - 9:s.w + 10]
            crown = win[6:13, 6:13]
            brim = np.concatenate([win[:6].ravel(), win[13:].ravel(),
                                   win[6:13, :6].ravel(),
                                   win[6:13, 13:].ravel()])
            _ = crown.sum() - crown.size * np.median(brim)
            n_phot += 1
    photometry_seconds = time.perf_counter() - t0
    floor = detect_seconds + tracking_seconds + photometry_seconds
    ref_est = detect_seconds + oracle_tracking_seconds + photometry_seconds
    return floor, ref_est


def make_step_traces(N, T, seed=0, beta=30000.0, noise=800.0):
    """N timetrace photometry traces of length T with 1-4 planted
    photobleaching steps (the basic_timetrace_script workload)."""
    rng = np.random.default_rng(seed)
    levels = rng.integers(1, 5, N)
    traces = np.empty((N, T))
    for i in range(N):
        drops = np.sort(rng.choice(np.arange(5, T - 5), levels[i],
                                   replace=False))
        value = beta * (levels[i] + 1)
        trace = np.full(T, value)
        for d in drops:
            value -= beta
            trace[d:] = value
        traces[i] = trace + rng.normal(0, noise, T)
    return traces


def bench_stepfit(N=4096, T=100, host_sample=24):
    """Config 3: batched step fitting (mirror -> Chung-Kennedy ->
    sliding-t -> refit -> t-test merge; flexlibrary.py:1380-1469 per
    trace) vs the same chain run per-trace on host. Returns
    (traces/s batched, traces/s host-port, traces/s reference-equivalent)
    — host-port uses our direct Welch t (bit-identical to scipy but
    without the wrapper overhead); reference-equivalent times the chain
    with scipy-wrapped t-tests like the reference's loop."""
    from fluorosequencingimageanalysis_tpu.ops.stepfit_batch import (
        stepfit_batched)
    from fluorosequencingimageanalysis_tpu import stepfitting as sf

    phot = make_step_traces(N, T)
    kw = dict(mirror_start=10, chung_kennedy=1, p_threshold=0.01)
    # Warm at the full probed dispatch-chunk shape so the timed run
    # hits the compiled program.
    from fluorosequencingimageanalysis_tpu.utils import probes
    sf_chunk = probes.stepfit_chunk()
    stepfit_batched(phot[:min(sf_chunk, N)], **kw)
    from fluorosequencingimageanalysis_tpu.utils import profiling
    dt, ledger = float("inf"), {}
    for _ in range(3):  # best-of-3: filters tunnel-link interference
        profiling.reset_counters()
        t0 = time.perf_counter()
        res = stepfit_batched(phot, **kw)
        it_dt = time.perf_counter() - t0
        if it_dt < dt:
            dt = it_dt
            ledger = profiling.counters()
    assert len(res) == N and any(len(r[3]) > 1 for r in res)

    def host_chain(i):
        photometries = tuple(phot[i].tolist())
        mirrored = sf.mirror_photometries(photometries, mirror_size=10)
        ck = sf.chung_kennedy_filter(luminosities=mirrored,
                                     window_lengths=(2, 4, 8, 16))
        plateaus = sf.sliding_t_fitter(
            luminosity_sequence=ck, window_radius=6, p_threshold=0.01,
            median_filter_size=None, downsteps_only=False,
            min_step_magnitude=None)
        plateaus = sf.refit_plateaus(mirrored, plateaus)
        sf.t_test_filter(luminosities=mirrored, plateaus=plateaus,
                         p_threshold=0.01, drop_sort=True,
                         no_merge_start=10)

    # Reference-equivalent CPU chain: the reference calls
    # scipy.stats.ttest_ind per window pair (stepfitting_library.py:1020,
    # 1371) — time the same chain with the scipy-wrapped t-test.
    from scipy.stats import ttest_ind as _scipy_ttest

    def _scipy_welch(left, right):
        import warnings
        if len(left) == 0 or len(right) == 0:
            return float("nan"), float("nan")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t, p = _scipy_ttest(left, right, equal_var=False)
        return float(t), float(p)

    fast_welch = sf._welch_t
    sf._welch_t = _scipy_welch
    try:
        t0 = time.perf_counter()
        for i in range(host_sample):
            host_chain(i)
        ref_dt = (time.perf_counter() - t0) / host_sample
    finally:
        sf._welch_t = fast_welch

    # Our own host port (direct Welch t, bit-identical to scipy) — the
    # conservative comparator.
    t0 = time.perf_counter()
    for i in range(host_sample):
        host_chain(i)
    host_dt = (time.perf_counter() - t0) / host_sample
    return N / dt, 1.0 / host_dt, 1.0 / ref_dt, dt, ledger


def bench_chisq(N=2048, T=100, num_steps=10, host_sample=12):
    """The batched Kerssemakers chi-squared fitter (native/chisqfit.cpp
    via stepfitting.chi_squared_fit_batch) vs the per-trace host loop —
    bit-equal per trace (tests/test_stepfit_batch.py). num_steps=10 is
    the reference's save_stepfits_as_csv default for this method
    (flexlibrary.py:3722). Returns (traces/s batched, traces/s host)."""
    from fluorosequencingimageanalysis_tpu import stepfitting as sf

    rng = np.random.default_rng(0)
    traces = np.zeros((N, T))
    for i in range(N):
        nsteps = int(rng.integers(0, 4))
        drops = np.sort(rng.choice(np.arange(4, T - 4), nsteps,
                                   replace=False))
        level = float(nsteps + 1)
        tr = np.full(T, level)
        for d in drops:
            level -= 1.0
            tr[d:] = level
        traces[i] = tr * 2500 + rng.normal(0, 300, T)

    sf.chi_squared_fit_batch(traces[:64], num_steps=num_steps,
                             engine="native")  # warm
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = sf.chi_squared_fit_batch(traces, num_steps=num_steps,
                                       engine="native")
        dt = min(dt, time.perf_counter() - t0)
    assert len(out) == N and all(len(f) >= 1 for f in out)

    # Device-engine A/B (VERDICT r4 item 8): the probe registry's
    # measured native-vs-device rates (utils/probes.chisq_engine).
    # Reported from the per-backend cache rather than re-timed here —
    # on tunnel backends whose compile of the f64 device program
    # exceeds the probe timeout, the cached verdict is None and the
    # engine stays native (re-timing in-bench would burn those same
    # minutes every run). Exact-agreement CI lives in
    # tests/test_chisq_device.py.
    from fluorosequencingimageanalysis_tpu.utils import probes
    engine_rates = probes.chisq_engine_rates()
    engine = probes.chisq_engine()

    t0 = time.perf_counter()
    for i in range(host_sample):
        sf.chi_squared_step_fitter(tuple(float(v) for v in traces[i]),
                                   num_steps=num_steps)
    host_dt = (time.perf_counter() - t0) / host_sample
    return N / dt, 1.0 / host_dt, engine_rates, engine


def make_movie(T=24, H=512, W=512, n_spots=800, seed=0, beta=2500.0):
    """A timetrace movie: n_spots bleaching spots with subpixel wander
    (the basic_timetrace_script workload)."""
    rng = np.random.default_rng(seed)
    movie = rng.normal(400.0, 6.0, (T, H, W)).astype(np.float32)
    # (clipped to uint16 raw camera frames at the end)
    pos = rng.uniform(12, H - 12, (n_spots, 2))
    steps = rng.integers(1, 4, n_spots)
    hh, ww = np.indices((25, 25)).astype(np.float32)
    for s in range(n_spots):
        drops = np.sort(rng.choice(np.arange(4, T - 2), steps[s],
                                   replace=False)).tolist()
        level = float(steps[s])
        wander = rng.normal(0, 0.08, (T, 2)).cumsum(axis=0)
        for f in range(T):
            if drops and f >= drops[0]:
                level -= 1.0
                drops = drops[1:]
            if level <= 0:
                break
            h = pos[s, 0] + wander[f, 0]
            w = pos[s, 1] + wander[f, 1]
            ih = min(max(int(h) - 12, 0), H - 25)
            iw = min(max(int(w) - 12, 0), W - 25)
            movie[f, ih:ih + 25, iw:iw + 25] += level * beta * np.exp(
                -(((hh - (h - ih)) ** 2) + ((ww - (w - iw)) ** 2)) /
                (2 * 1.3 ** 2))
    # Raw uint16 camera frames (the real acquisition dtype): half the
    # host->device bytes of float32; run_timetrace casts on device.
    return np.clip(movie, 0, 65535).astype(np.uint16)


def bench_timetrace(T=24, n_spots=800, host_sample=12):
    """Timetrace front door (run_timetrace: detect -> lax.scan LC
    tracking -> photometry -> batched step fits) vs the reference's
    per-spot-per-frame host walk + per-trace scipy step-fit chain
    (basic_timetrace_script.py; flexlibrary.py:1172-1317, 3309-3536).
    Returns (traces/s end-to-end, traces/s CPU-equivalent, n_traces)."""
    from fluorosequencingimageanalysis_tpu.api import Pipeline
    from fluorosequencingimageanalysis_tpu import stepfitting as sf
    from scipy import ndimage
    from scipy.stats import ttest_ind
    import warnings

    movie = make_movie(T=T, n_spots=n_spots)
    pipe = Pipeline()
    # max_candidates=None -> EXHAUSTIVE chunked detect: every above-
    # threshold candidate is fitted (the reference's uncapped semantics,
    # pflib.py:217-258) in 2048-sized chunks — the single-bucket 4096
    # compile cliff (DESIGN.md §14) no longer caps the honest
    # configuration.
    from fluorosequencingimageanalysis_tpu.utils import profiling
    kw = dict(max_candidates=None, chung_kennedy=1, p_threshold=0.01,
              mirror_start=10)
    out = pipe.run_timetrace(movie, **kw)  # compile + warm
    n_traces = out["trace_count"]
    dt, ledger = float("inf"), {}
    for _ in range(3):  # best-of-3: filters tunnel-link interference
        profiling.reset_counters()
        t0 = time.perf_counter()
        out = pipe.run_timetrace(movie, **kw)
        it_dt = time.perf_counter() - t0
        if it_dt < dt:
            dt = it_dt
            ledger = profiling.counters()
    assert out["trace_count"] == n_traces and n_traces > 100

    # CPU equivalent, per trace: LC walk (center-of-mass on the search
    # window + Illumina S/N gate per frame), mexican-hat photometry per
    # frame, and the scipy-wrapped step-fit chain; plus the per-trace
    # share of the first-frame detect cost.
    detect_dt, _ = bench_cpu_reference(movie[0], max_fits=400)
    h0 = out["traces"]["h"][:host_sample]
    w0 = out["traces"]["w"][:host_sample]
    H, W = movie.shape[1:]

    def _scipy_welch(left, right):
        if len(left) == 0 or len(right) == 0:
            return float("nan"), float("nan")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t, p = ttest_ind(left, right, equal_var=False)
        return float(t), float(p)

    fast_welch = sf._welch_t
    sf._welch_t = _scipy_welch
    try:
        t0 = time.perf_counter()
        for i in range(len(h0)):
            h, w = int(h0[i]), int(w0[i])
            phots = []
            for f in range(T):
                win = movie[f, max(h - 3, 0):h + 4, max(w - 3, 0):w + 4]
                ch, cw = ndimage.center_of_mass(win)
                rh = int(np.floor(ch) + (ch - np.floor(ch) >= 0.5)) + h - 3
                rw = int(np.floor(cw) + (cw - np.floor(cw) >= 0.5)) + w - 3
                sl = movie[f, max(rh - 2, 0):rh + 3, max(rw - 2, 0):rw + 3]
                edge = np.concatenate([sl[0].ravel(), sl[-1].ravel(),
                                       sl[1:-1, 0], sl[1:-1, -1]])
                _ = (sl.max() - edge.mean()) / edge.std()
                h, w = min(max(rh, 9), H - 10), min(max(rw, 9), W - 10)
                pw = movie[f, h - 9:h + 10, w - 9:w + 10]
                crown = pw[6:13, 6:13]
                brim = np.concatenate([pw[:6].ravel(), pw[13:].ravel(),
                                       pw[6:13, :6].ravel(),
                                       pw[6:13, 13:].ravel()])
                phots.append(float(crown.sum() -
                                   crown.size * np.median(brim)))
            mirrored = sf.mirror_photometries(tuple(phots), mirror_size=10)
            ck = sf.chung_kennedy_filter(luminosities=mirrored,
                                         window_lengths=(2, 4, 8, 16))
            plateaus = sf.sliding_t_fitter(
                luminosity_sequence=ck, window_radius=6, p_threshold=0.01,
                median_filter_size=None, downsteps_only=False,
                min_step_magnitude=None)
            plateaus = sf.refit_plateaus(mirrored, plateaus)
            sf.t_test_filter(luminosities=mirrored, plateaus=plateaus,
                             p_threshold=0.01, drop_sort=True,
                             no_merge_start=10)
        host_dt = ((time.perf_counter() - t0) / len(h0) +
                   detect_dt / n_traces)
    finally:
        sf._welch_t = fast_welch
    return n_traces / dt, 1.0 / host_dt, n_traces, dt, ledger


def make_v8_workload(T, F=12, K=5, beta=30000.0, beta_sigma=0.2, seed=0):
    """T synthetic traces at the reference's cost-warning shape
    (n_cycles=12, max_fluors=5 -> C(17, 12) = 6188 sequences/trace,
    MCsimlib.py:5426-5466)."""
    rng = np.random.default_rng(seed)
    start = rng.integers(1, K + 1, T)
    counts = np.zeros((T, F), np.int64)
    counts[:, 0] = start
    for c in range(1, F):
        drop = rng.random(T) < 0.25
        counts[:, c] = np.maximum(counts[:, c - 1] - drop, 0)
    z = rng.normal(0, 1, (T, F))
    intensities = np.where(
        counts > 0, np.exp(np.log(beta * np.maximum(counts, 1)) +
                           beta_sigma * z), 0.0)
    categories = counts > 0
    lfm = np.log(beta * np.arange(1, K + 1))
    return intensities, categories, lfm


def bench_v8(T=100_000, F=12, K=5, beta_sigma=0.2, host_sample=150):
    """Config 5: the batched MXU v8 scorer vs the reference's per-trace
    host loop at scale. Returns (traces/s batched, traces/s host)."""
    from fluorosequencingimageanalysis_tpu.ops.lognormal import score_traces
    from fluorosequencingimageanalysis_tpu.inference.lognormal import (
        _intensities_to_signal_lognormal_v8)

    intensities, categories, lfm = make_v8_workload(T, F, K)
    kw = dict(log_fluor_means=lfm, beta_sigma=beta_sigma, max_possible=K,
              allow_multidrop=True, max_deviation=3)
    # warm/compile the chunk shape AND the ragged-tail bucket, then timed
    from fluorosequencingimageanalysis_tpu.utils import probes
    chunk = probes.v8_chunk()
    score_traces(intensities[:chunk], categories[:chunk], **kw)
    tail = T % chunk
    if tail:
        score_traces(intensities[:tail], categories[:tail], **kw)
    dt = float("inf")
    for _ in range(2):  # best-of-2: filters tunnel-link interference
        t0 = time.perf_counter()
        seqs, found, _ = score_traces(intensities, categories, **kw)
        dt = min(dt, time.perf_counter() - t0)
    assert found.mean() > 0.95  # the workload must actually fit

    t0 = time.perf_counter()
    for i in range(host_sample):
        _intensities_to_signal_lognormal_v8(
            intensities[i].tolist(), beta=30000.0, beta_sigma=beta_sigma,
            max_possible=K, allow_multidrop=True, max_deviation=3,
            categories=categories[i].tolist(), log_fluor_means=lfm.tolist())
    host_dt = (time.perf_counter() - t0) / host_sample
    return T / dt, 1.0 / host_dt


def bench_simulation(N=100_000, host_sample=3000):
    """Config 5 (simulation half): the batched device Monte-Carlo dye
    simulation (sim/dye_sim.py — the TPU-native randsiggen) vs the
    reference-shaped per-molecule host event loop
    (sim/events.simulate_dye_counts + simulate_photometries, the faithful
    port of peptide_simulator.py:190-435).

    Workload: simulate_peptide.py's CLI defaults (N=100000 molecules,
    edman_efficiency 0.90, dye_destruction 0.1, dud_dyes 0.50, surface
    degradation 0.30/4/0.10, beta 70000, beta_sigma 0.20, default DDIF
    curve; num_mocks 4 with 1 omitted -> 3, num_edmans 8 -> 12 count
    cycles) on a two-color 18-mer. Both paths produce per-molecule dye
    counts for every cycle plus per-color lognormal photometries; the
    device numbers include the device->host fetch of both result arrays
    (photometries chain from the device counts — no intermediate round
    trip). Returns (molecules/s batched, molecules/s host)."""
    import math

    import jax
    from fluorosequencingimageanalysis_tpu.sim.dye_sim import (
        decode_intensities_fixed16, encode_intensities_fixed16,
        simulate_dye_counts_batched, simulate_photometries_batched)
    from fluorosequencingimageanalysis_tpu.sim.events import (
        simulate_dye_counts, simulate_photometries)

    seq = "ACKDYECAGKHSECAMKR"
    labels = {"C", "K"}
    params = dict(p=0.90, b=-math.log(1.0 - 0.1), u=0.50, s=0.30, sc=4,
                  s2=0.10)
    beta, beta_sigma = 70000.0, 0.20
    ddif = [0, 0.30] + [0.30] * 5

    def dispatch(n, seed):
        """Enqueue one rep's full device program + async result copies
        (nothing blocks here — jax dispatch is async). The intensities
        cross the link as uint16 fixed-point (encode_intensities_fixed16
        — quantization three orders below the model's own beta_sigma=0.2
        lognormal noise floor, codec-tested in tests/test_sim.py), and
        the counts as int8: 4.8 MB/rep instead of the 13 MB float32
        fetch that held the r4 line under the 50x target."""
        counts_d, labels_out = simulate_dye_counts_batched(
            seq, labels, num_mocks=3, num_edmans=8, num_simulations=n,
            seed=seed, device_out=True, **params)
        enc_d = [encode_intensities_fixed16(
                     simulate_photometries_batched(
                         counts_d[:, :, k], beta, beta_sigma,
                         seed=seed + 7919 * (k + 1), ddif=ddif,
                         device_out=True), beta)
                 for k in range(len(labels_out))]
        counts8 = counts_d.astype(jax.numpy.int8)
        for arr in [counts8] + enc_d:
            arr.copy_to_host_async()
        return counts8, enc_d, labels_out

    def fetch(handles):
        counts8, enc_d, labels_out = handles
        out = {label: decode_intensities_fixed16(enc_d[k], beta)
               for k, label in enumerate(labels_out)}
        counts = np.asarray(counts8)
        fetch._bytes = counts.nbytes + sum(
            int(np.asarray(e).nbytes) for e in enc_d)
        return out, counts

    fetch(dispatch(N, seed=0))  # compile + warm at the timed shape
    # Pipelined steady-state throughput: rep k+1's device programs are
    # enqueued BEFORE rep k's results are pulled, so compute overlaps the
    # fetch direction (the reps are independent draws — exactly the
    # production Monte-Carlo shape). Fetch seconds per rep are recorded
    # for the artifact.
    reps = 3
    fetch_secs = []
    cur = dispatch(N, seed=1)
    t_all = time.perf_counter()
    for rep in range(reps):
        nxt = dispatch(N, seed=rep + 2) if rep + 1 < reps else None
        t0 = time.perf_counter()
        out, counts = fetch(cur)
        fetch_secs.append(round(time.perf_counter() - t0, 3))
        cur = nxt
    dt = (time.perf_counter() - t_all) / reps
    bench_simulation._fetch_bytes = fetch._bytes
    assert all(np.isfinite(v).all() for v in out.values())
    assert (counts >= 0).all() and counts.max() <= len(seq)

    t0 = time.perf_counter()
    host = simulate_dye_counts(seq, labels, num_mocks=3, num_edmans=8,
                               num_simulations=host_sample, random_seed=7,
                               **params)
    for _, dye_counts, _, _ in host:
        for counts in dye_counts.values():
            simulate_photometries(counts, beta, beta_sigma, number=1,
                                  ddif=ddif)
    host_dt = (time.perf_counter() - t0) / host_sample
    return N / dt, 1.0 / host_dt, fetch_secs


def bench_sim_fit(N=100_000, host_sample=300):
    """Config 5, closure: the device-chained simulate -> v8 fit
    (sim/dye_sim.simulate_and_fit_batched — sim scan, photometry kernel
    and scorer share the device; ONE fetch round of per-trace winners +
    compact counts) vs the reference-shaped host closure: per-molecule
    event simulation (sim/events, the faithful peptide_simulator.py
    port) + per-trace v8 sequence enumeration
    (_intensities_to_signal_lognormal_v8, the exact MCsimlib.py:5387
    port). Single-label CLI-default model; chained == two-step equality
    is CI-pinned (tests/test_sim.py). Returns (molecules/s chained,
    molecules/s host)."""
    import math

    from fluorosequencingimageanalysis_tpu.sim.dye_sim import (
        simulate_and_fit_batched)
    from fluorosequencingimageanalysis_tpu.sim.events import (
        simulate_dye_counts, simulate_photometries)
    from fluorosequencingimageanalysis_tpu.inference.lognormal import (
        _intensities_to_signal_lognormal_v8)

    seq = "ACKDYECAGKHSECAMKR"
    labels = {"K"}
    params = dict(p=0.90, b=-math.log(1.0 - 0.1), u=0.50, s=0.30, sc=4,
                  s2=0.10)
    beta, beta_sigma = 70000.0, 0.20
    ddif = [0.0, 0.30] + [0.30] * 5
    kw = dict(num_mocks=3, num_edmans=8, beta=beta, beta_sigma=beta_sigma,
              ddif=ddif, error_signals=False, **params)

    simulate_and_fit_batched(seq, labels, num_simulations=N, seed=0, **kw)
    dt = float("inf")
    for rep in range(3):  # best-of-3: filters tunnel-link interference
        t0 = time.perf_counter()
        out = simulate_and_fit_batched(seq, labels, num_simulations=N,
                                       seed=rep + 1, **kw)
        dt = min(dt, time.perf_counter() - t0)
    assert out["total_count"] == N
    assert sum(out["signals"].values()) + out["none_count"] == N

    lfm = [math.log(beta) + math.log(i + 1.0) - ddif[i] for i in range(7)]
    t0 = time.perf_counter()
    host = simulate_dye_counts(seq, labels, num_mocks=3, num_edmans=8,
                               num_simulations=host_sample, random_seed=7,
                               p=params["p"], b=params["b"], u=params["u"],
                               s=params["s"], sc=params["sc"],
                               s2=params["s2"])
    for _, dye_counts, _, _ in host:
        for counts in dye_counts.values():
            intens = simulate_photometries(counts, beta, beta_sigma,
                                           number=1, ddif=ddif)[0]
            _intensities_to_signal_lognormal_v8(
                intens, beta, beta_sigma, max_possible=5,
                allow_multidrop=True, max_deviation=3,
                categories=tuple(c != 0 for c in counts),
                log_fluor_means=lfm)
    host_dt = (time.perf_counter() - t0) / host_sample
    return N / dt, 1.0 / host_dt


def make_zstack(T=32, H=512, W=512, n_spots=800, seed=4):
    """Config-2 workload (BASELINE.json): one field over a z/time axis —
    a smooth, slowly-varying nonuniform background (the thing the
    SExtractor mesh estimator exists to remove) + persistent PSF spots,
    emitted as raw uint16 camera frames."""
    rng = np.random.default_rng(seed)
    yy, xx = np.indices((H, W)).astype(np.float32)
    base = (600 + 0.4 * yy + 0.25 * xx
            + 120 * np.exp(-(((yy - 200) ** 2 + (xx - 300) ** 2)
                             / (2 * 150.0 ** 2))))
    pos = rng.uniform(16, H - 16, (n_spots, 2)).astype(np.float32)
    amp = rng.uniform(1500, 4000, n_spots).astype(np.float32)
    field = np.zeros((H, W), np.float32)
    for h, w, a in zip(pos[:, 0], pos[:, 1], amp):
        lo_h, hi_h = max(0, int(h) - 6), min(H, int(h) + 7)
        lo_w, hi_w = max(0, int(w) - 6), min(W, int(w) + 7)
        field[lo_h:hi_h, lo_w:hi_w] += a * np.exp(
            -(((yy[lo_h:hi_h, lo_w:hi_w] - h) ** 2) +
              ((xx[lo_h:hi_h, lo_w:hi_w] - w) ** 2)) / (2 * 1.3 ** 2))
    stack = np.empty((T, H, W), np.float32)
    for t in range(T):
        stack[t] = (base * (1.0 + 0.05 * np.sin(t / 4.0)) + field
                    + rng.normal(0, 6, (H, W)))
    return np.clip(stack, 0, 65535).astype(np.uint16)


def bench_zstack(T=32, iters=3, max_fits=400):
    """Config 2: per-frame background estimation + subtraction + batched
    multi-spot PSF fits over a z/time stack, end-to-end through
    api.Pipeline.run_zstack (raw uint16 upload -> device background +
    detect + fit -> keep-first lean fetch).

    Round 5: the fetch is the LEAN keep-first pack (every one of the
    ~6.8k above-noise candidates per frame is still fitted on device —
    the CPU equivalent below is charged for ALL of them — but only the
    2048-slot keep-first buckets cross the link, ~739 kept fits/frame;
    the reference's product per image is the consolidated fits,
    pflib.py:479-519). The run's exact transfer ledger and a per-run
    floor decomposition at the measured per-direction link speeds are
    returned so any regression is attributable from the artifact
    (VERDICT r4 item 1: the r3->r4 41.5 -> 20.5 frames/s drop was
    link-phase, but the artifact could not prove it).

    CPU equivalent charged per frame: our vectorized host SExtractor
    background (pipeline.spots._mesh_background — conservative: it is
    the fast host implementation, not photutils' python setup) + the
    scipy-equivalent per-candidate bounded LM fit loop on the
    background-subtracted frame (bench_cpu_reference, fit cost scaled
    from max_fits sampled fits); best of 2 with the spread recorded so
    host-measurement noise is visible in vs_baseline."""
    from fluorosequencingimageanalysis_tpu.api import Pipeline
    from fluorosequencingimageanalysis_tpu.pipeline.spots import \
        _mesh_background
    from fluorosequencingimageanalysis_tpu.utils import profiling

    stack = make_zstack(T)
    pipe = Pipeline()
    # 8192 candidate slots cover every candidate the noise floor raises
    # (~6.8k/frame): nothing is dropped before the fit; lean max_spots
    # 2048 covers the ~739 kept fits per frame with 2.7x headroom.
    kw = dict(max_candidates=8192, lean=True, max_spots=2048)
    pipe.run_zstack(stack, **kw)  # compile + warm
    best, ledger = float("inf"), {}
    for _ in range(iters):
        profiling.reset_counters()
        t0 = time.perf_counter()
        pipe.run_zstack(stack, **kw)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            ledger = profiling.counters()
    frames_per_sec = T / best

    cpu_times = []
    for _ in range(2):
        f0 = stack[0].astype(np.float64)
        t0 = time.perf_counter()
        bg = _mesh_background(f0, 10, 10)
        bg_dt = time.perf_counter() - t0
        fit_dt, n_cands = bench_cpu_reference(
            (f0 - bg).astype(np.float32), max_fits=max_fits)
        cpu_times.append(bg_dt + fit_dt)
    cpu_frames_per_sec = 1.0 / min(cpu_times)
    cpu_spread = (max(cpu_times) - min(cpu_times)) / max(min(cpu_times),
                                                         1e-9)
    return (frames_per_sec, cpu_frames_per_sec, n_cands, best, ledger,
            cpu_spread)


def measure_link_bandwidth(mb=32, iters=3):
    """Host->device upload bandwidth (MB/s) of this session's link.

    The transfer-bound configs (config 4's 134 MB frame upload and the
    timetrace movie) sit at this link's upload ceiling, and the tunnel's
    bandwidth swings several-fold between health phases. Reporting the
    measured link speed alongside those metrics makes runs comparable:
    fields/s moves with MB/s, not with the compute pipeline."""
    import jax

    host = np.zeros(mb * 1024 * 1024 // 2, np.uint16)
    best = float("inf")
    for i in range(iters + 1):
        t0 = time.perf_counter()
        x = jax.device_put(host)
        np.asarray(x[:1])  # host fetch as the completion barrier
        dt = time.perf_counter() - t0
        if i > 0:  # first round pays allocator/program warmup
            best = min(best, dt)
        del x
    return mb / best


def measure_link(mb=16, iters=2):
    """Per-direction link measurement at THIS moment: upload MB/s, fetch
    MB/s and round-trip latency ms. The tunnel is asymmetric (the round-5
    zstack diagnosis measured fetch 3-5x slower than upload in bad
    phases), so floor decompositions must price each direction with its
    own bandwidth."""
    import jax
    import jax.numpy as jnp

    # latency: tiny round trips, median of 5
    tiny = jax.device_put(jnp.zeros((8,), jnp.float32))
    np.asarray(tiny)
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny + 0)
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))

    host = np.zeros(mb * 1024 * 1024 // 2, np.uint16)
    up = float("inf")
    for i in range(iters + 1):
        t0 = time.perf_counter()
        x = jax.device_put(host)
        np.asarray(x[:1])
        dt = time.perf_counter() - t0
        if i > 0:
            up = min(up, dt)
    down = float("inf")
    for i in range(iters + 1):
        # A FRESH device buffer each round: jax.Array caches its host
        # copy, so re-fetching the same array times a host memcpy, not
        # the link.
        y = x + np.uint16(i)
        np.asarray(y[:1])  # materialize before timing the bulk fetch
        t0 = time.perf_counter()
        np.asarray(y)
        dt = time.perf_counter() - t0
        if i > 0:
            down = min(down, dt)
        del y
    del x
    return {"up_MBps": round(mb / max(up - lat, 1e-9), 1),
            "down_MBps": round(mb / max(down - lat, 1e-9), 1),
            "latency_ms": round(lat * 1e3, 1)}


def _floor_decomposition(ledger, link, host_sec=0.0, compute_sec=0.0):
    """Attribute a transfer-bound run's seconds from its exact ledger and
    the per-direction link measurement: upload bytes at up_MBps + fetch
    bytes at down_MBps (the serial tunnel carries both directions one at
    a time) + counted round-trip latencies + measured host/compute
    stages. Returns the decomposition dict to embed in the metric line;
    callers add ``residual_sec`` = measured - floor so every lost second
    is visible in the artifact."""
    up_b = ledger.get("ledger/upload_bytes", 0)
    fetch_b = ledger.get("ledger/fetch_bytes", 0)
    trips = (ledger.get("ledger/uploads", 0) +
             ledger.get("ledger/result_fetches", 0))
    # measure_link's bandwidths are MiB/s (it times MiB-sized buffers),
    # so floors must price bytes in MiB too — a 1e6 divisor would
    # understate every floor by ~4.7% and book it as phantom residual.
    mib = 1024.0 * 1024.0
    up_s = up_b / mib / max(link["up_MBps"], 1e-9)
    fetch_s = fetch_b / mib / max(link["down_MBps"], 1e-9)
    # Latency is an UPPER attribution, not part of the floor: result
    # copies start async at dispatch time, so most round trips overlap
    # transfers/compute (counting them serially put the r5 config-4
    # floor ABOVE its measurement).
    lat_s = trips * link["latency_ms"] / 1e3
    floor = up_s + fetch_s + host_sec + compute_sec
    out = {"upload_sec": round(up_s, 3), "fetch_sec": round(fetch_s, 3),
           "latency_upper_sec": round(lat_s, 3)}
    if host_sec:
        out["host_sec"] = round(host_sec, 3)
    if compute_sec:
        out["compute_sec"] = round(compute_sec, 3)
    out["floor_sec"] = round(floor, 3)
    return out


def main():
    F, C = 8, 4
    stack = make_stack(F, C)
    tpu_fields_per_sec, _ = bench_tpu(stack)

    # CPU reference on one field (same registration cost is negligible on
    # CPU relative to the fit loop; we charge only detect+fit).
    cpu_dt, n_fit = bench_cpu_reference(stack[0, 0])
    cpu_fields_per_sec = 1.0 / cpu_dt

    # Config 4: the full experiment, 32 fields x 8 cycles, ~2k spots/field.
    # Raw uint16 frames (the camera dtype): the device step casts on
    # device, halving the host->device transfer vs a pre-cast float stack.
    exp_stack = np.clip(make_experiment_stack(32, 8), 0,
                        65535).astype(np.uint16)
    exp_fields_per_sec, n_rows, stages, ledger = bench_experiment_tpu(
        exp_stack)
    exp_link = measure_link()  # per-direction, at the run's own moment
    cpu_floor_seconds, cpu_ref_est_seconds = bench_experiment_cpu(
        exp_stack[0])
    link_mbps = measure_link_bandwidth()

    # Backend calibration record: the probe registry's measurements and
    # the decisions they drove for THIS run (utils/probes) — recorded so
    # bench numbers carry their backend context like link_MBps does.
    from fluorosequencingimageanalysis_tpu.utils import probes
    print(json.dumps({"metric": "backend_probes", **probes.snapshot()}),
          flush=True)
    # What THIS link's upload bandwidth alone permits for this stack
    # (134 MB of uint16 frames / 32 fields): the config is at its ceiling
    # when value ~= this number.
    mb_per_field = exp_stack[0].nbytes / (1024 * 1024)
    # Per-run floor decomposition (VERDICT r4 item 3: the DESIGN 15b
    # decomposition was measured once out-of-band; now every run emits
    # its own floor from its own ledger + link moment, so a
    # value-vs-floor gap is visible the run it appears).
    host_sec = stages.get("api/run_experiment/track+photometry", 0.0)
    exp_floor = _floor_decomposition(ledger, exp_link, host_sec=host_sec)
    measured_sec = exp_stack.shape[0] / exp_fields_per_sec
    exp_floor["residual_sec"] = round(measured_sec - exp_floor["floor_sec"],
                                      3)
    print(json.dumps({
        "metric": "experiment_fields_per_sec",
        "value": round(exp_fields_per_sec, 2),
        "unit": "fields/s",
        "link_MBps": round(link_mbps, 1),
        "link": exp_link,
        "upload_ceiling_fields_per_sec": round(link_mbps / mb_per_field, 2),
        # Conservative measured floor: the CPU stand-in uses OUR
        # vectorized host tracker (50-100x the reference's walk).
        "vs_baseline": round(exp_fields_per_sec * cpu_floor_seconds, 1),
        # Honest true-reference estimate: same numbers, but tracking
        # timed on the vendored reference-faithful oracle walk.
        "vs_baseline_ref_est": round(
            exp_fields_per_sec * cpu_ref_est_seconds, 1),
        "rows": n_rows,
        "stages_sec": stages,
        "floor_decomposition": exp_floor,
        "floor_fields_per_sec": round(
            exp_stack.shape[0] / max(exp_floor["floor_sec"], 1e-6), 2),
        # Exact round-trip census of the timed run (uploads, step
        # dispatches, result fetches, hole-photometry dispatches,
        # bytes each way) — the DESIGN.md section 15b transfer ledger.
        "transfer_ledger": ledger,
    }), flush=True)

    # Config 2: z/time-stack background estimation + batched PSF fits.
    # The line carries its exact ledger + a floor decomposition at the
    # per-direction link speeds measured at THIS moment, so value moves
    # are attributable to link vs pipeline from the artifact alone.
    z_fps, z_cpu_fps, z_cands, z_sec, z_ledger, z_cpu_spread = \
        bench_zstack()
    z_link = measure_link()
    z_floor = _floor_decomposition(z_ledger, z_link)
    z_floor["residual_sec"] = round(z_sec - z_floor["floor_sec"], 3)
    print(json.dumps({
        "metric": "zstack_frames_per_sec",
        "value": round(z_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(z_fps / z_cpu_fps, 1),
        "cpu_baseline_spread": round(z_cpu_spread, 3),
        "link": z_link,
        "stages_sec": z_floor,
        "transfer_ledger": z_ledger,
        "floor_frames_per_sec": round(
            32 / max(z_floor["floor_sec"], 1e-6), 2),
        "shape": f"T=32 512x512 frames, ~{z_cands} candidates/frame "
                 "(sextractor background + subtract + detect + PSF fits; "
                 "lean keep-first fetch)",
    }), flush=True)

    # Config 3: step fitting over many timetrace traces. vs_baseline is
    # against the reference-equivalent chain (scipy-wrapped t-tests);
    # vs_host_port against our own (bit-identical, faster) host port.
    # The chunked dispatches cross the link (upload (N, T+mirror) f64 +
    # mask fetches), so the line carries its ledger + link moment
    # (VERDICT r4 item 1: the r4 11.9k -> 9.2k slide was unattributable).
    step_tps, step_host_tps, step_ref_tps, step_sec, step_ledger = \
        bench_stepfit()
    step_link = measure_link()
    step_floor = _floor_decomposition(step_ledger, step_link)
    step_floor["residual_sec"] = round(step_sec - step_floor["floor_sec"],
                                       3)
    print(json.dumps({
        "metric": "stepfit_traces_per_sec",
        "value": round(step_tps, 1),
        "unit": "traces/s",
        "vs_baseline": round(step_tps / step_ref_tps, 1),
        "vs_host_port": round(step_tps / step_host_tps, 1),
        "link": step_link,
        "stages_sec": step_floor,
        "transfer_ledger": step_ledger,
        "shape": "N=4096 T=100 (CK + sliding-t + refit + t-merge)",
    }), flush=True)

    # Kerssemakers chi-squared step fitter: the native batched core vs
    # the per-trace host loop (stepfitting.chi_squared_step_fitter, the
    # exact reference port). Host cost measured on a sample and scaled.
    cs_tps, cs_host_tps, cs_rates, cs_engine = bench_chisq()
    print(json.dumps({
        "metric": "chisq_traces_per_sec",
        "value": round(cs_tps, 1),
        "unit": "traces/s",
        "vs_baseline": round(cs_tps / cs_host_tps, 1),
        "host_cores": __import__("os").cpu_count(),
        "engine": cs_engine,
        "engine_probe_rates": cs_rates,
        "shape": "N=2048 T=100 num_steps=10 (best-fit/counter-fit chain)",
    }), flush=True)

    # Timetrace workflow: the movie front door end-to-end. The link is
    # re-measured HERE: the tunnel's bandwidth swings several-fold
    # between health phases, and this transfer-bound metric should carry
    # the link state of its own moment, not the run's start.
    tt_tps, tt_host_tps, tt_n, tt_sec, tt_ledger = bench_timetrace()
    tt_link = measure_link()
    tt_floor = _floor_decomposition(tt_ledger, tt_link)
    tt_floor["residual_sec"] = round(tt_sec - tt_floor["floor_sec"], 3)
    print(json.dumps({
        "metric": "timetrace_traces_per_sec",
        "value": round(tt_tps, 1),
        "unit": "traces/s",
        "vs_baseline": round(tt_tps / tt_host_tps, 1),
        "link": tt_link,
        "stages_sec": tt_floor,
        "transfer_ledger": tt_ledger,
        "shape": f"T=24 512x512 movie, {tt_n} traces "
                 "(detect + LC track + photometry + step fits)",
    }), flush=True)

    # Config 5, simulation half: batched Monte-Carlo dye simulation.
    # This line fetches the FULL per-molecule product (counts + both
    # colors' intensities, ~13 MB) in its one overlapped round, so it is
    # transfer-bound on the tunnel — the per-moment link measure rides
    # along for context (the production closure flow never fetches the
    # intensities; that is the sim_fit line below).
    sim_link = measure_link()
    sim_mps, sim_host_mps, sim_fetch_secs = bench_simulation()
    print(json.dumps({
        "metric": "sim_molecules_per_sec",
        "value": round(sim_mps, 1),
        "unit": "molecules/s",
        "vs_baseline": round(sim_mps / sim_host_mps, 1),
        "link": sim_link,
        "fetch_MB": round(getattr(
            bench_simulation, "_fetch_bytes", 0) / 1e6, 1),
        "fetch_secs_per_rep": sim_fetch_secs,
        "shape": "N=1e5 molecules, 2-color 18-mer, 12 count cycles, "
                 "3 pipelined reps (counts int8 + photometries uint16 "
                 "fixed-point, CLI-default model)",
    }), flush=True)

    # Config 5, closure: simulate -> v8 fit CHAINED on device (one fetch
    # round of per-trace winners; the (N, F) intensities never cross the
    # link). vs_baseline is the per-molecule host event loop + per-trace
    # v8 enumeration — the reference's whole closure flow
    # (simulate_peptide.py:190-285).
    sf_mps, sf_host_mps = bench_sim_fit()
    print(json.dumps({
        "metric": "sim_fit_molecules_per_sec",
        "value": round(sf_mps, 1),
        "unit": "molecules/s",
        "vs_baseline": round(sf_mps / sf_host_mps, 1),
        "shape": "N=1e5 molecules, 1-color 18-mer, 12 count cycles "
                 "(sim + photometries + v8 fit + signals aggregation)",
    }), flush=True)

    # Config 5, inference half: v8 fluor counting at the reference's
    # cost-warning shape.
    v8_tps, v8_host_tps = bench_v8()
    print(json.dumps({
        "metric": "v8_traces_per_sec",
        "value": round(v8_tps, 1),
        "unit": "traces/s",
        "vs_baseline": round(v8_tps / v8_host_tps, 1),
        "shape": "T=100000 F=12 K=5 (6188 seqs/trace)",
    }), flush=True)

    print(json.dumps({
        "metric": "fields_per_sec_per_chip",
        "value": round(tpu_fields_per_sec, 2),
        "unit": "fields/s",
        "vs_baseline": round(tpu_fields_per_sec / cpu_fields_per_sec, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
