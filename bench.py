#!/usr/bin/env python
"""Benchmark: fields/sec/chip for align + detect + fit (+ photometry).

Prints ONE JSON line:
  {"metric": "fields_per_sec_per_chip", "value": N, "unit": "fields/s",
   "vs_baseline": M}

- value: 512x512 images fully processed per second on one chip through the
  sharded experiment step (registration + candidate detection + batched LM
  PSF fit + mexican-hat photometry).
- vs_baseline: speedup over the CPU reference pipeline (scipy median filter
  + correlation + per-candidate bounded least-squares, the algorithmic
  equivalent of /root/reference/pflib.py:284-520), measured in-process on
  this machine's CPU.
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

    mesh = make_mesh(len(jax.devices()))
    x = shard_fields(jnp.asarray(stack), mesh)
    with mesh:
        out = experiment_step_sharded(x, mesh, max_candidates=2048,
                                      num_iters=40, upsample_factor=10)
        force(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = experiment_step_sharded(x, mesh, max_candidates=2048,
                                          num_iters=40, upsample_factor=10)
        force(out)
        dt = (time.perf_counter() - t0) / iters
    n_images = stack.shape[0] * stack.shape[1]
    n_chips = len(jax.devices())
    return n_images / dt / n_chips, out


def bench_cpu_reference(image):
    """CPU reference: the scipy-equivalent of pflib.find_peptides."""
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

    hh, ww = np.indices((5, 5)).astype(np.float64)

    def model(p):
        return (p[0] + p[1] * np.exp(-(((p[3] - hh) / p[4]) ** 2 +
                                       ((p[2] - ww) / p[5]) ** 2) / 2.0))

    n_fit = 0
    for (h, w) in cands:
        sub = img[h - 2:h + 3, w - 2:w + 3]
        med, amax, amean = np.median(sub), sub.max(), sub.mean()
        p0 = np.array([med, amax, 2.5, 2.5, 1.0, 1.0])
        lo = np.array([0, (amax - amean) / 3, 2, 2, 0.75, 0.75])
        hi = np.array([np.inf, np.inf, 3, 3, 2, 2])
        p0 = np.clip(p0, lo, hi)
        least_squares(lambda p: (model(p) - sub).ravel(), p0,
                      bounds=(lo, hi), method="trf", max_nfev=200)
        n_fit += 1
    dt = time.perf_counter() - t0
    return dt, n_fit


def main():
    F, C = 8, 4
    stack = make_stack(F, C)
    tpu_fields_per_sec, _ = bench_tpu(stack)

    # CPU reference on one field (same registration cost is negligible on
    # CPU relative to the fit loop; we charge only detect+fit).
    cpu_dt, n_fit = bench_cpu_reference(stack[0, 0])
    cpu_fields_per_sec = 1.0 / cpu_dt

    print(json.dumps({
        "metric": "fields_per_sec_per_chip",
        "value": round(tpu_fields_per_sec, 2),
        "unit": "fields/s",
        "vs_baseline": round(tpu_fields_per_sec / cpu_fields_per_sec, 1),
    }))


if __name__ == "__main__":
    main()
