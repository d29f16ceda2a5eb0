"""Worker process for tests/test_multihost.py (not a pytest module).

Invoked as::

    python multihost_worker.py <process_id> <num_processes> <port> <out.npz>
                               [<f_local>]

Each worker gets 4 virtual CPU devices, joins the Gloo cluster, contributes
a deterministic slice of the shared synthetic stack, runs the multi-host
experiment step, and saves the host-replicated gathered results.

test_multihost.py also imports :func:`synthetic_stack` from here for its
single-process oracle, so the stack definition cannot drift between the
two sides; everything process-specific stays inside :func:`main`.
"""

import os
import sys

import numpy as np


def synthetic_stack(F, C=2, H=64, W=64, seed=0):
    """Shared by the workers and the in-process oracle — same bits."""
    rng = np.random.default_rng(seed)
    stack = rng.normal(100.0, 3.0, (F, C, H, W))
    hh, ww = np.mgrid[0:5, 0:5]
    psf = 800.0 * np.exp(-((hh - 2.2) ** 2 + (ww - 2.4) ** 2) / 2.0)
    for f in range(F):
        for (h, w) in [(12, 12), (30, 40), (50, 20), (20, 52)]:
            stack[f, :, h - 2:h + 3, w - 2:w + 3] += psf
    return stack.astype(np.float32)


def synthetic_movie(T=12, H=64, W=64, seed=3):
    """One filmed field with bleaching spots (shared by the run_timetrace
    workers and the single-process oracle — same bits)."""
    rng = np.random.default_rng(seed)
    movie = rng.normal(100.0, 3.0, (T, H, W)).astype(np.float32)
    hh, ww = np.mgrid[0:5, 0:5]
    psf = np.exp(-((hh - 2.2) ** 2 + (ww - 2.4) ** 2) / 2.0)
    spots = [(12, 12, 5), (30, 40, 7), (50, 20, 9), (20, 52, 4)]
    for (h, w, drop) in spots:
        for f in range(T):
            level = 2.0 if f < drop else 1.0
            movie[f, h - 2:h + 3, w - 2:w + 3] += \
                (800.0 * level * psf).astype(np.float32)
    return movie


def timetrace_kwargs():
    """Shared run_timetrace parameters (worker AND oracle)."""
    return dict(search_radius=3, s_n_cutoff=3.0, mirror_start=3,
                chung_kennedy=1, p_threshold=0.01)


def experiment_config():
    """Shared by the workers and the single-process oracle — one config."""
    from fluorosequencingimageanalysis_tpu.config import (DetectConfig,
                                                          PipelineConfig,
                                                          RegistrationConfig)
    return PipelineConfig(
        detect=DetectConfig(max_candidates=64, num_iters=20),
        registration=RegistrationConfig(upsample_factor=5))


def main(argv):
    pid, nproc, port, out_path = (int(argv[1]), int(argv[2]), argv[3],
                                  argv[4])
    f_local = int(argv[5]) if len(argv) > 5 else 4
    mode = argv[6] if len(argv) > 6 else "step"

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fluorosequencingimageanalysis_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    full = synthetic_stack(F=f_local * nproc)
    local = full[pid * f_local:(pid + 1) * f_local]
    if mode == "experiment":
        # Whole-experiment front door: every host writes the full CSV.
        res = multihost.run_experiment(local, csv_path=out_path + ".csv",
                                       config=experiment_config())
        np.savez(out_path, n_rows=np.int64(len(res["rows"])))
        return
    if mode == "experiment2ch":
        # Two channels (the MultichannelSequenceExperiment surface):
        # ch2 is the same fields at a different gain.
        stacks = {"ch1": local, "ch2": local * np.float32(0.8)}
        res = multihost.run_experiment(stacks, csv_path=out_path + ".csv",
                                       config=experiment_config())
        np.savez(out_path, n_rows=np.int64(len(res["rows"])))
        return
    if mode == "zstack":
        # Frame axis over the global mesh; ragged local count (3 frames
        # per process against a 4-device share exercises the pad path).
        frames = full[:, 0]  # [F_global, H, W]
        zl = 3
        bg = multihost.stack_background(
            frames[pid * zl:(pid + 1) * zl], box_size=8, filter_size=3)
        np.savez(out_path, bg=bg)
        return
    if mode == "timetrace":
        movie = full[:4, 0]  # [T, H, W], same on every process
        ys = np.array([12.2, 30.4, 50.1, 20.3])
        xs = np.array([12.1, 40.2, 20.4, 52.2])
        rec_h, rec_w, present = multihost.lc_track(movie, ys, xs)
        np.savez(out_path, rec_h=rec_h, rec_w=rec_w, present=present)
        return
    if mode == "run_timetrace":
        # Whole-movie front door: every host writes the full
        # save_experiment_as_csv CSV (flexlibrary.py:3550-3709 contract).
        res = multihost.run_timetrace(synthetic_movie(),
                                      csv_path=out_path + ".csv",
                                      config=experiment_config(),
                                      **timetrace_kwargs())
        np.savez(out_path, n_traces=np.int64(res["trace_count"]))
        return
    out = multihost.run_experiment_step(
        local, max_candidates=64, num_iters=20, upsample_factor=5)
    np.savez(out_path, **{k: np.asarray(v) for k, v in out.items()})


if __name__ == "__main__":
    main(sys.argv)
