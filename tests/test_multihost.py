"""Multi-host (multi-process) execution of the sharded experiment step.

Validates the DCN scaling design (parallel/multihost.py): two REAL worker
processes, each with 4 virtual CPU devices, join one jax.distributed
cluster (Gloo), contribute disjoint field shards, and run the SAME
``experiment_step_sharded`` program over the global 8-device mesh. Both
hosts' gathered results must match each other AND a single-process oracle
run over the concatenated stack — the multi-host path adds machinery, not
semantics.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers_once(tmp_path, nproc, f_local, attempt, mode="step"):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    f_locals = (f_local if isinstance(f_local, (list, tuple))
                else [f_local] * nproc)
    outs, procs = [], []
    for pid in range(nproc):
        out = str(tmp_path / f"worker_{pid}_a{attempt}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port), out,
             str(f_locals[pid]), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{log[-4000:]}")
    return [dict(np.load(o)) for o in outs]


def _run_workers(tmp_path, nproc=2, f_local=4, mode="step"):
    # One retry on a fresh port: under a loaded machine the cluster join
    # can time out, and the bind-then-release port probe can race another
    # process. A real semantic regression fails both attempts.
    try:
        return _run_workers_once(tmp_path, nproc, f_local, attempt=0,
                                 mode=mode)
    except (RuntimeError, subprocess.TimeoutExpired) as first:
        import warnings
        warnings.warn(f"multihost attempt 0 failed, retrying once: {first}")
        return _run_workers_once(tmp_path, nproc, f_local, attempt=1,
                                 mode=mode)


def _oracle(F):
    import jax.numpy as jnp
    from multihost_worker import synthetic_stack
    from fluorosequencingimageanalysis_tpu.parallel.mesh import (
        experiment_step_sharded, make_mesh)
    stack = synthetic_stack(F=F)
    out = experiment_step_sharded(jnp.asarray(stack), make_mesh(1),
                                  max_candidates=64, num_iters=20,
                                  upsample_factor=5)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.slow
def test_two_process_experiment_step_matches_single_process(tmp_path):
    results = _run_workers(tmp_path, nproc=2, f_local=4)
    oracle = _oracle(F=8)

    # Both hosts see the identical replicated global result.
    for key in results[0]:
        np.testing.assert_array_equal(results[0][key], results[1][key],
                                      err_msg=f"hosts disagree on {key}")

    got = results[0]
    assert got["params"].shape == oracle["params"].shape
    np.testing.assert_allclose(got["offsets_h"], oracle["offsets_h"],
                               atol=1e-5)
    np.testing.assert_allclose(got["params"], oracle["params"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got["keep"], oracle["keep"])
    np.testing.assert_allclose(got["photometry"], oracle["photometry"],
                               rtol=1e-4, atol=1e-2)


@pytest.mark.slow
def test_two_process_run_experiment_csv_byte_identical(tmp_path):
    """The whole-experiment multihost front door (VERDICT r3 item 6):
    two processes, per-process field loading, global-mesh step, local
    host layers, row allgather — each host's track-photometries CSV must
    be BYTE-identical to the other host's AND to a single-process
    Pipeline.run_experiment over the concatenated stack (same mesh
    shape: 8 devices, one 8-field group). Output contract:
    /root/reference/flexlibrary.py:2755-2892."""
    _run_workers(tmp_path, nproc=2, f_local=4, mode="experiment")
    csv0 = (tmp_path / "worker_0_a0.npz.csv")
    csv1 = (tmp_path / "worker_1_a0.npz.csv")
    if not csv0.exists():  # the retry attempt wrote _a1 outputs
        csv0 = tmp_path / "worker_0_a1.npz.csv"
        csv1 = tmp_path / "worker_1_a1.npz.csv"
    b0 = csv0.read_bytes()
    b1 = csv1.read_bytes()
    assert b0 == b1, "hosts wrote different CSVs"

    from multihost_worker import synthetic_stack, experiment_config
    from fluorosequencingimageanalysis_tpu.api import Pipeline

    oracle_csv = tmp_path / "oracle.csv"
    Pipeline(config=experiment_config()).run_experiment(
        synthetic_stack(F=8), csv_path=str(oracle_csv))
    assert b0 == oracle_csv.read_bytes(), \
        "multihost CSV differs from the single-process oracle"


@pytest.mark.slow
def test_two_process_run_experiment_two_channels(tmp_path):
    """Multi-channel multihost front door: dict-of-channels input, rows
    in channel order then global field order, CSV byte-identical to the
    single-process two-channel Pipeline.run_experiment."""
    _run_workers(tmp_path, nproc=2, f_local=4, mode="experiment2ch")
    csv0 = tmp_path / "worker_0_a0.npz.csv"
    if not csv0.exists():
        csv0 = tmp_path / "worker_0_a1.npz.csv"
    b0 = csv0.read_bytes()

    from multihost_worker import synthetic_stack, experiment_config
    from fluorosequencingimageanalysis_tpu.api import Pipeline

    full = synthetic_stack(F=8)
    oracle_csv = tmp_path / "oracle2.csv"
    Pipeline(config=experiment_config()).run_experiment(
        {"ch1": full, "ch2": full * np.float32(0.8)},
        csv_path=str(oracle_csv))
    assert b0 == oracle_csv.read_bytes(), \
        "two-channel multihost CSV differs from the single-process oracle"


@pytest.mark.slow
def test_two_process_zstack_and_timetrace_sharding(tmp_path):
    """run_zstack's background estimator and run_timetrace's LC tracker
    through the same two-process harness: frame / spot axes shard over
    the global mesh, results gather to every host, equal to the
    single-process programs."""
    res_z = _run_workers(tmp_path, nproc=2, f_local=4, mode="zstack")
    from multihost_worker import synthetic_stack
    from fluorosequencingimageanalysis_tpu.ops.background import (
        stack_background)

    full = synthetic_stack(F=8)
    frames = full[:6, 0]
    oracle_bg = np.asarray(stack_background(frames, box_size=8,
                                            filter_size=3))
    np.testing.assert_array_equal(res_z[0]["bg"], res_z[1]["bg"])
    np.testing.assert_allclose(res_z[0]["bg"], oracle_bg, rtol=1e-6,
                               atol=1e-4)

    res_t = _run_workers(tmp_path, nproc=2, f_local=4, mode="timetrace")
    from fluorosequencingimageanalysis_tpu.pipeline.fast_timetrace import (
        lc_track)

    movie = full[:4, 0]
    ys = np.array([12.2, 30.4, 50.1, 20.3])
    xs = np.array([12.1, 40.2, 20.4, 52.2])
    oh, ow, op = lc_track(movie, ys, xs)
    for got in res_t:
        np.testing.assert_array_equal(got["rec_h"], oh)
        np.testing.assert_array_equal(got["rec_w"], ow)
        np.testing.assert_array_equal(got["present"], op)


@pytest.mark.slow
def test_two_process_run_timetrace_csv_byte_identical(tmp_path):
    """The whole-movie multihost front door (VERDICT r4 item 4): two
    processes, movie replicated, spot axis sharded over the global mesh
    for tracking, per-process photometry + step-fit shares, product
    allgather — each host's save_experiment_as_csv CSV must be
    BYTE-identical to the other host's AND to a single-process
    Pipeline.run_timetrace. Output contract:
    /root/reference/flexlibrary.py:3550-3709."""
    res = _run_workers(tmp_path, nproc=2, f_local=4, mode="run_timetrace")
    assert int(res[0]["n_traces"]) == int(res[1]["n_traces"]) >= 4
    csv0 = tmp_path / "worker_0_a0.npz.csv"
    csv1 = tmp_path / "worker_1_a0.npz.csv"
    if not csv0.exists():  # the retry attempt wrote _a1 outputs
        csv0 = tmp_path / "worker_0_a1.npz.csv"
        csv1 = tmp_path / "worker_1_a1.npz.csv"
    b0 = csv0.read_bytes()
    b1 = csv1.read_bytes()
    assert b0 == b1, "hosts wrote different timetrace CSVs"

    from multihost_worker import (experiment_config, synthetic_movie,
                                  timetrace_kwargs)
    from fluorosequencingimageanalysis_tpu.api import Pipeline

    oracle_csv = tmp_path / "oracle_tt.csv"
    out = Pipeline(config=experiment_config()).run_timetrace(
        synthetic_movie(), csv_path=str(oracle_csv), **timetrace_kwargs())
    assert out["trace_count"] == int(res[0]["n_traces"])
    assert b0 == oracle_csv.read_bytes(), \
        "multihost timetrace CSV differs from the single-process oracle"


@pytest.mark.slow
def test_two_process_padding_roundtrip(tmp_path):
    """F_local=3 forces the data-axis padding path (3 % 4 != 0): padded
    rows must be dropped and real fields returned in process order."""
    results = _run_workers(tmp_path, nproc=2, f_local=3)
    oracle = _oracle(F=6)
    got = results[0]
    assert got["params"].shape[0] == 6
    np.testing.assert_allclose(got["params"], oracle["params"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got["keep"], oracle["keep"])


@pytest.mark.slow
def test_unequal_field_counts_raise(tmp_path):
    """Unequal F_local across processes must fail LOUDLY (the keep-index
    math assumes equality; a consistent global shape would otherwise
    return silently host-divergent rows)."""
    with pytest.raises(RuntimeError) as exc:
        _run_workers_once(tmp_path, nproc=2, f_local=[3, 4], attempt=0)
    assert "same F_local" in str(exc.value), str(exc.value)[-2000:]


def test_initialize_single_process_is_noop(tmp_path):
    """initialize() with no arguments on a machine with no cluster
    environment must be the documented no-op (jax's auto-detect raises
    ValueError('coordinator_address should be defined'), which the
    wrapper absorbs), and a second call must also be a no-op."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from fluorosequencingimageanalysis_tpu.parallel import multihost\n"
        "multihost.initialize()\n"
        "multihost.initialize()\n"
        "import jax\n"
        "assert jax.process_count() == 1\n"
        "print('single-process ok')\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code, repo],
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "single-process ok" in proc.stdout


def test_initialize_explicit_bad_coordinator_still_raises():
    """An explicit-but-broken cluster spec must NOT be swallowed by the
    single-process fallback."""
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from fluorosequencingimageanalysis_tpu.parallel import multihost\n"
        "try:\n"
        "    multihost.initialize(num_processes=2, process_id=0)\n"
        "except (ValueError, RuntimeError) as e:\n"
        "    print('raised', type(e).__name__)\n"
        "else:\n"
        "    print('no error')\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code, repo],
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "raised" in proc.stdout, proc.stdout


def test_initialize_partial_spec_still_raises():
    """process_id given WITHOUT coordinator/num_processes is a broken
    multi-host launch, not a single-process machine: swallowing jax's
    ValueError here would silently degrade every host to an independent
    1-process run with host-divergent results."""
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from fluorosequencingimageanalysis_tpu.parallel import multihost\n"
        "try:\n"
        "    multihost.initialize(process_id=0)\n"
        "except (ValueError, RuntimeError) as e:\n"
        "    print('raised', type(e).__name__)\n"
        "else:\n"
        "    print('no error')\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code, repo],
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "raised" in proc.stdout, proc.stdout
