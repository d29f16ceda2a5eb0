"""
fluorosequencingimageanalysis_tpu
=================================

A TPU-native JAX framework for fluorosequencing image analysis, providing the
capabilities of the reference pipeline (marcottelab/FluorosequencingImageAnalysis)
redesigned for XLA/Pallas/pjit execution:

- Spot (peptide PSF) detection and batched 2D-Gaussian PSF fitting
  (reference: pflib.py) as fused, vmapped array programs.
- Subpixel FFT phase-correlation registration (reference: phase_correlate.py)
  as batched XLA FFTs + matrix-multiply upsampled DFTs.
- Experiment data model, particle tracking and photometry
  (reference: flexlibrary.py).
- Intensity-trace step fitting (reference: stepfitting_library.py) vectorized
  across traces.
- Monte-Carlo dye simulation and lognormal fluor-count inference
  (reference: MCsimlib.py, peptide_simulator.py) as vectorized RNG programs.

Layout:
    ops/       pure jittable kernels (candidates, LM fit, FFT registration,
               photometry, step fitting, lognormal scoring)
    models/    composed compute pipelines (whole-field detect+fit, etc.)
    parallel/  mesh / sharding helpers for multi-chip execution
    pipeline/  host-side experiment layer (Spots, Images, Traces, Experiments)
    inference/ calibration + lognormal fitting + background correction
    sim/       Monte-Carlo peptide simulator
    native/    C++ runtime components (ctypes C ABI)
    utils/     hashing, IO, visualization, profiling, checkpointing
    api.py     Pipeline facade; config.py typed configs

Reference-compatible CLI entry points live as top-level scripts
(basic_image_script.py etc.), matching the reference's layout.
"""

__version__ = "0.1.0"


def _machine_cache_key():
    """Short stable key for this machine type: arch + OS + CPU model +
    CPU feature flags. XLA:CPU AOT results bake in LLVM's host-detected
    target features, which include per-MODEL tuning flags (e.g.
    ``prefer-no-gather``) that two machines with identical cpuinfo
    feature lists can still disagree on — so the model name is part of
    the key, not just the flags. Hashed so the directory name stays
    short."""
    import hashlib
    import platform

    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            # First processor block only: model name plus the raw
            # family/model/stepping numbers LLVM's CPUID-based host
            # detection keys its tuning on.
            want = ("model name", "cpu family", "model\t", "model:",
                    "stepping", "flags", "Features")
            seen = set()
            for line in f:
                if line.strip() == "" and seen:
                    break  # end of the first processor block
                for w in want:
                    if line.startswith(w) and w not in seen:
                        seen.add(w)
                        val = line.split(":", 1)[1].strip()
                        if w in ("flags", "Features"):
                            val = " ".join(sorted(val.split()))
                        bits.append(f"{w}={val}")
                        break
    except OSError:
        bits.append(platform.processor() or "unknown")
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def _enable_persistent_compile_cache():
    """Persistent XLA compile cache, on by default.

    TPU compiles of the big programs (512x512 detect, chunked stepfit /
    v8 buckets) cost 20 s - minutes on constrained backends; the disk
    cache makes every later process hit them in milliseconds. Opt out
    with FLUORO_TPU_NO_COMPILE_CACHE=1 or point the directory elsewhere
    with JAX_COMPILATION_CACHE_DIR (which JAX itself also honors).

    Importing this package must stay jax-free (CLI --help, sim-only
    consumers), so when jax is not yet loaded the cache is configured
    through the JAX_* env vars jax reads at its own import time; only
    an already-imported jax is configured directly.
    """
    import os
    import sys

    if os.environ.get("FLUORO_TPU_NO_COMPILE_CACHE"):
        return
    try:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # user already configured it; JAX reads the env var
        # Scope the cache directory by a MACHINE key: XLA:CPU AOT entries
        # bake in the compiling host's CPU feature set, and jax's own
        # cache key does not include it — loading an entry compiled on a
        # different machine type logs "could lead to SIGILL" warnings
        # today and can actually crash on a weaker host. A shared $HOME
        # across machine types (clusters, containers) must not share
        # these entries.
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "fluoro_tpu_jax_cache",
            _machine_cache_key())
        os.makedirs(cache_dir, exist_ok=True)
        if "jax" in sys.modules:
            jax = sys.modules["jax"]
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
            # Concurrent compiles of one shape are normal here (probe
            # subprocesses, multi-process tests/benches); jax's stock
            # cache write is torn-entry-prone (utils/jaxcache docstring).
            from .utils.jaxcache import ensure_atomic_cache_writes
            ensure_atomic_cache_writes()
        else:
            os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
            os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()


def __getattr__(name):
    # Lazy top-level exports (keep `import fluorosequencingimageanalysis_tpu`
    # free of jax initialization).
    if name == "Pipeline":
        from .api import Pipeline
        return Pipeline
    if name == "PipelineConfig":
        from .config import PipelineConfig
        return PipelineConfig
    raise AttributeError(name)
