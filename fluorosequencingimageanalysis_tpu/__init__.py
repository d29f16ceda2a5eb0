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
