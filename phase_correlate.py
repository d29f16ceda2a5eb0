"""Compatibility shim: the reference's ``phase_correlate`` module
(/root/reference/phase_correlate.py), backed by the batched XLA
registration kernels."""

from fluorosequencingimageanalysis_tpu.ops.registration import (  # noqa
    phase_correlate, phase_correlate_jit, phase_correlate_stack, _dftups)

__all__ = ["phase_correlate", "_dftups"]
