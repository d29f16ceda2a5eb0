"""Compatibility shim: the reference's ``plotting`` module
(/root/reference/plotting.py)."""

from fluorosequencingimageanalysis_tpu.plotting import (  # noqa
    colors, plot_histogram, single_drops_heatmap, double_drops_heatmap,
    single_drops_heatmap_v2, double_drops_heatmap_v2)
