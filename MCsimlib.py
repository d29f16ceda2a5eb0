"""Compatibility shim: the reference's ``MCsimlib`` module surface
(/root/reference/MCsimlib.py), backed by the TPU-native inference and
simulation layers."""

# Proteome prep + analytic model (sim/proteome.py)
from fluorosequencingimageanalysis_tpu.sim.proteome import (  # noqa
    _dp, load_proteome, homogenize, cleave, attach, homogenize_attached,
    discard, truncate_heads, edman_failure_gaps, edman_failure_gaps_MP,
    _split_peptides_for_mp, _exposures, window_filter, perfect)

# MC generators + tries (sim/)
from fluorosequencingimageanalysis_tpu.sim.signals import (  # noqa
    random_signal, monte_carlo_trie, monte_carlo_trie_MP,
    monte_carlo_dictionary, monte_carlo_dictionary_MP)
from fluorosequencingimageanalysis_tpu.sim.trie import (  # noqa
    SignalTrie, SlimSignalTrie, PolyfluorSignalTrie)
from fluorosequencingimageanalysis_tpu.sim.polyfluor import (  # noqa
    PolyfluorSignal, PolyfluorPeptide, PolyfluorPeptide_v2)

# Track ingestion + plateau/cluster fits + remainder adjust (inference/)
from fluorosequencingimageanalysis_tpu.inference.photometries import (  # noqa
    read_track_photometries_csv, _pairwise, _r_2, _check_no_downsteps,
    _plateau_fit, _all_plateau_fits, _remainder_adjust, _remainder_adjust_2)
from fluorosequencingimageanalysis_tpu.inference.calibration import (  # noqa
    optimal_bin_size, optimal_bin_size_MP, _get_m0Dm1, last_drop_method,
    last_drop_method_v2)
from fluorosequencingimageanalysis_tpu.inference.lognormal import (  # noqa
    _intensities_to_signal_lognormal_v8, _photometries_lognormal_fit_MP_v8,
    photometries_lognormal_fit_v8)
from fluorosequencingimageanalysis_tpu.inference.photometries import (  # noqa
    unwind_photometries, write_photometries_dict_to_csv)

# Signal algebra + background correction (inference/background.py)
from fluorosequencingimageanalysis_tpu.inference.background import (  # noqa
    is_multidrop, discard_late_signals, head_truncate, counts_to_percent,
    sum_signals, average_signals, signals_std, generate_adjacent_positions,
    interpolate_signal, outlier_z_scores, iterative_peak_finding,
    iterative_peak_finding_v2, iterative_peak_finding_v3,
    subtract_false_positives, expected_background)
