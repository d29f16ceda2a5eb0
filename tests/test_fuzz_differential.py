"""Randomized differential sweep: api.Pipeline.run_experiment vs the
class-based oracle across randomized experiment geometries.

The targeted parity tests (test_fast_experiment.py) each pin one scenario;
this sweep drives the SAME row-for-row comparison across a grid of
randomized geometries — field/cycle counts, spot density, dropout rate,
edge proximity — crossed with photometry methods, so method-specific
window-validity radii, interpolation fill-in, and category logic are
exercised jointly rather than one axis at a time. Seeds are fixed: every
case is deterministic and reproducible.

The oracle (class_path_rows) is the legacy-shaped class chain
(find_peptides -> Image/Spot -> SequenceExperiment ->
MultifieldMultichannelSequenceExperiment.track_photometries_as_csv), which
is itself the reference-parity surface (tested against
/root/reference/flexlibrary.py semantics throughout tests/).
"""

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.api import Pipeline
from fluorosequencingimageanalysis_tpu.config import (PipelineConfig,
                                                      PhotometryConfig)

from test_fast_experiment import make_stack, class_path_rows

# (seed, F, C, n_spots, presence_p, edge_margin, method)
# - edge_margin < 9 plants spots inside the mexican-hat ring -> rows that
#   exist only under smaller-window metrics;
# - presence_p spans sparse (0.6: gap/hole-heavy traces) to dense (0.95:
#   remainder-dominated);
# - C spans short (3) to long (8) category tuples.
CASES = [
    (101, 1, 3, 10, 0.70, 12, "simple"),
    (202, 3, 5, 30, 0.90, 7, "mexican_hat"),
    (303, 2, 6, 16, 0.60, 16, "maximum"),
    (404, 2, 4, 32, 0.95, 10, "gaussian_volume"),
    (505, 1, 8, 24, 0.80, 14, "sextractor"),
]


# MDMA sweep: randomized geometries under the photometric-drift
# adjustment (remainder-derived per-frame Af factors applied to every
# row) — (seed, F, C, n_spots, presence_p, edge_margin).
MDMA_CASES = [
    (111, 2, 5, 24, 0.85, 11),
    (222, 3, 4, 16, 0.95, 9),
]


@pytest.mark.parametrize("seed,F,C,n_spots,presence_p,edge_margin",
                         MDMA_CASES)
def test_fuzz_mdma_rows_match_class_path(seed, F, C, n_spots, presence_p,
                                         edge_margin, tmp_path):
    import csv

    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        SequenceExperiment)
    from test_mdma_qc import _class_experiment

    stack = make_stack(F=F, C=C, n_spots=n_spots, seed=seed,
                       presence_p=presence_p, edge_margin=edge_margin)
    mfmc = _class_experiment(stack)
    # The reference flow computes the factors first (stashing them as
    # photometry_adjustments["mdma"]) and then passes the adjustment
    # function to the CSV emitter (flexlibrary.py:2131-2212).
    mfmc.multiplicative_delta_median_adjustments()
    path = tmp_path / "ref.csv"
    mfmc.track_photometries_as_csv(
        str(path), save_averages=False,
        adjustment_function=SequenceExperiment.mdma_adjustment)
    with open(path) as fh:
        reader = csv.reader(fh)
        next(reader)
        rows_ref = list(reader)

    out = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256, mdma=True)
    rows_fast = out["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(ph, [float(x) for x in ref[5:]],
                                   rtol=1e-5, atol=1e-2,
                                   err_msg=f"case seed={seed} row {i}")


# Timetrace sweep: (seed, T, n_spots, drift, beta, ck, method)
# - drift spans pinned (0.02) to fast-wandering (0.30) spots;
# - beta spans bright (3000) to near-gate S/N (900: Illumina-S/N gate
#   failures -> fallback spots and None frames);
# - ck toggles the Chung-Kennedy prefilter branch.
TT_CASES = [
    (606, 16, 6, 0.02, 1800.0, 1, "mexican_hat"),
    (707, 30, 12, 0.15, 3000.0, 0, "simple"),
    (808, 12, 8, 0.30, 2500.0, 1, "maximum"),
    (909, 20, 10, 0.08, 900.0, 1, "mexican_hat"),
]


@pytest.mark.parametrize("seed,T,n_spots,drift,beta,ck,method", TT_CASES)
def test_fuzz_run_timetrace_matches_class_path(seed, T, n_spots, drift,
                                               beta, ck, method, tmp_path):
    import csv

    from fluorosequencingimageanalysis_tpu.config import StepfitConfig
    from test_fast_timetrace import (make_movie, class_path_csv,
                                     _compare_csvs)

    movie = make_movie(T=T, n_spots=n_spots, seed=seed, beta=beta,
                       drift=drift)
    header_ref, rows_ref = class_path_csv(movie, tmp_path,
                                          photometry_method=method,
                                          chung_kennedy=ck)
    pipe = Pipeline(PipelineConfig(
        photometry=PhotometryConfig(method=method),
        stepfit=StepfitConfig(mirror_start=0, chung_kennedy=ck,
                              p_threshold=0.01)))
    out = pipe.run_timetrace(movie, csv_path=str(tmp_path / "fast.csv"),
                             max_candidates=256)
    assert out["trace_count"] > 2
    with open(tmp_path / "fast.csv") as fh:
        reader = csv.reader(fh)
        header_fast = next(reader)
        rows_fast = list(reader)
    _compare_csvs(header_ref, rows_ref, header_fast, rows_fast)


@pytest.mark.parametrize("seed,F,C,n_spots,presence_p,edge_margin,method",
                         CASES)
def test_fuzz_run_experiment_matches_class_path(seed, F, C, n_spots,
                                                presence_p, edge_margin,
                                                method):
    stack = make_stack(F=F, C=C, n_spots=n_spots, seed=seed,
                       presence_p=presence_p, edge_margin=edge_margin)
    header_ref, rows_ref = class_path_rows(stack, photometry_method=method)

    pipe = Pipeline(PipelineConfig(photometry=PhotometryConfig(
        method=method)))
    res = pipe.run_experiment(stack, max_candidates=512, max_spots=256)
    rows_fast = res["rows"]

    assert len(rows_fast) == len(rows_ref) > 0, \
        (len(rows_fast), len(rows_ref))
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        ref_ph = np.array([float(x) for x in ref[5:]])
        np.testing.assert_allclose(ph, ref_ph, rtol=1e-5, atol=1e-2,
                                   err_msg=f"case seed={seed} row {i}")


# keep_invalid sweep: randomized geometries without the validity discard
# — None-Spot '0' rows, clipped-window edge photometry, and superset row
# sets all exercised across metrics. (seed, F, C, n_spots, presence_p,
# edge_margin, method); sextractor's clipped edges ride the host sweep's
# zero-padded aperture kernel.
KEEP_INVALID_CASES = [
    (121, 1, 5, 30, 0.60, 4, "mexican_hat"),
    (232, 2, 4, 24, 0.75, 5, "simple"),
    (343, 1, 6, 20, 0.70, 4, "maximum"),
    (454, 2, 5, 24, 0.65, 4, "gaussian_volume"),
    # edge_margin=1 verified non-vacuous: 3 None-Spot and 2 clipped-window
    # positions for this seed/geometry (an edge_margin>=4 variant produced
    # zero of each and pinned nothing).
    (565, 1, 4, 26, 0.65, 1, "sextractor"),
]


@pytest.mark.parametrize("seed,F,C,n_spots,presence_p,edge_margin,method",
                         KEEP_INVALID_CASES)
def test_fuzz_keep_invalid_matches_class_path(seed, F, C, n_spots,
                                              presence_p, edge_margin,
                                              method):
    stack = make_stack(F=F, C=C, n_spots=n_spots, seed=seed,
                       presence_p=presence_p, edge_margin=edge_margin)
    _, rows_ref = class_path_rows(stack, photometry_method=method,
                                  keep_invalid=True)
    pipe = Pipeline(PipelineConfig(photometry=PhotometryConfig(
        method=method)))
    res = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              keep_invalid=True)
    rows_fast = res["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        for c, (v, rv) in enumerate(zip(ph, ref[5:])):
            if v is None:
                assert rv == "0", (seed, i, c, rv)
            else:
                np.testing.assert_allclose(
                    v, float(rv), rtol=1e-5, atol=1e-2,
                    err_msg=f"case seed={seed} row {i} frame {c}")


# save_averages sweep: the uninterpolated AVERAGE_INTENSITY format across
# metrics and hole-heavy geometries (frame-0-absent traces -> None H/W).
SAVE_AVG_CASES = [
    (565, 2, 4, 24, 0.70, 10, "mexican_hat"),
    (676, 1, 6, 20, 0.60, 12, "simple"),
    (787, 2, 5, 18, 0.75, 9, "gaussian_volume"),
]


@pytest.mark.parametrize("seed,F,C,n_spots,presence_p,edge_margin,method",
                         SAVE_AVG_CASES)
def test_fuzz_save_averages_matches_class_path(seed, F, C, n_spots,
                                               presence_p, edge_margin,
                                               method):
    stack = make_stack(F=F, C=C, n_spots=n_spots, seed=seed,
                       presence_p=presence_p, edge_margin=edge_margin)
    header, rows_ref = class_path_rows(stack, photometry_method=method,
                                       save_averages=True)
    assert header[-1] == "AVERAGE_INTENSITY"
    pipe = Pipeline(PipelineConfig(photometry=PhotometryConfig(
        method=method)))
    res = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              save_averages=True)
    rows_fast = res["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    for i, ((ch, f, h, w, cat, mean), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(mean, float(ref[5]), rtol=1e-5,
                                   atol=1e-2,
                                   err_msg=f"case seed={seed} row {i}")


# keep_invalid + save_averages: the two flags are CLI-composable and take
# interacting paths (skip_hole_gathers leaves in-box holes NaN, the
# keep_invalid NaN->None conversion feeds the averages mean/H-W logic).
KI_SA_CASES = [
    (131, 1, 5, 28, 0.60, 4, "mexican_hat"),
    (242, 2, 4, 22, 0.70, 5, "simple"),
    # edge_margin=1 verified non-vacuous: 4 None-Spot and 6 clipped-window
    # positions for this seed/geometry, so the NaN->None conversion feeding
    # the averages mean/H-W logic is actually exercised.
    (353, 1, 5, 22, 0.65, 1, "sextractor"),
]


@pytest.mark.parametrize("seed,F,C,n_spots,presence_p,edge_margin,method",
                         KI_SA_CASES)
def test_fuzz_keep_invalid_save_averages_matches_class_path(
        seed, F, C, n_spots, presence_p, edge_margin, method):
    stack = make_stack(F=F, C=C, n_spots=n_spots, seed=seed,
                       presence_p=presence_p, edge_margin=edge_margin)
    header, rows_ref = class_path_rows(stack, photometry_method=method,
                                       save_averages=True,
                                       keep_invalid=True)
    assert header[-1] == "AVERAGE_INTENSITY"
    pipe = Pipeline(PipelineConfig(photometry=PhotometryConfig(
        method=method)))
    res = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              save_averages=True, keep_invalid=True)
    rows_fast = res["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    for i, ((ch, f, h, w, cat, mean), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(mean, float(ref[5]), rtol=1e-5,
                                   atol=1e-2,
                                   err_msg=f"case seed={seed} row {i}")


def test_keep_invalid_save_averages_mdma_branch_order():
    """mdma + save_averages + keep_invalid together: the adjustment must
    ride the save_averages branch (detected frames multiplied by 1-Af,
    absent frames excluded from the mean) — pinned against the same
    run's per-frame keep_invalid rows and its own reported Af factors,
    so a regression in the elif ordering at the mdma application site
    ships loudly."""
    stack = make_stack(F=2, C=5, n_spots=24, seed=353, presence_p=0.65,
                       edge_margin=4)
    pipe = Pipeline()
    raw = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              keep_invalid=True)
    out = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              keep_invalid=True, save_averages=True,
                              mdma=True)
    assert len(out["rows"]) == len(raw["rows"]) > 0
    adjs = out["mdma_adjustments"]
    for (ch, f, h, w, cat, mean), (ch2, f2, h2, w2, cat2, ph_raw) in zip(
            out["rows"], raw["rows"]):
        assert (ch, f, cat) == (ch2, f2, cat2)
        af = adjs[ch][f]
        expect = [ph_raw[i] * (1.0 - af[i])
                  for i in range(len(cat)) if cat[i]]
        # Detected frames always carry a value on the raw surface too.
        assert all(v is not None for v in expect)
        np.testing.assert_allclose(mean, np.mean(expect), rtol=1e-9,
                                   err_msg=f"row ({ch},{f},{h},{w})")
        if not cat[0]:
            assert h is None and w is None
