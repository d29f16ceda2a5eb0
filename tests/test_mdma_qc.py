"""MDMA + remainder-QC fast-path options vs the experiment classes.

The class flow is trace -> discard -> multiplicative_delta_median_
adjustments -> remainder_threshold_fields -> track_photometries_as_csv(
adjustment_function=mdma_adjustment, ignore_invalid_fields=True)
(flexlibrary.py:2131-2212, 3231-3263); api.run_experiment(mdma=True,
remainder_threshold=...) must reproduce its rows and masks exactly."""

import csv

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.api import Pipeline
from fluorosequencingimageanalysis_tpu.pipeline import tracking

from test_fast_experiment import make_stack


def _class_experiment(stack, max_candidates=512):
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        SequenceExperiment, MultichannelSequenceExperiment,
        MultifieldMultichannelSequenceExperiment)
    from fluorosequencingimageanalysis_tpu.models.detect import (
        find_peptides_batch)

    F, C, H, W = stack.shape
    fields = []
    for f in range(F):
        psfs_list = find_peptides_batch(stack[f],
                                        max_candidates=max_candidates,
                                        num_iters=60)
        images = []
        for c in range(C):
            img = Image(image=stack[f, c],
                        metadata={"filepath": f"mem://{f}/{c}"}, spots=None)
            spots = []
            for (h, w), gf in psfs_list[c].items():
                try:
                    spots.append(Spot(img, int(tracking._py2_round(h)),
                                      int(tracking._py2_round(w)), 5,
                                      gaussian_fit=gf))
                except Exception:
                    pass
            img.spots = spots
            images.append(img)
        ex = SequenceExperiment(images, alignment_frames=images)
        ex.offsets_from_frames()
        fields.append(MultichannelSequenceExperiment({"ch1": ex}))
    mfmc = MultifieldMultichannelSequenceExperiment(fields)
    mfmc.trace_existing_spots()
    mfmc.discard_invalid_traces()
    return mfmc


def test_mdma_rows_match_class_path(tmp_path):
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        SequenceExperiment)

    stack = make_stack(F=2, C=4, seed=21, n_spots=20, presence_p=0.8)
    mfmc = _class_experiment(stack)
    ref_adjs = mfmc.multiplicative_delta_median_adjustments()
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
                                   rtol=1e-5, atol=1e-2, err_msg=f"row {i}")
    # The adjustment factors themselves must match the class computation
    # per (field, channel): MFMC returns a list over fields of per-channel
    # dicts of Af tuples.
    for f, field_adjs in enumerate(ref_adjs):
        np.testing.assert_allclose(out["mdma_adjustments"]["ch1"][f],
                                   field_adjs["ch1"], rtol=1e-9, atol=1e-12)
    # A nontrivial scenario: at least one field has remainders and a
    # nonzero adjustment somewhere.
    assert any(any(a != 0.0 for a in adjs)
               for adjs in out["mdma_adjustments"]["ch1"].values())


def test_remainder_threshold_mask_matches_class_path(tmp_path):
    stack = make_stack(F=3, C=4, seed=22, n_spots=14, presence_p=0.75)
    # Field 2: pure noise -> zero remainders -> QC-masked.
    stack[2] = np.random.default_rng(77).normal(
        400.0, 6.0, stack.shape[1:]).astype(np.float32)
    mfmc = _class_experiment(stack)
    ref_counts = mfmc.count_remainders()
    threshold = max(2, min(c["ch1"] for c in ref_counts[:2]))
    ref_mask = mfmc.remainder_threshold_fields(min_remainders=threshold)
    path = tmp_path / "ref.csv"
    mfmc.track_photometries_as_csv(str(path), save_averages=False,
                                   ignore_invalid_fields=True)
    with open(path) as fh:
        reader = csv.reader(fh)
        next(reader)
        rows_ref = list(reader)

    out = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256,
                                    remainder_threshold=threshold)
    assert out["remainder_counts"]["ch1"] == [c["ch1"] for c in ref_counts]
    assert out["invalid_fields_mask"] == list(ref_mask)
    assert not out["invalid_fields_mask"][2]  # noise field masked
    rows_fast = out["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    assert all(out["invalid_fields_mask"][f]
               for (_, f, _, _, _, _) in rows_fast)
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(ph, [float(x) for x in ref[5:]],
                                   rtol=1e-5, atol=1e-2, err_msg=f"row {i}")


def test_remainder_threshold_requires_matching_field_counts():
    s1 = make_stack(F=1, C=3, seed=2, n_spots=8)
    s2 = make_stack(F=2, C=3, seed=3, n_spots=8)
    with pytest.raises(ValueError, match="field count"):
        Pipeline().run_experiment({"a": s1, "b": s2},
                                  max_candidates=256, max_spots=64,
                                  remainder_threshold=2)


def _tagged_adjustment(photometry, frame, adjustments):
    """A custom hook exercising every argument: scales by frame parity
    and, when mdma adjustments ride along, folds in the Af factor with a
    non-stock formula (so this can never pass by accident through the
    built-in multiply)."""
    base = photometry * (0.5 if frame % 2 else 1.25) + 3.0 * frame
    if adjustments is not None and "mdma" in adjustments:
        base = base - 100.0 * adjustments["mdma"][frame]
    return base


@pytest.mark.parametrize("with_mdma", [False, True])
def test_custom_adjustment_function_matches_class_path(tmp_path, with_mdma):
    """run_experiment(adjustment_function=...) == the classes'
    track_photometries_as_csv(adjustment_function=...) — including the
    adjustments dict handoff (None before multiplicative_delta_median_
    adjustments runs, {'mdma': Af} after), flexlibrary.py:2088-2124."""
    stack = make_stack(F=2, C=4, seed=23, n_spots=18, presence_p=0.8)
    mfmc = _class_experiment(stack)
    if with_mdma:
        mfmc.multiplicative_delta_median_adjustments()
    path = tmp_path / "ref.csv"
    mfmc.track_photometries_as_csv(str(path), save_averages=False,
                                   adjustment_function=_tagged_adjustment)
    with open(path) as fh:
        reader = csv.reader(fh)
        next(reader)
        rows_ref = list(reader)

    out = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256, mdma=with_mdma,
                                    adjustment_function=_tagged_adjustment)
    rows_fast = out["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    assert (out["mdma_adjustments"] is not None) == with_mdma
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(ph, [float(x) for x in ref[5:]],
                                   rtol=1e-5, atol=1e-2, err_msg=f"row {i}")


def test_mdma_tag_is_ignored_like_reference(tmp_path):
    """PARITY 'MDMA tag': the reference's docstring promises an alternate
    tag creates a new photometry_adjustments entry, but its code always
    stores under the literal 'mdma' key
    (/root/reference/flexlibrary.py:2197-2200). Pin the quirk: a custom
    tag is accepted, ignored, and the factors land under 'mdma'."""
    stack = make_stack(F=1, C=4, seed=23, n_spots=16, presence_p=0.8)
    mfmc = _class_experiment(stack)
    ref = mfmc.multiplicative_delta_median_adjustments()

    mfmc2 = _class_experiment(stack)
    got = mfmc2.multiplicative_delta_median_adjustments(tag="custom")
    assert got == ref
    checked = 0
    for field in mfmc2.experimental_fields:
        for ex in field.channels.values():
            adjs = ex.photometry_adjustments
            if adjs is not None:
                assert "mdma" in adjs
                assert "custom" not in adjs
                checked += 1
    assert checked > 0
