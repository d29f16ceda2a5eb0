"""Differential test: array-native run_experiment vs the class-based path.

The class-based flow (find_peptides -> Image/Spot -> SequenceExperiment ->
MultifieldMultichannelSequenceExperiment.track_photometries_as_csv) is the
reference-parity oracle; api.Pipeline.run_experiment must reproduce its
CSV rows exactly (keys/categories/order) with photometries equal to float
tolerance."""

import csv
import io

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.api import Pipeline
from fluorosequencingimageanalysis_tpu.pipeline import tracking


def make_stack(F, C, H=128, W=128, n_spots=24, seed=0, presence_p=0.85,
               edge_margin=16, subpixel_drift=False):
    """Synthetic experiment: persistent spots with random per-cycle
    dropouts (-> gaps, head holes, tail holes) and integer stage drift.

    edge_margin < 9 plants spots inside the default mexican-hat window
    ring, exercising the per-method window-validity rejection."""
    rng = np.random.default_rng(seed)
    hh, ww = np.indices((H, W)).astype(np.float32)
    if subpixel_drift:
        # Real stage drift is subpixel; registration at upsample 20
        # reports 0.05-px multiples, driving the interpolation float
        # paths through non-representable offsets.
        drift = [(0.0, 0.0)] + [(round(rng.uniform(-2, 2) * 20) / 20,
                                 round(rng.uniform(-2, 2) * 20) / 20)
                                for _ in range(C - 1)]
    else:
        drift = [(0, 0)] + [(int(rng.integers(-2, 3)),
                             int(rng.integers(-2, 3)))
                            for _ in range(C - 1)]
    cumd = np.cumsum(np.asarray(drift), axis=0)
    stack = rng.normal(400.0, 6.0, (F, C, H, W)).astype(np.float32)
    for f in range(F):
        pos = rng.uniform(edge_margin, H - edge_margin, (n_spots, 2))
        amp = rng.uniform(2000, 5000, n_spots)
        present = rng.random((n_spots, C)) < presence_p
        present[:, 0] |= rng.random(n_spots) < 0.7  # most start ON
        for c in range(C):
            # The image of cycle c is shifted by the cumulative drift:
            # a fixed physical spot appears displaced by -cum (the spot
            # moves opposite to the field shift reported by registration).
            for s in range(n_spots):
                if not present[s, c]:
                    continue
                h = pos[s, 0] - cumd[c, 0]
                w = pos[s, 1] - cumd[c, 1]
                stack[f, c] += amp[s] * np.exp(
                    -(((hh - h) ** 2) + ((ww - w) ** 2)) / (2 * 1.3 ** 2))
    return stack


def class_path_rows(stack, max_candidates=512, photometry_method="mexican_hat",
                    save_averages=False, adjustment_function=None,
                    keep_invalid=False):
    """Drive the legacy-shaped experiment classes end-to-end; return the
    parsed track-photometries CSV rows."""
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
                try:  # easy_load_processed_image semantics
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
    # The reference script passes the photometry parameters to BOTH the
    # discard and the CSV emitter (basic_experiment_script.py:474, 620-624),
    # so window validity is judged at the chosen metric's radius.
    # --keep_invalid skips the discard entirely
    # (basic_experiment_script.py:472-476).
    if not keep_invalid:
        mfmc.discard_invalid_traces(photometry_method=photometry_method)
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".csv")
    os.close(fd)
    try:
        mfmc.track_photometries_as_csv(path, save_averages=save_averages,
                                       photometry_method=photometry_method,
                                       adjustment_function=adjustment_function)
        with open(path) as fh:
            reader = csv.reader(fh)
            header = next(reader)
            rows = list(reader)
    finally:
        os.unlink(path)
    return header, rows


@pytest.mark.parametrize("seed", [0, 3])
def test_run_experiment_matches_class_path(seed):
    # Integer drift only here: with subpixel drift the two paths register
    # at different precisions (the class path casts frames to float64, the
    # device step runs float32), so their offset ESTIMATES differ in low
    # bits and can Py2-round across .5 boundaries — a registration-
    # precision artifact, not an experiment-logic divergence. Subpixel
    # interpolation parity is proven with injected identical offsets in
    # test_fast_experiment_subpixel_offsets_match_class_path.
    stack = make_stack(F=2, C=4, seed=seed)
    header_ref, rows_ref = class_path_rows(stack)

    pipe = Pipeline()
    res = pipe.run_experiment(stack, max_candidates=512, max_spots=256)
    rows_fast = res["rows"]

    assert len(rows_fast) == len(rows_ref), \
        (len(rows_fast), len(rows_ref))
    # Keys + categories + order must match exactly; photometries to float
    # tolerance (identical kernel, float32 both — expect near-bit equality).
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        ref_ph = np.array([float(x) for x in ref[5:]])
        np.testing.assert_allclose(ph, ref_ph, rtol=1e-5, atol=1e-2,
                                   err_msg=f"row {i}")
    # Sanity: the scenario really exercises gaps + multiple categories.
    cats = {cat for (_, _, _, _, cat, _) in rows_fast}
    assert len(cats) > 2
    assert any(not all(cat) for cat in cats)


@pytest.mark.parametrize("seed", [6, 11])
def test_fast_experiment_subpixel_offsets_match_class_path(seed, tmp_path):
    """Interpolation float-path parity under subpixel offsets, with BOTH
    paths consuming identical injected offsets (isolating the
    interpolate/fill/round logic from registration precision). 0.05-px
    multiples are what upsample-20 registration reports and are not
    exactly representable, so association order matters (the reference
    groups offset differences before the add)."""
    import csv as csv_module
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        SequenceExperiment, MultichannelSequenceExperiment,
        MultifieldMultichannelSequenceExperiment)
    from fluorosequencingimageanalysis_tpu.models.detect import (
        find_peptides_batch)
    from fluorosequencingimageanalysis_tpu.pipeline.fast_experiment import (
        run_experiment_stack)

    rng = np.random.default_rng(seed)
    stack = make_stack(F=1, C=5, seed=seed, n_spots=18, presence_p=0.7,
                       subpixel_drift=True)
    F, C, H, W = stack.shape
    offs = [(0.0, 0.0)] + [(round(rng.uniform(-2, 2) * 20) / 20,
                            round(rng.uniform(-2, 2) * 20) / 20)
                           for _ in range(C - 1)]

    psfs_list = find_peptides_batch(stack[0], max_candidates=512,
                                    num_iters=60)
    images, rhs, rws = [], [[None] * C], [[None] * C]
    for c in range(C):
        img = Image(image=stack[0, c],
                    metadata={"filepath": f"mem://0/{c}"}, spots=None)
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
        rhs[0][c] = np.asarray([s.h for s in spots], np.int64)
        rws[0][c] = np.asarray([s.w for s in spots], np.int64)

    ex = SequenceExperiment(images, alignment_frames=images)
    ex.offsets = list(offs)  # inject: skip offsets_from_frames
    mfmc = MultifieldMultichannelSequenceExperiment(
        [MultichannelSequenceExperiment({"ch1": ex})])
    mfmc.trace_existing_spots()
    mfmc.discard_invalid_traces()
    path = tmp_path / "ref.csv"
    mfmc.track_photometries_as_csv(str(path), save_averages=False)
    with open(path) as fh:
        reader = csv_module.reader(fh)
        next(reader)
        rows_ref = list(reader)

    off_h = np.asarray([[o[0] for o in offs]])
    off_w = np.asarray([[o[1] for o in offs]])
    per_field = run_experiment_stack(stack, off_h, off_w, (rhs, rws))
    rows_fast = per_field[0]
    assert len(rows_fast) == len(rows_ref) > 0
    interpolated = 0
    for i, ((cat, h, w, ph), ref) in enumerate(zip(rows_fast, rows_ref)):
        assert (str(h), str(w), str(cat)) == tuple(ref[2:5]), (i, ref[:5])
        interpolated += cat.count(False) if isinstance(cat, tuple) else 0
        ref_ph = np.array([float(x) for x in ref[5:]])
        np.testing.assert_allclose(ph, ref_ph, rtol=1e-5, atol=1e-2,
                                   err_msg=f"row {i}")
    assert interpolated > 0  # the scenario actually interpolates holes


@pytest.mark.parametrize("method", ["simple", "maximum", "gaussian_volume",
                                    "sigmas", "sextractor"])
def test_run_experiment_photometry_methods(method):
    """Non-default metrics must match the class path too (each metric has
    its own square radius, hence its own window-validity rejection).
    edge_margin=7 plants spots inside the mexican-hat ring (radius 9) but
    outside the simple/maximum windows (2/5), so rows exist here that the
    default metric would reject — the validity radius must follow the
    configured method."""
    from fluorosequencingimageanalysis_tpu.config import (
        PipelineConfig, PhotometryConfig)

    stack = make_stack(F=1, C=4, seed=5, n_spots=16, edge_margin=7)
    header_ref, rows_ref = class_path_rows(stack, photometry_method=method)
    pipe = Pipeline(PipelineConfig(photometry=PhotometryConfig(method=method)))
    res = pipe.run_experiment(stack, max_candidates=512, max_spots=256)
    rows_fast = res["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        ref_ph = np.array([float(x) for x in ref[5:]])
        np.testing.assert_allclose(ph, ref_ph, rtol=1e-5, atol=1e-2,
                                   err_msg=f"row {i}")


def test_run_experiment_rejects_unknown_methods():
    from fluorosequencingimageanalysis_tpu.pipeline.fast_experiment import (
        run_experiment_stack)

    stack = make_stack(F=1, C=3, seed=6, n_spots=6)
    rhs = [[np.zeros(0, np.int64)] * 3]
    with pytest.raises(ValueError, match="no_such_metric"):
        run_experiment_stack(stack, np.zeros((1, 3)), np.zeros((1, 3)),
                             (rhs, rhs), photometry_method="no_such_metric")


def test_run_experiment_csv_and_counts(tmp_path):
    stack = make_stack(F=2, C=3, seed=1, n_spots=12)
    pipe = Pipeline()
    out = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              csv_path=str(tmp_path / "tracks.csv"))
    with open(tmp_path / "tracks.csv") as fh:
        reader = csv.reader(fh)
        header = next(reader)
        rows = list(reader)
    assert header == ["CHANNEL", "FIELD", "H", "W", "CATEGORY",
                      "FRAME 0", "FRAME 1", "FRAME 2"]
    assert len(rows) == len(out["rows"]) > 0
    total = sum(n for by_f in out["category_counts"].values()
                for d in by_f.values() for n in d.values())
    assert total == len(rows)
    # Filtered counts keep only monotone one-drop patterns.
    for by_f in out["filtered_category_counts"].values():
        for d in by_f.values():
            for cat in d:
                assert tuple(sorted(cat, reverse=True)) == cat
    # The CSV is ingestible by the inference layer (the L3 -> L4 surface).
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        read_track_photometries_csv)
    d, d2 = read_track_photometries_csv(str(tmp_path / "tracks.csv"))
    assert "ch1" in d and len(d2) == len(rows)


def test_run_experiment_multichannel_dict():
    stacks = {"ch1": make_stack(F=1, C=3, seed=2, n_spots=10),
              "ch2": make_stack(F=1, C=3, seed=9, n_spots=10)}
    out = Pipeline().run_experiment(stacks, max_candidates=512,
                                    max_spots=128)
    channels = {r[0] for r in out["rows"]}
    assert channels == {"ch1", "ch2"}
    assert set(out["category_counts"].keys()) == {"ch1", "ch2"}
    assert set(out["offsets"].keys()) == {"ch1", "ch2"}


def test_run_experiment_category_csv_matches_class_path(tmp_path):
    """The Pattern,Channel,Count CSV must match category_counts_as_csv
    byte-for-byte (filtered and unfiltered, plain and collated)."""
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        SequenceExperiment, MultichannelSequenceExperiment,
        MultifieldMultichannelSequenceExperiment)
    from fluorosequencingimageanalysis_tpu.models.detect import (
        find_peptides_batch)

    stack = make_stack(F=2, C=4, seed=7, n_spots=14)
    F, C, H, W = stack.shape
    fields = []
    for f in range(F):
        psfs_list = find_peptides_batch(stack[f], max_candidates=512,
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

    out = Pipeline().run_experiment(
        stack, max_candidates=512, max_spots=256,
        category_csv_path=str(tmp_path / "fast.csv"))
    for filtered, collate in [(True, False), (False, False), (True, True)]:
        mfmc.category_counts_as_csv(str(tmp_path / "ref.csv"),
                                    filtered=filtered,
                                    collate_fields=collate)
        Pipeline().run_experiment(
            stack, max_candidates=512, max_spots=256,
            category_csv_path=str(tmp_path / "fast.csv"),
            category_csv_filtered=filtered,
            category_csv_collate_fields=collate)
        ref = (tmp_path / "ref.csv").read_text()
        fast = (tmp_path / "fast.csv").read_text()
        assert ref == fast, (filtered, collate)
    assert out["category_csv_path"] is not None


def test_run_experiment_warns_on_spot_overflow(caplog):
    """Overflowing the spot bucket must be reported, never silent."""
    import logging

    stack = make_stack(F=1, C=3, seed=8, n_spots=20)
    with caplog.at_level(logging.WARNING,
                         logger="fluorosequencingimageanalysis_tpu.api"):
        Pipeline().run_experiment(stack, max_candidates=256, max_spots=4)
    assert any("overflowed" in r.message for r in caplog.records)


def test_run_experiment_summary_matches_class_counts():
    """spot/trace/singleton counts must agree with the experiment
    classes' spot_count/trace_count/singleton_count (post-discard)."""
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        SequenceExperiment, MultichannelSequenceExperiment,
        MultifieldMultichannelSequenceExperiment)
    from fluorosequencingimageanalysis_tpu.models.detect import (
        find_peptides_batch)

    stack = make_stack(F=2, C=4, seed=12, n_spots=12, presence_p=0.6)
    F, C, H, W = stack.shape
    fields = []
    for f in range(F):
        psfs_list = find_peptides_batch(stack[f], max_candidates=512,
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
    # Detected-spot count, taken BEFORE tracking: the class number grows
    # afterwards because interpolate_spots appends its Spots to the
    # frames on every fill_in_trace call (a path-dependent accumulation
    # artifact the front door intentionally does not reproduce).
    ref_spots = sum(ex.spot_count()["ch1"] for ex in fields)
    mfmc.trace_existing_spots()
    mfmc.discard_invalid_traces()
    ref_traces = mfmc.trace_count()["ch1"]
    ref_singletons = mfmc.singleton_count()["ch1"]

    out = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256)
    s = out["summary"]["ch1"]
    assert s["spot_count"] == ref_spots
    assert s["trace_count"] == ref_traces
    assert s["singleton_count"] == ref_singletons


def test_run_experiment_category_csv_empty_field(tmp_path):
    """Zero-trace fields must still appear: the reference pre-creates a
    per-field entry for every valid field (experiment.py:685 /
    flexlibrary.py:2682-2688), so collated category CSVs carry count-0
    rows for fields that produced nothing."""
    import csv as csv_module

    stack = make_stack(F=2, C=3, seed=10, n_spots=10)
    stack[1] = np.random.default_rng(99).normal(
        400.0, 6.0, stack.shape[1:]).astype(np.float32)  # field 1: noise
    out = Pipeline().run_experiment(
        stack, max_candidates=256, max_spots=128,
        category_csv_path=str(tmp_path / "cats.csv"),
        category_csv_collate_fields=True)
    # Both field keys exist even if field 1 produced no traces.
    assert set(out["category_counts"]["ch1"].keys()) == {0, 1}
    with open(tmp_path / "cats.csv") as fh:
        reader = csv_module.reader(fh)
        next(reader)
        rows = list(reader)
    # Every (pattern, field) combination appears exactly once — including
    # field 1 rows (count 0 for patterns it never produced).
    seen = {}
    for (pattern, field, chan, count) in rows:
        seen.setdefault(pattern, set()).add(field)
    for pattern, fields_seen in seen.items():
        assert fields_seen == {"0", "1"}, (pattern, fields_seen)


def test_run_experiment_uint16_equals_float32():
    """Raw 16-bit camera frames must give bit-identical rows to the same
    data pre-cast to float32 (the cast happens on device either way)."""
    stack_f = np.clip(make_stack(F=1, C=3, seed=4, n_spots=10), 0, 65535)
    stack_u = stack_f.astype(np.uint16)
    out_u = Pipeline().run_experiment(stack_u, max_candidates=256,
                                      max_spots=128)
    out_f = Pipeline().run_experiment(stack_u.astype(np.float32),
                                      max_candidates=256, max_spots=128)
    assert len(out_u["rows"]) == len(out_f["rows"]) > 0
    for ru, rf in zip(out_u["rows"], out_f["rows"]):
        assert ru[:5] == rf[:5]
        np.testing.assert_array_equal(ru[5], rf[5])


def test_run_experiment_empty_field():
    """A spotless stack must come back with zero rows, not crash."""
    rng = np.random.default_rng(0)
    stack = rng.normal(400.0, 6.0, (1, 3, 128, 128)).astype(np.float32)
    out = Pipeline().run_experiment(stack, max_candidates=256, max_spots=64)
    # Pure noise may still produce a few spurious fits, but the path must
    # be structurally sound either way.
    assert isinstance(out["rows"], list)
    for (_, _, h, w, cat, ph) in out["rows"]:
        assert len(cat) == 3 and len(ph) == 3


def test_run_experiment_multigroup_matches_per_field():
    """F > group size exercises the pipelined grouped-upload generator
    (api._stack_step_groups): group boundaries and tail padding must not
    perturb any field's rows. Tracking is per-field independent, so the
    10-field run must emit exactly the rows of ten 1-field runs."""
    stacks = [make_stack(F=1, C=3, seed=20 + f, n_spots=10)
              for f in range(10)]
    stack = np.concatenate(stacks)
    pipe = Pipeline()
    rows_multi = pipe.run_experiment(stack, max_candidates=256,
                                     max_spots=128)["rows"]
    rows_single = []
    for f in range(10):
        for (ch, _, h, w, cat, ph) in pipe.run_experiment(
                stacks[f], max_candidates=256, max_spots=128)["rows"]:
            rows_single.append((ch, f, h, w, cat, ph))
    assert len(rows_multi) == len(rows_single) > 50
    for rm, rs in zip(rows_multi, rows_single):
        assert rm[:5] == rs[:5]
        np.testing.assert_array_equal(rm[5], rs[5])


def test_run_experiment_store_cache_hit(tmp_path):
    """With an ArtifactStore, the second run_experiment call must reuse
    the cached detect step (the generator's store-hit path yields one
    full-stack group) and reproduce the rows exactly."""
    from fluorosequencingimageanalysis_tpu.utils.checkpoint import (
        ArtifactStore)

    stack = make_stack(F=2, C=3, seed=15, n_spots=10)
    store = ArtifactStore(str(tmp_path / "store"), use_orbax=False)
    pipe = Pipeline(store=store)
    out1 = pipe.run_experiment(stack, max_candidates=256, max_spots=128)
    n_keys = len(list(store.keys()))
    assert n_keys > 0
    out2 = pipe.run_experiment(stack, max_candidates=256, max_spots=128)
    assert len(list(store.keys())) == n_keys  # hit, no new entries
    assert len(out1["rows"]) == len(out2["rows"]) > 0
    for r1, r2 in zip(out1["rows"], out2["rows"]):
        assert r1[:5] == r2[:5]
        np.testing.assert_array_equal(r1[5], r2[5])


def test_link_field_discards_dropouts_and_survives_edge_drift():
    """Spots whose offset positions leave any frame must be discarded
    before linking (discard_dropouts semantics), for BOTH the native C++
    core and the Python fallback — previously the native branch fed
    out-of-grid bins into the C++ vectors (out-of-bounds access)."""
    from fluorosequencingimageanalysis_tpu.pipeline import fast_experiment
    from fluorosequencingimageanalysis_tpu.native import tracklink

    H = W = 64
    # Cycle 0: an interior spot and an edge spot at h=1 (drops out of
    # frame 1 under the +3 cumulative offset); cycle 1: an interior
    # partner and a spot at h=63 whose own-frame binning (63 + 3 = 66)
    # would index outside the grid without the pre-discard.
    rh = [np.array([1, 30]), np.array([30, 63])]
    rw = [np.array([30, 30]), np.array([30, 30])]
    offsets = [(0.0, 0.0), (3.0, 0.0)]

    results = {}
    for native in (True, False):
        orig = tracklink.have_native
        tracklink.have_native = (lambda: True) if native else (lambda: False)
        try:
            pos, present = fast_experiment._link_field(
                [a.copy() for a in rh], [a.copy() for a in rw], (H, W),
                offsets)
        finally:
            tracklink.have_native = orig
        results[native] = (pos, present)
    (pos_n, present_n), (pos_p, present_p) = results[True], results[False]
    np.testing.assert_array_equal(pos_n, pos_p)
    np.testing.assert_array_equal(present_n, present_p)
    # The two dropout spots are gone; the interior pair forms one trace.
    all_pos = {tuple(p) for t in range(pos_n.shape[0])
               for c in range(2) if present_n[t, c]
               for p in [pos_n[t, c]]}
    assert (1, 30) not in all_pos and (63, 30) not in all_pos
    assert (30, 30) in all_pos


def test_run_experiment_matches_class_path_with_dropouts():
    """Strong stage drift + edge-adjacent spots: some spots drift out of
    frames (discard_dropouts territory) — rows must still match the
    class-based oracle exactly."""
    rng = np.random.default_rng(13)
    H = W = 128
    C = 4
    hh, ww = np.indices((H, W)).astype(np.float32)
    # Monotone drift pushing the field 4 px per cycle.
    cumd = np.array([[0, 0], [4, 0], [8, 0], [12, 0]])
    stack = rng.normal(400.0, 6.0, (1, C, H, W)).astype(np.float32)
    pos = np.concatenate([
        rng.uniform(16, H - 16, (14, 2)),     # interior anchors
        np.array([[7.3, 40.6], [7.6, 90.3],   # near the leading edge:
                  [120.3, 30.6]]),            # dropout candidates
    ])
    present = rng.random((len(pos), C)) < 0.9
    present[:, 0] = True
    for c in range(C):
        for s in range(len(pos)):
            if not present[s, c]:
                continue
            h = pos[s, 0] - cumd[c, 0]
            w = pos[s, 1] - cumd[c, 1]
            if not (-6 < h < H + 6):
                continue
            stack[0, c] += 3000 * np.exp(
                -(((hh - h) ** 2) + ((ww - w) ** 2)) / (2 * 1.3 ** 2))
    header_ref, rows_ref = class_path_rows(stack)
    res = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256)
    rows_fast = res["rows"]
    assert len(rows_fast) == len(rows_ref) > 5
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(
            ph, [float(x) for x in ref[5:]], rtol=1e-5, atol=1e-2,
            err_msg=f"row {i}")


def test_run_experiment_dispatch_modes_and_deferred_holes_equal():
    """The grouped-upload dispatch mode (window vs eager) and the
    deferred hole-gather queue are pure scheduling choices — rows must
    be bit-identical across them, including at interpolated holes
    (which carry NaN until flush_hole_queue fills them in place)."""
    stack = make_stack(F=6, C=4, seed=31, n_spots=12)
    pipe = Pipeline()
    base = pipe.run_experiment(stack, max_candidates=256, max_spots=128,
                               dispatch="eager")["rows"]
    alt = pipe.run_experiment(stack, max_candidates=256, max_spots=128,
                              dispatch="window")["rows"]
    assert len(base) == len(alt) > 20
    n_holes = 0
    for rb, ra in zip(base, alt):
        assert rb[:5] == ra[:5]
        np.testing.assert_array_equal(rb[5], ra[5])
        assert not np.isnan(ra[5]).any()  # every hole was flushed
        n_holes += (~np.asarray(rb[4])).sum()
    assert n_holes > 0  # the scenario must actually have holes


def test_run_experiment_device_stack_sextractor():
    """A device-resident stack with method='sextractor' must take the
    same host-photometry path as a numpy stack (regression: run_stack
    once forwarded 'sextractor' to the device step, which rejects it)."""
    import jax.numpy as jnp

    from fluorosequencingimageanalysis_tpu.config import (
        PipelineConfig, PhotometryConfig)

    stack = make_stack(F=1, C=3, seed=11, n_spots=12)
    pipe = Pipeline(PipelineConfig(
        photometry=PhotometryConfig(method="sextractor")))
    res_np = pipe.run_experiment(stack, max_candidates=512, max_spots=256)
    res_dev = pipe.run_experiment(jnp.asarray(stack), max_candidates=512,
                                  max_spots=256)
    rows_np, rows_dev = res_np["rows"], res_dev["rows"]
    assert len(rows_np) == len(rows_dev) > 0
    for a, b in zip(rows_np, rows_dev):
        assert a[:5] == b[:5]
        np.testing.assert_allclose(a[5], b[5], rtol=1e-6)


def test_run_stack_direct_sextractor_raises(tmp_path):
    """Direct run_stack with a sextractor config must raise loudly (the
    device step has no such metric), and a warm store populated by
    run_experiment's sigmas-substituted entry must NOT satisfy the
    direct call (the store key carries the effective device-bucket
    method)."""
    from fluorosequencingimageanalysis_tpu.config import (
        PipelineConfig, PhotometryConfig)
    from fluorosequencingimageanalysis_tpu.utils.checkpoint import (
        ArtifactStore)

    stack = make_stack(F=1, C=3, seed=12, n_spots=10)
    cfg = PipelineConfig(photometry=PhotometryConfig(method="sextractor"))
    with pytest.raises(ValueError, match="sextractor"):
        Pipeline(cfg).run_stack(stack)

    store = ArtifactStore(str(tmp_path / "store"), use_orbax=False)
    pipe = Pipeline(cfg, store=store)
    assert len(pipe.run_experiment(stack, max_candidates=512,
                                   max_spots=256)["rows"]) > 0
    with pytest.raises(ValueError, match="sextractor"):
        pipe.run_stack(stack, max_candidates=512, max_spots=256)


def test_rows_by_field_many_cycles():
    """Category grouping must stay exact past 64 cycles (the packed
    bitmask spills into multiple uint64 words)."""
    from fluorosequencingimageanalysis_tpu.pipeline.fast_experiment import (
        _rows_by_field)

    rng = np.random.default_rng(3)
    C, fs = 70, [40, 0, 13]
    T = sum(fs)
    pos = rng.integers(16, 100, (T, C, 2))
    cats = rng.random((T, C)) < 0.5
    cats[:, 0] = True
    # Force a pair differing ONLY in a cycle >= 64 (word-1 territory).
    cats[1] = cats[0]
    cats[1, 65] = ~cats[0, 65]
    phot = rng.normal(0, 1, (T, C))
    out = _rows_by_field(pos, cats, phot, fs, len(fs))

    # Differential vs the dict-insertion original.
    start, expect = 0, []
    for f in range(len(fs)):
        stop = start + fs[f]
        by_cat = {}
        for t in range(start, stop):
            by_cat.setdefault(tuple(bool(x) for x in cats[t]),
                              []).append(t)
        expect.append([(cat, int(pos[t, 0, 0]), int(pos[t, 0, 1]))
                       for cat, idxs in by_cat.items() for t in idxs])
        start = stop
    got = [[r[:3] for r in rows] for rows in out]
    assert got == expect
    assert out[0][0][0] != out[0][1][0]  # the word-1 difference held


def test_run_experiment_rows_unfloored_with_photometry_min(tmp_path):
    """config.photometry.photometry_min must NOT floor experiment rows:
    the reference's track-photometries CSV is unfloored
    (flexlibrary.py:2848-2866; the floor is a Trace.photometries/stepfit
    parameter). Regression: the device bucket used to apply it."""
    from fluorosequencingimageanalysis_tpu.config import (
        PipelineConfig, PhotometryConfig)

    stack = make_stack(F=2, C=3, seed=4)
    base_csv = tmp_path / "base.csv"
    floored_csv = tmp_path / "floored.csv"
    Pipeline().run_experiment(stack, max_candidates=256,
                              csv_path=str(base_csv))
    floored_cfg = Pipeline(PipelineConfig(photometry=PhotometryConfig(
        photometry_min=1e7)))  # absurd floor: would swamp every row
    floored_cfg.run_experiment(stack, max_candidates=256,
                               csv_path=str(floored_csv))
    base_text = base_csv.read_text()
    assert floored_csv.read_text() == base_text
    assert len(base_text.splitlines()) > 3  # real rows were compared


def test_run_experiment_warns_on_candidate_overflow(caplog):
    """Overflowing the candidate bucket must be reported, never silent
    (mesh cand_count contract carried through run_experiment)."""
    import logging

    stack = make_stack(F=1, C=3, seed=9, n_spots=24)
    with caplog.at_level(logging.WARNING,
                         logger="fluorosequencingimageanalysis_tpu.api"):
        Pipeline().run_experiment(stack, max_candidates=8)
    assert any("max_candidates" in r.message for r in caplog.records)


def test_py2_round_array_f32_knife_edge():
    """_py2_round_array must round in float64 regardless of input dtype:
    f32 `x + 0.5` rounds the just-below-half center 0.49999997 UP at the
    f32 tie, while the host contract int(py2_round(float(x))) gives 0.
    Regression: the float-bucket _spot_lists fallback rounded f32 centers
    in f32, flipping knife-edge spot identities vs the compact path."""
    x32 = np.float32(0.49999997)
    assert float(np.float32(x32 + np.float32(0.5))) == 1.0  # the f32 trap
    got = tracking._py2_round_array(np.asarray([x32], np.float32))
    assert got.tolist() == [0]
    assert int(tracking._py2_round(float(x32))) == 0
    # Negative mirror and exact halves keep Py2 away-from-zero semantics.
    vals = np.asarray([-0.5, 0.5, 1.5, -1.5, 2.49999988], np.float32)
    assert tracking._py2_round_array(vals).tolist() == [-1, 1, 2, -2, 2]


def test_pack_spot_keys_rejects_wild_coordinates():
    """Coordinates at/above the 2^20 packing range must raise instead of
    silently aliasing keys across images."""
    from fluorosequencingimageanalysis_tpu.pipeline.fast_experiment import (
        _pack_spot_keys)
    ok = _pack_spot_keys(np.asarray([0]), np.asarray([5]), np.asarray([7]))
    clash = _pack_spot_keys(np.asarray([1]), np.asarray([5]),
                            np.asarray([7]))
    assert ok[0] != clash[0]
    with pytest.raises(ValueError, match="key packing"):
        _pack_spot_keys(np.asarray([0]), np.asarray([(1 << 20) + 5]),
                        np.asarray([7]))


def _none_safe_adjustment(photometry, frame, adjustments):
    """A hook that (unlike the stock mdma_adjustment) survives the
    save_averages surface's None photometries — returning a FLOAT for
    holes, which the reference's mean then INCLUDES (only fp[2] is None
    is skipped, flexlibrary.py:2875-2878)."""
    if photometry is None:
        return 7.5 * frame
    return photometry * 1.1 + frame


@pytest.mark.parametrize("with_fn", [False, True])
def test_save_averages_matches_class_path(with_fn):
    """run_experiment(save_averages=True) == track_photometries_as_csv(
    save_averages=True): AVERAGE_INTENSITY over detected frames only,
    H/W from frame 0 even when the trace is absent there (the
    reference's always-true identity guard -> 'None','None'), and the
    adjustment hook fed photometry=None at absent frames
    (flexlibrary.py:2855-2882)."""
    fn = _none_safe_adjustment if with_fn else None
    stack = make_stack(F=2, C=4, seed=5, n_spots=24, presence_p=0.7)
    header, rows_ref = class_path_rows(stack, save_averages=True,
                                       adjustment_function=fn)
    assert header[-1] == "AVERAGE_INTENSITY"

    out = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256, save_averages=True,
                                    adjustment_function=fn)
    rows_fast = out["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    # The workload must exercise the frame-0-absent quirk.
    assert any(r[2] == "None" for r in rows_ref)
    for i, ((ch, f, h, w, cat, mean), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(mean, float(ref[5]), rtol=1e-5,
                                   atol=1e-2, err_msg=f"row {i}")


def test_save_averages_csv_format(tmp_path):
    stack = make_stack(F=1, C=3, seed=6, n_spots=10)
    path = tmp_path / "avg.csv"
    out = Pipeline().run_experiment(stack, max_candidates=256,
                                    max_spots=128, save_averages=True,
                                    csv_path=str(path))
    with open(path) as fh:
        reader = csv.reader(fh)
        header = next(reader)
        rows = list(reader)
    assert header == ["CHANNEL", "FIELD", "H", "W", "CATEGORY",
                      "AVERAGE_INTENSITY"]
    assert len(rows) == len(out["rows"]) > 0
    for (ch, f, h, w, cat, mean), ref in zip(out["rows"], rows):
        assert str(mean) == ref[5]


@pytest.mark.parametrize("method", ["gaussian_volume", "sextractor"])
def test_save_averages_other_metrics_match_class_path(method):
    """save_averages over a fit-product metric (device bucket values,
    no image access) and over the host sextractor sweep: detected-frame
    means must equal the class path's uninterpolated averages."""
    from fluorosequencingimageanalysis_tpu.config import (PipelineConfig,
                                                          PhotometryConfig)

    stack = make_stack(F=1, C=4, seed=9, n_spots=20, presence_p=0.75)
    _, rows_ref = class_path_rows(stack, save_averages=True,
                                  photometry_method=method)
    pipe = Pipeline(config=PipelineConfig(
        photometry=PhotometryConfig(method=method)))
    out = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              save_averages=True)
    rows_fast = out["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    for i, ((ch, f, h, w, cat, mean), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        np.testing.assert_allclose(mean, float(ref[5]), rtol=1e-5,
                                   atol=1e-2, err_msg=f"row {i}")


@pytest.mark.parametrize("method", ["mexican_hat", "gaussian_volume",
                                    "sextractor"])
def test_keep_invalid_matches_class_path(method):
    """run_experiment(keep_invalid=True) == the classes without
    discard_invalid_traces (basic_experiment_script.py:472-476): every
    trace emits a row, out-of-box interpolated holes write '0'
    (None Spots), and edge positions use the reference's clipped-slice
    photometry."""
    from fluorosequencingimageanalysis_tpu.config import (PipelineConfig,
                                                          PhotometryConfig)

    # edge_margin=4 plants spots inside the photometry windows (so
    # window-truncated positions occur) and this seed's drift pushes at
    # least one interpolated hole out of the 5x5 box (a None Spot).
    stack = make_stack(F=1, C=5, seed=10, n_spots=30, presence_p=0.6,
                       edge_margin=4)
    _, rows_ref = class_path_rows(stack, photometry_method=method,
                                  keep_invalid=True)
    pipe = Pipeline(config=PipelineConfig(
        photometry=PhotometryConfig(method=method)))
    out = pipe.run_experiment(stack, max_candidates=512, max_spots=256,
                              keep_invalid=True)
    rows_fast = out["rows"]
    assert len(rows_fast) == len(rows_ref) > 0
    n_zero = sum(1 for r in rows_ref for v in r[5:] if v == "0")
    for i, ((ch, f, h, w, cat, ph), ref) in enumerate(
            zip(rows_fast, rows_ref)):
        assert (str(ch), str(f), str(h), str(w), str(cat)) == \
            tuple(ref[:5]), (i, (ch, f, h, w, cat), ref[:5])
        for c, (v, rv) in enumerate(zip(ph, ref[5:])):
            if v is None:
                assert rv == "0", (i, c, rv)
            else:
                np.testing.assert_allclose(v, float(rv), rtol=1e-5,
                                           atol=1e-2,
                                           err_msg=f"row {i} frame {c}")
    # keep_invalid must be a strict superset of the default run: the
    # default path discards at least one window-invalid trace here.
    out_discard = pipe.run_experiment(stack, max_candidates=512,
                                      max_spots=256)
    assert len(rows_fast) > len(out_discard["rows"])
    # The scenario must actually exercise the None-Spot ('0') rows.
    assert n_zero > 0


def test_keep_invalid_csv_zeros(tmp_path):
    stack = make_stack(F=1, C=4, seed=13, n_spots=24, presence_p=0.75,
                       edge_margin=6)
    path = tmp_path / "keep.csv"
    out = Pipeline().run_experiment(stack, max_candidates=512,
                                    max_spots=256, keep_invalid=True,
                                    csv_path=str(path))
    with open(path) as fh:
        reader = csv.reader(fh)
        next(reader)
        rows = list(reader)
    assert len(rows) == len(out["rows"])
    for (ch, f, h, w, cat, ph), ref in zip(out["rows"], rows):
        for v, rv in zip(ph, ref[5:]):
            assert rv == ("0" if v is None else str(v))


def test_keep_invalid_sextractor_no_host_images():
    """The sextractor host sweep measures clipped edge apertures itself
    (kernel zero padding == photutils partial-aperture truncation), so
    run_experiment_stack accepts keep_invalid without host_images for
    this metric only."""
    from fluorosequencingimageanalysis_tpu.pipeline.fast_experiment import (
        run_experiment_stack)

    stack = make_stack(F=1, C=3, seed=2, n_spots=8)
    with pytest.raises(ValueError, match="host_images"):
        run_experiment_stack(stack, np.zeros((1, 3)), np.zeros((1, 3)),
                             ([[np.zeros(0, np.int64)] * 3],
                              [[np.zeros(0, np.int64)] * 3]),
                             photometry_method="mexican_hat",
                             spot_values=[[np.zeros(0)] * 3],
                             keep_invalid=True)
    out = run_experiment_stack(stack, np.zeros((1, 3)), np.zeros((1, 3)),
                               ([[np.zeros(0, np.int64)] * 3],
                                [[np.zeros(0, np.int64)] * 3]),
                               photometry_method="sextractor",
                               keep_invalid=True)
    assert out == [[]]
