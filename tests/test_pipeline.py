"""Tests for the experiment layer: photometry, tracking, experiments."""

import numpy as np

from fluorosequencingimageanalysis_tpu.pipeline import (
    Image, Spot, SequenceExperiment, MultichannelSequenceExperiment,
    MultifieldMultichannelSequenceExperiment, TimetraceExperiment,
    Experiment)
from fluorosequencingimageanalysis_tpu.pipeline import tracking


def _frame_with_spots(rng, coords, shape=(64, 64), amp=3000.0,
                      background=400.0, noise=5.0):
    img = background + rng.normal(0, noise, shape)
    for h, w in coords:
        hh, ww = np.indices(shape).astype(float)
        img += amp * np.exp(-(((hh - h) ** 2) + ((ww - w) ** 2)) /
                            (2 * 1.2 ** 2))
    return np.round(img).astype(np.uint16)


def _mexican_hat_oracle(image, h, w, brim_size=6, radius=9):
    """Direct transcription of flexlibrary.py:172-210 for interior spots."""
    d = 2 * radius + 1
    sl = image[h - radius:h + radius + 1, w - radius:w + radius + 1]
    crown, brim = [], []
    for (hh, ww), p in np.ndenumerate(sl):
        if (brim_size <= hh < d - brim_size and
                brim_size <= ww < d - brim_size):
            crown.append(p)
        else:
            brim.append(p)
    return sum(crown) - len(crown) * np.median(brim)


def test_mexican_hat_matches_oracle():
    rng = np.random.default_rng(0)
    img = _frame_with_spots(rng, [(20, 20), (40, 45)])
    image = Image(image=img)
    for (h, w) in [(20, 20), (40, 45), (30, 30)]:
        spot = Spot(image, h, w, 5)
        image.spots.append(spot)
    for spot in image.spots:
        ours = spot.photometry(method="mexican_hat")
        ref = _mexican_hat_oracle(img.astype(np.float64), spot.h, spot.w)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_simple_and_maximum_photometry():
    rng = np.random.default_rng(1)
    img = _frame_with_spots(rng, [(30, 30)])
    image = Image(image=img)
    spot = Spot(image, 30, 30, 5)
    image.spots.append(spot)
    simple = spot.photometry(method="simple")
    ref = img[28:33, 28:33].sum()
    np.testing.assert_allclose(simple, ref, rtol=1e-6)
    mx = spot.photometry(method="maximum", radius=5, top=3)
    ref_m = np.sort(img[25:36, 25:36].ravel())[-3:].sum()
    np.testing.assert_allclose(mx, ref_m, rtol=1e-6)


def test_edge_spot_photometry_uses_truncated_square():
    rng = np.random.default_rng(2)
    img = _frame_with_spots(rng, [(4, 4)])
    image = Image(image=img)
    spot = Spot(image, 4, 4, 5)
    image.spots.append(spot)
    ours = spot.photometry(method="mexican_hat")
    # Exact truncated-slice semantics.
    sl = img[0:14, 0:14].astype(np.float64)
    d = 19
    crown, brim = [], []
    for (hh, ww), p in np.ndenumerate(sl):
        if 6 <= hh < d - 6 and 6 <= ww < d - 6:
            crown.append(p)
        else:
            brim.append(p)
    ref = sum(crown) - len(crown) * np.median(brim)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # And return_invalid=False gives None for the truncated square.
    assert spot.photometry(method="mexican_hat",
                           return_invalid=False) is None


def test_greedy_tracking_static_spots():
    rng = np.random.default_rng(3)
    coords = [(20, 20), (40, 45), (10, 50)]
    frames = []
    for f in range(4):
        img = _frame_with_spots(rng, coords)
        image = Image(image=img, metadata={"filepath": f"frame{f}.png"})
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    traces, discarded = tracking.greedy_particle_tracking(
        [im.spots for im in frames], frames[0].image.shape)
    assert discarded == 0
    assert len(traces) == 3
    for trace in traces:
        assert all(s is not None for s in trace)
        hws = {(s.h, s.w) for s in trace}
        assert len(hws) == 1  # static spots stay linked


def test_greedy_tracking_with_gap_and_disappearance():
    rng = np.random.default_rng(4)
    a, b = (20, 20), (40, 45)
    frames = []
    present = [(True, True), (True, True), (False, True), (True, False)]
    for pa, pb in present:
        coords = ([a] if pa else []) + ([b] if pb else [])
        img = _frame_with_spots(rng, coords)
        image = Image(image=img)
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    traces, _ = tracking.greedy_particle_tracking(
        [im.spots for im in frames], frames[0].image.shape)
    # Spot a: present 0,1,None,3 -> single trace with a gap (ancestor cache
    # persists). Spot b: present 0,1,2,None.
    patterns = sorted(tuple(s is not None for s in t) for t in traces)
    assert (True, True, False, True) in patterns
    assert (True, True, True, False) in patterns
    assert len(traces) == 2


def test_greedy_tracking_with_offsets():
    rng = np.random.default_rng(5)
    base = [(20, 20), (40, 45)]
    offsets = [(0, 0), (2, -1), (1, 1)]
    cum = tracking.accumulate_offsets(offsets)
    frames = []
    for f in range(3):
        # Frame f's content is shifted by -cumulative offset (stage drift).
        coords = [(h - int(cum[f][0]), w - int(cum[f][1])) for h, w in base]
        img = _frame_with_spots(rng, coords)
        image = Image(image=img)
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    traces, _ = tracking.greedy_particle_tracking(
        [im.spots for im in frames], frames[0].image.shape, offsets=offsets)
    assert len(traces) == 2
    for t in traces:
        assert all(s is not None for s in t)


def test_sequence_experiment_categories_and_remainders():
    rng = np.random.default_rng(6)
    a, b = (20, 20), (40, 45)
    frames = []
    presence = [(True, True), (True, True), (True, False)]
    for pa, pb in presence:
        coords = ([a] if pa else []) + ([b] if pb else [])
        img = _frame_with_spots(rng, coords)
        image = Image(image=img, metadata={"filepath": "x.png"})
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    ex = SequenceExperiment(frames)
    ex.trace_existing_spots()
    btc = ex.binary_trace_categories()
    assert tuple([True, True, True]) in btc
    assert tuple([True, True, False]) in btc
    assert ex.count_remainders() == 1
    assert ex.spot_count() == 5
    assert ex.singleton_count() == 0


def test_fill_in_trace_interpolates_middle_gap():
    rng = np.random.default_rng(7)
    a = (20, 20)
    frames = []
    for f in range(3):
        img = _frame_with_spots(rng, [a] if f != 1 else [])
        image = Image(image=img)
        image.spots = [Spot(image, *a, 5)] if f != 1 else []
        frames.append(image)
    ex = SequenceExperiment(frames)
    ex.trace_existing_spots()
    assert len(ex.spot_traces) == 1
    filled = ex.fill_in_trace(ex.spot_traces[0])
    assert all(s is not None for s in filled)
    assert (filled[1].h, filled[1].w) == a


def test_mdma_adjustments():
    rng = np.random.default_rng(8)
    coords = [(20, 20), (40, 45)]
    frames = []
    for f in range(3):
        img = _frame_with_spots(rng, coords)
        image = Image(image=img)
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    ex = SequenceExperiment(frames)
    ex.trace_existing_spots()
    adj = ex.multiplicative_delta_median_adjustments()
    assert len(adj) == 3
    # Static intensities: adjustments near zero.
    assert all(abs(a) < 0.2 for a in adj)
    assert SequenceExperiment.mdma_adjustment(
        100.0, 0, {"mdma": (0.1, 0, 0)}) == 100.0 * 0.9


def test_multifield_csv_emitters(tmp_path):
    rng = np.random.default_rng(9)
    fields = []
    for e in range(2):
        coords = [(20 + e, 20), (40, 45)]
        frames = []
        for f in range(3):
            img = _frame_with_spots(rng, coords)
            image = Image(image=img)
            image.spots = [Spot(image, h, w, 5) for h, w in coords]
            frames.append(image)
        ex = SequenceExperiment(frames)
        fields.append(MultichannelSequenceExperiment({"ch1": ex}))
    mfmc = MultifieldMultichannelSequenceExperiment(fields)
    mfmc.trace_existing_spots()
    counts, merged = mfmc.count_binary_trace_categories()
    assert counts["ch1"][0][(True, True, True)] == 2
    csv_path = tmp_path / "tracks.csv"
    n = mfmc.track_photometries_as_csv(str(csv_path), save_averages=False)
    assert n == 4
    lines = csv_path.read_text().strip().split("\n")
    assert lines[0].startswith("CHANNEL,FIELD,H,W,CATEGORY,FRAME 0")
    assert len(lines) == 5
    cat_path = tmp_path / "cats.csv"
    mfmc.category_counts_as_csv(str(cat_path))
    assert "Pattern" in cat_path.read_text()
    s = mfmc.offsets_as_string()
    assert "Frame 0" in s


def test_timetrace_experiment_stepfits(tmp_path):
    rng = np.random.default_rng(10)
    coords = [(20, 20), (40, 45)]
    frames = []
    n_frames = 30
    for f in range(n_frames):
        # Spot at (20,20) bleaches halfway; (40,45) persists.
        active = coords if f < 15 else [coords[1]]
        img = _frame_with_spots(rng, active)
        image = Image(image=img, metadata={"filepath": "x.png"})
        if f == 0:
            image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    tte = TimetraceExperiment(frames)
    tte.lc_create_traces()
    assert len(tte.spot_traces) == 2
    step_fits, intermediates = tte.stepfit_tracks()
    assert len(step_fits) == 2
    # The bleaching trace must show a drop near frame 15.
    bleach_fit = step_fits[(20, 20)]
    heights = [p[2] for p in bleach_fit.trace]
    assert heights[0] > heights[-1] * 2 + 1000
    csv_path = tmp_path / "tt.csv"
    rows = tte.save_experiment_as_csv(str(csv_path), include_step_fits=True,
                                      include_intermediates=True)
    assert rows == 2 * n_frames + 1
    header = csv_path.read_text().split("\n")[0]
    assert "Plateau Height" in header and "photometries" in header


def test_trace_binary_helpers():
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import \
        Experiment
    img = Image(image=np.zeros((32, 32)))
    s = Spot(img, 10, 10, 5)
    assert Experiment.trace_to_binary([s, None, s]) == [True, False, True]
    assert Experiment.truefalse_to_onoff([True, False]) == "[ON]  [OFF]"


def test_binary_trace_categories_photometry_and_extract_tracks():
    rng = np.random.default_rng(10)
    a, b = (20, 20), (40, 45)
    frames = []
    presence = [(True, True), (True, True), (True, False)]
    for pa, pb in presence:
        coords = ([a] if pa else []) + ([b] if pb else [])
        img = _frame_with_spots(rng, coords)
        image = Image(image=img)
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)
    ex = SequenceExperiment(frames)
    ex.trace_existing_spots()

    btcp = ex.binary_trace_categories_photometry(method="simple")
    all_on = (True, True, True)
    assert all_on in btcp
    for trace_p in btcp[all_on]:
        assert len(trace_p) == 3
        assert all(ph is not None for h, w, ph in trace_p)
    # the (T,T,F) category has None photometry in its OFF frame
    off_cat = (True, True, False)
    assert btcp[off_cat][0][2] == (None, None, None)
    import pytest as _pytest
    with _pytest.raises(DeprecationWarning):
        ex.binary_trace_categories_photometry(discard_invalid=True)

    tracks = ex.extract_tracks(all_on, radius=3, number=5)
    assert len(tracks) == 1
    (nh, nw), seq = tracks[0]
    assert (round(nh), round(nw)) == a
    assert len(seq) == 3
    for subimg, frame in seq:
        assert subimg.shape == (7, 7)
    # category with an OFF frame: the gap subimage comes from the raw frame
    tracks2 = ex.extract_tracks(off_cat, radius=3)
    assert len(tracks2) == 1
    assert tracks2[0][1][2][0].shape == (7, 7)
    assert ex.extract_tracks((False, False, False)) == []


def test_discard_invalid_traces_keeps_interior():
    rng = np.random.default_rng(11)
    good = (30, 30)
    edge = (2, 30)  # too close to the border for a valid 5x5 + brim
    frames = []
    for f in range(3):
        coords = [good, edge]
        img = _frame_with_spots(rng, coords)
        image = Image(image=img)
        image.spots = [Spot(image, h, w, 5, gaussian_fit=(h, w))
                       for h, w in coords]
        frames.append(image)
    ex = SequenceExperiment(frames)
    ex.trace_existing_spots()
    n_before = len(ex.spot_traces)
    invalid = ex.discard_invalid_traces(photometry_method="mexican_hat")
    assert len(ex.spot_traces) + len(invalid) == n_before
    assert all((t[0].h, t[0].w) == good for t in ex.spot_traces)


def test_remainder_threshold_fields():
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        MultichannelSequenceExperiment,
        MultifieldMultichannelSequenceExperiment)
    rng = np.random.default_rng(12)

    def make_field(n_persistent):
        coords = [(15 + 9 * i, 15 + 7 * i) for i in range(n_persistent)]
        frames = []
        for f in range(2):
            img = _frame_with_spots(rng, coords)
            image = Image(image=img)
            image.spots = [Spot(image, h, w, 5) for h, w in coords]
            frames.append(image)
        ex = SequenceExperiment(frames)
        ex.trace_existing_spots()
        return MultichannelSequenceExperiment({"ch1": ex})

    mfmc = MultifieldMultichannelSequenceExperiment(
        [make_field(6), make_field(2)])
    mask = mfmc.remainder_threshold_fields(min_remainders=5)
    assert mask[0] is True or mask[0] == True  # noqa: E712
    assert mask[1] == False  # noqa: E712


def test_save_psfs_png_and_plot_traces(tmp_path):
    from PIL import Image as PILImage
    from fluorosequencingimageanalysis_tpu.utils.visualize import \
        save_psfs_png
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import \
        Experiment

    rng = np.random.default_rng(13)
    coords = [(20, 20), (40, 45)]
    img_paths = []
    frames = []
    for f in range(2):
        arr = _frame_with_spots(rng, coords)
        p = str(tmp_path / f"frame{f}.png")
        PILImage.fromarray((arr / arr.max() * 255).astype(np.uint8),
                           mode="L").save(p)
        img_paths.append(p)
        image = Image(image=arr, metadata={"filepath": p})
        image.spots = [Spot(image, h, w, 5) for h, w in coords]
        frames.append(image)

    psfs = {c: tuple([0] * 12) for c in coords}
    out = save_psfs_png(psfs, img_paths[0],
                        output_path=str(tmp_path / "psfs.png"))
    assert out.endswith("psfs.png")
    png = PILImage.open(out)
    assert png.size[0] > 0 and png.mode == "RGB"

    traces = [[frames[0].spots[0], frames[1].spots[0]],
              [frames[0].spots[1], None]]
    outs = Experiment.plot_traces(
        traces, [str(tmp_path / "t0.png"), str(tmp_path / "t1.png")])
    assert len(outs) >= 1
    for o in outs:
        assert PILImage.open(o).size[0] > 0


def test_plot_histogram_and_heatmaps(tmp_path):
    import plotting as pl
    rng = np.random.default_rng(14)
    h = pl.plot_histogram(rng.lognormal(10, 0.3, 500), "t", "count",
                          "intensity", True, str(tmp_path / "hist.html"))
    assert open(h).read().startswith("<!DOCTYPE html>") or \
        "<html" in open(h).read()
    signals = {((("A", 1),), True): 10, ((("A", 2),), True): 5,
               ((("A", 1), ("A", 2)), True): 3}
    f1 = pl.single_drops_heatmap(signals, 1, 2, 0, "PEP", 647, 0, 10,
                                 str(tmp_path / "sd.html"))
    assert "html" in open(f1).read().lower()
    f2 = pl.double_drops_heatmap(signals, 1, 2, 0, "PEP", 647, 0, 10,
                                 str(tmp_path / "dd.html"))
    assert "html" in open(f2).read().lower()
    v2 = {((("A", 1),), True, 1): 7, ((("A", 2),), True, 2): 2}
    f3 = pl.single_drops_heatmap_v2(v2, 1, 2, 0, "PEP", 561, 0, 10,
                                    str(tmp_path / "sd2.html"))
    assert "html" in open(f3).read().lower()
    f4 = pl.double_drops_heatmap_v2(v2, 1, 2, 0, "PEP", 561, 0, 10,
                                    str(tmp_path / "dd2.html"))
    assert "html" in open(f4).read().lower()


def test_discard_dropouts():
    from fluorosequencingimageanalysis_tpu.pipeline import tracking
    img = Image(image=np.zeros((64, 64)))
    inner = Spot(img, 30, 30, 5)
    border = Spot(img, 3, 30, 5)
    spots = [inner, border]
    spot_offs = [(0, 0), (0, 0)]
    frame_offs = [(0, 0), (5, 0)]  # second frame shifts everything up 5
    kept, discarded = tracking.discard_dropouts(
        spots, spot_offs, frame_offs, (64, 64), spot_radius=0)
    assert kept == [inner]
    assert discarded == 1


def test_luminosity_centroid_tracking_follows_spot():
    from fluorosequencingimageanalysis_tpu.pipeline.tracking import (
        luminosity_centroid_particle_tracking)
    rng = np.random.default_rng(15)
    start = (30, 30)
    frames = []
    for f in range(4):
        # spot drifts one pixel right per frame
        arr = _frame_with_spots(rng, [(start[0], start[1] + f)],
                                amp=5000.0)
        frames.append(Image(image=arr))
    s0 = Spot(frames[0], *start, 5)
    frames[0].spots.append(s0)
    tracks = luminosity_centroid_particle_tracking(frames, [s0],
                                                   search_radius=3,
                                                   s_n_cutoff=2.0)
    assert len(tracks) == 1
    tr = tracks[0]
    assert len(tr) == 4
    assert all(s is not None for s in tr)
    assert abs(tr[-1].w - (start[1] + 3)) <= 1
    assert abs(tr[-1].h - start[0]) <= 1


def test_aperture_sum_matches_scalar_reference():
    """The vectorized circular-aperture sum must agree with the scalar
    subsampled-overlap accumulation it replaced (to summation-order
    rounding), including edge-truncated windows."""
    import numpy as np
    from fluorosequencingimageanalysis_tpu.pipeline.spots import \
        _aperture_sum

    def scalar(image, h, w, radius, subsample=10):
        image = np.asarray(image, dtype=np.float64)
        r_int = int(np.ceil(radius)) + 1
        h0, h1 = max(0, h - r_int), min(image.shape[0], h + r_int + 1)
        w0, w1 = max(0, w - r_int), min(image.shape[1], w + r_int + 1)
        total = 0.0
        offs = (np.arange(subsample) + 0.5) / subsample - 0.5
        for hh in range(h0, h1):
            for ww in range(w0, w1):
                dy = hh + offs[:, None] - h
                dx = ww + offs[None, :] - w
                frac = np.mean((dy ** 2 + dx ** 2) <= radius ** 2)
                if frac > 0:
                    total += image[hh, ww] * frac
        return float(total)

    rng = np.random.default_rng(0)
    img = rng.normal(500, 30, (48, 48))
    for (h, w) in [(24, 24), (0, 0), (47, 47), (1, 46), (3, 3), (24, 0)]:
        for radius in (3, 2.5):
            # Vectorized subsampled mode == the scalar loop, bit-tight.
            a = _aperture_sum(img, h, w, radius, subsample=10)
            b = scalar(img, h, w, radius)
            assert abs(a - b) <= 1e-9 * max(abs(b), 1.0), (h, w, radius)
            # The default (exact analytic overlap, photutils
            # method='exact') agrees with 10x10 sampling to its
            # discretization error, including truncated edge windows.
            e = _aperture_sum(img, h, w, radius)
            assert abs(e - b) <= 0.02 * max(abs(b), 100.0), (h, w, radius)


def test_greedy_tracking_accepts_iterators():
    """frame_spots documented as iterable-of-iterables: one-shot
    iterators must work (regression: the frame was consumed twice)."""
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.tracking import (
        greedy_particle_tracking)

    rng = np.random.default_rng(0)
    imgs = [Image(image=rng.normal(400, 8, (64, 64)).astype(np.float32),
                  metadata={"filepath": f"mem://{f}"}, spots=None)
            for f in range(2)]
    frames = [iter([Spot(imgs[f], 30, 30, 5, gaussian_fit=None)])
              for f in range(2)]
    traces, discarded = greedy_particle_tracking(frames, (64, 64))
    assert len(traces) == 1 and discarded == 0
    assert all(s is not None for s in traces[0])


def test_native_link_rejects_out_of_range_positions():
    """greedy_link must fail loudly on positions whose rounded bins land
    outside the frame (regression: out-of-bounds vector writes)."""
    import pytest
    from fluorosequencingimageanalysis_tpu.native import tracklink

    if not tracklink.have_native():
        pytest.skip("native tracklink unavailable")
    h = np.array([-0.6, 10.0])
    w = np.array([5.0, 12.0])
    frame_start = np.array([0, 1, 2], np.int32)
    with pytest.raises(ValueError, match="outside"):
        tracklink.greedy_link(h, w, frame_start, (64, 64), 2.0)


def test_spot_photometry_semantics_regressions():
    """Batch-path parity details: un-listed spots measure fine (no
    KeyError), 'simple' follows each spot's own size, maximum validates
    background_adjust for interior spots, and top=0 keeps the
    reference's whole-window Py2 quirk on every spot."""
    import pytest
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot

    rng = np.random.default_rng(0)
    arr = rng.normal(400, 8, (64, 64)).astype(np.float64)
    img = Image(image=arr, metadata={"filepath": "mem://0"}, spots=None)
    listed = Spot(img, 30, 30, 5, gaussian_fit=None)
    img.spots = [listed]

    # Un-listed spot (reference supports it; no cache KeyError).
    loose = Spot(img, 20, 40, 5, gaussian_fit=None)
    v = loose.simple_photometry_metric()
    assert v == pytest.approx(arr[18:23, 38:43].sum())

    # simple uses the spot's OWN size (7 -> 7x7 window).
    wide = Spot(img, 32, 18, 7, gaussian_fit=None)
    img.spots.append(wide)
    assert wide.simple_photometry_metric() == \
        pytest.approx(arr[29:36, 15:22].sum())

    # maximum: interior spots must validate background_adjust like the
    # host/edge path (reference flexlibrary.py:275-284).
    with pytest.raises(NotImplementedError):
        listed.photometry("maximum", background_adjust="multiplicative")
    with pytest.raises(ValueError):
        listed.photometry("maximum", background_adjust="aditive")

    # top=0: the Py2 r[-0:] quirk sums the WHOLE window, interior or not.
    v0 = listed.photometry("maximum", top=0)
    assert v0 == pytest.approx(arr[25:36, 25:36].sum())


def test_spot_illumina_sn_rejects_truncated_slice():
    """Truncated edge slices must raise like pflib.illumina_s_n."""
    import pytest
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot

    arr = np.random.default_rng(1).normal(400, 8, (32, 32))
    img = Image(image=arr, metadata={"filepath": "mem://1"}, spots=None)
    fit = (5.0, 5.0, 400.0, 1500.0, 1.3, 1.3, 0.0, arr[:5, :5])
    edge_spot = Spot(img, 1, 16, 5, gaussian_fit=fit)
    with pytest.raises(ValueError, match="square"):
        edge_spot.illumina_s_n()


def test_sextractor_aperture_sums_rejects_out_of_frame():
    import pytest
    from fluorosequencingimageanalysis_tpu.pipeline.spots import (
        sextractor_aperture_sums)

    arr = np.random.default_rng(2).normal(400, 8, (64, 64))
    with pytest.raises(ValueError, match="inside"):
        sextractor_aperture_sums(arr, np.array([-1]), np.array([10]),
                                 3, 10, 10)


def test_content_key_hashes_nested_arrays_by_content():
    """Arrays nested in containers must hash by CONTENT: the old
    json-default=str path summarized big arrays as '[0 0 ... 0]',
    colliding different inputs onto one cache key."""
    from fluorosequencingimageanalysis_tpu.utils.checkpoint import (
        content_key)

    a = np.zeros(10000, np.int64)
    b = a.copy()
    b[5000] = 7  # hidden inside the '...' of the truncated repr
    assert content_key({"mask": a}) != content_key({"mask": b})
    assert content_key({"mask": a}) == content_key({"mask": a.copy()})
    assert content_key([a, 1]) != content_key([b, 1])


def test_histogram_equalization_equal_pixels_equal_output():
    """equalize_hist semantics: equal input values -> one gray level."""
    from fluorosequencingimageanalysis_tpu.utils.visualize import (
        _histogram_equalization)

    rng = np.random.default_rng(0)
    img = np.full((32, 32), 400, np.uint16)  # flat background
    img[4:8, 4:8] = 3000
    out = _histogram_equalization(img)
    bg = out[img == 400]
    assert (bg == bg[0]).all()
    assert (out[img == 3000] > bg[0]).all()


def test_unlisted_spot_photometry_cached(monkeypatch):
    """A spot NOT in image.spots must not rebuild the full batched
    photometry cache on every repeat query (regression: each call paid a
    whole-image device dispatch just to miss again). The host value is
    cached identity-pinned like listed entries."""
    rng = np.random.default_rng(4)
    img_arr = _frame_with_spots(rng, [(20, 20), (40, 45)])
    image = Image(image=img_arr)
    for (h, w) in [(20, 20), (40, 45)]:
        image.spots.append(Spot(image, h, w, 5))
    foreign = Spot(image, 30, 30, 5)  # never appended to image.spots

    calls = {"n": 0}
    real = Image._compute_photometries

    def counting(self, method, kwargs):
        calls["n"] += 1
        return real(self, method, kwargs)

    monkeypatch.setattr(Image, "_compute_photometries", counting)
    v1 = foreign.photometry(method="mexican_hat")
    v2 = foreign.photometry(method="mexican_hat")
    assert v1 == v2
    assert calls["n"] == 1, "repeat foreign queries must hit the cache"
    ref = _mexican_hat_oracle(img_arr.astype(np.float64), 30, 30)
    np.testing.assert_allclose(v1, ref, rtol=1e-5)
    # Listed spots still served from the same rebuilt cache.
    v_listed = image.spots[0].photometry(method="mexican_hat")
    assert calls["n"] == 1
    np.testing.assert_allclose(
        v_listed, _mexican_hat_oracle(img_arr.astype(np.float64), 20, 20),
        rtol=1e-5)


def test_epoch_to_hash_half_second_rounds_away_from_zero():
    """Reference runs under Py2 round(): *.5 epochs go UP, not to the
    even second (pflib.py:523-543). Py3 round() would name the artifact
    t...0 instead of t...1 on exact half-second timestamps."""
    from fluorosequencingimageanalysis_tpu.utils.hashing import (
        epoch_to_hash, hash_to_epoch)

    assert epoch_to_hash(1755000000.5) == epoch_to_hash(1755000001)
    assert hash_to_epoch(epoch_to_hash(1755000000.5)) == 1755000001


def test_pow2_bucket_rejects_overflow():
    """n > cap must raise loudly, not hand the caller a negative pad."""
    import pytest
    from fluorosequencingimageanalysis_tpu.utils.dispatch import pow2_bucket

    assert pow2_bucket(1000, 1024) == 1024
    assert pow2_bucket(1024, 1024) == 1024
    with pytest.raises(ValueError, match="chunk"):
        pow2_bucket(1025, 1024)


def test_read_image_array_stack_handling(tmp_path):
    """(Z, H, W) multi-page TIFFs must not be silently column-sliced as
    if they were channel-last RGB; read_stack_array handles them."""
    import imageio.v2 as iio
    import pytest
    from fluorosequencingimageanalysis_tpu.utils.imageio import (
        read_image_array, read_stack_array)

    rng = np.random.default_rng(0)
    stack = rng.integers(0, 4000, (5, 16, 24)).astype(np.uint16)
    path = str(tmp_path / "movie.tif")
    iio.mimwrite(path, list(stack))
    got = read_stack_array(path)
    np.testing.assert_array_equal(got, stack)

    # Plugins that hand imread the whole (Z, H, W) volume must raise,
    # not column-slice it as channel-last RGB.
    import unittest.mock as mock
    with mock.patch("imageio.v2.imread", lambda p: stack):
        with pytest.raises(ValueError, match="stack"):
            read_image_array(path)

    # Single 2-D image: both readers agree, stack reader adds the axis.
    single = str(tmp_path / "one.png")
    img = rng.integers(0, 255, (16, 24)).astype(np.uint8)
    iio.imwrite(single, img)
    np.testing.assert_array_equal(read_image_array(single), img)
    np.testing.assert_array_equal(read_stack_array(single), img[None])

    # Channel-last RGB still collapses to the first channel.
    rgb = str(tmp_path / "rgb.png")
    arr = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    iio.imwrite(rgb, arr)
    np.testing.assert_array_equal(read_image_array(rgb), arr[..., 0])


def test_histogram_equalization_float_branch_256_bins():
    """Float images go through skimage's 256-bin histogram + interp
    (NOT the exact empirical CDF): values inside one bin map linearly,
    and the result must equal the documented skimage formula."""
    from fluorosequencingimageanalysis_tpu.utils.visualize import (
        _histogram_equalization, _intensity_scaling)

    rng = np.random.default_rng(1)
    img = rng.normal(400.0, 60.0, (48, 48))
    # skimage.exposure.equalize_hist float path, verbatim:
    hist, edges = np.histogram(img.ravel(), bins=256)
    centers = (edges[:-1] + edges[1:]) / 2.0
    cdf = np.cumsum(hist) / float(img.size)
    expected = _intensity_scaling(
        np.interp(img.ravel(), centers, cdf).reshape(img.shape))
    np.testing.assert_array_equal(_histogram_equalization(img), expected)
    # And it genuinely differs from the exact empirical CDF on floats.
    flat = img.ravel()
    ecdf = (np.searchsorted(np.sort(flat), flat, side="right")
            / flat.size).reshape(img.shape)
    assert (_histogram_equalization(img) != _intensity_scaling(ecdf)).any()


def test_luminosity_centroid_tracking_wrapped_window_parity():
    """Reference slice-shape parity (round-4 review): when drift pushes a
    window origin far enough negative (o <= -(r+1)), the reference's
    numpy slice WRAPS a full-size window from the opposite edge and its
    shape check passes it (flexlibrary.py:1224-1229) — the tracker must
    follow the same code path (centroid from the wrapped pixels, Spot
    construction rules deciding the outcome), not silently emit None.
    Differential-tested against a direct transcription of
    next_frame_spot_by_luminosity_centroid."""
    from scipy.ndimage import center_of_mass

    from fluorosequencingimageanalysis_tpu.pipeline.tracking import (
        luminosity_centroid_particle_tracking, _py2_round)

    rng = np.random.default_rng(23)
    r = 3
    d = 2 * r + 1

    def reference_next(frame, spot, offset, s_n_cutoff=2.0):
        o_h = int(spot.h - offset[0])
        o_w = int(spot.w - offset[1])
        sl = frame.image[o_h - r:o_h + r + 1, o_w - r:o_w + r + 1]
        if sl.shape != (d, d):
            return None
        c_h, c_w = center_of_mass(sl)
        r_c_h = int(_py2_round(c_h + o_h - r))
        r_c_w = int(_py2_round(c_w + o_w - r))
        try:
            cand = Spot(frame, r_c_h, r_c_w, spot.size, gaussian_fit=None)
        except AttributeError:
            return None
        if cand.illumina_s_n() < s_n_cutoff:
            try:
                cand = Spot(frame, int(_py2_round(spot.h)),
                            int(_py2_round(spot.w)), spot.size,
                            gaussian_fit=None)
            except AttributeError:
                cand = None
        return cand

    # Offsets that drive origins through every regime: in-bounds,
    # partial-slice (None), and the wrapped full-slice quirk.
    for off_h in (0, 25, 28, 31, 34, 37, 58):
        frames = [Image(image=rng.normal(400, 6, (64, 64)))
                  for _ in range(2)]
        frames[0].image[28:33, 28:33] += 4000.0
        s0 = Spot(frames[0], 30, 30, 5)
        frames[0].spots.append(s0)
        offsets = [(0, 0), (off_h, -2)]
        tracks = luminosity_centroid_particle_tracking(
            frames, [s0], search_radius=r, s_n_cutoff=2.0,
            offsets=offsets)
        got = tracks[0][1]
        want = reference_next(frames[1], s0, offsets[1])
        if want is None:
            assert got is None, off_h
        else:
            assert got is not None, off_h
            assert (got.h, got.w) == (want.h, want.w), off_h
