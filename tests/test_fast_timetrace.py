"""Differential test: array-native run_timetrace vs the class-based path.

The class flow (find_peptides -> Image/Spot -> TimetraceExperiment:
lc_create_traces -> stepfit_tracks -> save_experiment_as_csv) is the
reference-parity oracle (flexlibrary.py:3266-3713); api.Pipeline.
run_timetrace must reproduce its CSV rows."""

import csv

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.api import Pipeline


def make_movie(T=24, H=96, W=96, n_spots=10, seed=0, beta=2500.0,
               drift=0.08):
    """Bleaching spots: each drops to background in 1-3 steps, with slow
    subpixel wander (LC tracking territory)."""
    rng = np.random.default_rng(seed)
    hh, ww = np.indices((H, W)).astype(np.float32)
    movie = rng.normal(400.0, 6.0, (T, H, W)).astype(np.float32)
    pos = rng.uniform(12, H - 12, (n_spots, 2))
    steps = rng.integers(1, 4, n_spots)
    for s in range(n_spots):
        drops = np.sort(rng.choice(np.arange(4, T - 2), steps[s],
                                   replace=False))
        level = float(steps[s])
        wander = rng.normal(0, drift, (T, 2)).cumsum(axis=0)
        for f in range(T):
            if len(drops) and f >= drops[0]:
                level -= 1.0
                drops = drops[1:]
            if level <= 0:
                break
            h = pos[s, 0] + wander[f, 0]
            w = pos[s, 1] + wander[f, 1]
            movie[f] += level * beta * np.exp(
                -(((hh - h) ** 2) + ((ww - w) ** 2)) / (2 * 1.3 ** 2))
    return movie


def class_path_csv(movie, tmp_path, photometry_method="mexican_hat",
                   mirror_start=0, chung_kennedy=1, **p_params):
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import (
        TimetraceExperiment)
    from fluorosequencingimageanalysis_tpu.models.detect import find_peptides

    T = movie.shape[0]
    frames = [Image(image=movie[f], metadata={"filepath": f"mem://{f}"},
                    spots=None) for f in range(T)]
    psfs = find_peptides(movie[0], max_candidates=256, num_iters=60)
    frames[0].spots = [Spot(frames[0], h, w, gaussian_fit[7].shape[0],
                            gaussian_fit=gaussian_fit)
                       for (h, w), gaussian_fit in psfs.items()]
    tte = TimetraceExperiment(frames=frames, spot_traces=None,
                              step_fits=None, step_fit_intermediates=None)
    tte.lc_create_traces()
    tte.stepfit_tracks(photometry_min=None, mirror_start=mirror_start,
                       chung_kennedy=chung_kennedy, p_threshold=0.01,
                       photometry_method=photometry_method, **p_params)
    path = tmp_path / "ref.csv"
    tte.save_experiment_as_csv(str(path), include_step_fits=True,
                               include_intermediates=True,
                               photometry_method=photometry_method,
                               **p_params)
    with open(path) as fh:
        reader = csv.reader(fh)
        header = next(reader)
        return header, list(reader)


def _compare_csvs(header_ref, rows_ref, header_fast, rows_fast):
    assert header_fast == header_ref
    assert len(rows_fast) == len(rows_ref) > 0
    for i, (fast, ref) in enumerate(zip(rows_fast, rows_ref)):
        assert len(fast) == len(ref), i
        for j, (a, b) in enumerate(zip(fast, ref)):
            try:
                fb = float(b)
            except ValueError:
                assert a == b, (i, j, a, b)  # plateau tuples etc.
                continue
            assert float(a) == pytest.approx(fb, rel=1e-5, abs=1e-2), \
                (i, j, header_ref[j], a, b)


@pytest.mark.parametrize("seed,ck", [(0, 1), (5, 0)])
def test_run_timetrace_matches_class_path(seed, ck, tmp_path):
    from fluorosequencingimageanalysis_tpu.config import (
        PipelineConfig, StepfitConfig)

    movie = make_movie(seed=seed)
    header_ref, rows_ref = class_path_csv(movie, tmp_path, chung_kennedy=ck)

    pipe = Pipeline(PipelineConfig(stepfit=StepfitConfig(
        mirror_start=0, chung_kennedy=ck, p_threshold=0.01)))
    out = pipe.run_timetrace(movie, csv_path=str(tmp_path / "fast.csv"),
                             max_candidates=256)
    assert out["trace_count"] > 3
    with open(tmp_path / "fast.csv") as fh:
        reader = csv.reader(fh)
        header_fast = next(reader)
        rows_fast = list(reader)
    _compare_csvs(header_ref, rows_ref, header_fast, rows_fast)
    # The scenario must really exercise steps (bleaching plateaus).
    assert any(len(sf.trace) > 1 for sf in out["step_fits"].values())


def test_run_timetrace_edge_spot_goes_none(tmp_path):
    """A spot wandering off the frame edge must produce None frames
    (position -1, present False) in BOTH paths, row-equal."""
    rng = np.random.default_rng(11)
    T, H, W = 10, 64, 64
    hh, ww = np.indices((H, W)).astype(np.float32)
    movie = rng.normal(400.0, 6.0, (T, H, W)).astype(np.float32)
    # One interior anchor and one spot marching off the top edge.
    for f in range(T):
        movie[f] += 3000 * np.exp(
            -(((hh - 32.3) ** 2) + ((ww - 40.6) ** 2)) / (2 * 1.3 ** 2))
        h_edge = 6.0 - 1.2 * f
        if h_edge > -4:
            movie[f] += 3000 * np.exp(
                -(((hh - h_edge) ** 2) + ((ww - 20.4) ** 2)) / (2 * 1.3 ** 2))
    header_ref, rows_ref = class_path_csv(movie, tmp_path)
    out = Pipeline().run_timetrace(movie,
                                   csv_path=str(tmp_path / "fast.csv"),
                                   max_candidates=64, chung_kennedy=1)
    with open(tmp_path / "fast.csv") as fh:
        reader = csv.reader(fh)
        header_fast = next(reader)
        rows_fast = list(reader)
    _compare_csvs(header_ref, rows_ref, header_fast, rows_fast)
    assert not out["traces"]["present"].all()  # the walk-off went None


def test_run_timetrace_photometry_methods(tmp_path):
    """sextractor photometries ride the background/aperture host path."""
    from fluorosequencingimageanalysis_tpu.config import (
        PipelineConfig, PhotometryConfig)

    movie = make_movie(seed=3, T=12, n_spots=6)
    header_ref, rows_ref = class_path_csv(
        movie, tmp_path, photometry_method="sextractor")
    pipe = Pipeline(PipelineConfig(
        photometry=PhotometryConfig(method="sextractor")))
    out = pipe.run_timetrace(movie, csv_path=str(tmp_path / "fast.csv"),
                             max_candidates=256, chung_kennedy=1)
    with open(tmp_path / "fast.csv") as fh:
        reader = csv.reader(fh)
        header_fast = next(reader)
        rows_fast = list(reader)
    _compare_csvs(header_ref, rows_ref, header_fast, rows_fast)
    assert out["trace_count"] > 2


def test_run_timetrace_uint16_equals_float32(tmp_path):
    """Raw uint16 movies must give identical CSVs to the same data
    pre-cast to float32 (upload-as-is + on-device cast)."""
    movie_f = np.clip(make_movie(seed=2, T=12, n_spots=8), 0, 65535)
    movie_u = movie_f.astype(np.uint16)
    out_u = Pipeline().run_timetrace(movie_u,
                                     csv_path=str(tmp_path / "u.csv"),
                                     max_candidates=256, chung_kennedy=1)
    out_f = Pipeline().run_timetrace(movie_u.astype(np.float32),
                                     csv_path=str(tmp_path / "f.csv"),
                                     max_candidates=256, chung_kennedy=1)
    assert out_u["trace_count"] == out_f["trace_count"] > 3
    assert (tmp_path / "u.csv").read_text() == \
        (tmp_path / "f.csv").read_text()


def test_run_timetrace_empty_movie(tmp_path):
    rng = np.random.default_rng(0)
    movie = rng.normal(400.0, 6.0, (6, 64, 64)).astype(np.float32)
    out = Pipeline().run_timetrace(movie, max_candidates=64)
    assert out["photometries"].shape[1] == 6 or out["trace_count"] == 0

    # A promised CSV must exist even with zero detections (header-only,
    # like the class path's save on an empty experiment).
    csv_path = tmp_path / "tt_empty.csv"
    blank = rng.normal(400.0, 6.0, (4, 64, 64)).astype(np.float32)
    out2 = Pipeline().run_timetrace(blank, csv_path=str(csv_path),
                                    max_candidates=64)
    if out2["trace_count"] == 0:
        assert out2["csv_path"] == str(csv_path)
        assert csv_path.exists()
        header = csv_path.read_text().splitlines()
        assert len(header) == 1 and header[0].startswith("Trace #")


def test_run_timetraces_batch_matches_per_movie(tmp_path):
    """The batch front door must reproduce per-movie run_timetrace
    exactly (CSV-identical), with and without upload prefetch."""
    movies = [make_movie(seed=s, T=10, n_spots=6) for s in (0, 3)]
    pipe = Pipeline()
    kw = dict(max_candidates=256, chung_kennedy=1)
    singles = []
    for i, m in enumerate(movies):
        p = tmp_path / f"single_{i}.csv"
        pipe.run_timetrace(m, csv_path=str(p), **kw)
        singles.append(p.read_text())
    for prefetch in (False, True):
        paths = [tmp_path / f"batch_{prefetch}_{i}.csv"
                 for i in range(len(movies))]
        outs = pipe.run_timetraces(movies, csv_paths=[str(p) for p in paths],
                                   prefetch=prefetch, **kw)
        assert len(outs) == len(movies)
        for i, p in enumerate(paths):
            assert p.read_text() == singles[i], (prefetch, i)

    with pytest.raises(ValueError):
        pipe.run_timetraces(movies, csv_paths=["only_one.csv"], **kw)


def test_fused_track_photometry_equals_two_step():
    """lc_track_and_photometry (the fused device path run_timetrace
    takes) must equal lc_track + timetrace_photometries for every
    window metric, including edge fallbacks."""
    import jax.numpy as jnp
    from fluorosequencingimageanalysis_tpu.pipeline.fast_timetrace import (
        lc_track, lc_track_and_photometry, timetrace_photometries)

    movie = make_movie(seed=9, T=12, n_spots=8, H=64, W=64)
    # Spots near the frame edge exercise the host fallback overrides.
    h0 = np.array([12.4, 30.6, 50.2, 3.1, 60.7])
    w0 = np.array([20.3, 40.8, 10.5, 61.2, 4.4])
    movie_dev = jnp.asarray(movie)
    for method in ("mexican_hat", "simple", "maximum"):
        rec_h, rec_w, present = lc_track(movie, h0, w0)
        ref = timetrace_photometries(movie_dev, rec_h, rec_w, present,
                                     method, photometry_min=100.0)
        fh, fw, fp, phot = lc_track_and_photometry(
            movie_dev, h0, w0, method, photometry_min=100.0)
        np.testing.assert_array_equal(fh, rec_h, err_msg=method)
        np.testing.assert_array_equal(fw, rec_w, err_msg=method)
        np.testing.assert_array_equal(fp, present, err_msg=method)
        np.testing.assert_allclose(phot, ref, rtol=1e-6, atol=1e-4,
                                   err_msg=method)


def test_fused_track_photometry_chunked_dispatch():
    """T*N above the dispatch chunk must split into chunk-sized kernel
    slices and still equal the two-step path (regression: the fused path
    used to assume a single dispatch and crash on a negative pad)."""
    import jax.numpy as jnp
    from fluorosequencingimageanalysis_tpu.pipeline.fast_timetrace import (
        lc_track, lc_track_and_photometry, timetrace_photometries)

    movie = make_movie(seed=13, T=12, n_spots=8, H=64, W=64)
    h0 = np.array([12.4, 30.6, 50.2, 25.0, 44.5])
    w0 = np.array([20.3, 40.8, 10.5, 48.9, 33.1])  # T*N = 60 > chunk=32
    movie_dev = jnp.asarray(movie)
    rec_h, rec_w, present = lc_track(movie, h0, w0)
    ref = timetrace_photometries(movie_dev, rec_h, rec_w, present,
                                 "mexican_hat")
    fh, fw, fp, phot = lc_track_and_photometry(
        movie_dev, h0, w0, "mexican_hat", chunk=32)
    np.testing.assert_array_equal(fh, rec_h)
    np.testing.assert_array_equal(fp, present)
    np.testing.assert_allclose(phot, ref, rtol=1e-6, atol=1e-4)


def test_run_timetraces_rejects_singular_csv_path():
    pipe = Pipeline()
    with pytest.raises(TypeError, match="csv_paths"):
        pipe.run_timetraces([make_movie(seed=0, T=10, n_spots=3)],
                            csv_path="out.csv")


def test_lc_track_matches_host_tracker():
    """The lax.scan tracker must agree with the per-frame batched host
    tracker (pipeline/tracking.luminosity_centroid_particle_tracking)
    position by position, including None frames and fallbacks."""
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Image, Spot
    from fluorosequencingimageanalysis_tpu.pipeline.tracking import (
        luminosity_centroid_particle_tracking)
    from fluorosequencingimageanalysis_tpu.pipeline.fast_timetrace import (
        lc_track)
    from fluorosequencingimageanalysis_tpu.models.detect import find_peptides

    movie = make_movie(seed=7, T=16, n_spots=8)
    T = movie.shape[0]
    frames = [Image(image=movie[f], metadata={"filepath": f"mem://{f}"},
                    spots=None) for f in range(T)]
    psfs = find_peptides(movie[0], max_candidates=256, num_iters=60)
    spots = [Spot(frames[0], h, w, 5, gaussian_fit=gf)
             for (h, w), gf in psfs.items()]
    frames[0].spots = spots
    tracks = luminosity_centroid_particle_tracking(frames, spots)

    h0 = np.array([s.h for s in spots])
    w0 = np.array([s.w for s in spots])
    rec_h, rec_w, present = lc_track(movie, h0, w0)
    assert len(tracks) == len(spots)
    mismatches = 0
    for i, track in enumerate(tracks):
        for f in range(1, T):
            s = track[f]
            if s is None:
                mismatches += present[f, i]
            else:
                mismatches += (not present[f, i] or
                               rec_h[f, i] != s.h or rec_w[f, i] != s.w)
    assert mismatches == 0


def test_lc_track_mesh_sharded_equals_single_device():
    """Spot-axis mesh sharding (SURVEY P2) must be bit-equal to the
    unsharded scan, including the N % n_devices != 0 padding path."""
    from fluorosequencingimageanalysis_tpu.parallel.mesh import make_mesh
    from fluorosequencingimageanalysis_tpu.pipeline.fast_timetrace import (
        lc_track)

    rng = np.random.default_rng(4)
    T, H, W = 6, 96, 96
    n = 13  # not divisible by the mesh size
    movie = rng.normal(400, 8, (T, H, W)).astype(np.float32)
    ys = rng.uniform(12, H - 12, n)
    xs = rng.uniform(12, W - 12, n)
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(T):
        for i in range(n):
            movie[t] += (2500 * np.exp(
                -(((yy - ys[i] - 0.3 * t) ** 2 +
                   (xx - xs[i] + 0.2 * t) ** 2) / (2 * 1.3 ** 2)))
            ).astype(np.float32)
    import jax.numpy as jnp

    a = lc_track(movie, ys, xs)
    b = lc_track(movie, ys, xs, mesh=make_mesh(8))
    # Device-resident movie (api.run_timetrace's call pattern; regression:
    # an np.asarray bounce cost a device round trip) must match too.
    c = lc_track(jnp.asarray(movie), ys, xs, mesh=make_mesh(8))
    for x, y, z, name in zip(a, b, c, ("rec_h", "rec_w", "present")):
        assert x.shape == y.shape == z.shape == (T, n)
        np.testing.assert_array_equal(x, y, err_msg=name)
        np.testing.assert_array_equal(x, z, err_msg=name + " (device)")
    assert a[2][1:].any()  # tracks actually survived past frame 0


def test_run_timetrace_saturated_flat_region_matches_class_path(tmp_path):
    """NaN S/N must KEEP the candidate, like the host gate. A tracked
    spot whose 5x5 slice goes exactly flat (saturated camera region:
    edge std == 0 AND max == mean) makes illumina_s_n 0/0 = NaN; the
    reference's gate is "fall back if s_n < cutoff" (flexlibrary.py:1247)
    and NaN < x is False, so the candidate spot survives. The scan
    tracker's gate must be ~(sn < cutoff) — (sn >= cutoff) silently
    dropped these frames."""
    rng = np.random.default_rng(21)
    T, H, W = 8, 64, 64
    hh, ww = np.indices((H, W)).astype(np.float32)
    movie = rng.normal(400.0, 6.0, (T, H, W)).astype(np.float32)
    for f in range(T):
        # Interior anchor spot (keeps the experiment non-trivial).
        movie[f] += 3000 * np.exp(
            -(((hh - 44.3) ** 2) + ((ww - 44.6) ** 2)) / (2 * 1.3 ** 2))
        # The test spot: normal in frame 0, saturated-flat neighborhood
        # afterwards (every pixel the tracker can see is the same value).
        if f == 0:
            movie[f] += 3000 * np.exp(
                -(((hh - 20.2) ** 2) + (
                    (ww - 20.4) ** 2)) / (2 * 1.3 ** 2))
        else:
            movie[f, 8:33, 8:33] = 50000.0
    header_ref, rows_ref = class_path_csv(movie, tmp_path)
    out = Pipeline().run_timetrace(movie,
                                   csv_path=str(tmp_path / "fast.csv"),
                                   max_candidates=64, chung_kennedy=1)
    with open(tmp_path / "fast.csv") as fh:
        reader = csv.reader(fh)
        header_fast = next(reader)
        rows_fast = list(reader)
    _compare_csvs(header_ref, rows_ref, header_fast, rows_fast)
    # The scenario must actually hit the NaN gate: the flat-region
    # track stays PRESENT through the saturated frames.
    h0 = np.asarray(out["traces"]["h"], float)
    w0 = np.asarray(out["traces"]["w"], float)
    sat = (np.abs(h0 - 20.2) < 2) & (np.abs(w0 - 20.4) < 2)
    assert sat.any(), "planted saturated spot was not detected"
    assert out["traces"]["present"][1:, sat].all(), \
        "NaN-S/N frames must keep the candidate like the host gate"
