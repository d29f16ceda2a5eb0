"""End-to-end integration tests for the CLI apps on synthetic data."""

import csv
import os
import pickle

import numpy as np
import pytest


def _write_field_png(path, coords, shape=(96, 96), rng=None, amp=3000.0):
    import imageio.v2 as iio
    rng = rng or np.random.default_rng(0)
    img = 400 + rng.normal(0, 6, shape)
    hh, ww = np.indices(shape).astype(float)
    for h, w in coords:
        img += amp * np.exp(-(((hh - h) ** 2) + ((ww - w) ** 2)) /
                            (2 * 1.2 ** 2))
    iio.imwrite(path, np.round(img).astype(np.uint16))


def test_basic_experiment_script_end_to_end(tmp_path, monkeypatch):
    # Layout: one directory per cycle, one file per field. Persistent
    # anchor spots make self-registration well-determined (with only a
    # couple of spots the cross-correlation peak is degenerate — real
    # fields have hundreds of spots).
    rng = np.random.default_rng(1)
    # Subpixel centers (+0.3/+0.6): integer-centered spots sit exactly on
    # the bounded fit's edge and round unstably (the reference's fitter
    # has the same property).
    anchors0 = [(12.3, 80.6), (80.3, 12.3), (84.6, 84.3), (15.3, 40.6),
                (55.6, 85.3), (85.3, 55.6)]
    anchors1 = [(12.6, 12.3), (80.3, 85.6), (84.3, 40.3), (40.6, 84.6),
                (14.3, 55.3), (60.6, 12.6)]
    spots_field0 = [(20.3, 20.6), (40.6, 45.3), (70.3, 30.3)]
    spots_field1 = [(25.3, 60.6), (50.6, 20.3)]
    presence0 = [(True, True, True), (True, True, False),
                 (True, False, False)]
    presence1 = [(True, True), (True, True), (True, False)]
    peptide_files = []
    for cycle in range(3):
        d = tmp_path / f"cycle_{cycle:02d}"
        d.mkdir()
        c0 = anchors0 + [s for s, p in zip(spots_field0, presence0[cycle])
                         if p]
        c1 = anchors1 + [s for s, p in zip(spots_field1, presence1[cycle])
                         if p]
        f0 = d / "field_00.png"
        f1 = d / "field_01.png"
        _write_field_png(str(f0), c0, rng=rng)
        _write_field_png(str(f1), c1, rng=rng)
        peptide_files += [str(f0), str(f1)]

    import basic_experiment_script
    outdir = tmp_path / "out"
    outdir.mkdir()
    monkeypatch.chdir(tmp_path)
    mfmc = basic_experiment_script.main([
        "--peptide_files", *peptide_files,
        "--output_directory", str(outdir),
        "--no_sanity_check_images",
        "-L", str(tmp_path / "log.txt"),
    ])
    # Track photometries CSV written with all frames.
    csvs = [p for p in os.listdir(outdir)
            if p.startswith("track_photometries_NO_NONES_")]
    assert len(csvs) == 1
    with open(outdir / csvs[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0][:5] == ["CHANNEL", "FIELD", "H", "W", "CATEGORY"]
    assert len(rows[0]) == 5 + 3  # three frames
    assert len(rows) > 1
    # Categories: the persistent spots must appear as [ON][ON][ON].
    cat_csvs = [p for p in os.listdir(outdir)
                if p.startswith("category_counts_")]
    assert len(cat_csvs) == 1
    text = open(outdir / cat_csvs[0]).read()
    assert "[ON]" in text
    # Offsets dict written.
    assert any(p.startswith("offsets_dict_") for p in os.listdir(outdir))
    # Tracking found the right trace structure: 12 persistent anchors +
    # the 5 planted bleaching/persistent spots.
    counts, merged = mfmc.count_binary_trace_categories()
    agg = {}
    for chan in counts.values():
        for ex_counts in chan.values():
            for pattern, c in ex_counts.items():
                agg[pattern] = agg.get(pattern, 0) + c
    assert agg[(True, True, True)] == 12 + 2
    assert agg[(True, True, False)] == 2
    assert agg[(True, False, False)] == 1
    assert sum(agg.values()) == 17


def test_basic_experiment_script_sextractor(tmp_path, monkeypatch):
    """--sextractor routes photometry_method='sextractor' into BOTH the
    trace discard and the CSV emitter (reference
    basic_experiment_script.py:474, 620-624); background-subtracted
    aperture sums must differ from the default mexican hat."""
    rng = np.random.default_rng(3)
    anchors = [(12.3, 80.6), (80.3, 12.3), (84.6, 84.3), (15.3, 40.6),
               (55.6, 85.3), (85.3, 55.6)]
    peptide_files = []
    for cycle in range(2):
        d = tmp_path / f"cycle_{cycle:02d}"
        d.mkdir()
        f0 = d / "field_00.png"
        _write_field_png(str(f0), anchors, rng=rng)
        peptide_files.append(str(f0))

    import basic_experiment_script
    monkeypatch.chdir(tmp_path)
    rows_by_mode = {}
    for mode, extra in [("default", []), ("sex", ["--sextractor"])]:
        outdir = tmp_path / ("out_" + mode)
        outdir.mkdir()
        basic_experiment_script.main([
            "--peptide_files", *peptide_files,
            "--output_directory", str(outdir),
            "--no_sanity_check_images",
            "-L", str(tmp_path / f"log_{mode}.txt"), *extra,
        ])
        csvs = [p for p in os.listdir(outdir)
                if p.startswith("track_photometries_NO_NONES_")]
        assert len(csvs) == 1
        with open(outdir / csvs[0]) as f:
            rows = list(csv.reader(f))[1:]
        rows_by_mode[mode] = {tuple(r[:4]): [float(x) for x in r[5:]]
                              for r in rows}
    assert rows_by_mode["sex"], "sextractor run produced no traces"
    shared = set(rows_by_mode["default"]) & set(rows_by_mode["sex"])
    assert shared
    diffs = [abs(a - b)
             for k in shared
             for a, b in zip(rows_by_mode["default"][k],
                             rows_by_mode["sex"][k])]
    assert max(diffs) > 1.0, "sextractor photometries identical to default"


def test_basic_timetrace_script_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    frames = []
    for f in range(12):
        coords = [(30, 30), (60, 70)] if f < 6 else [(60, 70)]
        path = tmp_path / f"frame_{f:03d}.png"
        _write_field_png(str(path), coords, rng=rng)
        frames.append(str(path))
    import basic_timetrace_script
    outdir = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    tte = basic_timetrace_script.main([
        "--output_directory", str(outdir),
        "--no_sanity_check_images",
        "-L", str(tmp_path / "log.txt"),
        *frames,
    ])
    assert (outdir / "test.csv").exists()
    with open(outdir / "test.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][:5] == ["Trace #", "Hcoord", "Wcoord", "Frame #",
                           "Photometry"]
    assert "Plateau Height" in rows[0]
    # 2 traces x 12 frames + header.
    assert len(rows) == 2 * 12 + 1
    # The bleaching spot's step fit shows a drop. (The detected key can be
    # +-1 px from the planted center due to the reference's axis quirk.)
    key = min(tte.step_fits,
              key=lambda k: (k[0] - 30) ** 2 + (k[1] - 30) ** 2)
    fits = tte.step_fits[key]
    heights = [p[2] for p in fits.trace]
    assert heights[0] > heights[-1] + 5000


def test_simulate_peptide_and_lognormal_closure(tmp_path, monkeypatch):
    import simulate_peptide
    monkeypatch.chdir(tmp_path)
    signals, molecular = simulate_peptide.main([
        "AXXA", "A", "-N", "300", "-m", "1", "-o", "1", "-e", "4",
        "--edman_efficiency", "0.95", "--dye_destruction", "0.02",
        "--dud_dyes", "0.2", "--surface_degradation_1", "0.0",
        "--surface_degradation_1_num_cycles", "0",
        "--surface_degradation_2", "0.0",
        "--fluor_intensity", "30000", "--beta_sigma", "0.2",
        "--output_directory", str(tmp_path),
    ])
    assert sum(signals.values()) > 50
    # The dominant fitted signal should involve drops at cycles 1 and 4
    # (the two labeled positions under near-ideal chemistry).
    top_signal = max(signals, key=signals.get)
    sig, is_zero, si = top_signal
    assert is_zero in (True, False)
    pkls = [p for p in os.listdir(tmp_path) if p.startswith("Simulated_")
            and p.endswith(".pkl")]
    assert len(pkls) == 1
    with open(tmp_path / pkls[0], "rb") as f:
        loaded_args, loaded_signals, loaded_mes = pickle.load(f)
    assert loaded_signals == signals


def test_remainder_correction_app(tmp_path, monkeypatch):
    # Build a small track CSV with remainders.
    path = tmp_path / "tracks.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY",
                    "FRAME 0", "FRAME 1", "FRAME 2"])
        for t in range(6):
            w.writerow(["ch1", 0, t, 0, "(True, True, True)",
                        1000, 1100, 1000])
        w.writerow(["ch1", 0, 99, 0, "(True, True, False)", 900, 950, 10])
    import remainder_correction
    monkeypatch.chdir(tmp_path)
    out = remainder_correction.main([str(path), "--method", "4"])
    assert os.path.exists(out)
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0][:5] == ["CHANNEL", "FIELD", "H", "W", "CATEGORY"]
    # Frame-1 drift (+10%) removed from the remainders.
    vals = [float(r[6]) for r in rows[1:] if r[2] != "99"]
    np.testing.assert_allclose(vals, 1100 * 0.9, rtol=1e-6)


def test_iterative_background_app(tmp_path, monkeypatch):
    keys = [((("A", i),), True, 1) for i in range(1, 7)]
    rng = np.random.default_rng(3)
    ac_paths = []
    for i in range(3):
        signals = {k: 100 + int(rng.integers(-10, 10)) for k in keys}
        p = tmp_path / f"ac_{i}.pkl"
        with open(p, "wb") as f:
            pickle.dump(signals, f)
        ac_paths.append(str(p))
    ac_csv = tmp_path / "ac.csv"
    with open(ac_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "filepath"])
        for i, p in enumerate(ac_paths):
            w.writerow([i, p])
    boc = {k: 100 for k in keys}
    boc[((("A", 3),), True, 1)] = 1000
    boc_path = tmp_path / "boc.pkl"
    with open(boc_path, "wb") as f:
        pickle.dump(boc, f)
    import iterative_background_v2
    outdir = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    corrected = iterative_background_v2.main([
        "--boc_file", str(boc_path), "--ac_file", str(ac_csv),
        "--num_cycles", "6", "--output_directory", str(outdir),
    ])
    assert corrected[((("A", 3),), True, 1)] > 0
    outs = os.listdir(outdir)
    for prefix in ("average_background_", "std_background_",
                   "experiment_background_", "corrected_experiment_"):
        assert any(p.startswith(prefix) for p in outs)


def test_basic_image_script_end_to_end(tmp_path, monkeypatch):
    import glob
    import math
    import pickle
    from PIL import Image as PILImage
    import basic_image_script

    rng = np.random.default_rng(21)
    arr = rng.normal(400, 8, (64, 64)).astype(np.float32)
    hh, ww = np.indices((64, 64)).astype(np.float32)
    for (h, w) in [(20.3, 20.6), (40.4, 45.2)]:
        arr += 3000.0 * np.exp(-(((hh - h) ** 2) + ((ww - w) ** 2)) /
                               (2 * 1.3 ** 2))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    tif = str(img_dir / "field0.tif")
    PILImage.fromarray(arr.astype(np.uint16), mode="I;16").save(tif)

    monkeypatch.chdir(tmp_path)
    processed = basic_image_script.main(
        ["--parameters", "{'c_std': 3}",
         "-L", str(tmp_path / "log.txt"), str(img_dir)])
    assert len(processed) == 1
    pkls = glob.glob(str(img_dir) + "/*_psfs_*.pkl")
    csvs = glob.glob(str(img_dir) + "/*_psfs_*.csv")
    pngs = glob.glob(str(img_dir) + "/*_psfs_*.png")
    assert pkls and csvs and pngs
    with open(pkls[0], "rb") as f:
        psfs = pickle.load(f)
    found = sorted(psfs.keys())
    assert any(math.hypot(h - 20, w - 21) <= 2 for h, w in found)
    assert any(math.hypot(h - 40, w - 45) <= 2 for h, w in found)
    # 12-tuple contract (pflib.py:395-428)
    assert all(len(v) == 12 for v in psfs.values())


def test_lognormal_fitter_v2_end_to_end(tmp_path, monkeypatch):
    import csv
    import glob
    import math
    import pickle
    import lognormal_fitter_v2

    rng = np.random.default_rng(22)
    beta = 30000.0
    path = str(tmp_path / "tracks.csv")
    n_frames = 5
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY"] +
                   [f"FRAME {i}" for i in range(n_frames)])
        for t in range(60):
            seq = (1, 1, 0, 0, 0) if t % 2 else (2, 1, 1, 0, 0)
            ints = [int(rng.lognormal(math.log(beta * v), 0.2)) + 800
                    if v else int(abs(rng.normal(800, 100)))
                    for v in seq]
            cat = tuple(v > 0 for v in seq)
            w.writerow(["ch1", 0, 10 + t, 20 + t,
                        "(" + ", ".join(str(c) for c in cat) + ")"] + ints)

    monkeypatch.chdir(tmp_path)
    lognormal_fitter_v2.main([path, "-m", "1", "-o", "0", "-e", "4"])
    sig_pkls = glob.glob(path + "_*_ch1_SIGNALS.pkl")
    assert sig_pkls, "SIGNALS.pkl not written"
    with open(sig_pkls[0], "rb") as f:
        signals = pickle.load(f)
    assert sum(signals.values()) > 30
    top = max(signals, key=signals.get)
    assert top[0] in ((("A", 2),), (("A", 1), ("A", 3)))
    assert glob.glob(path + "_*_ch1_INTERMEDIATES_v2.pkl")
    assert glob.glob(path + "_*_ch1_RAW_PHOTOMETRIES.pkl")
    assert glob.glob(path + "_*_ch1_HISTOGRAM.html")


def test_module_cli_run_experiment_and_fluor_counts(tmp_path, monkeypatch):
    """The redesigned CLI (python -m fluorosequencingimageanalysis_tpu):
    run-experiment writes both CSVs from cycle/field image files, and
    fluor-counts chains on the track CSV."""
    import json as json_module
    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    rng = np.random.default_rng(7)
    anchors = [(12.3, 80.6), (80.3, 12.3), (84.6, 84.3), (15.3, 40.6),
               (55.6, 85.3), (85.3, 55.6)]
    files = []
    for cycle in range(3):
        d = tmp_path / f"cycle_{cycle:02d}"
        d.mkdir()
        f0 = d / "field_00.png"
        # anchors persist; one spot bleaches after cycle 1
        coords = anchors + ([(40.6, 45.3)] if cycle < 1 else [])
        _write_field_png(str(f0), coords, rng=rng)
        files.append(str(f0))

    outdir = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["run-experiment", "--peptide-files", *files,
                       "--output-dir", str(outdir),
                       "--max-candidates", "256", "--max-spots", "64",
                       "--offsets-pkl", "offsets.pkl", "--profile"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["fields"] == 1 and info["cycles"] == 3
    assert info["rows"] >= 6
    assert "api/run_stack" in info["stages_sec"]
    with open(outdir / "track_photometries.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][:5] == ["CHANNEL", "FIELD", "H", "W", "CATEGORY"]
    assert len(rows) - 1 == info["rows"]
    cat_text = (outdir / "category_counts.csv").read_text()
    assert "[ON]" in cat_text
    assert (outdir / "offsets.pkl").exists()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["fluor-counts", str(outdir / "track_photometries.csv"),
                       "--beta", "25000", "--beta-sigma", "0.3",
                       "--signals-pkl", str(outdir / "SIGNALS.pkl")])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["traces"] == len(rows) - 1
    with open(outdir / "SIGNALS.pkl", "rb") as f:
        signals = pickle.load(f)
    assert isinstance(signals, dict)


def test_module_cli_timetrace(tmp_path):
    """`timetrace` subcommand: movie frame files -> LC tracking ->
    step fits -> timetrace CSV."""
    import contextlib
    import io
    import json as json_module

    import imageio.v2 as iio

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main
    from test_fast_timetrace import make_movie

    movie = make_movie(seed=2, T=12, n_spots=6)
    frames = []
    for f in range(movie.shape[0]):
        p = tmp_path / f"frame_{f:03d}.png"
        iio.imwrite(str(p), np.clip(np.round(movie[f]), 0,
                                    65535).astype(np.uint16))
        frames.append(str(p))
    outdir = tmp_path / "out"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["timetrace", "--frames", *frames,
                       "--output-dir", str(outdir),
                       "--max-candidates", "256", "--chung-kennedy", "1",
                       "--profile"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["frames"] == 12
    assert info["traces"] > 2
    assert "api/run_timetrace/track" in info["stages_sec"]
    with open(outdir / "timetrace.csv") as fh:
        rows = list(csv.reader(fh))
    assert rows[0][:5] == ["Trace #", "Hcoord", "Wcoord", "Frame #",
                           "Photometry"]
    assert len(rows) - 1 == info["traces"] * 12


def test_module_cli_simulate(tmp_path):
    """`simulate` subcommand: batched MC over the event model."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    buf = io.StringIO()
    pkl = tmp_path / "sim.pkl"
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["simulate", "GCAGCAGAG", "C",
                       "--num-mocks", "2", "--num-edmans", "6",
                       "--num-sims", "2000", "--seed", "3",
                       "--results-pkl", str(pkl)])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["simulations"] == 2000
    assert info["distinct_patterns"] > 1
    with open(pkl, "rb") as f:
        results = pickle.load(f)
    assert len(results) == 2000
    # Each record is (dye_decrements, dye_counts, None, ci).
    decs, counts, _, ci = results[0]
    assert "C" in counts and "C" in ci


def test_module_cli_fluor_counts_auto_calibrate(tmp_path):
    """fluor-counts --auto-calibrate derives alpha/beta itself (the
    lognormal_fitter_v2 flow) and reports the calibration."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        write_photometries_dict_to_csv)

    rng = np.random.default_rng(5)
    beta = 30000.0
    photometries = {"ch1": {0: {}}}
    n_cycles = 6
    for t in range(160):
        n0 = int(rng.integers(1, 3))
        drop = int(rng.integers(1, n_cycles))
        counts = [n0] * drop + [n0 - 1] * (n_cycles - drop)
        intensities = tuple(
            float(n * beta * np.exp(rng.normal(0, 0.18))) if n else
            float(rng.normal(0, 120.0)) for n in counts)
        category = tuple(n > 0 for n in counts)
        photometries["ch1"][0][(t, t)] = (category, intensities, t)
    path = tmp_path / "tracks.csv"
    write_photometries_dict_to_csv(photometries, str(path))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["fluor-counts", str(path), "--auto-calibrate",
                       "--signals-pkl", str(tmp_path / "SIGNALS.pkl")])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["traces"] == 160
    cal = info["calibration"]
    # beta recovered within a factor-ish band (last-drop HWHM estimate).
    assert 0.5 * beta < float(cal["beta"]) < 2.0 * beta
    with open(tmp_path / "SIGNALS.pkl", "rb") as f:
        signals = pickle.load(f)
    assert sum(signals.values()) > 100


def test_module_cli_stepfit(tmp_path):
    """`stepfit` subcommand: .npy photometry matrix and track-CSV inputs
    both emit the reference per-frame step-fit schema, with step columns
    equal to the batched fitter's plateaus."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main
    from fluorosequencingimageanalysis_tpu.ops.stepfit_batch import (
        stepfit_batched)

    rng = np.random.default_rng(4)
    T = 40
    levels = np.where(np.arange(T) < 16, 60000.0,
                      np.where(np.arange(T) < 30, 30000.0, 1000.0))
    phot = levels[None] + rng.normal(0, 700.0, (6, T))
    np.save(tmp_path / "traces.npy", phot)

    outdir = tmp_path / "out"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["stepfit", "--npy", str(tmp_path / "traces.npy"),
                       "--output-dir", str(outdir),
                       "--mirror-start", "10", "--chung-kennedy", "1"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["traces"] == 6 and info["steps"] >= 6
    with open(outdir / "step_fits.csv") as fh:
        rows = list(csv.reader(fh))
    assert rows[0][:8] == ["Trace #", "Channel", "Field", "Hcoord",
                           "Wcoord", "Frame #", "Photometry", "Step #"]
    assert len(rows) - 1 == 6 * T
    # Step columns must reflect the batched fitter's t-filtered plateaus.
    ref = stepfit_batched(phot, mirror_start=10, chung_kennedy=1,
                          p_threshold=0.01)
    for t in range(6):
        # Row columns update only AT plateau starts (the reference's
        # per-frame semantics) — the last frame carries the values of
        # the LAST plateau.
        last = rows[1 + t * T + (T - 1)]
        start, end, height = ref[t][3][-1]
        np.testing.assert_allclose(float(last[8]), height)  # Plateau Height
        assert int(last[10]) == end - start + 1             # Plateau Length
        assert len(ref[t][3]) >= 3  # the scenario: >= two steps

    # Track-CSV input path: carries channel/field/coords through.
    csv_in = tmp_path / "tracks.csv"
    with open(csv_in, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY"] +
                   [f"FRAME {i}" for i in range(T)])
        for t in range(3):
            w.writerow(["ch1", 0, 10 + t, 20 + t,
                        "[" + " ".join(["True,"] * (T - 1)) + " True]"] +
                       [f"{x:.1f}" for x in phot[t]])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["stepfit", str(csv_in), "--output-dir",
                       str(outdir), "--csv", "from_csv.csv",
                       "--mirror-start", "10", "--chung-kennedy", "1"])
    assert rc == 0
    with open(outdir / "from_csv.csv") as fh:
        rows = list(csv.reader(fh))
    assert len(rows) - 1 == 3 * T
    assert rows[1][1] == "ch1" and rows[1][3] == "10"


def test_module_cli_background_correct_matches_legacy_app(tmp_path,
                                                          monkeypatch):
    """`background-correct` must reproduce iterative_background_v2's
    corrected counts on identical inputs (pkl paths instead of the
    index-CSV indirection)."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main
    import iterative_background_v2

    keys = [((("A", i),), True, 1) for i in range(1, 7)]
    rng = np.random.default_rng(3)
    ac_paths = []
    for i in range(3):
        signals = {k: 100 + int(rng.integers(-10, 10)) for k in keys}
        p = tmp_path / f"ac_{i}.pkl"
        with open(p, "wb") as f:
            pickle.dump(signals, f)
        ac_paths.append(str(p))
    boc = {k: 100 for k in keys}
    boc[((("A", 3),), True, 1)] = 1000
    boc_path = tmp_path / "boc.pkl"
    with open(boc_path, "wb") as f:
        pickle.dump(boc, f)

    ac_csv = tmp_path / "ac.csv"
    with open(ac_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "filepath"])
        for i, p in enumerate(ac_paths):
            w.writerow([i, p])
    monkeypatch.chdir(tmp_path)
    legacy = iterative_background_v2.main([
        "--boc_file", str(boc_path), "--ac_file", str(ac_csv),
        "--num_cycles", "6", "--output_directory", str(tmp_path / "leg")])

    outdir = tmp_path / "out"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["background-correct", str(boc_path),
                       "--control-pkls", *ac_paths, "--num-cycles", "6",
                       "--output-dir", str(outdir),
                       "--background-pkl", "background.pkl"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    with open(outdir / "corrected_signals.pkl", "rb") as f:
        corrected = pickle.load(f)
    assert corrected == legacy
    assert info["counts_out"] == sum(legacy.values())
    assert (outdir / "background.pkl").exists()


def test_module_cli_simulate_ddif(tmp_path):
    """--ddif (a scalar CLI flag) expands to the per-dye-count quench
    array simulate_photometries_batched expects; regression for the
    0-d ndarray len() crash."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["simulate", "GCAGCAG", "C",
                       "--num-mocks", "1", "--num-edmans", "5",
                       "--num-sims", "500", "--seed", "5",
                       "--ddif", "0.1"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["simulations"] == 500


def test_module_cli_detect(tmp_path, monkeypatch):
    """`detect` subcommand: image files -> psfs pkl/csv/png artifacts
    (the basic_image_script workflow on the new CLI)."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    png = tmp_path / "field.png"
    _write_field_png(str(png), [(20.3, 30.6), (60.6, 70.3), (40.3, 50.6)])
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["detect", str(png), "--max-candidates", "256"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["processed"] == 1
    (pkl_path, csv_path, png_path), = info["artifacts"].values()
    for p in (pkl_path, csv_path, png_path):
        assert os.path.exists(p), p
    with open(pkl_path, "rb") as f:
        psfs = pickle.load(f)
    assert len(psfs) == 3 == list(info["spots"].values())[0]
    # 12-tuple psfs-dict contract (pflib.py:395-428).
    (h, w), fit = next(iter(psfs.items()))
    assert len(fit) == 12


def test_module_cli_remainder_correct(tmp_path, monkeypatch):
    """`remainder-correct` subcommand: method-4 output must equal the
    compat app's byte-for-byte; other methods run and adjust."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    path = tmp_path / "tracks.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY",
                    "FRAME 0", "FRAME 1", "FRAME 2"])
        for t in range(6):
            w.writerow(["ch1", 0, t, 0, "(True, True, True)",
                        1000, 1100, 1000])
        w.writerow(["ch1", 0, 99, 0, "(True, True, False)", 900, 950, 10])
    monkeypatch.chdir(tmp_path)

    import remainder_correction
    app_out = remainder_correction.main([str(path), "--method", "4"])

    cli_out = tmp_path / "cli_adjusted.csv"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["remainder-correct", str(path), "--method", "4",
                       "--output", str(cli_out),
                       "--adjustments-pkl", str(tmp_path / "adj.pkl")])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["rows"] == 7
    assert sorted(open(cli_out).read().splitlines()) == \
        sorted(open(app_out).read().splitlines())
    with open(tmp_path / "adj.pkl", "rb") as f:
        adjustments = pickle.load(f)
    assert "ch1" in adjustments

    for method, extra in ((1, ["--m1-diff-median"]), (2, []), (3, [])):
        out = tmp_path / f"m{method}.csv"
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli_main(["remainder-correct", str(path),
                           "--method", str(method), "--min", "3",
                           "--output", str(out)])
        assert rc == 0
        rows = list(csv.reader(open(out)))
        assert rows[0][:5] == ["CHANNEL", "FIELD", "H", "W", "CATEGORY"]
        assert len(rows) == 8


def test_module_cli_fluor_counts_channel_flag(tmp_path):
    """Manual-mode fluor-counts honors --channel: a multi-channel track
    CSV is restricted to the requested channel instead of raising the
    one-beta-cannot-span-channels error (which it still does without
    the flag)."""
    import contextlib
    import io
    import json as json_module
    import math
    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    rng = np.random.default_rng(9)
    beta = 30000.0
    path = str(tmp_path / "tracks.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY"] +
                   [f"FRAME {i}" for i in range(4)])
        for t in range(12):
            ch = "ch1" if t % 2 == 0 else "ch2"
            seq = (1, 1, 0, 0)
            ints = [int(rng.lognormal(math.log(beta), 0.2)) if v
                    else int(abs(rng.normal(300, 50))) for v in seq]
            w.writerow([ch, 0, 10 + t, 20,
                        "(True, True, False, False)"] + ints)

    with pytest.raises(NotImplementedError, match="channels"):
        cli_main(["fluor-counts", path, "--beta", "30000"])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["fluor-counts", path, "--beta", "30000",
                       "--channel", "ch1"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["traces"] == 6


def test_module_cli_zstack(tmp_path, monkeypatch):
    """`zstack` subcommand (BASELINE config 2): [T, H, W] npy stack ->
    device background subtraction + batched detect/fit -> spots CSV +
    background maps."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    rng = np.random.default_rng(41)
    H = W = 96
    yy, xx = np.mgrid[:H, :W].astype(np.float64)
    stack = np.empty((3, H, W), np.float64)
    coords = [(20.3, 30.6), (60.6, 70.3), (40.3, 50.6)]
    for t in range(3):
        img = 700 + 2.0 * yy + 1.0 * xx + rng.normal(0, 4, (H, W))
        for h, w in coords:
            img += 2500 * np.exp(-(((yy - h) ** 2) + ((xx - w) ** 2))
                                 / (2 * 1.2 ** 2))
        stack[t] = img
    npy = tmp_path / "stack.npy"
    np.save(npy, np.round(stack).astype(np.uint16))
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["zstack", str(npy), "--box-size", "16",
                       "--filter-size", "3", "--max-candidates", "256",
                       "--output", "spots.csv",
                       "--background-npy", "bg.npy"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["frames"] == 3
    bg = np.load(tmp_path / "bg.npy")
    assert bg.shape == stack.shape
    # The estimated background must track the planted gradient (far from
    # the spots) to within the noise.
    assert abs(bg[0, 80, 10] - (700 + 2.0 * 80 + 1.0 * 10)) < 25
    rows = list(csv.DictReader(open(tmp_path / "spots.csv")))
    assert info["spots"] == len(rows)
    for t in range(3):
        frame_rows = [r for r in rows if int(r["FRAME"]) == t]
        got = np.array([(float(r["H"]), float(r["W"])) for r in frame_rows])
        for h, w in coords:
            d = np.abs(got - [h, w]).max(axis=1).min()
            # Within a pixel: the centers carry the reference's transposed
            # agpy subpixel quirk (ops/gaussian.py), reproduced on purpose.
            assert d <= 1.0, f"frame {t}: no spot near ({h}, {w})"


def test_module_cli_parameter_dicts(tmp_path, monkeypatch):
    """--photometry-parameters / --detect-parameters dict literals (the
    reference's --photometry_parameters / --parameters surface) reach
    the configs: a changed mexican-hat geometry changes the CSV values,
    and an unknown key fails loudly."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    rng = np.random.default_rng(8)
    files = []
    for cycle in range(2):
        d = tmp_path / f"cycle_{cycle:02d}"
        d.mkdir()
        f0 = d / "field_00.png"
        _write_field_png(str(f0), [(30.3, 40.6), (70.6, 80.3)], rng=rng)
        files.append(str(f0))
    monkeypatch.chdir(tmp_path)

    def run(outdir, extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli_main(["run-experiment", "--peptide-files", *files,
                           "--output-dir", outdir,
                           "--max-candidates", "128", "--max-spots", "32"]
                          + extra)
        assert rc == 0
        json_module.loads(buf.getvalue())
        with open(tmp_path / outdir / "track_photometries.csv") as f:
            return list(csv.reader(f))[1:]

    rows_default = run("out_a", [])
    rows_tuned = run("out_b", ["--photometry-parameters",
                               "{'radius': 7, 'brim_size': 4}"])
    assert [r[:5] for r in rows_default] == [r[:5] for r in rows_tuned]
    assert any(a[5:] != b[5:] for a, b in zip(rows_default, rows_tuned))

    with pytest.raises(ValueError, match="unknown PhotometryConfig"):
        run("out_c", ["--photometry-parameters", "{'nope': 1}"])

    # A 'method' key inside the dict wins when --photometry-method is
    # not given (it used to be silently clobbered by the flag default).
    rows_dict_m = run("out_d", ["--photometry-parameters",
                                "{'method': 'simple'}"])
    rows_flag_m = run("out_e", ["--photometry-method", "simple"])
    assert rows_dict_m == rows_flag_m
    assert any(a[5:] != b[5:] for a, b in zip(rows_default, rows_dict_m))


def test_module_cli_stepfit_chi_squared(tmp_path):
    """`stepfit --method chi_squared`: the Kerssemakers batched fitter +
    raw-trace refit (the reference's save_stepfits_as_csv chi_squared
    flow, flexlibrary.py:3756-3789), with its mirror_start refusal."""
    import contextlib
    import io
    import json as json_module

    from fluorosequencingimageanalysis_tpu import stepfitting as sflib
    from fluorosequencingimageanalysis_tpu.__main__ import main as cli_main

    rng = np.random.default_rng(9)
    T = 30
    levels = np.where(np.arange(T) < 12, 50000.0,
                      np.where(np.arange(T) < 22, 25000.0, 1000.0))
    phot = levels[None] + rng.normal(0, 500.0, (5, T))
    np.save(tmp_path / "traces.npy", phot)

    outdir = tmp_path / "out"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["stepfit", "--npy", str(tmp_path / "traces.npy"),
                       "--output-dir", str(outdir),
                       "--method", "chi_squared", "--num-steps", "6"])
    assert rc == 0
    info = json_module.loads(buf.getvalue())
    assert info["traces"] == 5 and info["steps"] >= 5
    with open(outdir / "step_fits.csv") as fh:
        rows = list(csv.reader(fh))
    assert len(rows) - 1 == 5 * T

    # Plateau heights in the CSV equal the oracle chain per trace:
    # chi_squared_step_fitter on the raw trace, then refit (CK passes 0).
    for t in range(5):
        fit = sflib.chi_squared_step_fitter(
            tuple(float(v) for v in phot[t]), num_steps=6)
        refit = sflib.refit_plateaus(list(phot[t]), fit)
        heights = {}
        for (start, stop, height) in refit:
            for f in range(start, stop + 1):
                heights[f] = height
        for r in rows[1:]:
            if int(r[0]) == t:
                assert float(r[8]) == pytest.approx(heights[int(r[5])],
                                                    rel=1e-12)

    # mirror_start refusal (reference parity, flexlibrary.py:3764).
    with pytest.raises(SystemExit) as exc:
        cli_main(["stepfit", "--npy", str(tmp_path / "traces.npy"),
                  "--output-dir", str(outdir), "--method", "chi_squared",
                  "--mirror-start", "4"])
    assert "chi_squared not supported with mirror_start" in str(exc.value)
