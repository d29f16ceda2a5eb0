"""The TPU-native CLI front door: ``python -m fluorosequencingimageanalysis_tpu``.

The seven reference-compatible scripts at the repo root keep the exact old
flags and artifacts; this is the redesigned interface over api.Pipeline —
one command for the flagship workflow and one for fluor counting:

    python -m fluorosequencingimageanalysis_tpu run-experiment \
        --peptide-files cycle_*/field_*.png --output-dir out
    python -m fluorosequencingimageanalysis_tpu fluor-counts \
        out/track_photometries.csv --beta 30000 --beta-sigma 0.2 \
        --signals-pkl out/SIGNALS.pkl

run-experiment groups files by the reference's directory=cycle,
filename=field convention (flexlibrary.py:1105-1154), runs the one-call
array-native path (registration + detect/fit + tracking + interpolation +
categories), and writes the track-photometries and category-counts CSVs.
Raw uint16 images upload as-is and cast on device.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


def _load_stack(files):
    """files -> ([F, C, H, W] array, frame_count) via dir=cycle/file=field."""
    from .pipeline.experiment import Experiment
    from .utils.imageio import read_image_array

    frame_indexed, field_indexed = Experiment.easy_sort_target_images(files)
    n_fields = {len(v) for v in frame_indexed.values()}
    if len(n_fields) != 1:
        raise SystemExit("every cycle directory must hold the same number "
                         f"of field files (got counts {sorted(n_fields)})")
    fields = []
    for f in sorted(field_indexed):
        fields.append(np.stack([read_image_array(p)
                                for p in field_indexed[f]]))
    stack = np.stack(fields)  # [F, C, H, W]
    return stack, stack.shape[1]


def _cmd_run_experiment(args):
    from .api import Pipeline
    from .config import PipelineConfig, PhotometryConfig

    store = None
    if args.store:
        from .utils.checkpoint import ArtifactStore
        store = ArtifactStore(args.store)
    stack, C = _load_stack(args.peptide_files)
    stacks = {"ch1": stack}
    if args.second_channel_files:
        stack2, C2 = _load_stack(args.second_channel_files)
        if C2 != C:
            raise SystemExit("second channel must have the same cycle count")
        stacks["ch2"] = stack2
    config = PipelineConfig(
        photometry=PhotometryConfig(method=args.photometry_method))
    pipe = Pipeline(config=config, store=store, profile=args.profile)
    os.makedirs(args.output_dir, exist_ok=True)
    csv_path = os.path.join(args.output_dir, args.csv)
    category_csv_path = os.path.join(args.output_dir, args.category_csv)
    out = pipe.run_experiment(
        stacks, csv_path=csv_path, category_csv_path=category_csv_path,
        category_csv_filtered=not args.all_categories,
        category_csv_collate_fields=args.collate_fields,
        max_candidates=args.max_candidates, max_spots=args.max_spots)
    if args.offsets_pkl:
        with open(os.path.join(args.output_dir, args.offsets_pkl),
                  "wb") as fh:
            pickle.dump({ch: (np.asarray(oh), np.asarray(ow))
                         for ch, (oh, ow) in out["offsets"].items()}, fh)
    summary = {"fields": int(stack.shape[0]), "cycles": int(C),
               "channels": sorted(stacks),
               "rows": len(out["rows"]),
               "summary": out["summary"],
               "csv": csv_path, "category_csv": category_csv_path}
    if args.profile:
        from .utils import profiling
        summary["stages_sec"] = {k: round(v["total"], 3)
                                 for k, v in profiling.timings().items()}
    print(json.dumps(summary, default=str))
    return 0


def _cmd_fluor_counts(args):
    from .api import Pipeline

    pipe = Pipeline()
    signals, total, none_count, fit_info = pipe.fluor_counts(
        args.tracks_csv, beta=args.beta, beta_sigma=args.beta_sigma,
        alpha_adjust=args.alpha_adjust)
    if args.signals_pkl:
        with open(args.signals_pkl, "wb") as fh:
            pickle.dump(signals, fh)
    print(json.dumps({"traces": total, "none": none_count,
                      "distinct_signals": len(signals),
                      "signals_pkl": args.signals_pkl}, default=str))
    return 0


def build_parser():
    parser = argparse.ArgumentParser(
        prog="python -m fluorosequencingimageanalysis_tpu",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="command", required=True)

    pe = sub.add_parser(
        "run-experiment",
        help="registration + detect/fit + tracking + categories + CSVs")
    pe.add_argument("--peptide-files", nargs="+", required=True,
                    help="image files; directory = cycle, filename = field")
    pe.add_argument("--second-channel-files", nargs="+", default=None,
                    help="optional second-channel image files (ch2), same "
                         "cycle/field layout")
    pe.add_argument("--output-dir", default=".",
                    help="directory for output CSVs")
    pe.add_argument("--csv", default="track_photometries.csv",
                    help="track-photometries CSV filename")
    pe.add_argument("--category-csv", default="category_counts.csv",
                    help="category-counts CSV filename")
    pe.add_argument("--offsets-pkl", default=None,
                    help="also dump per-channel offsets to this pkl")
    pe.add_argument("--photometry-method", default="mexican_hat",
                    choices=["mexican_hat", "simple", "maximum"])
    pe.add_argument("--max-candidates", type=int, default=None)
    pe.add_argument("--max-spots", type=int, default=None)
    pe.add_argument("--all-categories", action="store_true",
                    help="category CSV keeps every pattern (default: "
                         "one-drop monotone only, like the reference)")
    pe.add_argument("--collate-fields", action="store_true",
                    help="per-field category counts")
    pe.add_argument("--profile", action="store_true",
                    help="print per-stage wall-clock")
    pe.add_argument("--store", default=None,
                    help="artifact-store directory: detect-step results "
                         "are content-hash cached there, so re-runs with "
                         "unchanged inputs skip the device step")
    pe.set_defaults(func=_cmd_run_experiment)

    fc = sub.add_parser("fluor-counts",
                        help="v8 lognormal fluor counting from a track CSV")
    fc.add_argument("tracks_csv")
    fc.add_argument("--beta", type=float, required=True)
    fc.add_argument("--beta-sigma", type=float, required=True)
    fc.add_argument("--alpha-adjust", type=float, default=0.0)
    fc.add_argument("--signals-pkl", default=None,
                    help="dump the signals dict to this pkl")
    fc.set_defaults(func=_cmd_fluor_counts)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
