#!/usr/bin/env python
"""
Adjust track photometries using persistent remainders.

CLI parity: /root/reference/remainder_correction.py. Methods 1-3 are the
local variants; method 4 (default) is MCsimlib._remainder_adjust_2
(multiplicative median ratio).
"""

import argparse
import csv
import os
import pickle

import numpy as np

import MCsimlib


class MyFormatter(argparse.ArgumentDefaultsHelpFormatter,
                  argparse.RawDescriptionHelpFormatter):
    pass


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__,
                                     formatter_class=MyFormatter)
    parser.add_argument("tracks", nargs=1, type=str,
                        help="track_photometries CSV to adjust.")
    parser.add_argument("--min", type=int, default=5,
                        help="Minimum remainders per field.")
    parser.add_argument("--M1_diff_median", action="store_true",
                        default=False,
                        help="Method 1: use median instead of mean.")
    parser.add_argument("--print_adjustments", action="store_true",
                        default=False, help="Print adjustments.")
    parser.add_argument("--save_adjustments", action="store_true",
                        default=False, help="Pickle adjustments.")
    parser.add_argument("--method", type=int, default=4,
                        help="Adjustment method (1-4).")
    return parser


def method_1(photometries, minimum, num_frames, use_median):
    """Per-field median of per-remainder differences (reference
    remainder_correction.py:61-99)."""
    remainder_diffs = {}
    for channel, cdict in photometries.items():
        for field, fdict in cdict.items():
            remainder_diffs.setdefault(channel, {}).setdefault(
                field, [[] for _ in range(num_frames)])
            for (h, w), (category, intensities, row) in fdict.items():
                if set(category) != {True}:
                    continue
                m = (np.median(intensities) if use_median
                     else np.mean(intensities))
                for frame, intensity in enumerate(intensities):
                    remainder_diffs[channel][field][frame].append(
                        intensity - m)
    remainder_medians = {}
    for channel, cdict in remainder_diffs.items():
        for field, diff_lists in cdict.items():
            if any(len(d) < minimum for d in diff_lists):
                continue
            remainder_medians.setdefault(channel, {}).setdefault(
                field, [np.median(d) for d in diff_lists])
    adjusted = {}
    for channel, cdict in remainder_medians.items():
        adjusted.setdefault(channel, {})
        for field, medians in cdict.items():
            adjusted[channel].setdefault(field, {})
            for (h, w), (category, intensities,
                         row) in photometries[channel][field].items():
                adj = [i - medians[f] for f, i in enumerate(intensities)]
                adjusted[channel][field].setdefault((h, w),
                                                    (category, adj, row))
    return adjusted, remainder_medians


def method_2(photometries, minimum, num_frames):
    """Additive medians relative to frame 0
    (remainder_correction.py:102-135)."""
    adjusted, adjustments = MCsimlib._remainder_adjust(
        photometries, num_frames, minimum_r_per_field=minimum)
    return adjusted, adjustments


def method_3(photometries, minimum, num_frames):
    """Multiplicative frame-0-median ratio
    (remainder_correction.py:137-170)."""
    remainder_values = {}
    for channel, cdict in photometries.items():
        for field, fdict in cdict.items():
            for (h, w), (category, intensities, row) in fdict.items():
                if set(category) != {True}:
                    continue
                remainder_values.setdefault(channel, {}).setdefault(
                    field, [[] for _ in range(num_frames)])
                for frame, intensity in enumerate(intensities):
                    remainder_values[channel][field][frame].append(intensity)
    adjustments = {}
    for channel, cdict in remainder_values.items():
        for field, rl in cdict.items():
            if len(rl[0]) < minimum:
                continue
            medians = [np.median(r) for r in rl]
            adjustments.setdefault(channel, {}).setdefault(
                field, [medians[0] / float(m) for m in medians])
    adjusted = {}
    for channel, cdict in adjustments.items():
        adjusted.setdefault(channel, {})
        for field, adj in cdict.items():
            adjusted[channel].setdefault(field, {})
            for (h, w), (category, intensities,
                         row) in photometries[channel][field].items():
                a = [i * adj[f] for f, i in enumerate(intensities)]
                adjusted[channel][field].setdefault((h, w),
                                                    (category, a, row))
    return adjusted, adjustments


def main(argv=None):
    args = build_parser().parse_args(argv)
    csv_path = os.path.abspath(args.tracks[0])
    photometries, row_photometries = MCsimlib.read_track_photometries_csv(
        csv_path, head_truncate=0, tail_truncate=0, downstep_filtered=False)
    num_frames = len(row_photometries.popitem()[1][4])
    del row_photometries
    if args.method == 1:
        adjusted, adjustments = method_1(photometries, args.min, num_frames,
                                         args.M1_diff_median)
    elif args.method == 2:
        adjusted, adjustments = method_2(photometries, args.min, num_frames)
    elif args.method == 3:
        adjusted, adjustments = method_3(photometries, args.min, num_frames)
    elif args.method == 4:
        adjusted, adjustments = MCsimlib._remainder_adjust_2(
            photometries=photometries, num_frames=num_frames,
            minimum_r_per_field=args.min)
    else:
        raise ValueError("Unknown method.")
    if args.print_adjustments:
        print(adjustments)
    output_filepath = csv_path + "_adjusted.csv"
    if args.save_adjustments:
        with open(csv_path + "_adjustments.pkl", "wb") as f:
            pickle.dump(adjustments, f)
    with open(output_filepath, "w", newline="") as f:
        csv_writer = csv.writer(f)
        csv_writer.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY"] +
                            ["FRAME " + str(fr) for fr in range(num_frames)])
        for channel, cdict in adjusted.items():
            for field, fdict in cdict.items():
                for (h, w), entry in fdict.items():
                    category, adjusted_intensities = entry[0], entry[1]
                    row = [str(channel), str(field), str(h), str(w),
                           str(category)]
                    row += [str(i) for i in adjusted_intensities]
                    csv_writer.writerow(row)
    return output_filepath


if __name__ == "__main__":
    main()
