"""Average-voice target builder CLI (reference DiffVC/get_avg_mels.ipynb):
per-phoneme corpus statistics -> painted '_avgmel.npy' targets."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_speech.data.diffvc import build_average_mels

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True,
                    help="dataset dir with mels/ and textgrids/ subdirs")
    ap.add_argument("--avg-type", default="mode")
    args = ap.parse_args()
    modes = build_average_mels(args.data_dir, avg_type=args.avg_type)
    print(f"Built mels_{args.avg_type} for {len(modes)} phonemes.")
