"""GE2E speaker-encoder training CLI (reference:
DiffVC/speaker_encoder/encoder/train.py driven by the RTVC encoder_train
surface): per-speaker directories of preprocessed mel-frame ``.npy`` files ->
GE2E loss with EER logging, periodic embedding-projection images, and
checkpoint/resume."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_speech.train.speaker_encoder import train_speaker_encoder


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_id", help="name for this training run")
    ap.add_argument(
        "clean_data_root",
        help="directory of preprocessed per-speaker directories of .npy mel frames",
    )
    ap.add_argument("-m", "--models_dir", default="saved_models")
    ap.add_argument("-u", "--umap_every", type=int, default=100,
                    help="steps between embedding-projection images (0 off)")
    ap.add_argument("-s", "--save_every", type=int, default=500)
    ap.add_argument("-b", "--backup_every", type=int, default=7500)
    ap.add_argument("-v", "--vis_every", type=int, default=10)
    ap.add_argument("-f", "--force_restart", action="store_true",
                    help="do not resume from an existing checkpoint")
    ap.add_argument("--speakers_per_batch", type=int, default=64)
    ap.add_argument("--utterances_per_speaker", type=int, default=10)
    ap.add_argument("--n_frames", type=int, default=160)
    ap.add_argument("--max_steps", type=int, default=1_000_000)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args(argv)

    train_speaker_encoder(
        clean_data_root=args.clean_data_root,
        models_dir=args.models_dir,
        run_id=args.run_id,
        speakers_per_batch=args.speakers_per_batch,
        utterances_per_speaker=args.utterances_per_speaker,
        n_frames=args.n_frames,
        learning_rate=args.lr,
        max_steps=args.max_steps,
        vis_every=args.vis_every,
        umap_every=args.umap_every,
        save_every=args.save_every,
        backup_every=args.backup_every,
        force_restart=args.force_restart,
    )


if __name__ == "__main__":
    main()
