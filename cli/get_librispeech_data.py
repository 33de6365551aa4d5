"""LibriSpeech data preparation (reference: SPIRAL/scripts/
get_librispeech_data.py): download (optional) -> flac->wav -> JSON manifest.

Without network access, point --data_root at an existing extracted
LibriSpeech tree and this builds wavs + manifests only."""

import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

URLS = {
    "dev-clean": "https://www.openslr.org/resources/12/dev-clean.tar.gz",
    "dev-other": "https://www.openslr.org/resources/12/dev-other.tar.gz",
    "test-clean": "https://www.openslr.org/resources/12/test-clean.tar.gz",
    "test-other": "https://www.openslr.org/resources/12/test-other.tar.gz",
    "train-clean-100": "https://www.openslr.org/resources/12/train-clean-100.tar.gz",
    "train-clean-360": "https://www.openslr.org/resources/12/train-clean-360.tar.gz",
    "train-other-500": "https://www.openslr.org/resources/12/train-other-500.tar.gz",
}


def maybe_download(url, dest):
    if os.path.exists(dest):
        return dest
    print(f"downloading {url} ...")
    subprocess.run(["wget", "-q", "-O", dest, url], check=True)
    return dest


def flac_to_wav(flac_path, wav_path):
    """Decode FLAC to 16-bit wav (shared host decode chain, data/wav.py)."""
    from tpu_speech.data.wav import decode_to_wav

    return decode_to_wav(flac_path, wav_path)


def build_manifest(split_dir, wav_dir, manifest_path, sample_rate=16000):
    import scipy.io.wavfile

    entries = []
    for trans in sorted(
        glob.glob(os.path.join(split_dir, "*", "*", "*.trans.txt"))
    ):
        with open(trans) as f:
            for line in f:
                utt_id, text = line.strip().split(" ", 1)
                flac = os.path.join(os.path.dirname(trans), utt_id + ".flac")
                wav = os.path.join(wav_dir, utt_id + ".wav")
                if not os.path.exists(wav):
                    if not flac_to_wav(flac, wav):
                        continue
                sr, data = scipy.io.wavfile.read(wav)
                entries.append(
                    {
                        "audio_filepath": os.path.abspath(wav),
                        "duration": len(data) / sr,
                        "text": text.lower(),
                    }
                )
    with open(manifest_path, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    print(f"{manifest_path}: {len(entries)} utterances")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--data_sets", default="dev-clean")
    ap.add_argument("--manifest_dir", default=None)
    ap.add_argument("--download", action="store_true")
    args = ap.parse_args()

    manifest_dir = args.manifest_dir or os.path.join(args.data_root, "manifest_json")
    os.makedirs(manifest_dir, exist_ok=True)

    for split in args.data_sets.split(","):
        split = split.strip()
        if args.download:
            tar = maybe_download(
                URLS[split], os.path.join(args.data_root, f"{split}.tar.gz")
            )
            subprocess.run(
                ["tar", "-xzf", tar, "-C", args.data_root], check=True
            )
        split_dir = os.path.join(args.data_root, "LibriSpeech", split)
        wav_dir = os.path.join(args.data_root, "wavs", split)
        os.makedirs(wav_dir, exist_ok=True)
        build_manifest(
            split_dir, wav_dir,
            os.path.join(manifest_dir, f"librivox-{split}.json"),
        )


if __name__ == "__main__":
    main()
