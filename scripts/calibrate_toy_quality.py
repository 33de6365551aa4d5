"""Calibrate the trains-to-quality WER gates at a given toy-corpus scale.

Round-4 verdict: the toy finetune WER trajectory is chaotic at 120 train
utterances x 25 finetune epochs (a 1e-7 perturbation moves WER within
~[0.02, 0.45]), forcing weak gates (sanity cap 0.55). This script measures
the WER bands at a LARGER scale so tests/test_spiral_quality.py can
tighten its gates with committed calibration evidence (round-5 item 4).

For each perturbation (base, lr*(1+1e-6)) it runs the real CLI flows:
pretrain -> finetune(pretrained) -> test, and finetune(scratch) -> test,
printing a JSON line per arm. Usage:

    python scripts/calibrate_toy_quality.py --utts 360 --ft-epochs 40 \
        --pre-epochs 60 --out /tmp/calib

Run on the CPU backend (JAX_PLATFORMS=cpu, the test-suite bootstrap) —
this is a learning-dynamics measurement, not a perf one.
"""

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "cli"))

# force the CPU backend BEFORE backend init: the dev harness's
# sitecustomize re-prepends its chip platform over JAX_PLATFORMS (same
# bootstrap note as __graft_entry__._reexec_dryrun), and this measurement
# must not fight chip jobs for the tunnel
os.environ.setdefault("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _run(argv):
    import run_spiral

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_spiral.main(argv)
    return buf.getvalue()


def _test_wer(out):
    m = re.search(r"TEST: WER = ([\d.]+)", out)
    assert m, out[-2000:]
    return float(m.group(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=360)
    ap.add_argument("--test-utts", type=int, default=48)
    ap.add_argument("--pre-epochs", type=int, default=60)
    ap.add_argument("--ft-epochs", type=int, default=40)
    ap.add_argument("--out", default="/tmp/toy_quality_calib")
    ap.add_argument("--perturbations", type=int, default=2,
                    help="arms per condition: base + (n-1) lr*(1+k*1e-6)")
    args = ap.parse_args()

    from tests.toy_corpus import make_toy_corpus

    os.makedirs(args.out, exist_ok=True)
    train_manifest = make_toy_corpus(
        os.path.join(args.out, "train"), args.utts, seed=0, name="train.json")
    test_manifest = make_toy_corpus(
        os.path.join(args.out, "test"), args.test_utts, seed=1,
        name="test.json")
    sets = [
        "--set", f"model.train_ds.manifest_filepath={train_manifest}",
        "--set", f"model.validation_ds.manifest_filepath={test_manifest}",
        "--set", f"model.test_ds.manifest_filepath={test_manifest}",
    ]

    results = []

    def emit(rec):
        rec["utts"] = args.utts
        rec["ft_epochs"] = args.ft_epochs
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(os.path.join(args.out, "calib.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    for p in range(args.perturbations):
        tag = "base" if p == 0 else f"lr1p{p}e-6"
        lr_sets = [] if p == 0 else [
            "--set", f"model.optim.lr={2e-3 * (1.0 + p * 1e-6):.10g}",
        ]
        logs_pre = os.path.join(args.out, f"pre_{tag}")
        t0 = time.time()
        _run([
            "--config_name=spiral_toy_quality",
            "--model_save_dir", logs_pre,
            "--model_type=st2vec",
            f"--max_epochs={args.pre_epochs}",
            "--resume_if_exists=false",
        ] + sets + lr_sets)
        pre_s = time.time() - t0
        ck = os.path.join(logs_pre, "ckpt")
        step_dir = sorted(os.listdir(ck))[-1]

        for scratch in (False, True):
            name = f"{'scratch' if scratch else 'pretrained'}_{tag}"
            logs_ft = os.path.join(args.out, f"ft_{name}")
            init = (["--finetune_from_scratch=true"] if scratch else
                    ["--init_chkpt_dir", ck, "--init_chkpt_file", step_dir,
                     "--use_teacher_encoder", "true"])
            t0 = time.time()
            _run([
                "--config_name=spiral_toy_quality",
                "--model_save_dir", logs_ft,
                "--model_type=ctc_finetune",
                f"--max_epochs={args.ft_epochs}",
                "--resume_if_exists=false",
            ] + init + sets + lr_sets)
            out = _run([
                "--config_name=spiral_toy_quality",
                "--model_save_dir", logs_ft,
                "--model_type=ctc_finetune",
                "--run_mode=test",
                "--resume_if_exists=true",
            ] + sets)
            emit({
                "arm": name, "wer": _test_wer(out),
                "pretrain_s": round(pre_s, 1),
                "finetune_s": round(time.time() - t0, 1),
            })

    by = {r["arm"]: r["wer"] for r in results}
    pre = [v for k, v in by.items() if k.startswith("pretrained")]
    scr = [v for k, v in by.items() if k.startswith("scratch")]
    print(json.dumps({
        "summary": {
            "pretrained_band": [min(pre), max(pre)],
            "scratch_band": [min(scr), max(scr)],
            "worst_gap": min(scr) - max(pre),
            "worst_ratio": max(pre) / max(min(scr), 1e-9),
        }
    }, indent=1))


if __name__ == "__main__":
    main()
