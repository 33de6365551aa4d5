"""Regenerate the README benchmark table from a committed BENCH_FULL JSON.

Every performance number in README.md must be mechanically reproducible:
`python bench.py --all --out=BENCH_FULL_rNN.json` writes the sweep, this
script renders it. Usage:

    python scripts/gen_bench_table.py BENCH_FULL_r03.json [--update-readme]

--update-readme replaces the block between the markers
`<!-- BENCH_TABLE_START -->` and `<!-- BENCH_TABLE_END -->` in README.md.
"""

import json
import re
import subprocess
import sys

# files whose changes invalidate a bench artifact (the measured code paths);
# doc/test/artifact-only commits do not
CODE_PATHS = ["tpu_speech", "cli", "native", "bench.py"]


def check_sha(data: dict, path: str) -> None:
    """Refuse to render a table for an artifact that does not measure the
    current compute-path code (rounds 3/4 both shipped stale artifacts).
    Override with --force for explicitly-historical tables."""
    sha = data.get("git_sha")
    if not sha:
        print(
            f"WARNING: {path} carries no git_sha stamp (pre-round-5 "
            "artifact) — cannot prove it measures HEAD",
            file=sys.stderr,
        )
        return
    if data.get("git_dirty"):
        print(
            f"WARNING: {path} was produced from a DIRTY tree at {sha[:9]}",
            file=sys.stderr,
        )
    diff = subprocess.run(
        ["git", "diff", "--name-only", sha, "HEAD", "--", *CODE_PATHS],
        capture_output=True, text=True,
    )
    if diff.returncode != 0:
        print(
            f"WARNING: cannot diff artifact sha {sha[:9]} against HEAD "
            f"({diff.stderr.strip()})",
            file=sys.stderr,
        )
        return
    changed = diff.stdout.strip()
    if changed and "--force" not in sys.argv:
        raise SystemExit(
            f"{path} was produced at {sha[:9]} but compute-path files "
            f"changed since:\n{changed}\n"
            "Re-run `python bench.py --all --out=...` at HEAD (or pass "
            "--force for an explicitly historical table)."
        )

DESCRIPTIONS = {
    "gradtts_e2e_wav_rtf_10step":
        "Grad-TTS end-to-end text->**waveform** RTF, 10-step SDE + HiFi-GAN",
    "gradtts_e2e_wav_rtf_10step_bf16": "… same, bf16 weights/activations",
    "gradtts_rtf_10step": "Grad-TTS mel-only RTF (reference formula)",
    "gradtts_e2e_wav_rtf_dpm6": "e2e RTF, DPM-Solver++(2M), 6 calls",
    "gradtts_e2e_throughput_b16": "serving throughput, batch 16",
    "hifigan_throughput_b16": "HiFi-GAN vocoder-only throughput, batch 16",
    "gradtts_train_step_ms_fp32": "Grad-TTS train step (recipe point)",
    "gradtts_train_step_ms_bf16": "… bf16",
    "spiral_step_ms_fp32": "SPIRAL-base pretrain step (B=24, 250k crops)",
    "spiral_step_ms_bf16": "… bf16",
    "ctc_finetune_step_ms_pad24": "CTC finetune step, B=14, 24 s pad",
    "ctc_finetune_step_ms_bucket13s": "… duration-bucketed ~13 s",
    "ctc_finetune_step_ms_pad24_bf16": "… 24 s pad, bf16",
    "diffvc_conversion_rtf_30step": "DiffVC 30-step `ml` conversion RTF",
    "diffvc_conversion_rtf_30step_bf16": "… bf16 serving (fp32 gates apply)",
    "diffvc_conversion_rtf_dpm6":
        "DiffVC DPM-Solver++(2M) conversion RTF, 6 calls",
    "spiral_streaming_chunk_ms": "streaming ASR per-chunk latency (1.28 s)",
    "spiral_input_pipeline_efficiency":
        "loader-fed vs pre-staged step-rate ratio",
}


def _render_vs(r: dict) -> str:
    """Render vs_baseline HONESTLY per baseline_kind.

    `steps_per_sec`-kind records carry vs_baseline = 1000/ms — a RATE, not a
    speedup ratio; `estimate`/`north_star_target` comparisons must say what
    the denominator is so they never read as measured-baseline claims
    (round-3 verdict: "0.35x" and "21.27x" both read as claims they aren't).
    """
    vs = r["vs_baseline"]
    kind = r.get("baseline_kind", "")
    if kind == "steps_per_sec":
        return f"{vs:.2f} steps/s (no published baseline)"
    if kind == "estimate":
        return f"{vs:.2f}x vs A100-class *estimate*"
    if kind == "north_star_target":
        # the 0.02 RTF north star is defined for Grad-TTS serving
        # (BASELINE.md); for other metrics it is only an informational yard
        if r["metric"].startswith("gradtts"):
            return f"{vs:.2f}x vs 0.02-RTF target"
        return f"{vs:.2f}x vs 0.02-RTF yardstick (informational)"
    if kind == "vendored_readme_v100":
        return f"{vs:.2f}x vs 167x-realtime V100 claim"
    if kind == "realtime_budget":
        return f"{vs:.0f}x faster than realtime"
    if kind.startswith("gate"):
        return f"{vs:.2f}x vs gate"
    return f"{vs:.2f}x ({kind})"


def render(path: str) -> str:
    with open(path) as f:
        data = json.load(f)
    check_sha(data, path)
    sha = data.get("git_sha")
    lines = [
        f"Measured on 1x {data.get('device', '?')} "
        f"(`python bench.py --all --out={path}`"
        + (f" at `{sha[:9]}`" if sha else "")
        + "; `chain` = iterations amortized per dispatch, `mfu` vs the "
        "chip's bf16 peak):",
        "",
        "| metric | value | vs baseline | MFU | notes |",
        "|---|---|---|---|---|",
    ]
    for r in data["records"]:
        if "error" in r:
            lines.append(f"| `{r['metric']}` | ERROR | | | {r['error'][:60]} |")
            continue
        val = f"{r['value']:.4g} {r['unit']}"
        vs = _render_vs(r)
        mfu = f"{r['mfu']*100:.1f}%" if "mfu" in r else ""
        notes = DESCRIPTIONS.get(r["metric"], "")
        if "chain" in r:
            notes += f" [chain {r['chain']}]"
        if "host_efficiency" in r:
            notes += (
                f" — host-side gate {r['host_efficiency']:.3f} "
                f"(host {r['host_ms']:.0f} ms vs step "
                f"{r['prestaged_step_ms']:.0f} ms); raw ratio is bounded by "
                f"the dev tunnel's {r['h2d_mbps']:.0f} MB/s H2D vs the "
                f"{r['required_mbps']:.0f} MB/s the payload needs"
            )
        lines.append(f"| `{r['metric']}` | {val} | {vs} | {mfu} | {notes} |")
    return "\n".join(lines)


def main():
    path = sys.argv[1]
    table = render(path)
    if "--update-readme" in sys.argv:
        readme = open("README.md").read()
        new = re.sub(
            r"(<!-- BENCH_TABLE_START -->\n).*?(\n<!-- BENCH_TABLE_END -->)",
            r"\1" + table.replace("\\", "\\\\") + r"\2",
            readme, flags=re.S,
        )
        if new == readme and "<!-- BENCH_TABLE_START -->" not in readme:
            raise SystemExit("README.md lacks BENCH_TABLE_START/END markers")
        open("README.md", "w").write(new)
        print("README.md updated")
    else:
        print(table)


if __name__ == "__main__":
    main()
