"""End-to-end run_spiral.py CLI: pretrain writes the exp-manager artifacts
and a resumable checkpoint; test mode writes the WER number and the
per-utterance HTML diagnosis (reference spiral_pretrain.py:95-190 +
compute_wer.analyze)."""

import json
import re
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "cli"))

from tpu_speech.data.wav import write_wav

SR = 16000


def _make_corpus(root, n=40):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    entries = []
    words = ["hello", "world", "speech", "test", "audio"]
    for i in range(n):
        wav = (rng.standard_normal(int(SR * 0.6)) * 0.1).astype(np.float32)
        p = os.path.join(root, f"utt{i}.wav")
        write_wav(p, wav, SR)
        entries.append({
            "audio_filepath": p, "duration": 0.6,
            "text": " ".join(rng.choice(words, size=3)),
        })
    mpath = os.path.join(root, "manifest.json")
    with open(mpath, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return mpath


@pytest.mark.slow
def test_run_spiral_pretrain_and_test_mode(tmp_path):
    import run_spiral

    data = str(tmp_path / "data")
    _make_corpus(data)
    logs_pre = str(tmp_path / "logs_pre")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs_pre,
        "--model_type=st2vec",
        "--max_epochs=1",
    ])
    assert os.path.isdir(os.path.join(logs_pre, "ckpt"))
    assert os.path.exists(os.path.join(logs_pre, "env.json"))
    assert os.path.exists(os.path.join(logs_pre, "config.json"))
    assert os.path.exists(os.path.join(logs_pre, "train.log"))
    log_text = open(os.path.join(logs_pre, "train.log")).read()
    assert "Validation: loss =" in log_text  # validation loop ran
    # .nemo-analog archive written at train end and restorable
    from tpu_speech.utils.archive import load_archive

    arch = os.path.join(logs_pre, "st2vec_tiny.tpu_speech")
    assert os.path.exists(arch)
    cfg_dict, params, extra = load_archive(arch)
    assert "teacher" in extra and params

    logs_ft = str(tmp_path / "logs_ft")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs_ft,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
    ])
    html = os.path.join(logs_ft, "wer_diagnosis.html")
    assert os.path.exists(html)
    content = open(html).read()
    assert "WER =" in content and "<table>" in content


@pytest.mark.slow
def test_archive_restore_round_trip(tmp_path, capsys):
    """Train -> .tpu_speech archive -> restore via --init_archive in a FRESH
    run dir -> test-mode WER identical to the live training state (the
    reference's .nemo save/restore_from workflow, modelPT.py:~900-1268)."""
    import re

    import run_spiral

    data = str(tmp_path / "data")
    _make_corpus(data, n=16)
    logs_tr = str(tmp_path / "logs_train")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs_tr,
        "--model_type=ctc_finetune",
        "--max_epochs=1",
        "--resume_if_exists=false",
    ])
    arch = os.path.join(logs_tr, "ctc_tiny.tpu_speech")
    if not os.path.exists(arch):
        cand = [f for f in os.listdir(logs_tr) if f.endswith(".tpu_speech")]
        assert cand, os.listdir(logs_tr)
        arch = os.path.join(logs_tr, cand[0])

    def test_wer(argv):
        capsys.readouterr()
        run_spiral.main(argv)
        out = capsys.readouterr().out
        m = re.search(r"TEST: WER = ([\d.]+)", out)
        assert m, out
        return float(m.group(1)), out

    # live state: test mode resuming the training run's checkpoint
    wer_live, _ = test_wer([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs_tr,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=true",
    ])
    # shipped file: fresh run dir, no checkpoint, weights from the archive
    wer_arch, out = test_wer([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", str(tmp_path / "logs_fresh"),
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
        "--init_archive", arch,
    ])
    assert "Restored weights from archive" in out
    assert wer_arch == pytest.approx(wer_live)
    # random-init control: without the archive the WER differs (weights matter)
    wer_rand, _ = test_wer([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", str(tmp_path / "logs_rand"),
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
    ])
    assert wer_rand != pytest.approx(wer_live) or wer_live == 1.0


@pytest.mark.slow
def test_finetune_validate_and_transcribe(tmp_path):
    """Runner-level validate() (val WER logging) and transcribe() utility
    (ctc_finetune.py:135-170 / :440-460 roles)."""
    import run_spiral  # noqa: F401  (ensures cli on path)
    from importlib import import_module

    from tpu_speech.text.tokenizers import CharTokenizer
    from tpu_speech.train.spiral_runner import SpiralFinetuneRunner

    data = str(tmp_path / "data")
    mpath = _make_corpus(data, n=8)
    cfg = import_module("conf.spiral.spiral_tiny_test").cfg
    import copy

    cfg = copy.deepcopy(cfg)
    for ds in (cfg.model.train_ds, cfg.model.validation_ds, cfg.model.test_ds):
        ds.manifest_filepath = mpath
    runner = SpiralFinetuneRunner(
        cfg, str(tmp_path / "logs"), CharTokenizer(cfg.model.labels)
    )
    results = runner.validate()
    assert np.isfinite(results["wer"]) and results["n"] == 8
    log_text = open(os.path.join(str(tmp_path / "logs"), "train.log")).read()
    assert "Validation: WER =" in log_text

    wavs = [os.path.join(data, f"utt{i}.wav") for i in range(3)]
    texts = runner.transcribe(wavs, batch_size=2)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)

    # long audio: > max_duration goes down the chunked-stitch path (the
    # reference truncates); order must be preserved vs the short files
    long_wav = (np.random.default_rng(1).standard_normal(
        int(SR * 2.5)) * 0.1).astype(np.float32)
    long_path = os.path.join(data, "long.wav")
    write_wav(long_path, long_wav, SR)
    mixed = [wavs[0], long_path, wavs[1]]
    texts2 = runner.transcribe(mixed, batch_size=2, overlap_s=0.3)
    assert len(texts2) == 3
    assert texts2[0] == texts[0] and texts2[2] == texts[1]
    assert isinstance(texts2[1], str)


@pytest.mark.slow
def test_run_spiral_export_model(tmp_path):
    import run_spiral

    from tpu_speech.utils.export import load_exported

    data = str(tmp_path / "data")
    _make_corpus(data, n=8)
    logs = str(tmp_path / "logs")
    exported = str(tmp_path / "model.stablehlo")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
        "--export_model", exported,
    ])
    assert os.path.exists(exported)
    art = load_exported(exported)
    assert art is not None


@pytest.mark.slow
def test_run_spiral_yaml_config_and_set_overrides(tmp_path):
    """YAML experiment file (base module + nested overrides) and --set dotted
    overrides through the CLI (reference legacy hydra path,
    run_spiral.py:113-131)."""
    import run_spiral

    data = str(tmp_path / "data")
    _make_corpus(data, n=8)
    yaml_path = str(tmp_path / "exp.yaml")
    with open(yaml_path, "w") as f:
        f.write(
            "base: spiral_tiny_test\n"
            "trainer:\n"
            "  log_every_n_steps: 1\n"
            "model:\n"
            "  optim:\n"
            "    lr: 0.0005\n"
        )
    logs = str(tmp_path / "logs_yaml")
    run_spiral.main([
        f"--config_name={yaml_path}",
        "--manifest_dir", data,
        "--model_save_dir", logs,
        "--model_type=st2vec",
        "--max_epochs=1",
        "--set", "trainer.max_steps=2",
        "--set", "model.optim.sched.warmup_steps=1",
    ])
    assert os.path.isdir(os.path.join(logs, "ckpt"))
    cfg_saved = json.load(open(os.path.join(logs, "config.json")))
    assert cfg_saved["model"]["optim"]["lr"] == 0.0005  # yaml override landed
    assert cfg_saved["trainer"]["max_steps"] == 2       # --set landed
    # struct-mode: bad --set key fails fast
    with pytest.raises(KeyError, match="no_such_key"):
        run_spiral.main([
            f"--config_name={yaml_path}",
            "--manifest_dir", data,
            "--model_save_dir", str(tmp_path / "x"),
            "--model_type=st2vec",
            "--set", "trainer.no_such_key=1",
        ])


@pytest.mark.slow
def test_run_spiral_pretrain_fsdp(tmp_path):
    """--fsdp: ZeRO-3-style state sharding wired through the runner — one
    pretrain epoch trains, checkpoints, and resumes under sharded placement."""
    import run_spiral

    data = str(tmp_path / "data")
    _make_corpus(data, n=16)
    logs = str(tmp_path / "logs_fsdp")
    argv = [
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs,
        "--model_type=st2vec",
        "--max_epochs=1",
        "--fsdp=true",
    ]
    run_spiral.main(argv)
    assert os.path.isdir(os.path.join(logs, "ckpt"))
    # resume path re-places the restored state with the fsdp shardings
    run_spiral.main(argv)
    log_text = open(os.path.join(logs, "train.log")).read()
    assert "loss" in log_text


@pytest.mark.slow
def test_run_spiral_finetune_bucketed(tmp_path):
    """model.train_ds.num_buckets=2: duration-bucketed CTC finetune trains
    with per-bucket static shapes (two compiled programs) and finishes an
    epoch + checkpoint."""
    import run_spiral

    data = str(tmp_path / "data")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "speech", "test", "audio"]
    entries = []
    for i in range(64):
        dur = 0.3 if i % 2 == 0 else 0.9  # two distinct duration buckets
        wav = (rng.standard_normal(int(SR * dur)) * 0.1).astype(np.float32)
        p = os.path.join(data, f"utt{i}.wav")
        write_wav(p, wav, SR)
        entries.append({
            "audio_filepath": p, "duration": dur,
            "text": " ".join(rng.choice(words, size=2)),
        })
    with open(os.path.join(data, "manifest.json"), "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    logs = str(tmp_path / "logs_bucketed")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs,
        "--model_type=ctc_finetune",
        "--max_epochs=1",
        "--resume_if_exists=false",
        "--set", "model.train_ds.num_buckets=2",
    ])
    log_text = open(os.path.join(logs, "train.log")).read()
    m = re.search(r"ctc loss = ([-\d.a-z]+)", log_text)
    assert m, log_text
    assert np.isfinite(float(m.group(1))), log_text  # steps actually ran
    assert os.path.isdir(os.path.join(logs, "ckpt"))


@pytest.mark.slow
def test_run_spiral_test_mode_beam_lm(tmp_path):
    """--beam_size + --lm_manifest: test mode decodes via prefix beam search
    with a native n-gram LM fused (beyond-reference decode path)."""
    import run_spiral

    data = str(tmp_path / "data")
    mpath = _make_corpus(data, n=12)
    logs = str(tmp_path / "logs_beam")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
        "--beam_size=4",
        "--lm_manifest", mpath,
        "--lm_alpha=0.3",
    ])
    assert os.path.exists(os.path.join(logs, "wer_diagnosis.html"))


@pytest.mark.slow
def test_run_spiral_finetune_tarred(tmp_path):
    """model.train_ds.tarred_audio_filepaths: the CTC finetune trains from
    tar shards (the reference's TarredAudioToCharDataset path,
    audio_to_text.py:798+)."""
    import tarfile

    import run_spiral

    data = str(tmp_path / "data")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "speech", "test", "audio"]
    shard_paths = [os.path.join(data, f"shard_{i}.tar") for i in range(2)]
    tars = [tarfile.open(p, "w") for p in shard_paths]
    entries = []
    for i in range(48):
        wav = (rng.standard_normal(int(SR * 0.6)) * 0.1).astype(np.float32)
        p = os.path.join(data, f"utt{i}.wav")
        write_wav(p, wav, SR)
        tars[i % 2].add(p, arcname=f"utt{i}.wav")
        entries.append({
            "audio_filepath": p, "duration": 0.6,
            "text": " ".join(rng.choice(words, size=2)),
        })
    for t in tars:
        t.close()
    with open(os.path.join(data, "manifest.json"), "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    logs = str(tmp_path / "logs_tar")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs,
        "--model_type=ctc_finetune",
        "--max_epochs=1",
        "--resume_if_exists=false",
        "--set",
        "model.train_ds.tarred_audio_filepaths=" + ",".join(shard_paths),
    ])
    log_text = open(os.path.join(logs, "train.log")).read()
    m = re.search(r"ctc loss = ([-\d.a-z]+)", log_text)
    assert m and np.isfinite(float(m.group(1))), log_text
