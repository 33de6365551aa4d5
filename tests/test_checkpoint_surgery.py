"""Checkpoint surgery (--init_model_partial / --load_model_skip_var /
--use_chkpt_hparams) and the full reference run_spiral.py flag surface
(reference SPIRAL/run_spiral.py:25-54: every flag must parse)."""

import json
import os
import re
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "cli"))

from tpu_speech.utils.surgery import (  # noqa: E402
    flatten_paths,
    merge_params,
    parse_skip_vars,
    unflatten_paths,
)


def _tree(scale=1.0, extra=False, reshaped=False):
    t = {
        "encoder": {
            "conv": {"kernel": np.full((3, 4), scale, np.float32),
                     "bias": np.full((4,), scale, np.float32)},
            "norm": {"scale": np.full((4,), scale, np.float32)},
        },
        "decoder": {"proj": {"kernel": np.full((4, 7), scale, np.float32)}},
    }
    if extra:
        t["quantizer"] = {"codebook": np.zeros((2, 2), np.float32)}
    if reshaped:
        t["decoder"]["proj"]["kernel"] = np.full((4, 9), scale, np.float32)
    return t


def test_flatten_unflatten_roundtrip():
    t = _tree()
    flat = flatten_paths(t)
    assert "encoder/conv/kernel" in flat and "decoder/proj/kernel" in flat
    rebuilt = unflatten_paths(flat)
    assert json.dumps(sorted(flatten_paths(rebuilt))) == json.dumps(sorted(flat))


def test_merge_strict_full_load():
    merged, report = merge_params(_tree(1.0), _tree(2.0))
    assert len(report.loaded) == 4 and not report.missing
    assert float(np.asarray(merged["encoder"]["conv"]["bias"])[0]) == 2.0


def test_merge_strict_fails_on_missing_and_mismatch():
    src = _tree(2.0)
    del src["decoder"]
    with pytest.raises(ValueError, match="strict checkpoint load"):
        merge_params(_tree(1.0), src)
    with pytest.raises(ValueError, match="strict checkpoint load"):
        merge_params(_tree(1.0), _tree(2.0, reshaped=True))


def test_merge_partial_keeps_init_for_missing_and_mismatched():
    src = _tree(2.0, extra=True, reshaped=True)
    del src["encoder"]["norm"]
    merged, report = merge_params(_tree(1.0), src, partial=True)
    # loaded: conv kernel+bias; missing: norm/scale; mismatched: proj kernel
    assert sorted(report.loaded) == [
        "encoder/conv/bias", "encoder/conv/kernel"]
    assert report.missing == ["encoder/norm/scale"]
    assert len(report.mismatched) == 1
    assert report.unexpected == ["quantizer/codebook"]
    assert float(np.asarray(merged["encoder"]["norm"]["scale"])[0]) == 1.0
    assert float(np.asarray(merged["decoder"]["proj"]["kernel"])[0, 0]) == 1.0
    assert float(np.asarray(merged["encoder"]["conv"]["kernel"])[0, 0]) == 2.0


def test_merge_skip_vars():
    merged, report = merge_params(
        _tree(1.0), _tree(2.0), skip=parse_skip_vars("decoder, norm")
    )
    assert sorted(report.skipped) == [
        "decoder/proj/kernel", "encoder/norm/scale"]
    assert float(np.asarray(merged["decoder"]["proj"]["kernel"])[0, 0]) == 1.0
    assert float(np.asarray(merged["encoder"]["conv"]["kernel"])[0, 0]) == 2.0


def test_archive_config_object_roundtrip():
    """_to_jsonable tags every dataclass level; config_object rebuilds the
    exact dataclass composition (the --use_chkpt_hparams load path)."""
    import copy
    from importlib import import_module

    from tpu_speech.utils.archive import _to_jsonable, config_object

    cfg = copy.deepcopy(import_module("conf.spiral.spiral_tiny_test").cfg)
    blob = json.loads(json.dumps(_to_jsonable(cfg)))
    rebuilt = config_object(blob)
    assert type(rebuilt) is type(cfg)
    assert type(rebuilt.model) is type(cfg.model)
    assert type(rebuilt.model.encoder) is type(cfg.model.encoder)
    assert rebuilt.model.optim.lr == cfg.model.optim.lr
    assert rebuilt.trainer.max_epochs == cfg.trainer.max_epochs


def test_reference_flag_surface_parses():
    """Every flag of the reference launcher (SPIRAL/run_spiral.py:28-54)
    parses here — a reference launch script does not die in argparse."""
    import run_spiral

    parser = run_spiral.build_parser()
    args = parser.parse_args([
        "--data_dir=/d", "--manifest_dir=/m", "--model_save_dir=/s",
        "--tensorboard_dir=/tb", "--log_dir=/l", "--chkpt_dir=/c",
        "--config_path=conf/spiral", "--config_name=spiral_tiny_test",
        "--structured_config=true", "--num_gpus=8", "--num_nodes=2",
        "--use_horovod=false", "--resume_if_exists=true",
        "--run_mode=test", "--test_mode=multi_gpu",
        "--init_chkpt_dir=/i", "--init_chkpt_file=x.ckpt",
        "--init_model_partial=true", "--use_chkpt_hparams=false",
        "--load_model_skip_var=decoder",
        "--test_manifest=/t.json", "--model_type=ctc_finetune",
        "--finetune_from_scratch=false", "--dev_data_dup_factor=2",
        "--use_teacher_encoder=true", "--save_logits=true",
    ])
    assert args.num_gpus == 8 and args.init_model_partial is True
    assert args.load_model_skip_var == "decoder"
    assert args.test_mode == "multi_gpu" and args.chkpt_dir == "/c"


def test_get_ckpt_path_glob(tmp_path):
    import run_spiral

    d = tmp_path / "ck"
    d.mkdir()
    (d / "step_0000000005").mkdir()
    assert run_spiral.get_ckpt_path(str(d), "step_*").endswith(
        "step_0000000005")
    (d / "step_0000000009").mkdir()
    with pytest.raises(ValueError, match="expect 1 ckpt"):
        run_spiral.get_ckpt_path(str(d), "step_*")
    # non-glob passes through untouched
    assert run_spiral.get_ckpt_path(str(d), "x.ckpt") == str(d / "x.ckpt")


SR = 16000


def _make_corpus(root, n=12):
    from tpu_speech.data.wav import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "speech", "test", "audio"]
    entries = []
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
def test_cli_surgery_end_to_end(tmp_path, capsys):
    """Train tiny CTC -> archive + step checkpoint; then through the CLI:
    (a) test-mode --init_chkpt_dir/--init_chkpt_file glob load reproduces
        the resume-based WER (reference spiral_pretrain.py:117-121),
    (b) --load_model_skip_var=decoder keeps the decoder at fresh init,
    (c) --use_chkpt_hparams rebuilds cfg.model from the archive config,
    (d) --num_gpus / --test_mode / --use_horovod / --chkpt_dir are live."""
    import run_spiral

    data = str(tmp_path / "data")
    _make_corpus(data)
    logs_tr = str(tmp_path / "logs_train")
    ckpt_dir = str(tmp_path / "relocated_ckpt")
    run_spiral.main([
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_save_dir", logs_tr,
        "--chkpt_dir", ckpt_dir,
        "--model_type=ctc_finetune",
        "--max_epochs=1",
        "--resume_if_exists=false",
        "--num_gpus=1",
        "--use_horovod=false",
        "--test_mode=multi_gpu",
    ])
    # --chkpt_dir relocated the checkpoints away from the run dir
    assert any(d.startswith("step_") for d in os.listdir(ckpt_dir))
    assert not os.path.isdir(os.path.join(logs_tr, "ckpt")) or not os.listdir(
        os.path.join(logs_tr, "ckpt"))
    arch = [f for f in os.listdir(logs_tr) if f.endswith(".tpu_speech")]
    assert arch
    arch = os.path.join(logs_tr, arch[0])

    def run_test(argv):
        capsys.readouterr()
        run_spiral.main(argv)
        out = capsys.readouterr().out
        m = re.search(r"TEST: WER = ([\d.]+)", out)
        assert m, out
        return float(m.group(1)), out

    base = [
        "--config_name=spiral_tiny_test",
        "--manifest_dir", data,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
    ]
    # (a) full-model load from the relocated step checkpoint, via glob
    wer_ckpt, out = run_test(base + [
        "--model_save_dir", str(tmp_path / "logs_a"),
        "--init_chkpt_dir", ckpt_dir,
        "--init_chkpt_file", "step_*",
    ])
    assert "Loaded test-mode weights from" in out
    wer_arch, _ = run_test(base + [
        "--model_save_dir", str(tmp_path / "logs_b"),
        "--init_archive", arch,
    ])
    assert wer_ckpt == pytest.approx(wer_arch)

    # (b) skip-var surgery: decoder stays at init -> report says so
    _, out = run_test(base + [
        "--model_save_dir", str(tmp_path / "logs_c"),
        "--init_archive", arch,
        "--load_model_skip_var=decoder",
    ])
    m = re.search(r"archive restore: loaded (\d+) vars, skipped (\d+)", out)
    assert m and int(m.group(2)) > 0, out

    # (c) hparams from the archive config
    _, out = run_test(base + [
        "--model_save_dir", str(tmp_path / "logs_d"),
        "--init_archive", arch,
        "--use_chkpt_hparams=true",
    ])
    assert "model hparams taken from archive config" in out

    # (d) partial load tolerates a checkpoint with missing leaves
    _, out = run_test(base + [
        "--model_save_dir", str(tmp_path / "logs_e"),
        "--init_archive", arch,
        "--init_model_partial=true",
    ])
    assert "archive restore: loaded" in out
