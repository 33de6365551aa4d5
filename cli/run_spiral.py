"""SPIRAL launcher (same surface as the reference SPIRAL/run_spiral.py:25-167):
python config modules as structured experiment files, CLI overrides, dispatch
to pretrain / finetune train / test."""

import argparse
import dataclasses
import os
import sys
from importlib import import_module

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def str2bool(v):
    return str(v).lower() in ("true", "1", "yes")


def get_ckpt_path(ckpt_dir, ckpt_name):
    """Resolve a checkpoint name inside a dir; a '*' glob must match exactly
    one path (reference run_spiral.py:137-145)."""
    import glob

    path = os.path.join(ckpt_dir, ckpt_name)
    if "*" not in path:
        return path
    matches = glob.glob(path)
    if len(matches) != 1:
        raise ValueError(f"expect 1 ckpt file, but got {len(matches)}")
    return matches[0]


def build_parser():
    parser = argparse.ArgumentParser(
        description="Run training",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--data_dir", type=str, default="", help="Dataset Path")
    parser.add_argument("--manifest_dir", type=str, default="")
    parser.add_argument("--model_save_dir", type=str, default="",
                        help="model save dir (falls back to --log_dir, "
                        "then logs/spiral)")
    parser.add_argument("--tensorboard_dir", type=str, default="",
                        help="tensorboard dir (reference run_spiral.py:31); "
                        "default: inside the run dir")
    parser.add_argument("--log_dir", type=str, default="",
                        help="log dir (reference run_spiral.py:32); used as "
                        "the run dir when --model_save_dir is unset")
    parser.add_argument("--chkpt_dir", type=str, default="",
                        help="checkpoint dir (reference run_spiral.py:33); "
                        "default: <run dir>/ckpt")
    parser.add_argument("--config_path", type=str, default="conf/spiral")
    parser.add_argument("--config_name", type=str, required=True)
    parser.add_argument("--structured_config", type=str2bool, default=True,
                        help="true: python dataclass experiment module "
                        "(reference run_spiral.py:62-109); false: YAML "
                        "experiment file (the legacy hydra path analog, "
                        ":113-131)")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="devices to use (0 = all; single-host only)")
    parser.add_argument("--num_gpus", type=int, default=0,
                        help="reference alias of --num_devices "
                        "(run_spiral.py:36: device count, nothing "
                        "GPU-specific here)")
    parser.add_argument("--use_horovod", type=str2bool, default=False,
                        help="accepted for launch-script parity "
                        "(run_spiral.py:38); XLA collectives are the only "
                        "backend, so this warns and is otherwise a no-op "
                        "(SURVEY.md §2.5)")
    parser.add_argument("--test_mode", type=str, default="multi_gpu",
                        help="accepted for parity; the reference parses "
                        "this and never consumes it (run_spiral.py:42)")
    parser.add_argument("--seq_parallel", type=int, default=0,
                        help="shard the time axis of activations over a "
                        "'seq' mesh axis of this size (long-crop memory "
                        "scaling; devices must be divisible)")
    parser.add_argument("--fsdp", type=str2bool, default=False,
                        help="ZeRO-3-style parameter/optimizer-state "
                        "sharding over the data axis (per-chip state memory "
                        "scales down with the mesh)")
    parser.add_argument("--num_nodes", type=int, default=1,
                        help="hosts in the run; >1 federates them via "
                        "jax.distributed (set MASTER_ADDR/MASTER_PORT/"
                        "WORLD_SIZE/NODE_RANK like the reference DDP launch, "
                        "or run on a TPU pod slice for auto-detection)")
    parser.add_argument("--node_rank", type=int, default=-1,
                        help="this host's rank (overrides NODE_RANK env)")
    parser.add_argument("--master_addr", type=str, default="",
                        help="coordinator host:port (overrides MASTER_ADDR)")
    parser.add_argument("--resume_if_exists", type=str2bool, default=True)
    parser.add_argument("--run_mode", type=str, default="train",
                        choices=["train", "test"])
    parser.add_argument("--init_chkpt_dir", type=str, default="")
    parser.add_argument("--init_chkpt_file", type=str, default="",
                        help="checkpoint name within --init_chkpt_dir; a "
                        "'*' glob must match exactly one path (reference "
                        "get_ckpt_path, run_spiral.py:137-145)")
    parser.add_argument("--init_model_partial", type=str2bool, default=False,
                        help="allow a PARTIAL weight load from the init "
                        "checkpoint/archive: matching names+shapes load, "
                        "the rest keep their fresh init (reference "
                        "run_spiral.py:45; strict load otherwise)")
    parser.add_argument("--use_chkpt_hparams", type=str2bool, default=False,
                        help="take cfg.model from the --init_archive's "
                        "embedded config instead of the experiment file "
                        "(reference run_spiral.py:46)")
    parser.add_argument("--load_model_skip_var", type=str, default="",
                        help="comma-separated substrings; matching variables "
                        "are NOT loaded from the init checkpoint/archive "
                        "(reference run_spiral.py:47)")
    parser.add_argument("--init_archive", type=str, default="",
                        help="restore weights from a self-contained "
                        ".tpu_speech archive written at train end (the "
                        "reference's .nemo restore_from workflow); applies "
                        "to pretrain, finetune-train and test modes")
    parser.add_argument("--test_manifest", type=str, default="")
    parser.add_argument("--model_type", type=str, default="spiral",
                        choices=["spiral", "st2vec", "ctc_finetune"])
    parser.add_argument("--finetune_from_scratch", type=str2bool, default=False)
    parser.add_argument("--use_teacher_encoder", type=str2bool, default=False)
    parser.add_argument("--save_logits", type=str2bool, default=False)
    parser.add_argument("--streaming_eval", type=str2bool, default=False,
                        help="test mode: decode through the chunk-"
                             "incremental streaming transcriber (requires a "
                             "streaming-mode model)")
    parser.add_argument("--beam_size", type=int, default=1,
                        help="test-mode CTC decode: 1 = greedy (reference "
                        "behavior), >1 = prefix beam search "
                        "(eval/ctc_beam.py)")
    parser.add_argument("--lm_manifest", type=str, default="",
                        help="fit a native n-gram LM on this manifest's "
                        "transcripts and shallow-fuse it into the beam")
    parser.add_argument("--lm_alpha", type=float, default=0.5,
                        help="LM fusion weight")
    parser.add_argument("--lm_order", type=int, default=4,
                        help="n-gram order for --lm_manifest")
    parser.add_argument("--export_model", type=str, default="",
                        help="in test mode, also serialize the inference "
                        "graph as StableHLO to this path")
    parser.add_argument("--tokenizer_file", type=str, default="")
    parser.add_argument("--max_epochs", type=int, default=0)
    parser.add_argument("--dev_data_dup_factor", type=int, default=0,
                        help="duplicate validation entries N times")
    parser.add_argument("--profile", type=str2bool, default=False,
                        help="capture an XLA profiler trace of the first "
                        "training epoch into <log_dir>/plugins (view in "
                        "TensorBoard's profile tab)")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="dotted config override, e.g. "
                        "--set model.optim.lr=1e-3 (repeatable; the "
                        "reference's hydra overrides_str, run_spiral.py:127; "
                        "unknown keys are struct-mode errors)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(args=argv)
    print(f"training args: {args}")

    if args.use_horovod:
        print(
            "WARNING: --use_horovod requested; XLA collectives are the only "
            "distributed backend on TPU (SURVEY.md §2.5) — flag accepted "
            "for launch-script parity, lr scaling is handled by "
            "expected_gpu_num rescaling in the runner.",
            file=sys.stderr,
        )
    if args.num_gpus and not args.num_devices:
        args.num_devices = args.num_gpus
    if not args.model_save_dir:
        args.model_save_dir = args.log_dir or "logs/spiral"

    from tpu_speech.utils.surgery import parse_skip_vars

    skip_vars = parse_skip_vars(args.load_model_skip_var)

    # Multi-host bootstrap BEFORE any mesh/device use: federate processes into
    # one global device view (the reference's MASTER_ADDR/NODE_RANK DDP
    # plumbing, SPIRAL/README.md:36-42, mapped onto jax.distributed).
    if args.num_nodes > 1 or os.environ.get("MASTER_ADDR") or args.master_addr:
        from tpu_speech.parallel import distributed

        distributed.initialize(
            coordinator_address=args.master_addr or None,
            num_processes=args.num_nodes if args.num_nodes > 1 else None,
            process_id=args.node_rank if args.node_rank >= 0 else None,
        )
        distributed.require_multiprocess(args.num_nodes)

    # Config front ends (reference run_spiral.py:62-131): python dataclass
    # experiment modules, or YAML experiment files composing a `base:` module
    # with nested overrides (the legacy hydra-YAML path analog).
    import copy

    from tpu_speech.utils.config import (
        apply_override,
        apply_overrides,
        load_yaml_experiment,
        parse_cli_override,
    )

    def _load_module_cfg(name):
        mod = import_module(
            os.path.join(args.config_path, name).replace("/", ".")
        )
        # deepcopy: never mutate the module-level singleton (repeat launches
        # in one process must not inherit earlier overrides)
        return copy.deepcopy(mod.cfg)

    yaml_path = None
    if args.config_name.endswith((".yaml", ".yml")):
        yaml_path = (
            args.config_name if os.path.isfile(args.config_name)
            else os.path.join(args.config_path, args.config_name)
        )
    elif not args.structured_config:
        # reference --structured_config=false = the YAML config path
        # (run_spiral.py:113-131); the name must resolve to a YAML file
        cand = os.path.join(args.config_path, args.config_name + ".yaml")
        if not os.path.isfile(cand):
            raise SystemExit(
                f"--structured_config=false but no YAML config at {cand}"
            )
        yaml_path = cand
    else:
        cand = os.path.join(args.config_path, args.config_name + ".yaml")
        if os.path.isfile(cand):
            yaml_path = cand
    if yaml_path:
        base, yaml_overrides = load_yaml_experiment(yaml_path)
        cfg = _load_module_cfg(base)
        apply_overrides(cfg, yaml_overrides)
    else:
        cfg = _load_module_cfg(args.config_name)

    for spec in args.overrides:
        key, value = parse_cli_override(spec)
        apply_override(cfg, key, value)

    if args.use_chkpt_hparams:
        # rebuild cfg.model from the archive's embedded config (the
        # reference loads hparams out of the checkpoint, run_spiral.py:46);
        # dataset paths are still rewired from the CLI below
        if not args.init_archive:
            raise SystemExit("--use_chkpt_hparams requires --init_archive")
        import tarfile as _tarfile
        import json as _json

        from tpu_speech.utils.archive import config_object

        with _tarfile.open(args.init_archive, "r") as tar:
            arch_cfg = _json.loads(
                tar.extractfile("config.json").read().decode("utf-8")
            )
        restored = config_object(arch_cfg)
        model_cfg = (
            restored.get("model") if isinstance(restored, dict)
            else getattr(restored, "model", None)
        )
        if model_cfg is None or isinstance(model_cfg, dict):
            raise SystemExit(
                "--use_chkpt_hparams: archive config has no reconstructable "
                "model section"
            )
        cfg.model = model_cfg
        print("model hparams taken from archive config "
              f"({args.init_archive})")

    manifest_dir = args.manifest_dir or args.data_dir
    for ds in (cfg.model.train_ds, cfg.model.validation_ds, cfg.model.test_ds):
        if ds is not None and manifest_dir:
            ds.manifest_filepath = ",".join(
                os.path.join(manifest_dir, os.path.basename(p))
                if not os.path.isabs(p) else p
                for p in ds.manifest_filepath.split(",")
            )
    if args.test_manifest and cfg.model.test_ds is not None:
        cfg.model.test_ds.manifest_filepath = args.test_manifest
    if args.max_epochs:
        cfg.trainer.max_epochs = args.max_epochs
    if args.num_devices:
        cfg.trainer.devices = args.num_devices
    if args.seq_parallel:
        cfg.trainer.seq_parallel = args.seq_parallel
    if args.fsdp:
        cfg.trainer.fsdp = True
    if args.dev_data_dup_factor > 0 and cfg.model.validation_ds is not None:
        cfg.model.validation_ds.dup_factor = args.dev_data_dup_factor

    log_dir = args.model_save_dir
    print(f"train config: {cfg}")

    # exp_manager composition (reference spiral_pretrain.py:102 +
    # utils/exp_manager.py:105): versioned/explicit run dir, git hash+diff,
    # config snapshot, TB — side effects on the primary process only.
    exp = None
    import jax as _jax

    if _jax.process_index() == 0:
        from tpu_speech.utils.exp_manager import ExpManager

        exp = ExpManager(
            name=cfg.exp_manager.name or args.config_name,
            explicit_log_dir=log_dir,
            resume_if_exists=args.resume_if_exists,
            tensorboard_dir=args.tensorboard_dir or None,
        )
        exp.save_config(cfg)
        log_dir = exp.log_dir

    if args.model_type in ("spiral", "st2vec"):
        from tpu_speech.train.spiral_runner import SpiralPretrainRunner

        runner = SpiralPretrainRunner(
            cfg, log_dir, exp=exp, ckpt_dir=args.chkpt_dir
        )
        if args.init_archive:
            runner.restore_from_archive(
                args.init_archive, partial=args.init_model_partial,
                skip=skip_vars,
            )
            print(f"Restored weights from archive: {args.init_archive}")
        if args.resume_if_exists and runner.resume_if_exists():
            print(f"Resumed from iteration {runner.iteration}")
        val_every = max(1, getattr(cfg.trainer, "val_check_interval_epochs", 1))
        for epoch in range(1, cfg.trainer.max_epochs + 1):
            if args.profile and epoch == 1:
                from tpu_speech.utils.profiling import trace

                with trace(log_dir):
                    loss = runner.train_epoch(epoch)
            else:
                loss = runner.train_epoch(epoch)
            print(f"Epoch {epoch}: loss = {loss:.4f}", flush=True)
            if epoch % val_every == 0:
                val = runner.validate()
                if val == val:  # not nan (validation_ds configured)
                    print(f"Validation: loss = {val:.4f}", flush=True)
            if cfg.trainer.max_steps and runner.iteration >= cfg.trainer.max_steps:
                break
        runner.ckpt.wait()  # drain the async checkpoint write
        archive = runner.save_archive()
        if archive:
            print(f"saved model archive: {archive}")
        return

    # ctc_finetune
    from tpu_speech.text.tokenizers import CharTokenizer, SubwordTokenizer
    from tpu_speech.train.spiral_runner import SpiralFinetuneRunner

    if args.tokenizer_file:
        tokenizer = SubwordTokenizer(args.tokenizer_file)
    else:
        tokenizer = CharTokenizer(cfg.model.labels)

    if args.run_mode == "train" and not args.finetune_from_scratch:
        if args.init_chkpt_dir and args.init_chkpt_file:
            cfg.model.pretrain_chkpt_path = get_ckpt_path(
                args.init_chkpt_dir, args.init_chkpt_file
            )
    cfg.model.use_teacher_encoder = args.use_teacher_encoder

    runner = SpiralFinetuneRunner(
        cfg, log_dir, tokenizer, exp=exp, ckpt_dir=args.chkpt_dir
    )
    if args.init_archive:
        runner.restore_from_archive(
            args.init_archive, partial=args.init_model_partial,
            skip=skip_vars,
        )
        print(f"Restored weights from archive: {args.init_archive}")
    if (args.run_mode == "test" and args.init_chkpt_dir
            and args.init_chkpt_file):
        # reference test mode loads the FULL model state from the named
        # checkpoint (spiral_pretrain.py:117-121, strict unless
        # --init_model_partial); '*' glob must match exactly one path
        path = get_ckpt_path(args.init_chkpt_dir, args.init_chkpt_file)
        if path.endswith(".tpu_speech"):
            runner.restore_from_archive(
                path, partial=args.init_model_partial, skip=skip_vars
            )
        else:
            runner.restore_from_checkpoint(
                path, partial=args.init_model_partial, skip=skip_vars
            )
        print(f"Loaded test-mode weights from: {path}")
        # explicit test weights take priority over local resume state
        args.resume_if_exists = False
    if args.resume_if_exists and runner.resume_if_exists():
        print(f"Resumed from iteration {runner.iteration}")

    if args.run_mode == "test" and args.streaming_eval:
        results = runner.evaluate_streaming()
        print(
            f"TEST (streaming): WER = {results['wer']:.4f} | "
            f"CER = {results['cer']:.4f} | {results['n']} utts"
        )
        return
    if args.run_mode == "test":
        lm = None
        if args.beam_size > 1 and args.lm_manifest:
            # shallow fusion: fit the native n-gram LM on the transcripts of
            # the given manifest IN THE MODEL'S id space (incl. blank offset)
            from tpu_speech.data.spiral import read_manifest
            from tpu_speech.eval.ctc_beam import NGramLM

            texts = [
                e["text"] for e in read_manifest(args.lm_manifest, 0.0, None)
            ]
            lm = NGramLM.from_texts(
                texts, runner.tokenizer, order=args.lm_order
            )
            print(f"n-gram LM (order {args.lm_order}) fit on "
                  f"{len(texts)} transcripts")
        results = runner.evaluate(
            save_logits_dir=os.path.join(log_dir, "logits")
            if args.save_logits else None,
            beam_width=args.beam_size, lm=lm, lm_alpha=args.lm_alpha,
        )
        print(
            f"TEST: WER = {results['wer']:.4f} | CER = {results['cer']:.4f} "
            f"| {results['n']} utts"
        )
        if results.get("diagnosis_html"):
            print(f"per-utterance diagnosis: {results['diagnosis_html']}")
        if args.export_model:
            print(f"exported: {runner.export_model(args.export_model)}")
        return

    val_every = max(1, getattr(cfg.trainer, "val_check_interval_epochs", 1))
    for epoch in range(1, cfg.trainer.max_epochs + 1):
        loss = runner.train_epoch(epoch)
        print(f"Epoch {epoch}: ctc loss = {loss:.4f}", flush=True)
        if epoch % val_every == 0:
            results = runner.validate()
            if results:
                print(
                    f"Validation: WER = {results['wer']:.4f} | "
                    f"CER = {results['cer']:.4f}", flush=True,
                )
        if cfg.trainer.max_steps and runner.iteration >= cfg.trainer.max_steps:
            break
    runner.ckpt.wait()  # drain the async checkpoint write
    archive = runner.save_archive()
    if archive:
        print(f"saved model archive: {archive}")


if __name__ == "__main__":
    main()
