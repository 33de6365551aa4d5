"""Per-phase attribution of the SPIRAL-base pretraining step on one chip.

Answers "where do the milliseconds go?" for the flagship step at the
reference operating point (batch 24/chip, 250k-sample crops,
spiral_base_pretrain_ls960.py:34,170-212): featurizer, teacher branch,
student branch, negatives+loss head, backward, optimizer+EMA — each timed
as its own chained jit, plus the real full step, with XLA-reported FLOPs /
HBM bytes and the roofline bound per phase.

Methodology notes:
- every scan iteration is made DATA-DEPENDENT on the previous one (the rng
  is folded per-iteration and a carry-derived epsilon perturbs the phase
  input), so XLA cannot hoist loop-invariant subgraphs out of the chain or
  elide repeated work — the failure mode scripts/profile_serving.py had
  before round 3.
- parameters are passed as jit ARGUMENTS, never closed over: the tunneled
  chip ships closed-over arrays as compile-request constants and 413s on
  the ~400 MB param tree.
- phase times are chain-amortized device time (one dispatch+sync per chain),
  the same convention as bench.py step metrics.
- fwd != featurize+teacher+student+loss exactly because XLA fuses across
  phase boundaries in the real step; the residual is reported as
  `fusion_gain`.

Usage: python scripts/profile_spiral_step.py [--bf16] [--json OUT.json]
"""

import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from tpu_speech.models.spiral.masking import apply_mask, gaussian_mask_emb  # noqa: E402
from tpu_speech.models.spiral.st2vec import (  # noqa: E402
    ST2VecEncoder,
    contrastive_loss,
    ema_update,
    momentum_schedule,
    sample_negatives,
    spiral_base_config,
    teacher_shift,
    wav_to_spec,
)
from tpu_speech.train.spiral import (  # noqa: E402
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
)
from tpu_speech.train.spiral_runner import _spec_len  # noqa: E402
from tpu_speech.utils.flops import (  # noqa: E402
    compiled_cost,
    device_hbm_gbps,
    device_peak_tflops,
    mfu,
)

BATCH = 24
CROP = 250000
REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    chain = args.chain
    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    import optax

    cfg = spiral_base_config()
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(3e-3, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    spec_len = _spec_len(CROP, cfg.sample_rate)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((BATCH, CROP)) * 0.1).astype(np.float32)
    lens = np.full((BATCH,), CROP, dtype=np.int32)
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(1),
    )
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (BATCH, spec_len, cfg.num_features), tx
    )
    mask_emb32 = jnp.asarray(gaussian_mask_emb(cfg.num_features))
    mask_emb = mask_emb32.astype(dt)
    base_key = jax.random.key(0, impl="rbg")

    def cast(tree):
        return jax.tree.map(
            lambda p: p.astype(dt)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    params_c = cast(state.params)
    teacher_c = cast(state.teacher)
    t_params_c = dict(params_c)
    t_params_c.update(teacher_c)
    bstats = state.batch_stats

    # ---- staged pieces (params are ARGS, see module docstring) ------------
    @jax.jit
    def stage_featurize(batch, key):
        t_specs, t_lens = wav_to_spec(cfg, batch["wavs"], batch["wav_lens"],
                                      training=True,
                                      rng=jax.random.fold_in(key, 1))
        s_specs, s_lens = wav_to_spec(cfg, batch["p_wavs"],
                                      batch["p_wav_lens"], training=True,
                                      rng=jax.random.fold_in(key, 2))
        return t_specs.astype(dt), t_lens, s_specs.astype(dt), s_lens

    @jax.jit
    def stage_teacher(tp, bstats, batch, t_specs, t_lens, key):
        sh, shl = teacher_shift(t_specs, t_lens, batch["shift_k"],
                                batch["shift_r"], cfg.shift_unit,
                                cfg.max_shift, mask_emb)
        targets, _ = model.apply(
            {"params": tp, "batch_stats": bstats},
            sh, shl, train=True, method=ST2VecEncoder.encode_teacher,
            rngs={"dropout": key})
        tf_student = t_specs.shape[1] // cfg.shift_unit
        targets = jax.lax.dynamic_slice_in_dim(
            targets, batch["shift_k"], tf_student, axis=1)
        return targets

    @jax.jit
    def stage_student(p, bstats, batch, s_specs, s_lens, key):
        masked = apply_mask(s_specs, batch["time_mask"], batch["chan_mask"],
                            mask_emb)
        (pred, fl), _ = model.apply(
            {"params": p, "batch_stats": bstats},
            masked, s_lens, train=True,
            method=ST2VecEncoder.encode_student,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return pred, fl

    t_specs, t_lens, s_specs, s_lens = stage_featurize(batch, base_key)
    targets = stage_teacher(t_params_c, bstats, batch, t_specs, t_lens,
                            base_key)
    pred, feat_lens = stage_student(params_c, bstats, batch, s_specs, s_lens,
                                    base_key)

    # production-equivalent full loss (same structure as train/spiral.py)
    def loss_full(params, teacher, bstats, batch, key, c):
        eps = jnp.float32(1e-30)
        emb = mask_emb32
        p, tch = params, teacher
        if args.bf16:
            p, tch, emb = cast(p), cast(tch), emb.astype(dt)
        rngs = {"dropout": jax.random.fold_in(key, 0)}
        tsp, tle = wav_to_spec(cfg, batch["wavs"] + c * eps,
                               batch["wav_lens"], training=True,
                               rng=jax.random.fold_in(key, 1))
        ssp, sle = wav_to_spec(cfg, batch["p_wavs"], batch["p_wav_lens"],
                               training=True, rng=jax.random.fold_in(key, 2))
        if args.bf16:
            tsp, ssp = tsp.astype(dt), ssp.astype(dt)
        sh, shl = teacher_shift(tsp, tle, batch["shift_k"], batch["shift_r"],
                                cfg.shift_unit, cfg.max_shift, emb)
        tp = dict(p)
        tp.update(tch)
        tg, _ = model.apply({"params": tp, "batch_stats": bstats},
                            sh, shl, train=True,
                            method=ST2VecEncoder.encode_teacher, rngs=rngs)
        tg = jax.lax.stop_gradient(tg)
        tf_student = ssp.shape[1] // cfg.shift_unit
        tg = jax.lax.dynamic_slice_in_dim(tg, batch["shift_k"], tf_student, 1)
        ssp = apply_mask(ssp, batch["time_mask"], batch["chan_mask"], emb)
        (pr, fl), _ = model.apply(
            {"params": p, "batch_stats": bstats}, ssp, sle,
            train=True, method=ST2VecEncoder.encode_student, rngs=rngs,
            mutable=["batch_stats"])
        valid = (jnp.arange(pr.shape[1])[None, :]
                 < fl[:, None]).astype(pr.dtype)
        ng = sample_negatives(jax.random.fold_in(key, 3), tg, fl,
                              cfg.n_negatives)
        loss, _ = contrastive_loss(pr, tg, ng, valid, cfg.logit_temp)
        return loss

    grad_fn = jax.value_and_grad(loss_full)

    # ---- phase runners: scan of `chain` data-dependent iterations ---------
    # operands holds the big arrays; every body perturbs its input with the
    # fp32 carry and folds the key per iteration -> nothing is loop-invariant
    def chained(body, operands):
        @jax.jit
        def run(operands, key):
            def it(c, i):
                return body(operands, c, jax.random.fold_in(key, i)), ()
            c, _ = jax.lax.scan(it, jnp.float32(0.0), jnp.arange(chain))
            return c
        return run, operands

    eps = jnp.float32(1e-30)

    def b_featurize(ops, c, key):
        b2 = dict(ops["batch"])
        b2["wavs"] = b2["wavs"] + c * eps
        o = stage_featurize(b2, key)
        return o[0].astype(jnp.float32).mean()

    def b_teacher(ops, c, key):
        t = stage_teacher(ops["tp"], ops["bstats"], ops["batch"],
                          ops["t_specs"] + (c * eps).astype(dt),
                          ops["t_lens"], key)
        return t.astype(jnp.float32).mean()

    def b_student(ops, c, key):
        p, _ = stage_student(ops["p"], ops["bstats"], ops["batch"],
                             ops["s_specs"] + (c * eps).astype(dt),
                             ops["s_lens"], key)
        return p.astype(jnp.float32).mean()

    def b_loss_head(ops, c, key):
        pred, targets, fl = ops["pred"], ops["targets"], ops["feat_lens"]
        valid = (jnp.arange(pred.shape[1])[None, :]
                 < fl[:, None]).astype(pred.dtype)
        negs = sample_negatives(key, targets, fl, cfg.n_negatives)
        loss, _ = contrastive_loss(pred + (c * eps).astype(dt), targets,
                                   negs, valid, cfg.logit_temp)
        return loss.astype(jnp.float32)

    def b_fwd(ops, c, key):
        return loss_full(ops["p32"], ops["t32"], ops["bstats"], ops["batch"],
                         key, c)

    def b_fwd_bwd(ops, c, key):
        loss, grads = grad_fn(ops["p32"], ops["t32"], ops["bstats"],
                              ops["batch"], key, c)
        return loss + jax.tree.leaves(grads)[0].astype(jnp.float32).mean()

    def b_update(ops, c, key):
        import optax as _o
        grads = jax.tree.map(
            lambda p: (jnp.full(p.shape, 1e-6, p.dtype)
                       + (c * eps).astype(p.dtype))
            if jnp.issubdtype(p.dtype, jnp.floating) else p, ops["p32"])
        updates, _ = tx.update(grads, ops["opt"], ops["p32"])
        newp = _o.apply_updates(ops["p32"], updates)
        m = momentum_schedule(jnp.int32(100), cfg.target_momentum,
                              cfg.target_momentum_final,
                              cfg.target_momentum_steps)
        t = ema_update(ops["t32"], newp, m)
        return jax.tree.leaves(t)[0].astype(jnp.float32).mean()

    common = {"batch": batch, "bstats": bstats}
    phases = [
        ("featurize_2x", b_featurize, common),
        ("teacher_branch", b_teacher,
         {**common, "tp": t_params_c, "t_specs": t_specs, "t_lens": t_lens}),
        ("student_branch", b_student,
         {**common, "p": params_c, "s_specs": s_specs, "s_lens": s_lens}),
        ("negatives_loss", b_loss_head,
         {"pred": pred, "targets": targets, "feat_lens": feat_lens}),
        ("forward_total", b_fwd,
         {**common, "p32": state.params, "t32": state.teacher}),
        ("forward_backward", b_fwd_bwd,
         {**common, "p32": state.params, "t32": state.teacher}),
        ("optimizer_ema", b_update,
         {"p32": state.params, "t32": state.teacher,
          "opt": state.opt_state}),
    ]

    peak = device_peak_tflops()
    hbm = device_hbm_gbps()
    rows = []
    for name, body, operands in phases:
        run, ops = chained(body, operands)
        for _ in range(2):
            jax.device_get(run(ops, base_key))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.device_get(run(ops, base_key))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / chain
        # XLA cost analysis counts a scan body ONCE regardless of trip
        # count (verified vs per-op trace flops), so the chain's flops ARE
        # the per-iteration flops
        cost = compiled_cost(run, ops, base_key)
        fl = cost["flops"]
        by = cost["bytes"]
        row = {
            "phase": name, "ms": t * 1e3, "gflops": fl / 1e9,
            "hbm_gb": by / 1e9,
            "mfu": mfu(fl, t),
            "bw_frac": (by / (hbm * 1e9)) / t if hbm else None,
        }
        rows.append(row)
        print(f"{name:18s} {row['ms']:8.2f} ms  {row['gflops']:9.1f} GF  "
              f"{row['hbm_gb']*1e3:8.1f} MB  mfu={row['mfu'] or 0:.3f}  "
              f"bw={row['bw_frac'] or 0:.3f}", flush=True)

    # the real production step (donated, incl. EMA + opt)
    step = make_pretrain_step(model, cfg, tx, bf16=args.bf16)

    @partial(jax.jit, donate_argnums=(0,))
    def full_chain(st, batch, key):
        def it(st, i):
            st, m = step(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(it, st, jnp.arange(chain))

    cost = compiled_cost(full_chain, state, batch, base_key)  # body-once
    st = state
    for i in range(2):
        st, losses = full_chain(st, batch, jax.random.fold_in(base_key, i))
        jax.device_get(losses)
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        st, losses = full_chain(st, batch, jax.random.fold_in(base_key, 9 + i))
        jax.device_get(losses)
        ts.append(time.perf_counter() - t0)
    t_full = float(np.median(ts)) / chain
    fl = cost["flops"]
    by = cost["bytes"]
    row = {
        "phase": "full_step", "ms": t_full * 1e3, "gflops": fl / 1e9,
        "hbm_gb": by / 1e9, "mfu": mfu(fl, t_full),
        "bw_frac": (by / (hbm * 1e9)) / t_full if hbm else None,
    }
    rows.append(row)
    print(f"{'full_step':18s} {row['ms']:8.2f} ms  {row['gflops']:9.1f} GF  "
          f"{row['hbm_gb']*1e3:8.1f} MB  mfu={row['mfu'] or 0:.3f}  "
          f"bw={row['bw_frac'] or 0:.3f}", flush=True)

    fwd = next(r for r in rows if r["phase"] == "forward_total")
    parts = sum(r["ms"] for r in rows
                if r["phase"] in ("featurize_2x", "teacher_branch",
                                  "student_branch", "negatives_loss"))
    print(f"\nfusion gain (sum of fwd parts - fused fwd): "
          f"{parts - fwd['ms']:.2f} ms", flush=True)
    out = {
        "dtype": "bf16" if args.bf16 else "fp32",
        "batch": BATCH, "crop": CROP, "chain": chain,
        "device": jax.devices()[0].device_kind,
        "peak_tflops_bf16": peak, "hbm_gbps": hbm,
        "phases": rows,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
