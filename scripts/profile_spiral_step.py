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
- phase times are chain-amortized device time (one dispatch+sync per chain),
  the same convention as bench.py step metrics.
- phases overlap deliberately is NOT modeled: fwd != featurize+teacher+student
  +loss exactly because XLA fuses across phase boundaries in the real step;
  the residual is reported as `fusion_gain`.

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
    teacher_param_subset,
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
CHAIN = 8
REPS = 5


def _chain_time(run, *args):
    """Median wall time of `run(*args)` (one dispatch), sync via device_get."""
    for _ in range(2):
        jax.device_get(run(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--chain", type=int, default=CHAIN)
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
    mask_emb = jnp.asarray(gaussian_mask_emb(cfg.num_features)).astype(dt)
    base_key = jax.random.key(0, impl="rbg")

    def cast(tree):
        return jax.tree.map(
            lambda p: p.astype(dt)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    params_c = cast(state.params)
    teacher_c = cast(state.teacher)
    t_params_c = dict(params_c)
    t_params_c.update(teacher_c)

    # ---- staged intermediates (computed once, feed later phases) ----------
    @jax.jit
    def stage_featurize(wavs, p_wavs, key):
        t_specs, t_lens = wav_to_spec(cfg, wavs, batch["wav_lens"],
                                      training=True,
                                      rng=jax.random.fold_in(key, 1))
        s_specs, s_lens = wav_to_spec(cfg, p_wavs, batch["p_wav_lens"],
                                      training=True,
                                      rng=jax.random.fold_in(key, 2))
        return t_specs.astype(dt), t_lens, s_specs.astype(dt), s_lens

    t_specs, t_lens, s_specs, s_lens = stage_featurize(
        batch["wavs"], batch["p_wavs"], base_key)

    @jax.jit
    def stage_teacher(t_specs, t_lens, key):
        sh, shl = teacher_shift(t_specs, t_lens, batch["shift_k"],
                                batch["shift_r"], cfg.shift_unit,
                                cfg.max_shift, mask_emb)
        targets, tl = model.apply(
            {"params": t_params_c, "batch_stats": state.batch_stats},
            sh, shl, train=True, method=ST2VecEncoder.encode_teacher,
            rngs={"dropout": key})
        tf_student = t_specs.shape[1] // cfg.shift_unit
        targets = jax.lax.dynamic_slice_in_dim(
            targets, batch["shift_k"], tf_student, axis=1)
        return targets

    targets = stage_teacher(t_specs, t_lens, base_key)

    @jax.jit
    def stage_student(s_specs, s_lens, key):
        masked = apply_mask(s_specs, batch["time_mask"], batch["chan_mask"],
                            mask_emb)
        (pred, fl), _ = model.apply(
            {"params": params_c, "batch_stats": state.batch_stats},
            masked, s_lens, train=True,
            method=ST2VecEncoder.encode_student,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return pred, fl

    pred, feat_lens = stage_student(s_specs, s_lens, base_key)

    # ---- phase runners: scan of `chain` data-dependent iterations ---------
    def chained(body):
        """body(carry_scalar, key) -> new_carry_scalar (fp32)."""
        @jax.jit
        def run(key):
            def it(c, i):
                return body(c, jax.random.fold_in(key, i)), ()
            c, _ = jax.lax.scan(it, jnp.float32(0.0), jnp.arange(chain))
            return c
        return run

    eps = jnp.float32(1e-30)

    def b_featurize(c, key):
        o = stage_featurize(batch["wavs"] + c * eps, batch["p_wavs"], key)
        return o[0].astype(jnp.float32).mean()

    def b_teacher(c, key):
        t = stage_teacher(t_specs + (c * eps).astype(dt), t_lens, key)
        return t.astype(jnp.float32).mean()

    def b_student(c, key):
        p, _ = stage_student(s_specs + (c * eps).astype(dt), s_lens, key)
        return p.astype(jnp.float32).mean()

    def b_loss_head(c, key):
        valid = (jnp.arange(pred.shape[1])[None, :]
                 < feat_lens[:, None]).astype(pred.dtype)
        negs = sample_negatives(key, targets, feat_lens, cfg.n_negatives)
        loss, _ = contrastive_loss(pred + (c * eps).astype(dt), targets,
                                   negs, valid, cfg.logit_temp)
        return loss.astype(jnp.float32)

    # full forward / forward+backward via the production loss, built exactly
    # as make_pretrain_step does (same rng wiring)
    step = make_pretrain_step(model, cfg, tx, bf16=args.bf16)

    def loss_full(params, key, c):
        from tpu_speech.train import spiral as S
        # reproduce loss_fn inline: the production one is a closure
        emb = jnp.asarray(gaussian_mask_emb(cfg.num_features))
        p, tch = params, state.teacher
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
        tg, _ = model.apply({"params": tp, "batch_stats": state.batch_stats},
                            sh, shl, train=True,
                            method=ST2VecEncoder.encode_teacher, rngs=rngs)
        tg = jax.lax.stop_gradient(tg)
        tf_student = ssp.shape[1] // cfg.shift_unit
        tg = jax.lax.dynamic_slice_in_dim(tg, batch["shift_k"], tf_student, 1)
        ssp = apply_mask(ssp, batch["time_mask"], batch["chan_mask"], emb)
        (pr, fl), _ = model.apply(
            {"params": p, "batch_stats": state.batch_stats}, ssp, sle,
            train=True, method=ST2VecEncoder.encode_student, rngs=rngs,
            mutable=["batch_stats"])
        valid = (jnp.arange(pr.shape[1])[None, :]
                 < fl[:, None]).astype(pr.dtype)
        ng = sample_negatives(jax.random.fold_in(key, 3), tg, fl,
                              cfg.n_negatives)
        loss, _ = contrastive_loss(pr, tg, ng, valid, cfg.logit_temp)
        return loss

    def b_fwd(c, key):
        return loss_full(state.params, key, c)

    grad_fn = jax.value_and_grad(lambda p, k, c: loss_full(p, k, c))

    def b_fwd_bwd(c, key):
        loss, grads = grad_fn(state.params, key, c)
        return loss + 0.0 * jax.tree.leaves(grads)[0].astype(jnp.float32).mean()

    # optimizer + EMA on realistic (param-shaped) grads
    def b_update(c, key):
        grads = jax.tree.map(
            lambda p: jnp.full(p.shape, 1e-6, p.dtype) + (c * eps).astype(
                p.dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            state.params)
        updates, _ = tx.update(grads, state.opt_state, state.params)
        import optax as _o
        newp = _o.apply_updates(state.params, updates)
        m = momentum_schedule(state.step, cfg.target_momentum,
                              cfg.target_momentum_final,
                              cfg.target_momentum_steps)
        t = ema_update(state.teacher, newp, m)
        return jax.tree.leaves(t)[0].astype(jnp.float32).mean()

    phases = [
        ("featurize_2x", b_featurize),
        ("teacher_branch", b_teacher),
        ("student_branch", b_student),
        ("negatives_loss", b_loss_head),
        ("forward_total", b_fwd),
        ("forward_backward", b_fwd_bwd),
        ("optimizer_ema", b_update),
    ]

    peak = device_peak_tflops()
    hbm = device_hbm_gbps()
    rows = []
    for name, body in phases:
        run = chained(body)
        t = _chain_time(run, base_key) / chain
        cost = compiled_cost(run, base_key)
        fl = cost["flops"] / chain
        by = cost["bytes"] / chain
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
    st = state

    @partial(jax.jit, donate_argnums=(0,))
    def full_chain(st, key):
        def it(st, i):
            st, m = step(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(it, st, jnp.arange(chain))

    for i in range(2):
        st, losses = full_chain(st, jax.random.fold_in(base_key, i))
        jax.device_get(losses)
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        st, losses = full_chain(st, jax.random.fold_in(base_key, 10 + i))
        jax.device_get(losses)
        ts.append(time.perf_counter() - t0)
    t_full = float(np.median(ts)) / chain
    cost = compiled_cost(
        jax.jit(lambda s, k: full_chain(s, k)[1]), state, base_key)
    fl = cost["flops"] / chain
    by = cost["bytes"] / chain
    row = {
        "phase": "full_step", "ms": t_full * 1e3, "gflops": fl / 1e9,
        "hbm_gb": by / 1e9, "mfu": mfu(fl, t_full),
        "bw_frac": (by / (819e9)) / t_full if hbm else None,
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
