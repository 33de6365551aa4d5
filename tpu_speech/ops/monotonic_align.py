"""Monotonic Alignment Search (MAS) — on-device, jit-compatible.

The reference implements MAS as a Cython/OpenMP CPU extension with a
device->host->device round-trip per training step
(Grad-TTS/model/monotonic_align/core.pyx:9-45, __init__.py:8-23). Here the
Viterbi-style DP runs entirely on device as a ``lax.scan`` over mel columns:
each column update is a vectorized max over the "stay" / "advance" transitions
across the whole batch, so the only sequential dimension is T_y. The backtrace
is a second (reversed) scan emitting one-hot rows.

Semantics match the Cython kernel exactly, including its tie-breaking
(advance only when value[stay] < value[advance], i.e. ties stay) and the
max_neg_val = -1e9 gating constant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_speech.utils.typing_contracts import typecheck

MAX_NEG = -1e9


@typecheck(value="B Tx Ty", mask="B Tx Ty")
def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Most-likely monotone alignment path.

    Args:
      value: (B, Tx, Ty) log-likelihood grid (e.g. Gaussian log-prior).
      mask: (B, Tx, Ty) validity mask (outer product of text/mel masks).
    Returns:
      (B, Tx, Ty) binary path, dtype of ``value``.
    """
    dtype = value.dtype
    b, t_x, t_y = value.shape
    value = (value * mask).astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    t_xs = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)  # (B,)
    t_ys = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)  # (B,)

    x_idx = jnp.arange(t_x, dtype=jnp.int32)

    # ---- forward DP: scan over mel columns ----
    def fwd_step(prev_col, inputs):
        y, lp_col = inputs  # y: scalar int, lp_col: (B, Tx)
        # "stay" transition: came from (x, y-1); impossible when x == y
        stay = jnp.where(x_idx[None, :] == y, MAX_NEG, prev_col)
        # "advance" transition: came from (x-1, y-1); at x==0 it is the
        # virtual start cell: 0 at y==0, impossible otherwise
        x0 = jnp.where(y == 0, 0.0, MAX_NEG)
        adv = jnp.concatenate(
            [jnp.full((b, 1), x0, dtype=prev_col.dtype), prev_col[:, :-1]], axis=1
        )
        new_col = lp_col + jnp.maximum(stay, adv)
        return new_col, new_col

    init = jnp.full((b, t_x), MAX_NEG, dtype=jnp.float32)
    lp_cols = jnp.moveaxis(value, 2, 0)  # (Ty, B, Tx)
    ys = jnp.arange(t_y, dtype=jnp.int32)
    _, v_cols = jax.lax.scan(fwd_step, init, (ys, lp_cols))

    # ---- backtrace: reversed scan over mel columns ----
    # v_cols is (Ty, B, Tx); we index columns y and y-1 during the scan.
    v_prev_cols = jnp.concatenate(
        [jnp.full((1, b, t_x), MAX_NEG, dtype=jnp.float32), v_cols[:-1]], axis=0
    )  # column y-1 aligned with step y (column -1 is junk, gated by y>0)

    def bwd_step(index, inputs):
        y, vprev = inputs  # vprev: (B, Tx) = DP column y-1
        active = y < t_ys  # (B,)
        # (re)pin index to Tx-1 until this sample's last column is reached
        index = jnp.where(y >= t_ys - 1, t_xs - 1, index)
        row = (jax.nn.one_hot(index, t_x, dtype=jnp.float32)
               * active[:, None].astype(jnp.float32))
        v_i = jnp.take_along_axis(vprev, index[:, None], axis=1)[:, 0]
        v_im1 = jnp.take_along_axis(
            vprev, jnp.maximum(index - 1, 0)[:, None], axis=1)[:, 0]
        step_down = (index != 0) & ((index == y) | (v_i < v_im1)) & active & (y > 0)
        index = index - step_down.astype(jnp.int32)
        return index, row

    init_idx = t_xs - 1
    _, rows = jax.lax.scan(
        bwd_step, init_idx, (ys, v_prev_cols), reverse=True
    )  # rows: (Ty, B, Tx)
    path = jnp.moveaxis(rows, 0, 2)  # (B, Tx, Ty)
    return path.astype(dtype)


def maximum_path_numpy(value, mask, max_neg_val=MAX_NEG):
    """Pure-numpy oracle implementing the same DP (for tests)."""
    import numpy as np

    value = np.asarray(value, dtype=np.float32) * np.asarray(mask, dtype=np.float32)
    mask = np.asarray(mask)
    b, t_x, t_y = value.shape
    path = np.zeros_like(value, dtype=np.int32)
    t_xs = mask[:, :, 0].sum(1).astype(np.int32)
    t_ys = mask[:, 0, :].sum(1).astype(np.int32)
    for i in range(b):
        tx, ty = int(t_xs[i]), int(t_ys[i])
        v = value[i]
        for y in range(ty):
            for x in range(max(0, tx + y - ty), min(tx, y + 1)):
                v_cur = max_neg_val if x == y else v[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else max_neg_val
                else:
                    v_prev = v[x - 1, y - 1]
                v[x, y] = max(v_cur, v_prev) + v[x, y]
        index = tx - 1
        for y in range(ty - 1, -1, -1):
            path[i, index, y] = 1
            if index != 0 and (index == y or v[index, y - 1] < v[index - 1, y - 1]):
                index -= 1
    return path
