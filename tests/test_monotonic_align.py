import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_speech.ops.monotonic_align import maximum_path, maximum_path_numpy


def _random_case(rng, b, t_x, t_y):
    value = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    t_xs = rng.integers(2, t_x + 1, size=b)
    t_ys = np.array([rng.integers(tx, t_y + 1) for tx in t_xs])
    mask = np.zeros((b, t_x, t_y), dtype=np.float32)
    for i in range(b):
        mask[i, : t_xs[i], : t_ys[i]] = 1.0
    return value, mask


@pytest.mark.parametrize("shape", [(1, 4, 7), (3, 8, 16), (2, 16, 16), (4, 5, 40)])
def test_matches_numpy_oracle(rng, shape):
    value, mask = _random_case(rng, *shape)
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    want = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_path_is_valid_monotone(rng):
    value, mask = _random_case(rng, 3, 10, 30)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    t_xs = mask[:, :, 0].sum(1).astype(int)
    t_ys = mask[:, 0, :].sum(1).astype(int)
    for i in range(3):
        p = path[i, : t_xs[i], : t_ys[i]]
        # each mel column assigned to exactly one token
        np.testing.assert_array_equal(p.sum(0), np.ones(t_ys[i]))
        # each token covers a contiguous nonempty span, monotonically increasing
        rows = p.argmax(0)
        assert (np.diff(rows) >= 0).all()
        assert p.sum() == t_ys[i]
        assert (p.sum(1) >= 1).all()
    # nothing outside the mask
    assert (path * (1 - mask)).sum() == 0


def test_jit_and_degenerate(rng):
    f = jax.jit(maximum_path)
    value, mask = _random_case(rng, 2, 6, 6)
    got = np.asarray(f(jnp.asarray(value), jnp.asarray(mask)))
    want = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_prefers_high_likelihood(rng):
    # band of high value along a known diagonal path should be recovered
    t_x, t_y = 5, 15
    value = np.full((1, t_x, t_y), -10.0, dtype=np.float32)
    bounds = [0, 3, 6, 9, 12, 15]
    for x in range(t_x):
        value[0, x, bounds[x] : bounds[x + 1]] = 10.0
    mask = np.ones_like(value)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for x in range(t_x):
        np.testing.assert_array_equal(
            path[0, x, bounds[x] : bounds[x + 1]], np.ones(3, dtype=np.float32)
        )
