import jax
import jax.numpy as jnp
import numpy as np

from tpu_speech.ops.masks import (
    duration_loss,
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)


def test_sequence_mask():
    lengths = jnp.array([1, 3, 5])
    m = sequence_mask(lengths, 5)
    expected = np.array(
        [
            [1, 0, 0, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 1, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_fix_len_compatibility():
    assert fix_len_compatibility(172) == 172
    assert fix_len_compatibility(173) == 176
    assert fix_len_compatibility(1) == 4
    assert fix_len_compatibility(4) == 4
    assert fix_len_compatibility(5, num_downsamplings_in_unet=3) == 8


def test_generate_path():
    # durations [2, 1, 3] over 6 frames -> rows cover [0:2), [2:3), [3:6)
    dur = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    path = generate_path(dur, mask)
    expected = np.array(
        [
            [1, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(np.asarray(path[0]), expected)


def test_generate_path_masked():
    dur = jnp.array([[2.0, 2.0, 0.0]])
    mask = np.ones((1, 3, 6))
    mask[0, 2:, :] = 0  # only 2 valid tokens
    mask[0, :, 4:] = 0  # only 4 valid frames
    path = generate_path(dur, jnp.asarray(mask))
    assert np.asarray(path).sum() == 4
    np.testing.assert_array_equal(
        np.asarray(path[0, 0]), np.array([1, 1, 0, 0, 0, 0], dtype=np.float32)
    )


def test_duration_loss():
    logw = jnp.array([[1.0, 2.0]])
    logw_gt = jnp.array([[1.5, 2.5]])
    lengths = jnp.array([2])
    assert np.isclose(float(duration_loss(logw, logw_gt, lengths)), 0.25)


def test_generate_path_jits():
    f = jax.jit(generate_path)
    dur = jnp.array([[1.0, 2.0, 1.0]])
    mask = jnp.ones((1, 3, 4))
    np.testing.assert_array_equal(
        np.asarray(f(dur, mask)), np.asarray(generate_path(dur, mask))
    )
