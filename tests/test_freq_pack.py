"""Frequency-pair channel packing (models/freq_pack.py) — exactness gates.

The packed trunk must compute the SAME function as the reference-shaped
trunk (jdc.py / reference model.py:23-33) from the SAME parameters: these
tests pin kernel-assembly exactness, BN joint-statistics exactness, pooled
helpers, and full-model forward/training parity between modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pitchextractor_tpu.models import JDCNet
from pitchextractor_tpu.models.freq_pack import (
    maxpool2_packed,
    maxpool40_packed,
    pack_freq,
    pack_kernel,
    unpack_freq,
)
from pitchextractor_tpu.models.jdc import _max_pool_freq

TINY_SEQ = {"model_type": "bilstm", "num_layers": 1, "hidden_size": 32}


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def test_pack_unpack_roundtrip_and_indexing():
    x = _rand((2, 3, 8, 4))
    y = pack_freq(x)
    assert y.shape == (2, 3, 4, 8)
    # packed[..., g, r*C + c] == x[..., 2g+r, c]
    np.testing.assert_array_equal(np.asarray(y)[..., 1, 1 * 4 + 2], np.asarray(x)[..., 3, 2])
    np.testing.assert_array_equal(np.asarray(unpack_freq(y)), np.asarray(x))


def test_maxpool_helpers_match_unpacked():
    x = _rand((2, 5, 80, 4), seed=1)
    y = pack_freq(x)
    np.testing.assert_array_equal(
        np.asarray(maxpool2_packed(y)), np.asarray(_max_pool_freq(x, 2))
    )
    np.testing.assert_array_equal(
        np.asarray(maxpool40_packed(y)), np.asarray(_max_pool_freq(x, 40))
    )


@pytest.mark.parametrize("cin,cout", [(1, 8), (8, 8)])
def test_packed_conv_kernel_exact(cin, cout):
    """lax.conv on the packed grid with the assembled kernel == conv on the
    unpacked grid with the canonical kernel (boundary rows included)."""
    from jax import lax

    x = _rand((2, 6, 16, cin), seed=2)
    w = _rand((3, 3, cin, cout), seed=3)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    packed = lax.conv_general_dilated(
        pack_freq(x),
        pack_kernel(w),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(unpack_freq(packed)), np.asarray(ref), atol=1e-5
    )


def _models():
    kw = dict(num_class=1, sequence_model_config=TINY_SEQ)
    return JDCNet(**kw), JDCNet(freq_pack=True, **kw)


def test_param_trees_identical_between_modes():
    mu, mp = _models()
    x = jnp.zeros((2, 8, 80, 1), jnp.float32)
    vu = mu.init(jax.random.PRNGKey(0), x, train=False)
    vp = mp.init(jax.random.PRNGKey(0), x, train=False)
    pu = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vu)
    pp = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vp)
    assert jax.tree_util.tree_structure(pu) == jax.tree_util.tree_structure(pp)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(lambda a, b: a == b, pu, pp))


def test_full_model_eval_parity():
    mu, mp = _models()
    x = _rand((2, 12, 80, 1), seed=4)
    variables = mu.init(jax.random.PRNGKey(0), x, train=False)
    f0_u, v_u = mu.apply(variables, x, train=False)
    f0_p, v_p = mp.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(f0_p), np.asarray(f0_u), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_u), atol=2e-4)


def test_full_model_train_parity_including_batch_stats():
    mu, mp = _models()
    x = _rand((2, 12, 80, 1), seed=5)
    variables = mu.init(jax.random.PRNGKey(0), x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    (f0_u, v_u), mut_u = mu.apply(
        variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
    )
    (f0_p, v_p), mut_p = mp.apply(
        variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(f0_p), np.asarray(f0_u), atol=5e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_u), atol=5e-4)
    flat_u = jax.tree_util.tree_leaves_with_path(mut_u["batch_stats"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"]))
    assert len(flat_u) == len(flat_p)
    for path, leaf in flat_u:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf), atol=1e-5,
            err_msg=str(path),
        )


def test_gradient_parity():
    mu, mp = _models()
    x = _rand((2, 12, 80, 1), seed=6)
    variables = mu.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, model):
        f0, v = model.apply({**variables, "params": params}, x, train=False)
        return jnp.mean(f0**2) + jnp.mean(v**2)

    gu = jax.grad(loss)(variables["params"], mu)
    gp = jax.grad(loss)(variables["params"], mp)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gu), jax.tree_util.tree_leaves_with_path(gp)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, err_msg=str(path)
        )


def test_bf16_trunk_smoke():
    kw = dict(num_class=1, sequence_model_config=TINY_SEQ, dtype=jnp.bfloat16)
    mu, mp = JDCNet(**kw), JDCNet(freq_pack=True, **kw)
    x = _rand((2, 8, 80, 1), seed=8)
    variables = mu.init(jax.random.PRNGKey(0), x, train=False)
    f0_u, _ = mu.apply(variables, x, train=False)
    f0_p, _ = mp.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(f0_p), np.asarray(f0_u), atol=0.1, rtol=0.05)
