"""Model tests: shape contracts, both sequence heads, init sanity,
dropout/BN mode behaviour, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pitchextractor_tpu.models import JDCNet, SequenceModel
from pitchextractor_tpu.models.sequence import SinusoidalPositionalEncoding


def _make(seq_cfg=None, num_class=1):
    return JDCNet(num_class=num_class, sequence_model_config=seq_cfg or {"model_type": "bilstm", "num_layers": 2, "hidden_size": 64})


def _init(model, B=2, T=48, M=80):
    x = jnp.zeros((B, T, M, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


def test_forward_shapes_bilstm():
    model = _make()
    variables, x = _init(model)
    f0, voicing = model.apply(variables, x, train=False)
    assert f0.shape == (2, 48, 1)
    assert voicing.shape == (2, 48)


def test_forward_shapes_transformer():
    model = _make({"model_type": "transformer", "num_layers": 2, "nhead": 8, "dim_feedforward": 256})
    variables, x = _init(model)
    f0, voicing = model.apply(variables, x, train=False)
    assert f0.shape == (2, 48, 1)
    assert voicing.shape == (2, 48)


def test_num_class_regression_vs_classification():
    model = _make(num_class=722)
    variables, x = _init(model)
    f0, _ = model.apply(variables, x, train=False)
    assert f0.shape == (2, 48, 722)


def test_dynamic_time_axis():
    model = _make()
    variables, _ = _init(model, T=48)
    x2 = jnp.zeros((2, 192, 80, 1))
    f0, voicing = model.apply(variables, x2, train=False)
    assert f0.shape == (2, 192, 1) and voicing.shape == (2, 192)


def test_train_mode_updates_batch_stats_and_uses_dropout():
    model = _make()
    variables, x = _init(model)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(x.shape), jnp.float32)
    (f0a, _), mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert float(jnp.abs(leaf).sum()) > 0
    # dropout is stochastic in train mode
    (f0b, _), _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(f0a), np.asarray(f0b))
    # eval mode is deterministic
    f0c, _ = model.apply(variables, x, train=False)
    f0d, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(f0c), np.asarray(f0d))


def test_gradients_flow_everywhere():
    model = _make()
    variables, x = _init(model)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape), jnp.float32)

    def loss_fn(params):
        f0, voicing = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x, train=False
        )
        return jnp.mean(f0**2) + jnp.mean(voicing**2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat)
    assert nonzero / len(flat) > 0.9  # (some BN scale grads can be ~0)


def test_sequence_model_bilstm_shapes_and_dims():
    m = SequenceModel(input_size=512, model_type="bilstm", hidden_size=384, num_layers=2)
    x = jnp.zeros((2, 16, 512))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 16, 768)
    assert m.output_dim == 768


def test_sequence_model_transformer_shapes():
    m = SequenceModel(input_size=512, model_type="transformer", num_layers=1, nhead=8, dim_feedforward=256)
    x = jnp.zeros((2, 16, 512))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 16, 512)
    assert m.output_dim == 512


def test_sequence_model_bad_type_raises():
    m = SequenceModel(model_type="gru")
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 512)))


def test_lstm_is_causal_per_direction():
    """Forward LSTM output at t must not depend on inputs after t."""
    from pitchextractor_tpu.models.sequence import LSTMLayer

    layer = LSTMLayer(hidden_size=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 10, 8)), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    y1 = layer.apply(v, x)
    x2 = x.at[0, 7, :].set(99.0)
    y2 = layer.apply(v, x2)
    np.testing.assert_allclose(np.asarray(y1[0, :7]), np.asarray(y2[0, :7]), atol=1e-6)
    assert not np.allclose(np.asarray(y1[0, 7:]), np.asarray(y2[0, 7:]))


def test_positional_encoding_matches_torch_formula():
    pe_mod = SinusoidalPositionalEncoding(d_model=16, max_len=32)
    v = pe_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))
    out = pe_mod.apply(v, jnp.zeros((1, 8, 16)))
    import math

    pos = np.arange(32)[:, None]
    div = np.exp(np.arange(0, 16, 2) * (-math.log(10000.0) / 16))
    expected = np.zeros((32, 16))
    expected[:, 0::2] = np.sin(pos * div)
    expected[:, 1::2] = np.cos(pos * div)
    np.testing.assert_allclose(np.asarray(out[0]), expected[:8], atol=1e-5)


def test_param_count_reference_scale():
    """The bilstm-4-layer config (reference Configs/config.yml:16-24) should
    land in the 10-40M parameter band noted in SURVEY.md §2.11."""
    model = JDCNet(
        num_class=1,
        sequence_model_config={"model_type": "bilstm", "num_layers": 4, "dropout": 0.1},
    )
    variables, _ = _init(model, B=1, T=8)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 10_000_000 < n < 40_000_000, n


def test_bf16_trunk_matches_f32_forward():
    """model_params.activation_dtype=bf16: params/BN-stats stay f32, outputs
    stay f32, and the forward agrees with the f32 trunk to bf16 tolerance
    (the trunk is 7 convs deep; cents-level F0 agreement is gated at the
    eval level, here we gate raw closeness)."""
    from pitchextractor_tpu.models import activation_dtype_from

    seq = {"model_type": "bilstm", "num_layers": 2, "hidden_size": 64}
    f32 = JDCNet(num_class=1, sequence_model_config=seq)
    bf16 = JDCNet(num_class=1, sequence_model_config=seq, dtype=activation_dtype_from("bf16"))

    variables, _ = _init(f32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 48, 80, 1)).astype(np.float32))

    ref_f0, ref_v = f32.apply(variables, x, train=False)
    got_f0, got_v = bf16.apply(variables, x, train=False)  # same f32 params
    assert got_f0.dtype == jnp.float32 and got_v.dtype == jnp.float32
    # bf16 has ~3 decimal digits; through the trunk expect ~1e-2 relative
    scale = float(jnp.max(jnp.abs(ref_f0))) + 1e-6
    assert float(jnp.max(jnp.abs(got_f0 - ref_f0))) / scale < 5e-2
    vscale = float(jnp.max(jnp.abs(ref_v))) + 1e-6
    assert float(jnp.max(jnp.abs(got_v - ref_v))) / vscale < 5e-2


def test_bf16_trunk_train_step_and_stats_dtypes():
    """One init+apply with mutable batch_stats in train mode: running stats
    and params must stay float32 so checkpoints are dtype-identical."""
    from pitchextractor_tpu.models import activation_dtype_from

    model = JDCNet(
        num_class=1,
        sequence_model_config={"model_type": "bilstm", "num_layers": 2, "hidden_size": 64},
        dtype=activation_dtype_from("bfloat16"),
    )
    x = jnp.zeros((2, 48, 80, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (f0, v), updated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert f0.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(updated["batch_stats"]):
        assert leaf.dtype == jnp.float32


def test_activation_dtype_from_mapping():
    from pitchextractor_tpu.models import activation_dtype_from

    assert activation_dtype_from(None) is None
    assert activation_dtype_from("") is None
    assert activation_dtype_from("float32") is None
    assert activation_dtype_from("bf16") == jnp.bfloat16
    with pytest.raises(ValueError):
        activation_dtype_from("fp8")
