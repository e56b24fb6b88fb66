"""Pallas LSTM kernel tests (interpret mode on CPU): forward parity against
the lax.scan reference and gradient parity for the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import pitchextractor_tpu.ops.lstm_pallas as m


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(m, "_INTERPRET", True)


def _scan_reference(x_proj, w_hh):
    T, B, H4 = x_proj.shape
    H = H4 // 4

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = lax.scan(step, init, x_proj)
    return hs


def _inputs(T=12, B=8, H=16, seed=0):
    rng = np.random.default_rng(seed)
    x_proj = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    w_hh = jnp.asarray(0.3 * rng.standard_normal((H, 4 * H)), jnp.float32)
    return x_proj, w_hh


def test_forward_matches_scan():
    x_proj, w_hh = _inputs()
    ours = m.lstm_layer_pallas(x_proj, w_hh)
    ref = _scan_reference(x_proj, w_hh)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_reverse_direction():
    x_proj, w_hh = _inputs()
    ours = m.lstm_layer_pallas(x_proj, w_hh, reverse=True)
    ref = jnp.flip(_scan_reference(jnp.flip(x_proj, 0), w_hh), 0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_gradients_match_scan():
    x_proj, w_hh = _inputs(T=8, B=4, H=8)

    def loss_pallas(xp, w):
        out = m.lstm_layer_pallas(xp, w)
        return jnp.sum(jnp.sin(out) * out)

    def loss_scan(xp, w):
        out = _scan_reference(xp, w)
        return jnp.sum(jnp.sin(out) * out)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_hh)
    gs = jax.grad(loss_scan, argnums=(0, 1))(x_proj, w_hh)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]), atol=1e-4)


def test_gradients_reverse():
    x_proj, w_hh = _inputs(T=6, B=4, H=8, seed=3)

    def loss(xp, w, rev):
        return jnp.sum(m.lstm_layer_pallas(xp, w, reverse=rev) ** 2)

    def loss_ref(xp, w):
        return jnp.sum(jnp.flip(_scan_reference(jnp.flip(xp, 0), w), 0) ** 2)

    gp = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh, True)
    gs = jax.grad(loss_ref, argnums=(0, 1))(x_proj, w_hh)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]), atol=1e-4)


def test_odd_t_single_step():
    x_proj, w_hh = _inputs(T=1, B=4, H=8)
    ours = m.lstm_layer_pallas(x_proj, w_hh)
    ref = _scan_reference(x_proj, w_hh)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_fused_bidirectional_matches_separate():
    x_proj, w_fwd = _inputs(T=10, B=8, H=16, seed=5)
    _, w_bwd = _inputs(T=10, B=8, H=16, seed=6)
    x_proj2 = jnp.stack([x_proj, jnp.flip(x_proj, 0)], axis=1)
    fused = m.bilstm_layer_pallas(x_proj2, w_fwd, w_bwd)  # (T, B, 2H)
    ref_fwd = _scan_reference(x_proj, w_fwd)
    ref_bwd = jnp.flip(_scan_reference(jnp.flip(x_proj, 0), w_bwd), 0)
    ref = jnp.concatenate([ref_fwd, ref_bwd], axis=-1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_fused_bidirectional_gradients():
    x_proj, w_fwd = _inputs(T=6, B=4, H=8, seed=7)
    _, w_bwd = _inputs(T=6, B=4, H=8, seed=8)

    def loss_fused(xp, wf, wb):
        xp2 = jnp.stack([xp, jnp.flip(xp, 0)], axis=1)
        return jnp.sum(m.bilstm_layer_pallas(xp2, wf, wb) ** 2)

    def loss_ref(xp, wf, wb):
        fwd = _scan_reference(xp, wf)
        bwd = jnp.flip(_scan_reference(jnp.flip(xp, 0), wb), 0)
        return jnp.sum(jnp.concatenate([fwd, bwd], -1) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x_proj, w_fwd, w_bwd)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x_proj, w_fwd, w_bwd)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bilstm_module_fused_matches_scan(monkeypatch):
    """The BiLSTM flax module must produce identical outputs whether the
    fused pallas path or the lax.scan path runs (same params)."""
    from pitchextractor_tpu.models.sequence import BiLSTM
    import pitchextractor_tpu.models.sequence as seq

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 24)), jnp.float32)
    model = BiLSTM(hidden_size=16, num_layers=2, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: False)
    ref = model.apply(variables, x)
    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: True)
    fused = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_jdcnet_fused4_matches_unfused(monkeypatch):
    """JDCNet output must be identical whether heads run fused (C=4 kernel)
    or separately (same params, eval mode)."""
    import pitchextractor_tpu.models.sequence as seq
    import pitchextractor_tpu.models.jdc as jdc_mod

    from pitchextractor_tpu.models import JDCNet

    model = JDCNet(
        num_class=1,
        sequence_model_config={"model_type": "bilstm", "num_layers": 2, "hidden_size": 16, "dropout": 0.0},
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 80, 1)), jnp.float32)

    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: False)
    monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref_f0, ref_v = model.apply(variables, x, train=False)

    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: True)
    monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: True)
    fused_f0, fused_v = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(fused_f0), np.asarray(ref_f0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_v), np.asarray(ref_v), atol=1e-5)


def test_jdcnet_fused4_gradients(monkeypatch):
    import pitchextractor_tpu.models.sequence as seq
    import pitchextractor_tpu.models.jdc as jdc_mod

    from pitchextractor_tpu.models import JDCNet

    model = JDCNet(
        num_class=1,
        sequence_model_config={"model_type": "bilstm", "num_layers": 1, "hidden_size": 8, "dropout": 0.0},
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 80, 1)), jnp.float32)
    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: False)
    monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, fused):
        monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: fused)
        monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: fused)
        f0, v = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x, train=False)
        return jnp.mean(f0**2) + jnp.mean(v**2)

    g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_fused = jax.grad(lambda p: loss(p, True))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_projection_matmul_value_and_grads():
    """bf16-operand projection matmul (custom VJP): forward and both grads
    must match the f32 einsum to bf16 operand-rounding tolerance."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 24)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((24, 32)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)

    def loss(fn, x, w):
        y = fn(x, w)
        return jnp.sum((y - t) ** 2)

    ref_fn = lambda x, w: jnp.einsum("btd,dh->bth", x, w)
    ref_v, (ref_dx, ref_dw) = jax.value_and_grad(
        lambda x, w: loss(ref_fn, x, w), argnums=(0, 1)
    )(x, w)
    v, (dx, dw) = jax.value_and_grad(
        lambda x, w: loss(m.projection_matmul, x, w), argnums=(0, 1)
    )(x, w)

    def cosine(a, b):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert abs(float(v) - float(ref_v)) / abs(float(ref_v)) < 2e-2
    assert cosine(dx, ref_dx) > 0.999
    assert cosine(dw, ref_dw) > 0.999


def test_bf16_proj_training_path(monkeypatch):
    """With the projection flag forced on, the training-path BiLSTM grads
    must track the f32 path (bf16 operand rounding only) and the plumbing
    (bf16 x_proj stream, dtype-marker residuals, bf16 dgates) must compose."""
    from pitchextractor_tpu.models.sequence import BiLSTM
    import pitchextractor_tpu.models.sequence as seq

    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 12, 24)), jnp.float32)
    model = BiLSTM(hidden_size=16, num_layers=2, dropout=0.0)
    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: True)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params, bf16):
        monkeypatch.setattr(seq, "_proj_bf16_active", lambda train: bf16 and train)
        out = model.apply({"params": params}, x, train=True)
        return jnp.mean(out**2)

    v_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(variables["params"])
    v_bf, g_bf = jax.value_and_grad(lambda p: loss(p, True))(variables["params"])
    assert abs(float(v_bf) - float(v_ref)) / max(abs(float(v_ref)), 1e-9) < 3e-2

    a = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g_bf)])
    b = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g_ref)])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995


# ---------------------------------------------------------------------------
# Direction-aware per-chain DMA kernels (round 3)
# ---------------------------------------------------------------------------


def _dir_inputs(T=12, B=8, H=16, C=4, seed=7):
    rng = np.random.default_rng(seed)
    xs = tuple(
        jnp.asarray(0.3 * rng.standard_normal((T, B, 4 * H)), jnp.float32)
        for _ in range(C)
    )
    w = jnp.asarray(0.3 * rng.standard_normal((C, H, 4 * H)), jnp.float32)
    return xs, w


def test_multichain_dir_matches_flip_path():
    """The direction-aware kernel must equal the stacked-pack kernel fed
    caller-flipped inputs (values in real time order both ways)."""
    xs, w = _dir_inputs()
    dirs = (0, 1, 0, 1)
    hs_dir = m.multichain_lstm_dir(xs, w, dirs)

    xp4 = jnp.stack(
        [xs[0], jnp.flip(xs[1], axis=0), xs[2], jnp.flip(xs[3], axis=0)], axis=1
    )
    hs_ref = m.multichain_lstm_pallas(xp4, w)
    ref_aligned = jnp.stack(
        [
            hs_ref[:, 0],
            jnp.flip(hs_ref[:, 1], axis=0),
            hs_ref[:, 2],
            jnp.flip(hs_ref[:, 3], axis=0),
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(hs_dir), np.asarray(ref_aligned), atol=1e-5)


def test_multichain_dir_matches_scan_per_chain():
    xs, w = _dir_inputs(C=2)
    dirs = (0, 1)
    hs = m.multichain_lstm_dir(xs, w, dirs)
    fwd_ref = _scan_reference(xs[0], w[0])
    bwd_ref = jnp.flip(_scan_reference(jnp.flip(xs[1], axis=0), w[1]), axis=0)
    np.testing.assert_allclose(np.asarray(hs[:, 0]), np.asarray(fwd_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hs[:, 1]), np.asarray(bwd_ref), atol=1e-5)


def test_multichain_dir_gradients():
    """Custom VJP of the dir kernel vs autodiff of the scan reference."""
    xs, w = _dir_inputs(T=10, B=8, H=8, C=2, seed=9)
    dirs = (0, 1)

    def loss_dir(xs, w):
        hs = m.multichain_lstm_dir(xs, w, dirs)
        return jnp.sum(jnp.sin(hs))

    def loss_ref(xs, w):
        fwd = _scan_reference(xs[0], w[0])
        bwd = jnp.flip(_scan_reference(jnp.flip(xs[1], axis=0), w[1]), axis=0)
        hs = jnp.stack([fwd, bwd], axis=1)
        return jnp.sum(jnp.sin(hs))

    gd = jax.grad(loss_dir, argnums=(0, 1))(xs, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(xs, w)
    for a, b in zip(jax.tree_util.tree_leaves(gd), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_heads_dir_matches_disabled(monkeypatch):
    """JDCNet fused path: dir-DMA on vs off must agree (eval mode)."""
    import pitchextractor_tpu.models.sequence as seq
    import pitchextractor_tpu.models.jdc as jdc_mod

    from pitchextractor_tpu.models import JDCNet

    model = JDCNet(
        num_class=1,
        sequence_model_config={"model_type": "bilstm", "num_layers": 2, "hidden_size": 16, "dropout": 0.0},
    )
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 12, 80, 1)), jnp.float32)
    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: False)
    monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    monkeypatch.setattr(seq, "_lstm_use_pallas", lambda: True)
    monkeypatch.setattr(jdc_mod, "_lstm_use_pallas", lambda: True)
    monkeypatch.setenv("PEX_LSTM_DIRDMA", "1")
    f0_dir, v_dir = model.apply(variables, x, train=False)
    monkeypatch.setenv("PEX_LSTM_DIRDMA", "0")
    f0_off, v_off = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(f0_dir), np.asarray(f0_off), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_dir), np.asarray(v_off), atol=1e-5)
