"""Numerical parity against the reference PyTorch implementation.

Instantiates the reference ``model.JDCNet`` (torch, eval mode) as an oracle,
converts its randomly-initialised weights through
``tools/convert_torch_checkpoint.convert_state_dict`` into our flax tree, and
compares forward outputs on identical inputs.  This validates at once: the
layer-by-layer architecture port, the weight-layout conversion, and the
checkpoint-interop path (SURVEY.md §7 hard parts #2/#6).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE_DIR, "model.py")),
    reason="reference tree unavailable",
)

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _load_reference_model(num_class=1, seq_cfg=None):
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import importlib

        ref_model = importlib.import_module("model")
    finally:
        sys.path.remove(REFERENCE_DIR)
    m = ref_model.JDCNet(num_class=num_class, sequence_model_config=dict(seq_cfg or {}))
    m.eval()
    return m


@pytest.mark.parametrize("num_class", [1, 4])
def test_forward_parity_bilstm(num_class):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from convert_torch_checkpoint import convert_state_dict
    from pitchextractor_tpu.models import JDCNet
    from pitchextractor_tpu.train.checkpoint import tolerant_merge

    seq_cfg = {"model_type": "bilstm", "hidden_size": 64, "num_layers": 2, "dropout": 0.0}
    torch.manual_seed(0)
    ref = _load_reference_model(num_class=num_class, seq_cfg=seq_cfg)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, inferred_num_class, info = convert_state_dict(state)
    assert inferred_num_class == num_class
    assert info["num_layers"] == 2 and info["hidden_size"] == 64

    model = JDCNet(num_class=num_class, sequence_model_config=seq_cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80, 1)), train=False)
    variables = {
        "params": serialization.from_state_dict(
            template["params"],
            tolerant_merge(serialization.to_state_dict(template["params"]), params),
        ),
        "batch_stats": serialization.from_state_dict(
            template["batch_stats"],
            tolerant_merge(serialization.to_state_dict(template["batch_stats"]), stats),
        ),
    }

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 48, 80)).astype(np.float32)  # (B, T, M)

    with torch.no_grad():
        ref_f0, ref_voicing = ref(torch.from_numpy(x[:, None, :, :]))  # (B,1,T,M)
    ours_f0, ours_voicing = model.apply(variables, jnp.asarray(x[..., None]), train=False)

    np.testing.assert_allclose(
        np.asarray(ours_f0), ref_f0.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours_voicing), ref_voicing.numpy(), atol=2e-4, rtol=1e-3
    )


def test_checkpoint_file_conversion_roundtrip(tmp_path):
    """torch.save -> convert_torch_checkpoint CLI path -> load_model -> same output."""
    import jax.numpy as jnp

    import convert_torch_checkpoint as conv
    from pitchextractor_tpu.infer import F0Predictor, load_model

    seq_cfg = {"model_type": "bilstm", "hidden_size": 32, "num_layers": 1, "dropout": 0.0}
    torch.manual_seed(3)
    ref = _load_reference_model(num_class=1, seq_cfg=seq_cfg)
    pth = str(tmp_path / "epoch_00042.pth")
    torch.save({"model": ref.state_dict(), "steps": 5, "epochs": 42}, pth)

    out = str(tmp_path / "epoch_00042.ckpt")
    sys.argv = ["convert", pth, out]
    assert conv.main() == 0

    model, variables = load_model(out)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, 80)).astype(np.float32)
    with torch.no_grad():
        ref_f0, _ = ref(torch.from_numpy(x[:, None, :, :]))
    ours_f0, _ = model.apply(variables, jnp.asarray(x[..., None]), train=False)
    np.testing.assert_allclose(np.asarray(ours_f0), ref_f0.numpy(), atol=2e-4, rtol=1e-3)


def test_forward_parity_transformer():
    """Transformer-head parity: converted reference weights must reproduce
    the reference model's outputs (attention/FFN/norm mapping)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from convert_torch_checkpoint import convert_state_dict
    from pitchextractor_tpu.models import JDCNet
    from pitchextractor_tpu.train.checkpoint import tolerant_merge

    seq_cfg = {
        "model_type": "transformer",
        "num_layers": 2,
        "nhead": 8,
        "dim_feedforward": 256,
        "dropout": 0.0,
    }
    torch.manual_seed(7)
    ref = _load_reference_model(num_class=1, seq_cfg=seq_cfg)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, num_class, info = convert_state_dict(state)
    assert info["model_type"] == "transformer" and info["num_layers"] == 2

    model = JDCNet(num_class=1, sequence_model_config=seq_cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80, 1)), train=False)
    variables = {
        "params": serialization.from_state_dict(
            template["params"],
            tolerant_merge(serialization.to_state_dict(template["params"]), params),
        ),
        "batch_stats": serialization.from_state_dict(
            template["batch_stats"],
            tolerant_merge(serialization.to_state_dict(template["batch_stats"]), stats),
        ),
    }

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 32, 80)).astype(np.float32)
    with torch.no_grad():
        ref_f0, ref_voicing = ref(torch.from_numpy(x[:, None, :, :]))
    ours_f0, ours_voicing = model.apply(variables, jnp.asarray(x[..., None]), train=False)
    np.testing.assert_allclose(np.asarray(ours_f0), ref_f0.numpy(), atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ours_voicing), ref_voicing.numpy(), atol=5e-4, rtol=2e-3)
