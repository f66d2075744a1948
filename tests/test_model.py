"""CTCModel end-to-end shape/semantics tests (reference config shapes)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec


def _ref_cfg():
    cfg = Config()
    cfg.cnn = CNNConfig(
        add_cnn=True, layers=2,
        channel=[(1, 32), (32, 32)],
        kernel_size=[(3, 3), (3, 3)],
        stride=[(1, 2), (2, 2)],
        padding=[(1, 1), (1, 1)],
        batch_norm=True,
    )
    cfg.dtype = "float32"
    # shape semantics don't depend on RNN width; small RNN keeps CPU
    # compiles fast (the flagship size is compiled in test_entry_compiles)
    cfg.rnn_hidden_size = 32
    cfg.rnn_layers = 1
    return cfg


def test_cnn_model_shapes():
    cfg = _ref_cfg()
    spec = ModelSpec.from_config(cfg, num_class=41)
    assert spec.rnn_in_after_cnn == 61 * 32  # freq 243 -> 61, 32 channels
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 243), jnp.float32)
    log_probs, new_state = CTCModel.apply(spec, params, state, x)
    # time: 32 -> conv s=(1,·) 32 -> conv s=(2,·) 16
    assert log_probs.shape == (16, 2, 41)
    assert spec.output_time_len(32) == 16
    # log-softmax normalised
    np.testing.assert_allclose(
        np.exp(np.asarray(log_probs)).sum(-1), 1.0, rtol=2e-4
    )


def test_no_cnn_model_shapes():
    cfg = _ref_cfg()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_input_size = 81
    spec = ModelSpec.from_config(cfg, num_class=41)
    params, state = CTCModel.init(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(np.random.RandomState(1).randn(3, 20, 81), jnp.float32)
    log_probs, _ = CTCModel.apply(spec, params, state, x)
    assert log_probs.shape == (20, 3, 41)
    assert spec.output_time_len(20) == 20


def test_train_updates_bn_state_and_dropout_determinism():
    cfg = _ref_cfg()
    spec = ModelSpec.from_config(cfg, num_class=10)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 243), jnp.float32)
    rng = jax.random.PRNGKey(3)
    out1, st1 = CTCModel.apply(spec, params, state, x, train=True, rng=rng)
    out2, _ = CTCModel.apply(spec, params, state, x, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
    # BN running stats moved
    assert not np.allclose(
        np.asarray(st1["fc_bn"]["mean"]), np.asarray(state["fc_bn"]["mean"])
    )
    # eval path is deterministic without rng
    out3, _ = CTCModel.apply(spec, params, state, x)
    out4, _ = CTCModel.apply(spec, params, state, x)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out4))


def test_visualize_returns_intermediates():
    cfg = _ref_cfg()
    spec = ModelSpec.from_config(cfg, num_class=10)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    x = jnp.ones((1, 16, 243), jnp.float32)
    out, _, visual = CTCModel.apply(spec, params, state, x, visualize=True)
    assert len(visual) == 4  # input, post-cnn, pre-rnn, output


def test_spec_roundtrip():
    spec = ModelSpec.from_config(_ref_cfg(), num_class=41)
    spec2 = ModelSpec.from_dict(spec.to_dict())
    assert spec2 == spec


def test_gru_variant_and_jit():
    cfg = _ref_cfg()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_type = "nn.GRU"
    cfg.rnn_input_size = 40
    cfg.rnn_hidden_size = 32
    cfg.rnn_layers = 2
    spec = ModelSpec.from_config(cfg, num_class=8)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)

    @jax.jit
    def fwd(p, s, x):
        return CTCModel.apply(spec, p, s, x)[0]

    x = jnp.ones((2, 12, 40), jnp.float32)
    out = fwd(params, state, x)
    assert out.shape == (12, 2, 8)


@pytest.mark.parametrize("cases", [
    [
        # (B, T, F, Ci, Co, kt, kf, st, sf, pt, pf)
        (3, 40, 201, 1, 16, 11, 5, 2, 2, 0, 0),   # 863 front
        (1, 12, 11, 1, 4, 11, 5, 2, 2, 0, 0),     # output size 1 in time
    ],
    pytest.param([
        (2, 33, 81, 1, 32, 3, 3, 1, 2, 1, 1),     # flagship L1
        (2, 17, 41, 32, 32, 3, 3, 2, 2, 1, 1),    # flagship L2 (ci=32)
        (2, 31, 29, 2, 8, 5, 4, 3, 2, 2, 0),      # odd dims, stride 3
    ], marks=pytest.mark.slow),
])
def test_s2d_conv_equals_direct(cases):
    """The space-to-depth strided-conv formulation (models/cnn.py:_s2d_conv)
    must equal lax.conv exactly in fp32 across the shipped conv shapes:
    the 863 front (1->16, k(11,5), s(2,2), no pad), both flagship layers
    (k(3,3), pad (1,1), strides (1,2)/(2,2)), odd spatial dims, and a
    multi-channel small-kernel case."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctc_pytorch_tpu.models.cnn import _s2d_conv

    rng = np.random.RandomState(0)
    for bsz, t, f, ci, co, kt, kf, st, sf, pt, pf in cases:
        x = jnp.asarray(rng.randn(bsz, t, f, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(kt, kf, ci, co).astype(np.float32) * 0.2)
        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(st, sf),
            padding=[(pt, pt), (pf, pf)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _s2d_conv(x, w, (st, sf), (pt, pf))
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
