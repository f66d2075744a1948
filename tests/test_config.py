import textwrap

from ctc_pytorch_tpu.config import CNNConfig, Config, load_config

REFERENCE_YAML = textwrap.dedent(
    """
    exp_name: 'ctc_fbank_cnn'
    checkpoint_dir: 'checkpoint/'
    vocab_file: 'data/units'
    left_ctx: 0
    right_ctx: 2
    n_skip_frame: 2
    n_downsample: 2
    feature_dim: 81
    output_class_dim: 39
    mel: False
    feature_type: "fbank"
    rnn_input_size: 243
    rnn_hidden_size: 384
    rnn_layers: 4
    rnn_type: "nn.LSTM"
    bidirectional: True
    batch_norm: True
    drop_out: 0.2
    add_cnn: True
    layers: 2
    channel: "[(1, 32), (32, 32)]"
    kernel_size: "[(3, 3), (3, 3)]"
    stride: "[(1, 2), (2, 2)]"
    padding: "[(1, 1), (1, 1)]"
    pooling: "None"
    activation_function: "relu"
    init_lr: 0.001
    num_epoches: 500
    end_adjust_acc: 2
    lr_decay: 0.5
    batch_size: 8
    weight_decay: 0.0005
    seed: 1
    verbose_step: 50
    decode_type: "Greedy"
    beam_width: 10
    lm_alpha: 0.1
    """
)


def test_reference_yaml_keys(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = load_config(p)
    assert cfg.exp_name == "ctc_fbank_cnn"
    assert cfg.rnn_cell == "lstm"
    assert cfg.cnn.add_cnn is True
    assert cfg.cnn.channel == [(1, 32), (32, 32)]
    assert cfg.cnn.stride == [(1, 2), (2, 2)]
    assert cfg.cnn.pooling is None
    assert cfg.spliced_dim == 243
    assert cfg.weight_decay == 0.0005


def test_roundtrip(tmp_path):
    cfg = Config(rnn_type="nn.GRU", rnn_hidden_size=256)
    cfg.cnn = CNNConfig(
        add_cnn=True,
        layers=2,
        channel=[(1, 32), (32, 32)],
        kernel_size=[(3, 3), (3, 3)],
        stride=[(1, 2), (2, 2)],
        padding=[(1, 1), (1, 1)],
    )
    p = tmp_path / "out.yaml"
    cfg.to_yaml(p)
    cfg2 = load_config(p)
    assert cfg2 == cfg
    cfg3 = Config.from_json(cfg.to_json())
    assert cfg3 == cfg


def test_ini_style_config(tmp_path):
    p = tmp_path / "legacy.conf"
    p.write_text(
        "[Data]\nvocab_file = data/units\nfeature_dim = 40\n"
        "[Model]\nrnn_hidden_size = 256\nrnn_type = nn.GRU\n"
        "[Training]\ninit_lr = 0.001\nbatch_size = 16\n"
    )
    cfg = load_config(p)
    assert cfg.feature_dim == 40
    assert cfg.rnn_cell == "gru"
    assert cfg.batch_size == 16


def test_cnn_shape_arithmetic():
    # reference config: two convs, time strides (1, 2), freq strides (2, 2),
    # kernel 3, padding 1 — model_ctc.py:111,116 floor arithmetic
    cnn = CNNConfig(
        add_cnn=True,
        layers=2,
        channel=[(1, 32), (32, 32)],
        kernel_size=[(3, 3), (3, 3)],
        stride=[(1, 2), (2, 2)],
        padding=[(1, 1), (1, 1)],
    )
    assert cnn.output_freq_len(243) == 61  # 243 -> 122 -> 61
    assert cnn.output_time_len(100) == 50
    assert cnn.time_downsample() == 2


def test_cnn_per_layer_pooling():
    """Reference layer tuples carry pooling PER LAYER (l[4] may be None for
    some layers only, model_ctc.py:46-57); the arithmetic and the conv stack
    must honour mixed None/window entries."""
    import jax
    import numpy as np

    from ctc_pytorch_tpu.models.cnn import cnn_stack_apply, cnn_stack_init

    cnn = CNNConfig(
        add_cnn=True,
        layers=2,
        channel=[(1, 4), (4, 4)],
        kernel_size=[(3, 3), (3, 3)],
        stride=[(1, 1), (1, 1)],
        padding=[(1, 1), (1, 1)],
        pooling=[None, (2, 2)],  # layer 0 unpooled, layer 1 pools 2x2
    )
    assert cnn.pool_at(0) is None and cnn.pool_at(1) == (2, 2)
    assert cnn.time_downsample() == 2
    assert cnn.output_time_len(32) == 16
    assert cnn.output_freq_len(16) == 8
    params, state = cnn_stack_init(jax.random.PRNGKey(0), cnn)
    x = np.random.RandomState(0).randn(2, 1, 32, 16).astype(np.float32)
    out, _ = cnn_stack_apply(params, state, x, cnn, train=False)
    # (B, T', F', C): time/freq match the arithmetic above
    assert out.shape[1] == 16 and out.shape[2] == 8
    # checkpoint roundtrip: the spec dict keeps per-layer None entries
    from ctc_pytorch_tpu.models.ctc_model import ModelSpec

    spec = ModelSpec(add_cnn=True, cnn=cnn, rnn_input_size=16,
                     rnn_hidden_size=8, rnn_layers=1, rnn_cell="lstm",
                     bidirectional=True, batch_norm=True, num_class=4,
                     drop_out=0.0)
    spec2 = ModelSpec.from_dict(spec.to_dict())
    assert spec2.cnn.pooling == [None, (2, 2)]


def test_unknown_key_warns(tmp_path):
    """Unknown keys are tolerated (the reference YAML carries strays) but
    warned about — a typo like `epochs` for `num_epoches` must not
    silently train with the 500-epoch default."""
    import warnings

    p = tmp_path / "c.yaml"
    p.write_text("epochs: 3\nrnn_hidden_size: 8\n")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(p)
    assert cfg.rnn_hidden_size == 8
    assert cfg.num_epoches == 500  # the typo did NOT apply
    assert any("epochs" in str(x.message) for x in w)
