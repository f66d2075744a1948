"""Visualization tool smoke test: package -> npz with the four tensors."""

import numpy as np

import jax

from ctc_pytorch_tpu.cli.visualize import visualize
from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data.kaldi_io import ArkWriter
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train.checkpoint import save_package
from ctc_pytorch_tpu.train.state import TrainState
from ctc_pytorch_tpu.vocab import Vocab


def test_visualize_npz(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    units = ["sh", "ih", "k"]
    (data / "units").write_text("\n".join(units) + "\n")
    with ArkWriter(data / "f.ark", data / "f.scp") as w, \
            open(data / "phn_text", "w") as lab:
        for i in range(2):
            w.write(f"u{i}", rng.randn(24, 20).astype(np.float32))
            lab.write(f"u{i} sh ih k\n")

    cfg = Config()
    cfg.vocab_file = str(data / "units")
    cfg.test_scp_path = str(data / "f.scp")
    cfg.test_lab_path = str(data / "phn_text")
    cfg.feature_dim = 20
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    cfg.rnn_input_size = 20
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 1
    cfg.cnn = CNNConfig(
        add_cnn=True, layers=1, channel=[(1, 4)], kernel_size=[(3, 3)],
        stride=[(1, 2)], padding=[(1, 1)],
    )
    cfg.dtype = "float32"
    cfg.drop_out = 0.0

    vocab = Vocab(cfg.vocab_file)
    spec = ModelSpec.from_config(cfg, num_class=vocab.n_words)
    params, mstate = CTCModel.init(jax.random.PRNGKey(0), spec)
    import jax.numpy as jnp

    pkg = tmp_path / "m.npz"
    save_package(pkg, spec,
                 TrainState(jnp.zeros((), jnp.int32), params, mstate, ()))

    out = visualize(cfg, str(pkg), str(tmp_path / "viz" / "act.npz"),
                    log=lambda *a: None)
    z = np.load(out)
    assert z["input"].shape == (24, 20)
    assert z["post_cnn"].shape[0] == 4  # channels
    assert z["pre_rnn"].shape == (24, 4 * 10)
    assert z["log_probs"].shape[1] == vocab.n_words
    # probabilities normalised per frame
    np.testing.assert_allclose(np.exp(z["log_probs"]).sum(-1), 1.0, rtol=1e-4)
