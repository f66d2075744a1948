"""Import a reference-format torch package and verify forward parity.

Builds a torch model with the reference's exact module tree (so state_dict
keys match ``CTC_Model``), converts it, and checks our eval forward equals
torch's to fp32 tolerance — an end-to-end golden test of CNN+BN+BiLSTM+fc.
"""

from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from ctc_pytorch_tpu.cli.import_torch import (
    params_from_state_dict,
    spec_from_torch_package,
)
from ctc_pytorch_tpu.models import CTCModel


class _LayerCNN(nn.Module):
    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=p)
        self.batch_norm = nn.BatchNorm2d(cout)
        self.activation = nn.ReLU()
        self.dropout = nn.Dropout(0.0)

    def forward(self, x):
        return self.dropout(self.activation(self.batch_norm(self.conv(x))))


class _BatchRNN(nn.Module):
    def __init__(self, fin, h, bn):
        super().__init__()
        self.batch_norm = nn.BatchNorm1d(fin) if bn else None
        self.rnn = nn.LSTM(fin, h, bidirectional=True, bias=False)

    def forward(self, x):
        if self.batch_norm is not None:
            x = self.batch_norm(x.transpose(-1, -2)).transpose(-1, -2)
        x, _ = self.rnn(x)
        return x


class _TorchRef(nn.Module):
    """Same module tree as the reference CTC_Model (state_dict-compatible)."""

    def __init__(self, feat=20, h=8, layers=2, num_class=6):
        super().__init__()
        self.conv = nn.Sequential(OrderedDict([
            ("0", _LayerCNN(1, 4, (3, 3), (1, 2), (1, 1))),
            ("1", _LayerCNN(4, 4, (3, 3), (2, 2), (1, 1))),
        ]))
        f_out = 4 * (((feat + 2 - 3) // 2 + 1 + 2 - 3) // 2 + 1)
        rnns = [("0", _BatchRNN(f_out, h, False))]
        for i in range(1, layers):
            rnns.append((str(i), _BatchRNN(2 * h, h, True)))
        self.rnns = nn.Sequential(OrderedDict(rnns))
        self.fc = nn.Sequential(
            nn.BatchNorm1d(2 * h), nn.Linear(2 * h, num_class, bias=False)
        )

    def forward(self, x):
        x = self.conv(x.unsqueeze(1))
        x = x.transpose(1, 2).contiguous()
        b, t, c, f = x.shape
        x = x.view(b, t, c * f).transpose(0, 1).contiguous()
        x = self.rnns(x)
        t, b, hh = x.shape
        x = self.fc(x.view(t * b, hh)).view(t, b, -1)
        return torch.log_softmax(x, dim=-1)


@pytest.mark.slow
def test_torch_import_forward_parity():
    torch.manual_seed(0)
    feat, h, num_class = 20, 8, 6
    model = _TorchRef(feat, h, 2, num_class).eval()
    # exercise non-trivial BN running stats
    with torch.no_grad():
        model.train()
        for _ in range(3):
            model(torch.randn(4, 16, feat))
        model.eval()

    pkg = {
        "rnn_param": {
            "rnn_input_size": feat, "rnn_hidden_size": h, "rnn_layers": 2,
            "rnn_type": nn.LSTM, "bidirectional": True, "batch_norm": True,
        },
        "add_cnn": True,
        "cnn_param": {
            "layer": [
                [(1, 4), (3, 3), (1, 2), (1, 1), None],
                [(4, 4), (3, 3), (2, 2), (1, 1), None],
            ],
            "batch_norm": True,
        },
        "num_class": num_class,
        "_drop_out": 0.0,
        "state_dict": model.state_dict(),
    }
    spec = spec_from_torch_package(pkg)
    assert spec.rnn_in_after_cnn == 4 * 5  # 20 -> 10 -> 5 freq, 4 ch
    params, mstate = params_from_state_dict(spec, pkg["state_dict"])

    x = np.random.RandomState(1).randn(3, 16, feat).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours, _ = CTCModel.apply(spec, params, mstate, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
