"""Pin the frontend to the committed frozen fixture (VERDICT r2 item 8).

``tests/fixtures/frontend_golden.npz`` freezes fbank/mfcc/spectrum outputs
whose correctness was established by the independent piecewise checks in
``test_frontend_golden.py`` (scipy windows/DCT/FFT, torch.stft, brute-force
Kaldi-spec re-derivations — ``timit/conf/fbank.conf:1-3``,
``timit/conf/mfcc.conf:1``).  This test catches any future numerics drift
without re-deriving at test time, and keeps working in hermetic images
without scipy/torch.  Regenerate ONLY via tools/gen_frontend_fixture.py
after re-validating with the golden tests.
"""

from pathlib import Path

import numpy as np
import pytest

from ctc_pytorch_tpu.frontend.features import (
    add_deltas,
    fbank,
    log_spectrum_librosa,
    mfcc,
)
# SHARED with the generator: a test-local config copy would let an
# edited-but-unregenerated generator config pass silently against a stale
# fixture; importing it makes the forgotten regeneration fail here
from tools.gen_frontend_fixture import configs, waves

FIXTURE = Path(__file__).parent / "fixtures" / "frontend_golden.npz"

CONFIGS = configs()


def _compute(kind, cfg, wav):
    if kind == "fbank":
        return fbank(wav, cfg)
    if kind == "mfcc":
        return mfcc(wav, cfg)
    if kind == "mfcc_deltas":
        return add_deltas(mfcc(wav, cfg))
    return log_spectrum_librosa(wav)


@pytest.mark.parametrize("cname", sorted(CONFIGS))
def test_frontend_matches_frozen_fixture(cname):
    with np.load(FIXTURE) as z:
        kind, cfg = CONFIGS[cname]
        for wname, wav in waves().items():
            want = z[f"{wname}/{cname}"]
            got = np.asarray(_compute(kind, cfg, wav), np.float32)
            assert got.shape == want.shape, (wname, cname)
            # tolerance covers BLAS/fma reassociation across machines only;
            # any real numerics change trips this immediately (features are
            # log-scale, O(1)-O(10) magnitudes)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=3e-4,
                                       err_msg=f"{wname}/{cname}")


def test_fixture_is_complete():
    with np.load(FIXTURE) as z:
        keys = set(z.files)
    assert keys == {f"{w}/{c}" for w in waves() for c in CONFIGS}
