"""kaldiio stand-in for running the reference code in this image.

The reference calls ``kaldiio.load_mat(path)`` with an ``ark:offset``
rxspecifier (``timit/utils/data_loader.py:105``); our self-contained binary
ark reader implements the same contract.
"""

from ctc_pytorch_tpu.data.kaldi_io import load_mat  # noqa: F401
