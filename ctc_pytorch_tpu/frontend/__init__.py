from ctc_pytorch_tpu.frontend.features import (  # noqa: F401
    FrontendConfig,
    fbank,
    mfcc,
    spectrogram,
    log_spectrum_librosa,
    add_deltas,
    frame_signal,
    mel_filterbank,
    dct_matrix,
    num_frames,
)
from ctc_pytorch_tpu.frontend.cmvn import (  # noqa: F401
    CmvnStats,
    accumulate_cmvn,
    finalize_cmvn,
    apply_cmvn,
    compute_global_cmvn,
)
from ctc_pytorch_tpu.frontend.splice import (  # noqa: F401
    make_context,
    skip_frames,
    pad_to_downsample,
    splice_and_skip,
)
