from ctc_pytorch_tpu.data.kaldi_io import (  # noqa: F401
    read_ark_entry,
    read_scp,
    load_mat,
    ArkWriter,
    read_text_ark,
    read_cmvn_stats_text,
)
from ctc_pytorch_tpu.data.dataset import SpeechDataset  # noqa: F401
from ctc_pytorch_tpu.data.batching import (  # noqa: F401
    Batch,
    BucketBatcher,
    SpeechDataLoader,
    collate,
)
