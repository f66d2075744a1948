from ctc_pytorch_tpu.decode.metrics import Scorer  # noqa: F401
from ctc_pytorch_tpu.decode.greedy import GreedyDecoder, greedy_collapse  # noqa: F401
from ctc_pytorch_tpu.decode.ngram_lm import LanguageModel, train_bigram_lm  # noqa: F401
from ctc_pytorch_tpu.decode.beam import BeamDecoder, ctc_beam_search  # noqa: F401
