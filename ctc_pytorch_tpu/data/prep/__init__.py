from ctc_pytorch_tpu.data.prep.phones import (  # noqa: F401
    PHONE_MAP_60_48_39,
    phone_map,
    normalize_phones,
)
from ctc_pytorch_tpu.data.prep.sphere import read_sphere, read_audio  # noqa: F401
from ctc_pytorch_tpu.data.prep.timit import prepare_timit  # noqa: F401
