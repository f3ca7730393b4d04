from gdl_tpu.data.wav import load_wav  # noqa: F401
from gdl_tpu.data.datasets import (  # noqa: F401
    AVDataset,
    AVEDataset,
    AudioSetDataset,
    CremadDataset,
    KSDataset,
    Kinetics400Dataset,
    VGGSoundDataset,
    make_dataset,
)
from gdl_tpu.data.loader import Loader  # noqa: F401
from gdl_tpu.data.synthetic import SyntheticDataset, synthetic_batch  # noqa: F401
from gdl_tpu.data.preprocess import (  # noqa: F401
    make_train_preprocess,
    make_eval_preprocess,
)
