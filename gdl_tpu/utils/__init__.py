from gdl_tpu.utils.seed import setup_seed  # noqa: F401
from gdl_tpu.utils.metrics import PerClassAccuracy  # noqa: F401
from gdl_tpu.utils.logging import CSVLogger, TBLogger  # noqa: F401
from gdl_tpu.utils.checkpoint import (  # noqa: F401
    legacy_checkpoint_name,
    save_legacy_checkpoint,
    load_legacy_checkpoint,
    save_train_state,
    load_train_state,
)
