from gdl_tpu.models.resnet import ResNet, resnet18, resnet50  # noqa: F401
from gdl_tpu.models.fusion import (  # noqa: F401
    SumFusion,
    SumFusionDGL,
    ConcatFusion,
    ConcatFusionDGL,
    ConcatFusionDGLUnimodal,
    ConcatFusionSwin,
    FiLM,
    FiLMDGL,
    GatedFusion,
    GatedFusionDGL,
    make_fusion,
)
from gdl_tpu.models.classifier import (  # noqa: F401
    AVClassifierDGL,
    AVClassifier,
    AVClassifierSwin,
    AVClassifierSwinDGL,
)
from gdl_tpu.models.swin import SwinTransformer  # noqa: F401
from gdl_tpu.models.se_resnet import SELayer, SEStem, SETrunk  # noqa: F401
from gdl_tpu.models.intermediate import (  # noqa: F401
    MMTM,
    MMTMNet,
    SEFusionNet,
    MMFormer,
    MMFormerN,
)
from gdl_tpu.models.transformer import (  # noqa: F401
    MMTransformerModel,
    TransformerModel,
    LearnedPositionalEncoding,
    modality_drop,
    unbalance_modality_drop,
)
