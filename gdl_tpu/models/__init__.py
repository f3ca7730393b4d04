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
)
from gdl_tpu.models.swin import SwinTransformer  # noqa: F401
