from plnlp_tpu.models.encoders import init_encoder, apply_encoder, ENCODER_NAMES
from plnlp_tpu.models.predictors import (
    init_predictor,
    apply_predictor,
    PREDICTOR_NAMES,
)

__all__ = [
    "init_encoder",
    "apply_encoder",
    "init_predictor",
    "apply_predictor",
    "ENCODER_NAMES",
    "PREDICTOR_NAMES",
]
