from mr_gnas_tpu.layers import MLPClassifier, MaskedBatchNorm
from mr_gnas_tpu.models.lp import (
    LPNetwork,
    LPSupernet,
    MixedScoreFn,
    bce_logits_loss,
    bce_probs_loss,
    distmult_triplet_score,
    lp_search_loss,
    lp_search_loss_grouped,
)
from mr_gnas_tpu.models.nc import NCNetwork, NCSupernet, nc_accuracy, nc_loss

__all__ = [
    "LPNetwork",
    "LPSupernet",
    "MLPClassifier",
    "MaskedBatchNorm",
    "MixedScoreFn",
    "NCNetwork",
    "NCSupernet",
    "bce_logits_loss",
    "bce_probs_loss",
    "distmult_triplet_score",
    "lp_search_loss",
    "lp_search_loss_grouped",
    "nc_accuracy",
    "nc_loss",
]
