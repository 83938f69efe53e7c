from mr_gnas_tpu.train.config import (
    LPSearchConfig,
    LPTrainConfig,
    NCSearchConfig,
    NCTrainConfig,
)
from mr_gnas_tpu.train.lp_search import run_lp_search
from mr_gnas_tpu.train.lp_train import run_lp_train
from mr_gnas_tpu.train.nc_search import run_nc_search
from mr_gnas_tpu.train.nc_train import run_nc_train

__all__ = [
    "LPSearchConfig",
    "LPTrainConfig",
    "NCSearchConfig",
    "NCTrainConfig",
    "run_lp_search",
    "run_lp_train",
    "run_nc_search",
    "run_nc_train",
]
