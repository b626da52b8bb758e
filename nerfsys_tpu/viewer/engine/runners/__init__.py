from nerfsys_tpu.viewer.engine.runners.base import BaseRunner, ViewRunner, model_lock
from nerfsys_tpu.viewer.engine.runners.meta_train import MetaTrainRunner
from nerfsys_tpu.viewer.engine.runners.runtime_adapt import RuntimeAdaptRunner

__all__ = [
    "BaseRunner",
    "ViewRunner",
    "MetaTrainRunner",
    "RuntimeAdaptRunner",
    "model_lock",
]
