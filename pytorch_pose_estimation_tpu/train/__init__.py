from .device_cache import DeviceDataCache, build_device_cache
from .state import TrainState, create_train_state
from .steps import make_sbp_steps, make_spm_steps
from .trainer import Trainer

__all__ = [
    "DeviceDataCache",
    "build_device_cache",
    "TrainState",
    "create_train_state",
    "make_sbp_steps",
    "make_spm_steps",
    "Trainer",
]
