from .config import (
    AEConfig,
    ContentEncoderConfig,
    DataLoaderConfig,
    DecoderConfig,
    LambdaConfig,
    OptimizerConfig,
    SignalConfig,
    SpeakerEncoderConfig,
    TrainConfig,
    load_config,
    save_config,
)
from .mesh import make_mesh, batch_sharding, replicated_sharding, init_multihost

__all__ = [
    "AEConfig",
    "ContentEncoderConfig",
    "DataLoaderConfig",
    "DecoderConfig",
    "LambdaConfig",
    "OptimizerConfig",
    "SignalConfig",
    "SpeakerEncoderConfig",
    "TrainConfig",
    "load_config",
    "save_config",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "init_multihost",
]
