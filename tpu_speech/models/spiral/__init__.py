from tpu_speech.models.spiral.encoder import (
    ConvLayerCfg,
    ConvTransformerBlockCfg,
    FeatureEncoder,
    Projector,
    TransformerCfg,
    spiral_base_blocks,
)
from tpu_speech.models.spiral.st2vec import (
    ST2VecConfig,
    ST2VecEncoder,
    spiral_base_config,
)

__all__ = [
    "ConvLayerCfg",
    "ConvTransformerBlockCfg",
    "FeatureEncoder",
    "Projector",
    "ST2VecConfig",
    "ST2VecEncoder",
    "TransformerCfg",
    "spiral_base_blocks",
    "spiral_base_config",
]
