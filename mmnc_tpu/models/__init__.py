from .backbone import ScaleHyperprior
from .codecs import (
    MultiTaskCodecNet,
    MultiTaskCompressorBase,
    SingleTaskCompressor,
    MultiTaskMixedLatentCompressor,
    MultiTaskDisjointLatentCompressor,
    MultiTaskSharedLatentCompressor,
    MODEL_NUMBER,
    MODEL_NAME,
    CodecTables,
    build_model,
)
from . import losses
