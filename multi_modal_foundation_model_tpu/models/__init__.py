from .layers import (
    ACT2FN,
    MLP,
    Attention,
    CrossAttention,
    DecoderLayer,
    EncoderLayer,
    ModalityTokenizer,
    ScaleNorm,
    fixup_scaled_init,
    torch_bias_init,
    torch_linear_init,
)
from .multimodal import (
    ModalityInput,
    MultiModal,
    MultiModalConfig,
    MultiModalOutput,
)
from .baseline import (
    BaselineDecoder,
    BaselineEncoder,
    BaselineOutput,
)
from .region_lookup import RegionLookup

__all__ = [
    "ACT2FN",
    "Attention",
    "BaselineDecoder",
    "BaselineEncoder",
    "BaselineOutput",
    "CrossAttention",
    "DecoderLayer",
    "EncoderLayer",
    "MLP",
    "ModalityInput",
    "ModalityTokenizer",
    "MultiModal",
    "MultiModalConfig",
    "MultiModalOutput",
    "RegionLookup",
    "ScaleNorm",
    "fixup_scaled_init",
    "torch_bias_init",
    "torch_linear_init",
]
