from .masking import (
    MASK_MODES,
    MaskParams,
    RegionSets,
    apply_mask,
    apply_mask_by_id,
    expand_timesteps,
    mode_to_id,
)
from .losses import (
    masked_mse,
    masked_poisson_nll,
    poisson_nll_elementwise,
)
from .attention import (
    create_context_mask,
    mask_to_bias,
    multi_head_attention,
)

__all__ = [
    "MASK_MODES",
    "MaskParams",
    "RegionSets",
    "apply_mask",
    "apply_mask_by_id",
    "create_context_mask",
    "expand_timesteps",
    "mask_to_bias",
    "masked_mse",
    "masked_poisson_nll",
    "mode_to_id",
    "multi_head_attention",
    "poisson_nll_elementwise",
]
