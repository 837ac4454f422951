from cvpr2020_manet_tpu.ops.matching import (
    WRONG_LABEL_PADDING_DISTANCE,
    global_matching,
    local_matching,
    normalize_distance,
    pairwise_sq_distances,
)

__all__ = [
    "WRONG_LABEL_PADDING_DISTANCE",
    "global_matching",
    "local_matching",
    "normalize_distance",
    "pairwise_sq_distances",
]
