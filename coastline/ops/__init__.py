from coastline.ops.primitives import (  # noqa: F401
    Conv,
    ConvTranspose,
    Norm,
    adaptive_avg_pool,
    adaptive_max_pool,
    avg_pool_global,
    bilinear_resize,
    max_pool,
    max_pool_global,
    max_pool_with_indices,
    max_unpool,
    upsample_nearest,
)
from coastline.ops import blocks  # noqa: F401
