from tris_tpu.ops.resize import (
    bilinear_resize,
    nearest_resize,
    resize_matrix,
)

__all__ = ["bilinear_resize", "nearest_resize", "resize_matrix"]
