from imfnet_tpu.sparse.coords import (  # noqa: F401
    SparseVoxels,
    make_keys,
    lookup,
    unique_voxels,
    stride_coords,
)
from imfnet_tpu.sparse.kernel_map import (  # noqa: F401
    kernel_offsets,
    kernel_map_same,
    kernel_map_down,
    kernel_map_up,
    CoordinatePyramid,
    build_pyramid,
)
from imfnet_tpu.sparse.ops import (  # noqa: F401
    sparse_conv,
    masked_batchnorm_stats,
    sparse_cat,
    row_mask,
)
