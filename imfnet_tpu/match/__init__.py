from imfnet_tpu.match.nn import (  # noqa: F401
    blocked_nn,
    find_nn,
    mutual_nn,
    radius_match,
)
from imfnet_tpu.match.procrustes import kabsch_umeyama  # noqa: F401
from imfnet_tpu.match.ransac import ransac_registration  # noqa: F401
from imfnet_tpu.match.irls import est_rigid_irls  # noqa: F401
from imfnet_tpu.match.icp import icp_point_to_point  # noqa: F401
from imfnet_tpu.match.metrics import (  # noqa: F401
    apply_transform,
    corr_dist,
    hit_ratio,
    inlier_ratio,
    pdist_sq,
    relative_rotation_error,
    relative_translation_error,
    transform_error,
)
