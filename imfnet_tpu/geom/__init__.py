from imfnet_tpu.geom.ply import read_ply, write_ply  # noqa: F401
from imfnet_tpu.geom.transforms import (  # noqa: F401
    axis_angle_rotation,
    sample_random_trans,
    apply_transform_np,
)
from imfnet_tpu.geom.image import process_image, load_image  # noqa: F401
from imfnet_tpu.geom.trajectory import (  # noqa: F401
    CameraPose,
    read_trajectory,
    write_trajectory,
    read_log,
    read_info_file,
)
