from imfnet_tpu.data.collate import collate_pairs, VoxelizedPair  # noqa: F401
from imfnet_tpu.data.synthetic import synthetic_pair, synthetic_batch  # noqa: F401
