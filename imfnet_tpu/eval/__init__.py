from imfnet_tpu.eval.extract import make_extractor, pad_points  # noqa: F401
from imfnet_tpu.eval.registration import make_pair_registration  # noqa: F401
