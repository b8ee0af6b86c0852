from imfnet_tpu.train.losses import (  # noqa: F401
    contrastive_loss,
    hardest_contrastive_loss,
    triplet_loss,
    hardest_triplet_loss,
)
