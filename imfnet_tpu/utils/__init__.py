from imfnet_tpu.utils.timer import Timer, AverageMeter, MinTimer  # noqa: F401
