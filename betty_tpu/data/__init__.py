from betty_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop_resize,
    imagenet_eval_transform,
    imagenet_train_transform,
    normalize,
    random_horizontal_flip,
    random_resized_crop,
)
from betty_tpu.data.loader import ArrayLoader, prefetch_to_device, shard_loader

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "ArrayLoader",
    "prefetch_to_device",
    "shard_loader",
    "random_resized_crop",
    "random_horizontal_flip",
    "center_crop_resize",
    "normalize",
    "imagenet_train_transform",
    "imagenet_eval_transform",
]
