"""Device-side image augmentation (jit/vmap-friendly, static shapes).

TPU-native counterpart of the reference's torchvision input pipeline
(reference ``examples/imagenet_pruning/dataset.py:35-56``:
RandomResizedCrop + RandomHorizontalFlip + Normalize for training,
Resize + CenterCrop + Normalize for eval). Host-side per-image PIL
transforms cannot feed a TPU at ImageNet scale; here the augmentation is
expressed as batched array ops that run INSIDE the jitted training step,
so it fuses with the model's compute and rides HBM, not the host.

The key idea: RandomResizedCrop is exactly a per-image affine resample —
sample a crop box, then map it to the fixed output size with
``jax.image.scale_and_translate`` (one gather-matmul per image, static
shapes). No dynamic shapes, no host round trip.

Deviation from torchvision, documented: torchvision rejection-samples up
to 10 crop boxes and falls back to a center crop; we draw one box and
clamp it to the image bounds (single-shot, branch-free — the induced crop
distribution differs slightly at extreme aspect ratios).
"""

import functools
import math

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Channel-wise standardization; ``images`` is (..., C) float in [0,1]
    (torchvision ``Normalize`` semantics)."""
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def random_horizontal_flip(images, key, p=0.5):
    """Per-image left-right flip with probability ``p``.

    images: (B, H, W, C). Branch-free: computes the flipped batch and
    selects per image (XLA fuses the select; no data-dependent control
    flow under jit).
    """
    flip = jax.random.bernoulli(key, p, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :],
                     images)


def _resample(image, box, out_hw, method):
    """Map crop box (y0, x0, h, w) — float, in input pixels — onto the
    fixed output size with an affine scale-and-translate resample."""
    oh, ow = out_hw
    y0, x0, h, w = box
    scale = jnp.stack([oh / h, ow / w])
    translation = jnp.stack([-y0 * oh / h, -x0 * ow / w])
    return jax.image.scale_and_translate(
        image, (oh, ow, image.shape[-1]), (0, 1), scale, translation,
        method=method, antialias=True,
    )


def random_resized_crop(images, key, out_size, scale=(0.08, 1.0),
                        ratio=(3.0 / 4.0, 4.0 / 3.0), method="linear"):
    """Batched RandomResizedCrop (torchvision semantics, single-shot
    clamped sampling — see module docstring).

    images: (B, H, W, C) float; out_size: int or (out_h, out_w).
    Returns (B, out_h, out_w, C).
    """
    B, H, W, _ = images.shape
    out_hw = (out_size, out_size) if isinstance(out_size, int) else tuple(out_size)
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)

    area = jax.random.uniform(k_area, (B,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k_ratio, (B,), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    r = jnp.exp(log_r)
    # crop h/w from target area fraction and aspect ratio, clamped to fit
    h = jnp.clip(jnp.sqrt(area * H * W / r), 8.0, H)
    w = jnp.clip(jnp.sqrt(area * H * W * r), 8.0, W)
    y0 = jax.random.uniform(k_y, (B,)) * (H - h)
    x0 = jax.random.uniform(k_x, (B,)) * (W - w)
    boxes = jnp.stack([y0, x0, h, w], axis=1)

    return jax.vmap(
        functools.partial(_resample, out_hw=out_hw, method=method)
    )(images, boxes)


def center_crop_resize(images, out_size, resize_size=None, method="linear"):
    """Eval-path Resize(shorter side)+CenterCrop as one affine resample
    (reference dataset.py:50-56). ``resize_size`` defaults to
    ``out_size * 256 // 224`` (the torchvision ImageNet convention)."""
    B, H, W, _ = images.shape
    oh, ow = (out_size, out_size) if isinstance(out_size, int) else tuple(out_size)
    if resize_size is None:
        resize_size = int(round(oh * 256 / 224))
    # after resizing the SHORTER side to resize_size, the center crop of
    # (oh, ow) corresponds to an input-space box of size (oh, ow)/zoom
    zoom = resize_size / min(H, W)
    h, w = oh / zoom, ow / zoom
    y0, x0 = (H - h) / 2.0, (W - w) / 2.0
    box = jnp.asarray([y0, x0, h, w], jnp.float32)
    boxes = jnp.broadcast_to(box, (B, 4))
    return jax.vmap(
        functools.partial(_resample, out_hw=(oh, ow), method=method)
    )(images, boxes)


def imagenet_train_transform(images, key, out_size=224, mean=IMAGENET_MEAN,
                             std=IMAGENET_STD):
    """The reference's training pipeline (dataset.py:35-46), on device:
    RandomResizedCrop -> RandomHorizontalFlip -> Normalize."""
    k_crop, k_flip = jax.random.split(key)
    x = random_resized_crop(images, k_crop, out_size)
    x = random_horizontal_flip(x, k_flip)
    return normalize(x, mean, std)


def imagenet_eval_transform(images, out_size=224, mean=IMAGENET_MEAN,
                            std=IMAGENET_STD):
    """The reference's eval pipeline (dataset.py:50-56), on device:
    Resize -> CenterCrop -> Normalize."""
    return normalize(center_crop_resize(images, out_size), mean, std)
