"""On-device batch augmentation: mixup / cutmix with soft targets.

JAX re-design of the timm ``Mixup`` the reference configures
(/root/reference/quant_train.py:125-136,178-184): mixup alpha 0.8,
cutmix alpha 1.0, switch prob 0.5, label smoothing folded into the soft
targets. Runs inside jit on-device (batch-level 'elem' mode).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MixupConfig(NamedTuple):
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000


def _one_hot_smooth(labels, num_classes, smoothing):
    # timm convention: true class gets 1-ε+ε/n, others ε/n (sums to 1).
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, h, w, lam):
    """Cutmix box with area ratio (1-lam); returns a (h, w) mask."""
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = (h * cut).astype(jnp.int32), (w * cut).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - ch // 2, 0, h)
    y1 = jnp.clip(cy + ch // 2, 0, h)
    x0 = jnp.clip(cx - cw // 2, 0, w)
    x1 = jnp.clip(cx + cw // 2, 0, w)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1)
    return mask, y0, y1, x0, x1


def mixup_cutmix(rng, images, labels, cfg: MixupConfig):
    """Apply mixup or cutmix to a batch (NHWC) and return soft targets.

    The partner sample is the batch reversed (timm 'batch' pairing).
    Returns ``(mixed_images, soft_targets)``.
    """
    k_lam, k_switch, k_box, k_lam2 = jax.random.split(rng, 4)
    targets = _one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    flipped_img = images[::-1]
    flipped_tgt = targets[::-1]

    use_cutmix = jax.random.bernoulli(k_switch, cfg.switch_prob)

    lam_mix = jax.random.beta(k_lam, cfg.mixup_alpha, cfg.mixup_alpha)
    lam_cut = jax.random.beta(k_lam2, cfg.cutmix_alpha, cfg.cutmix_alpha)

    h, w = images.shape[1], images.shape[2]
    mask, y0, y1, x0, x1 = _rand_bbox(k_box, h, w, lam_cut)
    # Correct lambda by the realized (clipped) box area.
    lam_cut_real = 1.0 - ((y1 - y0) * (x1 - x0)) / float(h * w)

    cut_img = jnp.where(mask[None, :, :, None], flipped_img, images)
    mix_img = images * lam_mix + flipped_img * (1.0 - lam_mix)

    images_out = jnp.where(use_cutmix, cut_img, mix_img)
    lam = jnp.where(use_cutmix, lam_cut_real, lam_mix)
    targets_out = targets * lam + flipped_tgt * (1.0 - lam)
    return images_out, targets_out
