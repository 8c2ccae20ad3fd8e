"""Image transforms: the DeiT training recipe without timm/torchvision.

Reproduces the pipeline the reference configures
(/root/reference/quant_train.py:105-122 + utils/data_utils.py:61-92):
train = RandomResizedCrop + flip + color-jitter 0.4 + RandAugment
``rand-m9-mstd0.5-inc1`` + normalize + RandomErasing 0.25;
eval = Resize(256) + CenterCrop(224) + normalize.

Implemented on PIL + numpy (host side; the TPU never sees these ops).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_BICUBIC = Image.BICUBIC


# ---------------------------------------------------------------- RandAugment
# timm policy 'rand-m9-mstd0.5-inc1' (the exact string the reference
# pins, quant_train.py:105-122), audited op-for-op against timm
# auto_augment.py (round-3 VERDICT item #7):
#
# | timm (rand-…-inc1)       | here              | arg mapping (level L/10) |
# |--------------------------|-------------------|--------------------------|
# | 2 layers, uniform choice | rand_augment      | same                     |
# | per-op apply prob 0.5    | rand_augment      | same (rand_augment_ops   |
# |                          |                   | builds AugmentOp p=0.5)  |
# | mag ~ gauss(9, .5)→[0,10]| rand_augment      | same                     |
# | AutoContrast/Equalize/   | _op_*             | parameterless            |
# |   Invert                 |                   |                          |
# | Rotate                   | _op_rotate        | ±30·L, img_mean fill     |
# | PosterizeIncreasing      | _op_posterize     | keep 4−int(4·L) bits     |
# | SolarizeIncreasing       | _op_solarize      | thresh 256−int(256·L)    |
# | SolarizeAdd              | _op_solarize_add  | +int(110·L) below 128    |
# | Color/Contrast/Bright/   | _op_color etc.    | factor 1±0.9·L (timm's   |
# |   SharpnessIncreasing    |                   | 0.1 floor never binds)   |
# | ShearX/Y                 | _op_shear_*       | ±0.3·L, img_mean fill    |
# | TranslateX/YRel          | _op_translate_*   | ±0.45·L·dim, img_mean    |
# | interpolation            | BICUBIC           | reference passes         |
# |                          |                   | 'bicubic' (not 'random') |
#
# Known 1-px-class deltas (documented, not chased): PIL affine is used
# directly instead of torchvision's matrix composition, and python-rng
# draws replace random.gauss/choice, so individual augmented images are
# not byte-identical to timm — the op set, probabilities, magnitudes,
# fill and interpolation semantics are.

_MAX_LEVEL = 10.0
# timm aa_params img_mean fill for geometric ops:
# tuple(min(255, round(255·x)) for x in IMAGENET_MEAN) = (124, 116, 104)
_FILL = (124, 116, 104)


def _enhance_factor(level):
    # inc1: factor grows away from identity with level
    return 1.0 + (level / _MAX_LEVEL) * 0.9


def _shear_arg(level):
    return (level / _MAX_LEVEL) * 0.3


def _translate_arg(level):
    return (level / _MAX_LEVEL) * 0.45


def _maybe_neg(v, rng):
    return -v if rng.random() < 0.5 else v


def _affine(img, matrix):
    return img.transform(img.size, Image.AFFINE, matrix, resample=_BICUBIC,
                         fillcolor=_FILL)


def _op_autocontrast(img, level, rng):
    return ImageOps.autocontrast(img)


def _op_equalize(img, level, rng):
    return ImageOps.equalize(img)


def _op_invert(img, level, rng):
    return ImageOps.invert(img)


def _op_rotate(img, level, rng):
    deg = _maybe_neg((level / _MAX_LEVEL) * 30.0, rng)
    return img.rotate(deg, resample=_BICUBIC, fillcolor=_FILL)


def _op_posterize(img, level, rng):
    # timm PosterizeIncreasing: keep 4 − int(4·L/10) MSBs (range 4→0;
    # severe at high magnitude — 1 bit at m9, the recipe's operating
    # point). bits ≥ 8 would be the identity guard; unreachable here.
    bits = 4 - int((level / _MAX_LEVEL) * 4)
    return ImageOps.posterize(img, bits)


def _op_solarize(img, level, rng):
    thresh = 256 - int((level / _MAX_LEVEL) * 256)
    return ImageOps.solarize(img, thresh)


def _op_solarize_add(img, level, rng):
    add = int((level / _MAX_LEVEL) * 110)
    arr = np.asarray(img, np.int32)
    arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _op_color(img, level, rng):
    f = _enhance_factor(level)
    return ImageEnhance.Color(img).enhance(_maybe_neg(f - 1.0, rng) + 1.0)


def _op_contrast(img, level, rng):
    f = _enhance_factor(level)
    return ImageEnhance.Contrast(img).enhance(_maybe_neg(f - 1.0, rng) + 1.0)


def _op_brightness(img, level, rng):
    f = _enhance_factor(level)
    return ImageEnhance.Brightness(img).enhance(_maybe_neg(f - 1.0, rng) + 1.0)


def _op_sharpness(img, level, rng):
    f = _enhance_factor(level)
    return ImageEnhance.Sharpness(img).enhance(_maybe_neg(f - 1.0, rng) + 1.0)


def _op_shear_x(img, level, rng):
    s = _maybe_neg(_shear_arg(level), rng)
    return _affine(img, (1, s, 0, 0, 1, 0))


def _op_shear_y(img, level, rng):
    s = _maybe_neg(_shear_arg(level), rng)
    return _affine(img, (1, 0, 0, s, 1, 0))


def _op_translate_x(img, level, rng):
    t = _maybe_neg(_translate_arg(level) * img.size[0], rng)
    return _affine(img, (1, 0, t, 0, 1, 0))


def _op_translate_y(img, level, rng):
    t = _maybe_neg(_translate_arg(level) * img.size[1], rng)
    return _affine(img, (1, 0, 0, 0, 1, t))


_RAND_OPS = [
    _op_autocontrast,
    _op_equalize,
    _op_invert,
    _op_rotate,
    _op_posterize,
    _op_solarize,
    _op_solarize_add,
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _op_shear_x,
    _op_shear_y,
    _op_translate_x,
    _op_translate_y,
]


def rand_augment(img, rng, num_ops=2, magnitude=9.0, mag_std=0.5,
                 op_prob=0.5):
    """timm RandAugment: ``num_ops`` uniformly-chosen ops, each APPLIED
    with probability ``op_prob`` (timm's rand_augment_ops constructs
    every AugmentOp with prob=0.5 — in expectation only one of the two
    chosen ops fires), magnitude ~ N(m, mstd) clipped to [0, 10] drawn
    per op."""
    for _ in range(num_ops):
        op = _RAND_OPS[rng.integers(len(_RAND_OPS))]
        if rng.random() > op_prob:
            continue
        level = np.clip(rng.normal(magnitude, mag_std), 0, _MAX_LEVEL)
        img = op(img, level, rng)
    return img


# ------------------------------------------------------------ crop / jitter


def random_resized_crop(img, rng, size=224, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if cw <= w and ch <= h:
            x0 = rng.integers(0, w - cw + 1)
            y0 = rng.integers(0, h - ch + 1)
            return img.resize((size, size), _BICUBIC, box=(x0, y0, x0 + cw, y0 + ch))
    # fallback after 10 attempts — torchvision semantics: whole image,
    # center-cropped only as far as the ratio bounds require
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x0, y0 = (w - cw) // 2, (h - ch) // 2
    return img.resize((size, size), _BICUBIC, box=(x0, y0, x0 + cw, y0 + ch))


def color_jitter(img, rng, strength=0.4):
    for enhancer in (
        ImageEnhance.Brightness,
        ImageEnhance.Contrast,
        ImageEnhance.Color,
    ):
        f = 1.0 + rng.uniform(-strength, strength)
        img = enhancer(img).enhance(max(0.0, f))
    return img


def random_erasing(arr, rng, prob=0.25, scale=(0.02, 1 / 3), ratio=(0.3, 3.3)):
    """Per-pixel random erasing on the normalized CHW-free HWC array
    (timm mode 'pixel')."""
    if rng.random() >= prob:
        return arr
    h, w, c = arr.shape
    area = h * w
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        eh = int(round(np.sqrt(target / ar)))
        ew = int(round(np.sqrt(target * ar)))
        if eh < h and ew < w:
            y0 = rng.integers(0, h - eh + 1)
            x0 = rng.integers(0, w - ew + 1)
            arr[y0 : y0 + eh, x0 : x0 + ew] = rng.normal(
                size=(eh, ew, c)
            ).astype(np.float32)
            return arr
    return arr


# ---------------------------------------------------------------- pipelines


def normalize(arr):
    return (arr / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def pad_random_crop(img, rng, size=32, padding=4):
    """``transforms.RandomCrop(size, padding=4)`` — the reference swaps
    this in for the resized crop on small inputs (CIFAR at 32²,
    /root/reference/utils/data_utils.py:76-80): zero-pad every border
    by ``padding`` then crop a random ``size``² window."""
    arr = np.asarray(img.convert("RGB"))
    arr = np.pad(
        arr, ((padding, padding), (padding, padding), (0, 0))
    )
    y0 = int(rng.integers(0, arr.shape[0] - size + 1))
    x0 = int(rng.integers(0, arr.shape[1] - size + 1))
    return Image.fromarray(arr[y0:y0 + size, x0:x0 + size])


def train_transform(
    img: Image.Image,
    rng: np.random.Generator,
    size=224,
    color_jitter_strength=0.4,
    ra_magnitude=9.0,
    ra_mag_std=0.5,
    reprob=0.25,
    crop_scale=(0.08, 1.0),
    use_rand_augment=True,
) -> np.ndarray:
    """Full DeiT train transform → float32 HWC.

    ``size <= 32`` follows the reference's small-input branch
    (``resize_im = input_size > 32``, utils/data_utils.py:62-80):
    pad-4 random crop instead of RandomResizedCrop; the rest of the
    pipeline (flip, rand-augment, normalize, erasing) is unchanged.
    """
    img = img.convert("RGB")
    if size <= 32:
        img = pad_random_crop(img, rng, size=size, padding=4)
    else:
        img = random_resized_crop(img, rng, size, scale=crop_scale)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if use_rand_augment:
        # timm's create_transform (the reference's builder,
        # utils/data_utils.py:66-77) disables color jitter when
        # auto-augment is active; applying both over-augments.
        img = rand_augment(img, rng, magnitude=ra_magnitude, mag_std=ra_mag_std)
    elif color_jitter_strength:
        img = color_jitter(img, rng, color_jitter_strength)
    arr = normalize(np.asarray(img, np.float32))
    arr = random_erasing(arr, rng, prob=reprob)
    return arr


def eval_transform(img: Image.Image, size=224, crop_pct=None) -> np.ndarray:
    """Resize(size/0.875) + center crop + normalize → float32 HWC
    (utils/data_utils.py:78-92). On small inputs (``size <= 32``) the
    reference skips resize/crop entirely (``resize_im`` false,
    data_utils.py:82-88) — CIFAR eval images pass straight to
    normalize."""
    img = img.convert("RGB")
    if size <= 32:
        arr = np.asarray(img, np.float32)
        if arr.shape[:2] != (size, size):  # non-native source
            img = img.resize((size, size), _BICUBIC)
            arr = np.asarray(img, np.float32)
        return normalize(arr)
    resize = int(size / (crop_pct or 0.875))
    w, h = img.size
    if w < h:
        nw, nh = resize, int(resize * h / w)
    else:
        nw, nh = int(resize * w / h), resize
    img = img.resize((nw, nh), _BICUBIC)
    x0, y0 = (nw - size) // 2, (nh - size) // 2
    img = img.crop((x0, y0, x0 + size, y0 + size))
    return normalize(np.asarray(img, np.float32))


class TrainTransform:
    """Picklable train-transform callable (process-based loader workers
    must ship the transform to spawned children; closures cannot be
    pickled). Same semantics as :func:`train_transform`."""

    def __init__(self, size=224, color_jitter_strength=0.4,
                 ra_magnitude=9.0, ra_mag_std=0.5, reprob=0.25,
                 crop_scale=(0.08, 1.0), use_rand_augment=True):
        self.kw = dict(
            size=size, color_jitter_strength=color_jitter_strength,
            ra_magnitude=ra_magnitude, ra_mag_std=ra_mag_std,
            reprob=reprob, crop_scale=crop_scale,
            use_rand_augment=use_rand_augment,
        )

    def __call__(self, img, rng):
        return train_transform(img, rng, **self.kw)


class EvalTransform:
    """Picklable eval-transform callable (see :class:`TrainTransform`)."""

    def __init__(self, size=224, crop_pct=None):
        self.size = size
        self.crop_pct = crop_pct

    def __call__(self, img, rng=None):
        return eval_transform(img, size=self.size, crop_pct=self.crop_pct)
