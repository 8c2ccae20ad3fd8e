"""Pretrained checkpoint importers (torch state-dicts and Flax npz).

The reference pulls DeiT/Swin torch checkpoints from fb/MS hub URLs with
``strict=False`` (/root/reference/models/vit_quant.py:296-322,
swin_quant.py:567-627) and Google-Brain augreg ``.npz`` files via a
custom mapper (/root/reference/models/utils.py:10-163). Here the same
public checkpoints map onto our parameter pytree:

* torch linear ``weight`` is (out, in) → our ``kernel`` is (in, out);
* the patch-embed conv ``weight`` (D, C, ph, pw) becomes the
  space-to-depth matmul kernel (ph·pw·C, D) with row order (ph, pw, c)
  — matching QuantPatchEmbed's patch flattening;
* LayerNorm ``weight``/``bias`` → IntLayerNorm ``scale``/``bias``.

Missing/extra keys are tolerated and logged (strict=False semantics).
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict

import numpy as np

# torch's bicubic uses the Keys cubic-convolution kernel with A = -0.75
# (aten UpSample.h cubic_convolution1/2); jax.image.resize uses A = -0.5,
# a genuinely different kernel — hence this exact reimplementation.
_CUBIC_A = -0.75


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """The 4 tap weights torch computes per fractional offset ``t``
    (aten get_cubic_upsample_coefficients): taps at offsets
    (-1, 0, +1, +2) around ``floor(src)``."""
    A = np.float32(_CUBIC_A)
    t = t.astype(np.float32)

    def conv1(x):  # |x| <= 1
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def conv2(x):  # 1 < |x| < 2
        return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

    return np.stack(
        [conv2(t + 1), conv1(t), conv1(1 - t), conv2(2 - t)], axis=0
    ).astype(np.float32)


def _cubic_taps(n_in: int, n_out: int):
    """Source tap indices (4, n_out) int and weights (4, n_out) f32 for
    one axis of ``F.interpolate(mode='bicubic', align_corners=False)``:
    src = (dst + 0.5)·(in/out) − 0.5, taps clamped to the border
    (aten area_pixel_compute_source_index + upsample_get_value_bounded).
    """
    scale = np.float32(n_in) / np.float32(n_out)
    dst = np.arange(n_out, dtype=np.float32)
    src = scale * (dst + np.float32(0.5)) - np.float32(0.5)
    base = np.floor(src).astype(np.int64)
    t = src - base
    w = _cubic_weights(t)
    idx = np.clip(
        base[None, :] + np.arange(-1, 3, dtype=np.int64)[:, None],
        0,
        n_in - 1,
    )
    return idx, w


def bicubic_resize_nchw(g: np.ndarray, h_new: int, w_new: int) -> np.ndarray:
    """``F.interpolate(x, (h_new, w_new), mode='bicubic',
    align_corners=False)`` in pure numpy, f32, matching torch's CPU
    kernel's separable order (horizontal cubic, then vertical cubic of
    the 4 horizontal results). Golden-tested against torch in
    tests/test_import.py: agreement is to f32 rounding (~1e-6 rel;
    torch's CPU kernel orders the FMAs differently), which is far below
    the int8 quantization step the resized pos-embed feeds into."""
    g = np.asarray(g, np.float32)
    ix, wx = _cubic_taps(g.shape[-1], w_new)
    iy, wy = _cubic_taps(g.shape[-2], h_new)
    # horizontal pass: (..., H, w_new) per tap, summed left-to-right
    cols = [g[..., ix[k]] * wx[k] for k in range(4)]
    h = ((cols[0] + cols[1]) + cols[2]) + cols[3]
    rows = [h[..., iy[k], :] * wy[k][:, None] for k in range(4)]
    return (((rows[0] + rows[1]) + rows[2]) + rows[3]).astype(np.float32)


def resize_pos_embed(
    posemb: np.ndarray, ntok_new: int, num_tokens: int = 1
) -> np.ndarray:
    """Bicubic grid resize of a (1, N, D) position embedding.

    The reference resizes augreg/DeiT pos-embeds whose grid differs from
    the model's via ``F.interpolate(mode='bicubic',
    align_corners=False)`` (/root/reference/models/utils.py:78-100).
    :func:`bicubic_resize_nchw` reproduces that in pure numpy — no
    torch in the import path (golden-tested vs torch to f32 rounding).
    """
    posemb_tok = posemb[:, :num_tokens]
    grid = posemb[0, num_tokens:]
    gs_old = int(round(math.sqrt(grid.shape[0])))
    gs_new = int(round(math.sqrt(ntok_new - num_tokens)))
    if gs_old * gs_old != grid.shape[0]:
        raise ValueError(f"pos embed grid {grid.shape[0]} not square")
    if gs_new * gs_new != ntok_new - num_tokens:
        raise ValueError(f"target token count {ntok_new} not square")
    g = np.ascontiguousarray(
        grid.reshape(1, gs_old, gs_old, -1).transpose(0, 3, 1, 2),
        dtype=np.float32,
    )
    g = bicubic_resize_nchw(g, gs_new, gs_new)
    g = g.transpose(0, 2, 3, 1).reshape(1, gs_new * gs_new, -1)
    return np.concatenate(
        [posemb_tok, g.astype(np.float32)], axis=1
    ).astype(np.float32)


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def torch_vit_to_params(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """Map a (De)iT torch state-dict to our VisionTransformer param tree."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    params: dict = {}

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, np.float32)

    if "cls_token" in sd:
        put(("cls_token",), sd["cls_token"])
    if "pos_embed" in sd:
        put(("pos_embed",), sd["pos_embed"])

    if "patch_embed.proj.weight" in sd:
        w = sd["patch_embed.proj.weight"]  # (D, C, ph, pw)
        kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
        put(("patch_embed", "proj", "kernel"), kernel)
        put(("patch_embed", "proj", "bias"), sd["patch_embed.proj.bias"])

    depth = 1 + max(
        (int(k.split(".")[1]) for k in sd if k.startswith("blocks.")),
        default=-1,
    )
    for i in range(depth):
        src = f"blocks.{i}"
        dst = f"blocks_{i}"
        for norm in ("norm1", "norm2"):
            put((dst, norm, "scale"), sd[f"{src}.{norm}.weight"])
            put((dst, norm, "bias"), sd[f"{src}.{norm}.bias"])
        put((dst, "attn", "qkv", "kernel"), sd[f"{src}.attn.qkv.weight"].T)
        if f"{src}.attn.qkv.bias" in sd:
            put((dst, "attn", "qkv", "bias"), sd[f"{src}.attn.qkv.bias"])
        put((dst, "attn", "proj", "kernel"), sd[f"{src}.attn.proj.weight"].T)
        put((dst, "attn", "proj", "bias"), sd[f"{src}.attn.proj.bias"])
        put((dst, "mlp", "fc1", "kernel"), sd[f"{src}.mlp.fc1.weight"].T)
        put((dst, "mlp", "fc1", "bias"), sd[f"{src}.mlp.fc1.bias"])
        put((dst, "mlp", "fc2", "kernel"), sd[f"{src}.mlp.fc2.weight"].T)
        put((dst, "mlp", "fc2", "bias"), sd[f"{src}.mlp.fc2.bias"])

    if "norm.weight" in sd:
        put(("norm", "scale"), sd["norm.weight"])
        put(("norm", "bias"), sd["norm.bias"])
    if "head.weight" in sd:
        put(("head", "kernel"), sd["head.weight"].T)
        put(("head", "bias"), sd["head.bias"])
    return params


def npz_vit_to_params(npz, depth: int) -> dict:
    """Map an augreg Flax ``.npz`` ViT checkpoint (the
    ``load_weights_from_npz`` analogue, models/utils.py:10-163)."""
    g = dict(npz)
    params: dict = {}

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, np.float32)

    put(("cls_token",), g["cls"])
    put(("pos_embed",), g["Transformer/posembed_input/pos_embedding"])
    w = g["embedding/kernel"]  # (ph, pw, C, D) already HWIO
    put(("patch_embed", "proj", "kernel"), w.reshape(-1, w.shape[-1]))
    put(("patch_embed", "proj", "bias"), g["embedding/bias"])

    for i in range(depth):
        src = f"Transformer/encoderblock_{i}"
        dst = f"blocks_{i}"
        put((dst, "norm1", "scale"), g[f"{src}/LayerNorm_0/scale"])
        put((dst, "norm1", "bias"), g[f"{src}/LayerNorm_0/bias"])
        put((dst, "norm2", "scale"), g[f"{src}/LayerNorm_2/scale"])
        put((dst, "norm2", "bias"), g[f"{src}/LayerNorm_2/bias"])

        att = f"{src}/MultiHeadDotProductAttention_1"
        D = g[f"{att}/query/kernel"].shape[0]
        qkv_k = np.concatenate(
            [g[f"{att}/{n}/kernel"].reshape(D, D) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [g[f"{att}/{n}/bias"].reshape(D) for n in ("query", "key", "value")]
        )
        put((dst, "attn", "qkv", "kernel"), qkv_k)
        put((dst, "attn", "qkv", "bias"), qkv_b)
        put((dst, "attn", "proj", "kernel"), g[f"{att}/out/kernel"].reshape(D, D))
        put((dst, "attn", "proj", "bias"), g[f"{att}/out/bias"])

        mlp = f"{src}/MlpBlock_3"
        put((dst, "mlp", "fc1", "kernel"), g[f"{mlp}/Dense_0/kernel"])
        put((dst, "mlp", "fc1", "bias"), g[f"{mlp}/Dense_0/bias"])
        put((dst, "mlp", "fc2", "kernel"), g[f"{mlp}/Dense_1/kernel"])
        put((dst, "mlp", "fc2", "bias"), g[f"{mlp}/Dense_1/bias"])

    put(("norm", "scale"), g["Transformer/encoder_norm/scale"])
    put(("norm", "bias"), g["Transformer/encoder_norm/bias"])
    if "head/kernel" in g:
        put(("head", "kernel"), g["head/kernel"])
        put(("head", "bias"), g["head/bias"])
    return params


def merge_params(init_params: dict, loaded: dict, prefix=""):
    """strict=False merge: loaded values override where shapes match."""
    out = {}
    for k, v in init_params.items():
        if k in loaded:
            if isinstance(v, dict):
                out[k] = merge_params(v, loaded[k], f"{prefix}{k}/")
            elif tuple(loaded[k].shape) == tuple(np.shape(v)):
                out[k] = loaded[k]
            else:
                logging.warning(
                    "shape mismatch at %s%s: ckpt %s vs model %s — keeping init",
                    prefix, k, loaded[k].shape, np.shape(v),
                )
                out[k] = v
        else:
            logging.warning("missing in checkpoint: %s%s", prefix, k)
            out[k] = v
    return out


# The reference's published pretrained checkpoints, fetched when
# --pretrained auto is requested (the reference hardcodes these fetches
# in its factories: /root/reference/models/vit_quant.py:297-379,
# swin_quant.py:580-623).
PRETRAINED_URLS = {
    "deit_tiny": "https://dl.fbaipublicfiles.com/deit/deit_tiny_patch16_224-a1311bcf.pth",
    "deit_small": "https://dl.fbaipublicfiles.com/deit/deit_small_patch16_224-cd65a155.pth",
    "deit_base": "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_224-b5f2ef4d.pth",
    "vit_base": (
        "https://storage.googleapis.com/vit_models/augreg/"
        "B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0"
        "--imagenet2012-steps_20k-lr_0.01-res_224.npz"
    ),
    "vit_large": (
        "https://storage.googleapis.com/vit_models/augreg/"
        "L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.1-sd_0.1"
        "--imagenet2012-steps_20k-lr_0.01-res_224.npz"
    ),
    "swin_tiny": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_tiny_patch4_window7_224.pth",
    "swin_small": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_small_patch4_window7_224.pth",
    "swin_base": "https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_base_patch4_window7_224.pth",
}


def _fetch_pretrained(model_name: str) -> str:
    """Download the reference's published checkpoint for ``model_name``
    into the torch hub cache; returns the local path. Needs network."""
    import urllib.parse

    try:
        url = PRETRAINED_URLS[model_name]
    except KeyError:
        raise ValueError(
            f"no published pretrained checkpoint for {model_name!r}; "
            f"known: {sorted(PRETRAINED_URLS)}"
        ) from None
    import torch.hub

    hub_dir = os.path.join(torch.hub.get_dir(), "checkpoints")
    os.makedirs(hub_dir, exist_ok=True)
    fname = os.path.basename(urllib.parse.urlparse(url).path)
    dst = os.path.join(hub_dir, fname)
    if not os.path.exists(dst):
        try:
            torch.hub.download_url_to_file(url, dst, progress=False)
        except Exception as e:  # no network in air-gapped deployments
            raise RuntimeError(
                f"could not fetch {url}: {e}. Download it on a "
                f"networked machine and pass --pretrained <local path>."
            ) from e
    return dst


def load_pretrained(path: str, model_name: str, init_params: dict) -> dict:
    """Load a torch ``.pth``/``.pth.tar`` or Flax ``.npz`` checkpoint into
    an initialized param tree. ``path='auto'`` fetches the reference's
    published checkpoint for ``model_name`` (torch-hub cached)."""
    if path == "auto":
        path = _fetch_pretrained(model_name)
    if path.endswith(".npz"):
        depth = 1 + max(
            int(k.split("_")[1]) for k in init_params if k.startswith("blocks_")
        )
        loaded = npz_vit_to_params(np.load(path), depth)
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        if model_name.startswith("swin"):
            from .import_swin import torch_swin_to_params

            loaded = torch_swin_to_params(sd)
        else:
            loaded = torch_vit_to_params(sd)
    if "pos_embed" in loaded and "pos_embed" in init_params:
        tgt = tuple(np.shape(init_params["pos_embed"]))
        if tuple(loaded["pos_embed"].shape) != tgt:
            logging.info(
                "resizing pos_embed %s -> %s (bicubic)",
                loaded["pos_embed"].shape, tgt,
            )
            loaded["pos_embed"] = resize_pos_embed(
                loaded["pos_embed"], tgt[1]
            )
    return merge_params(init_params, loaded)
