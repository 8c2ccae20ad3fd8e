"""Weight-as-arguments engine wrapper.

``build_vit_infer``/``build_swin_infer`` close over the artifact's
arrays, so the jitted program embeds every weight as an XLA constant.
That is fine at DeiT scale (and lets XLA constant-fold requant ratios),
but a vit_large program carries ~300 MB of int8 constants — past the
remote-compile relay's upload limit (HTTP 413, measured), and in any
real serving system weights should be device buffers that can be
swapped without recompiling.

This wrapper splits the artifact: every array leaf above a size
threshold becomes a jit ARGUMENT (uploaded once as a device buffer);
scalars and small arrays stay embedded (the engine builders read them
as host floats for static elision decisions — ``float(blk["s_bias"])``
etc. — so they must remain concrete at trace time).

Bit-exactness: the engine graph is identical except that large
constants arrive as parameters; XLA's per-element arithmetic does not
depend on operand provenance. Pinned by tests/test_weight_args.py
(closure engine ≡ weight-args engine, both families).

Reference context: the reference's TVM path likewise separates the
graph from ``params.npy`` (relay.build consumes params as inputs —
TVM_benchmark/evaluate_accuracy.py:79-88).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Leaves larger than this many elements become jit arguments. 1024 keeps
# every per-channel scale / bias vector embedded (constant-foldable into
# requant epilogues) while lifting weight matrices and bias tables.
_ARG_THRESHOLD = 1024


def _collect(node, path, out):
    if node is None:
        return
    if isinstance(node, dict):
        for k, v in node.items():
            _collect(v, path + (k,), out)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            _collect(v, path + (i,), out)
    elif isinstance(node, (np.ndarray, jax.Array)):
        if node.ndim >= 1 and node.size > _ARG_THRESHOLD:
            out[path] = np.asarray(node)


def _substitute(node, path, repl):
    if isinstance(node, dict):
        return {k: _substitute(v, path + (k,), repl) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        items = [_substitute(v, path + (i,), repl) for i, v in enumerate(node)]
        return tuple(items) if isinstance(node, tuple) else items
    return repl.get(path, node)


def build_infer_weight_args(artifact: dict, build_fn, **build_kw):
    """``build_fn(artifact, **kw)`` with large arrays as jit arguments.

    Returns a jitted ``images → logits`` callable whose program embeds
    only the artifact's scalars/small vectors; the heavy buffers are
    passed (and cached on device) as arguments.
    """
    bufs: dict = {}
    _collect(artifact, (), bufs)
    keys = sorted(bufs, key=str)

    def fn(buflist, x):
        art = _substitute(artifact, (), dict(zip(keys, buflist)))
        return build_fn(art, **build_kw)(x)

    jfn = jax.jit(fn)
    buflist = [jnp.asarray(bufs[k]) for k in keys]
    return lambda x: jfn(buflist, x)
