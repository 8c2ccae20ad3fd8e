"""Fine-grained ablation of the integer nonlinearity chains on the TPU.

Times each incremental step of the requant->shiftgelu->requant and
requant->shiftmax chains on DeiT-S batch-128 shapes, using the validated
loop-timing method (BENCH_NOTES.md): warm up, loop N iters, force one
host readback at the end.

Usage: python scripts/bench_chain_ops.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, N, C, CH, H = 128, 197, 384, 1536, 6
ITERS = 30
_I32_MAX = 2.0**31 - 1.0


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    out = fn_j(*args)
    first = jax.tree.leaves(out)[0]
    float(first.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    first = jax.tree.leaves(out)[0]
    float(first.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:55s} {dt:8.3f} ms")
    return dt


def exp2i(k):
    return jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32
    )


def main():
    rng = np.random.default_rng(0)
    # gelu-chain input: fc1 int32 accumulator
    acc = jnp.asarray(
        rng.integers(-(2**20), 2**20, (B * N, CH), dtype=np.int32)
    )
    r1 = np.float32(1e-5)
    scale = np.float32(0.03)
    n = 23.0
    print(f"tensor: ({B*N}, {CH}) int32 = {acc.size*4/1e6:.0f} MB")

    def t0(acc):
        return acc + 1  # int32 touch: read+write floor

    def t_req(acc):
        x = acc.astype(jnp.float32)
        return jnp.clip(jnp.round(x * r1), -128.0, 127.0)

    def t_req_max(acc):
        q = t_req(acc)
        return q - jnp.max(q, axis=-1, keepdims=True)

    def t_qln(acc):
        q = t_req_max(acc)
        return q + jnp.floor(q / 2.0) - jnp.floor(q / 16.0)

    def t_qt(acc):
        q = t_qln(acc)
        x0 = jnp.floor(-1.0 / scale)
        q = jnp.maximum(q, n * x0)
        qt = jnp.floor(q / x0)
        r = q - x0 * qt
        return qt, r

    def t_exp(acc):
        qt, r = t_qt(acc)
        x0 = jnp.floor(-1.0 / scale)
        e = jnp.floor((r - 2.0 * x0) * exp2i(n - 1.0 - qt))
        return jnp.clip(e, 0.0, _I32_MAX)

    def t_full_gelu(acc):
        x = acc.astype(jnp.float32)
        gq = jnp.clip(jnp.round(x * r1), -128.0, 127.0)
        q_max = jnp.max(gq, axis=-1, keepdims=True)
        q = gq - q_max
        q = q + jnp.floor(q / 2.0) - jnp.floor(q / 16.0)
        x0 = jnp.floor(-1.0 / (scale * 1.702))
        q = jnp.maximum(q, n * x0)
        qt = jnp.floor(q / x0)
        r = q - x0 * qt
        exp_int = jnp.clip(
            jnp.floor((r - 2.0 * x0) * exp2i(n - 1.0 - qt)), 0.0, _I32_MAX
        )
        # e^{-max} branch (reduced tensor, cheap)
        qm = -q_max
        qm = qm + jnp.floor(qm / 2.0) - jnp.floor(qm / 16.0)
        qm = jnp.maximum(qm, n * x0)
        qmt = jnp.floor(qm / x0)
        rm = qm - x0 * qmt
        exp_m = jnp.clip(
            jnp.floor((rm - 2.0 * x0) * exp2i(n - 1.0 - qmt)), 0.0, _I32_MAX
        )
        s = jnp.clip(exp_int + exp_m, 1.0, _I32_MAX)
        factor = jnp.floor(_I32_MAX / s)
        sig = jnp.floor(exp_int * factor / 2.0**24)
        g = gq * sig
        return jnp.clip(jnp.round(g * 3e-4), -128.0, 127.0).astype(jnp.int8)

    timeit("gelu: int32 +1 (hbm floor)", t0, acc)
    timeit("gelu: requant", t_req, acc)
    timeit("gelu: requant+maxsub", t_req_max, acc)
    timeit("gelu: +qln (x+x/2-x/16)", t_qln, acc)
    timeit("gelu: +qt,r (div/floor)", t_qt, acc)
    timeit("gelu: +exp2/clip", t_exp, acc)
    timeit("gelu: full chain", t_full_gelu, acc)

    # softmax-chain input: q@kT int32 accumulator (B,H,N,N)
    att = jnp.asarray(
        rng.integers(-(2**18), 2**18, (B * H, N, N), dtype=np.int32)
    )
    print(f"tensor: ({B*H}, {N}, {N}) int32 = {att.size*4/1e6:.0f} MB")
    nsm = 15.0
    ssm = np.float32(0.01)

    def s_req(att):
        return jnp.clip(jnp.round(att.astype(jnp.float32) * r1), -128.0, 127.0)

    def s_full(att):
        q = s_req(att)
        q = q - jnp.max(q, axis=-1, keepdims=True)
        q = q + jnp.floor(q / 2.0) - jnp.floor(q / 16.0)
        x0 = jnp.floor(-1.0 / ssm)
        q = jnp.maximum(q, nsm * x0)
        qt = jnp.floor(q / x0)
        r = q - x0 * qt
        exp_int = jnp.clip(
            jnp.floor((r - 2.0 * x0) * exp2i(nsm - 1.0 - qt)), 0.0, _I32_MAX
        )
        s = jnp.clip(jnp.sum(exp_int, -1, keepdims=True), 1.0, _I32_MAX)
        factor = jnp.floor(_I32_MAX / s)
        return jnp.floor(exp_int * factor / 2.0**16)

    timeit("smax: int32 touch", t0, att)
    timeit("smax: requant", s_req, att)
    timeit("smax: full chain", s_full, att)


if __name__ == "__main__":
    main()
