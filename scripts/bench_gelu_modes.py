"""ShiftGELU formulation duel at the engine's MLP shape: the
reference's row-max two-term softmax vs the elementwise-stable form
(m = max(x,0) per element → ONE exp chain + a constant; no cross-
element reduce). Chain: requant → ShiftGELU → requant, fori_loop-chained
inside one jit (the only timing method valid through the relay)."""

import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.ops import DEPLOY, shiftgelu, shiftgelu_stable_int_deploy

REPS = 20
ITERS = 10
M, C = 128 * 197, 1536
S_IN = 0.05
R1 = 1.7e-4
R2 = 0.49
P = math.ceil(1.0 / (1.702 * S_IN))


def run(fn, x0):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, REPS, lambda i, c: fn(c), x)

    out = chain(x0)
    out.block_until_ready()
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chain(x0)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (ITERS * REPS)


def make(stable):
    def f(a):
        q = jnp.clip(jnp.round(a.astype(jnp.float32) * R1), -128, 127)
        g, _ = shiftgelu(q, jnp.float32(S_IN), out_bits=8, interp=DEPLOY,
                         static_p=P, stable=stable)
        g8 = jnp.clip(jnp.round(g * R2), -128, 127).astype(jnp.int8)
        return g8.astype(jnp.int32) * 16381
    return f


def make_int():
    def f(a):
        q = jnp.clip(jnp.round(a.astype(jnp.float32) * R1), -128, 127)
        g, _ = shiftgelu_stable_int_deploy(
            q, jnp.float32(S_IN), out_bits=8, static_p=P
        )
        g8 = jnp.clip(jnp.round(g * R2), -128, 127).astype(jnp.int8)
        return g8.astype(jnp.int32) * 16381
    return f


def main():
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(-(2**20), 2**20, (M, C)), jnp.int32)
    for name, fn in (("rowmax", make(False)), ("stable", make(True)),
                     ("stable_int", make_int())):
        t = run(fn, acc)
        print(f"{name}: {t*1e3:7.3f} ms ({M*C/t/1e9:6.1f} Gelem/s)")


if __name__ == "__main__":
    main()
