"""VPU-rate duel: the ShiftGELU chain as an XLA fusion vs the Pallas
kernel, fori_loop-chained inside one jit (no dispatch pollution).

Decides whether a pipelined fc1→GELU→fc2 megakernel can win: if Mosaic
sustains the chain at XLA's rate, overlapping the MXU under it saves the
serialized dot time; if Mosaic is materially slower, kernels stay off.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.kernels import fused_requant_shiftgelu
from ivit_tpu.ops import DEPLOY, shiftgelu

REPS = 20
ITERS = 10
M, C = 128 * 197, 1536
S_IN = 0.05
R1 = 1.7e-4
R2 = 0.49


def run(fn, x0):
    @jax.jit
    def chain(x):
        def body(i, x):
            x = (x + i.astype(x.dtype)) if x.dtype == jnp.int32 else x
            return fn(x)

        return jax.lax.fori_loop(0, REPS, body, x0)

    out = chain(x0)
    out.block_until_ready()
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chain(x0)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (ITERS * REPS)


def main():
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(-(2**20), 2**20, (M, C)), jnp.int32)
    r1 = jnp.full((C,), R1, jnp.float32)

    def xla_chain(a):
        q = jnp.clip(jnp.round(a.astype(jnp.float32) * R1), -128, 127)
        g, _ = shiftgelu(
            q, jnp.float32(S_IN), out_bits=8, interp=DEPLOY,
            static_p=int(np.ceil(1.0 / (1.702 * S_IN))),
        )
        g8 = jnp.clip(jnp.round(g * R2), -128, 127).astype(jnp.int8)
        # keep the loop carrier int32 so the next rep re-runs the chain
        return g8.astype(jnp.int32) * 16381

    def pallas_chain(a):
        g8 = fused_requant_shiftgelu(
            a, r1, s_in=S_IN, r2=R2, out_bits=8
        )
        return g8.astype(jnp.int32) * 16381

    t_x = run(xla_chain, acc)
    print(f"XLA    requant+ShiftGELU+requant: {t_x*1e3:7.3f} ms "
          f"({M*C/t_x/1e9:6.1f} Gelem/s)")
    t_p = run(pallas_chain, acc)
    print(f"Pallas requant+ShiftGELU+requant: {t_p*1e3:7.3f} ms "
          f"({M*C/t_p/1e9:6.1f} Gelem/s)")


if __name__ == "__main__":
    main()
