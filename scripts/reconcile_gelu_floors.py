"""Reconcile the fc1→GELU region's two floors (VERDICT r4 #5).

The round-4 roofline flagged the "fc1→GELU-chain→s8" events (24/iter,
5.08 ms actual) at 1.38× their all-operands-roundtrip HBM floor
(3.69 ms), while the round-3 chain microbench said 60.7 Gelem/s — two
numbers that were never put in one frame. The engine structure
(deploy/engine.py:_block) is in fact TWO fusions per block, separated
by the round-2 ``_mat`` s8 barrier:

    A: int8 dot (B·N, C)@(C, 4C) + bias + per-channel requant → s8
    B: s8 → f32 → stable ShiftGELU chain → requant → s8

so the honest per-region floor is  MXU(A) + max(HBM(B), VPU(B)) — not
the roundtrip-HBM bound the generic roofline assigns. This script
measures each leg fori_loop-chained inside one jit at the exact
DeiT-S batch-128 engine shapes (the validated loop method — see
BENCH_NOTES "Measurement caveat") plus a pure stream pass for the HBM
rate, and prints which floor binds leg B and how much of the 1.38×
excess is recoverable vs spec (VPU-op) cost.

Usage: python scripts/reconcile_gelu_floors.py   (on the TPU)
"""

import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.ops import DEPLOY, shiftgelu

B, N, C, CH = 128, 197, 384, 1536
M = B * N
BLOCKS = 12
REPS = 20
ITERS = 10
S_IN = 0.05
R2 = 0.49


def run(fn, x0):
    @jax.jit
    def chain(x):
        def body(i, x):
            return fn(x, i)

        return jax.lax.fori_loop(0, REPS, body, x0)

    out = chain(x0)
    jax.block_until_ready(out)
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chain(x0)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (ITERS * REPS)


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-128, 128, (M, C)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-128, 128, (C, CH)), jnp.int8)
    bias = jnp.asarray(rng.integers(-(2**15), 2**15, (CH,)), jnp.int32)
    r1 = jnp.asarray(rng.uniform(1e-4, 2e-4, (CH,)), jnp.float32)
    g8_0 = jnp.asarray(rng.integers(-128, 128, (M, CH)), jnp.int8)
    static_p = math.ceil(1.0 / (1.702 * S_IN))

    def dot_epilogue(x):
        acc = jax.lax.dot_general(
            x, w8, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) + bias
        q = jnp.clip(jnp.round(acc.astype(jnp.float32) * r1), -128, 127)
        return q.astype(jnp.int8)

    def gelu_chain(g8):
        g, _ = shiftgelu(
            g8.astype(jnp.float32), jnp.float32(S_IN), out_bits=8,
            interp=DEPLOY, static_p=static_p, stable=True,
        )
        return jnp.clip(jnp.round(g * R2), -128, 127).astype(jnp.int8)

    # leg A: the fc1 dot fusion (s8 in → s8 out). The dot input depends
    # on the loop carrier through a cheap-but-unelidable `& 1` so the
    # GEMM cannot be hoisted out of the fori_loop.
    t_A = run(
        lambda x, i: dot_epilogue(x8 + (x[:, :C] & 1)), g8_0
    )
    # leg B: the chain fusion alone (s8 in → s8 out)
    t_B = run(lambda g, i: gelu_chain(g + i.astype(jnp.int8)), g8_0)
    # A+B compiled together (the engine's actual structure, _mat barrier)
    t_AB = run(
        lambda g, i: gelu_chain(
            jax.lax.optimization_barrier(
                dot_epilogue(x8 + (g[:, :C] & 1))
            )
        ),
        g8_0,
    )
    # stream rate on this chip: s8 read + s8 write at leg-B size
    t_S = run(lambda g, i: g + i.astype(jnp.int8), g8_0)
    bw = 2 * M * CH / t_S

    macs = M * C * CH
    elems = M * CH
    mxu = macs / t_A
    rate_B = elems / t_B
    # leg B HBM floor: s8 in + s8 out at the measured stream rate
    hbm_B = 2 * M * CH / bw

    print(f"shapes: ({M},{C})@({C},{CH}); {elems/1e6:.1f} Melem/leg-B")
    print(f"stream: {t_S*1e3:.3f} ms -> {bw/1e9:.0f} GB/s")
    print(f"leg A (dot+requant): {t_A*1e3:.3f} ms  ({mxu/1e12:.1f} TMAC/s)")
    print(f"leg B (stable-GELU chain): {t_B*1e3:.3f} ms  "
          f"({rate_B/1e9:.1f} Gelem/s)")
    print(f"leg B HBM floor: {hbm_B*1e3:.3f} ms  "
          f"(B runs at {t_B/hbm_B:.2f}x of it)")
    print(f"A+B together: {t_AB*1e3:.3f} ms  "
          f"(sum of parts {1e3*(t_A+t_B):.3f} ms -> overlap "
          f"{1e3*(t_A+t_B-t_AB):+.3f} ms)")

    per_iter = BLOCKS * t_AB
    floor = BLOCKS * (t_A + max(hbm_B, t_B))
    print(f"\nper-iter region (x{BLOCKS} blocks): measured-here "
          f"{per_iter*1e3:.2f} ms  vs roofline-actual 5.08 ms")
    vpu_bound = t_B > 1.15 * hbm_B
    print(
        f"binding floor for leg B: {'VPU-op (spec)' if vpu_bound else 'HBM'}"
        f" — recoverable in region ≤ "
        f"{1e3*max(0.0, per_iter - floor):.2f} ms/iter"
    )
    print(
        "reading: the roofline's 1.38x-of-HBM excess is "
        + ("the chain's VPU op cost at XLA's own best rate (spec-bound; "
           "matches the microbench within noise) — not recoverable fat."
           if vpu_bound else
           "NOT explained by VPU cost — leg B has HBM headroom worth "
           "chasing.")
    )


if __name__ == "__main__":
    main()
