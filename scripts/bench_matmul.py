"""True sustained matmul rate probe: N dependent dot+requant round trips
inside ONE jit (fori_loop), so per-dispatch relay overhead — which
dominates single-op timings here (BENCH_NOTES) — is excluded."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 40
ITERS = 10
M = 128 * 197  # engine token rows


def main():
    rng = np.random.default_rng(0)
    shapes = {
        "qkv": (384, 1152),
        "fc1": (384, 1536),
        "fc2": (1536, 384),
        "proj": (384, 384),
    }
    for name, (K, N) in shapes.items():
        x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        wb8 = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
        macs = M * K * N + M * N * K  # fwd + back per rep

        def dot_rq(a, w):
            acc = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = jnp.round(acc.astype(jnp.float32) * 7.3e-4)
            return jnp.clip(y, -128, 127).astype(jnp.int8)

        @jax.jit
        def chain(a):
            def body(i, a):
                # i-dependent bias defeats loop-invariant hoisting
                a = (a + i.astype(jnp.int8)).astype(jnp.int8)
                return dot_rq(dot_rq(a, w8), wb8)

            return jax.lax.fori_loop(0, REPS, body, a)

        out = chain(x8)
        out.block_until_ready()
        int(jnp.sum(out.astype(jnp.int32)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = chain(out)
        int(jnp.sum(out.astype(jnp.int32)))
        dt = (time.perf_counter() - t0) / (ITERS * REPS)
        print(
            f"{name:5s} K={K:4d} N={N:4d}  dot+rq pair {dt*1e3:7.3f} ms "
            f"({macs/dt/1e12:6.1f} TMAC/s sustained)"
        )


if __name__ == "__main__":
    main()
