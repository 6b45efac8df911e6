"""Scratch bench: fused FFN half-layer kernel vs the XLA chain on one chip.

Run: python scripts/bench_ffn_block.py [BATCH [ITERS [T,D,F]]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
if len(sys.argv) > 3:
    T, D, F = (int(x) for x in sys.argv[3].split(","))
else:
    T, D, F = 320, 768, 3072


def main():
    import jax
    import jax.numpy as jnp

    from speechclip_tpu.kernels.ffn_block import _forward as ffn_fwd
    from speechclip_tpu.kernels.ffn_block import _reference as ffn_ref
    from speechclip_tpu.kernels.ffn_block import ffn_eligible

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((D, F)) * 0.03).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.asarray((rng.standard_normal(F) * 0.03).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((F, D)) * 0.03).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.asarray((rng.standard_normal(D) * 0.03).astype(np.float32))
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)

    def timed(name, fn):
        f = jax.jit(fn)
        float(jnp.sum(f(x, w1, b1, w2, b2).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(f(x, w1, b1, w2, b2).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:24s} {dt*1e3:7.2f} ms/iter")
        return dt

    def loop(body):
        def fn(x, w1, b1, w2, b2):
            def step(i, acc):
                out = body(x + (acc[0] * 0).astype(x.dtype), w1, b1, w2, b2)
                return jnp.ones((1,), jnp.float32) * jnp.mean(
                    out.astype(jnp.float32)
                ) + i * 0.0

            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((1,), jnp.float32))

        return fn

    timed("xla chain (+res+LN)", loop(
        lambda x, w1, b1, w2, b2: ffn_ref(x, w1, b1, w2, b2, g, be, "post", 1e-5)
    ))
    if not ffn_eligible(BATCH, T, D, F):
        print("shape not ffn_eligible; kernel would exceed VMEM")
        return
    timed("fused ffn_block", loop(
        lambda x, w1, b1, w2, b2: ffn_fwd(x, w1, b1, w2, b2, g, be, "post", 1e-5)
    ))
    of = np.asarray(ffn_fwd(x, w1, b1, w2, b2, g, be, "post", 1e-5), np.float32)
    oc = np.asarray(ffn_ref(x, w1, b1, w2, b2, g, be, "post", 1e-5), np.float32)
    print(f"max |fused - chain| = {np.abs(of - oc).max():.3e}")


if __name__ == "__main__":
    main()
