"""Scratch probe: bf16 matmul ceiling at the HuBERT encoder-layer shapes.

Times a bare fc1/fc2 chain (M=B*T, 768->3072->768) with the amortized
in-graph loop, to separate 'XLA matmul speed at these shapes' from
'everything else in the layer'. Params passed as args (remote-compile 413).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, D, F = 512, 320, 768, 3072
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * T, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w1 = jnp.asarray(
        (rng.standard_normal((D, F)) * 0.02).astype(np.float32)
    ).astype(jnp.bfloat16)
    w2 = jnp.asarray(
        (rng.standard_normal((F, D)) * 0.02).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, w1, w2):
        def step(i, acc):
            h = (acc + i * jnp.bfloat16(0)) @ w1
            return h @ w2

        return jax.lax.fori_loop(0, ITERS, step, x)

    float(jnp.sum(chain(x, w1, w2).astype(jnp.float32)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(x, w1, w2).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * B * T * D * F * 2  # fc1 + fc2
    print(
        f"fc1+fc2 ({B*T}x{D}x{F}): {dt*1e3:.2f} ms/iter"
        f" -> {flops/dt/1e12:.1f} TFLOP/s"
    )


if __name__ == "__main__":
    main()
