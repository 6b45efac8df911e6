"""Scratch bench: attention-core kernels at HuBERT shapes on one chip.

Compares sdpa_xla (the production XLA path, bf16 HBM buffers) against the
grouped VMEM-resident Pallas kernel (kernels/attention_vmem.py) at
B x H=12 x L=S=320 x Dh=64, with per-batch valid lengths — the exact
attention core of one HuBERT-base encoder layer.

Amortized fori_loop methodology (docs/DESIGN_NOTES.md): body depends on
the loop index; scalar fetch is the sync.

Run: python scripts/bench_attention_vmem.py [BATCH [ITERS [GROUPS [H,L,DH[,causal]]]]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
GROUPS = (
    [int(g) for g in sys.argv[3].split(",")] if len(sys.argv) > 3 else [4, 8, 12]
)
if len(sys.argv) > 4:
    parts = [int(x) for x in sys.argv[4].split(",")]
    H, L, DH = parts[:3]
    CAUSAL = bool(parts[3]) if len(parts) > 3 else False
else:
    H, L, DH = 12, 320, 64
    CAUSAL = False


def main():
    import jax
    import jax.numpy as jnp

    from speechclip_tpu.kernels.attention_vmem import _forward as vmem_fwd
    from speechclip_tpu.ops.attention import padding_bias, sdpa_xla

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((BATCH, H, L, DH)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    lens = jnp.asarray(rng.integers(L // 2, L + 1, BATCH).astype(np.int32))

    def timed(name, fn):
        f = jax.jit(fn)
        r = f(q, k, v, lens)
        ref = float(jnp.sum(r.astype(jnp.float32)))  # compile+warm
        t0 = time.perf_counter()
        float(jnp.sum(f(q, k, v, lens).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:26s} {dt*1e3:7.2f} ms/iter   checksum {ref:.1f}")
        return dt

    def loop(body):
        def fn(q, k, v, lens):
            def step(i, acc):
                out = body(q + (acc[0] * 0).astype(q.dtype), k, v, lens)
                return jnp.ones((1,), jnp.float32) * jnp.mean(
                    out.astype(jnp.float32)
                ) + i * 0.0

            return jax.lax.fori_loop(
                0, ITERS, step, jnp.zeros((1,), jnp.float32)
            )

        return fn

    def xla_core(q, k, v, lens):
        if CAUSAL:
            from speechclip_tpu.ops.attention import causal_bias

            out, _ = sdpa_xla(q, k, v, causal_bias(L)[None, None])
            return out
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        kpm = pos >= lens[:, None]
        out, _ = sdpa_xla(q, k, v, padding_bias(kpm))
        return out

    timed("sdpa_xla (bf16 buffers)", loop(xla_core))
    for g in GROUPS:
        if (BATCH * H) % g:
            continue
        timed(
            f"vmem kernel G={g}",
            loop(lambda q, k, v, lens, g=g: vmem_fwd(q, k, v, None if CAUSAL else lens, CAUSAL, group=g)),
        )

    # numerics cross-check on the same inputs
    ox = np.asarray(xla_core(q, k, v, lens), np.float32)
    ov = np.asarray(vmem_fwd(q, k, v, None if CAUSAL else lens, CAUSAL), np.float32)
    err = np.abs(ox - ov).max()
    print(f"max |xla - vmem| = {err:.3e}")


if __name__ == "__main__":
    main()
