"""Scratch bench: fused MHA block kernel vs the unfused chain on one chip.

Chain A (current production): fused-QKV XLA matmul -> attention core
(vmem kernel or sdpa_xla) -> out-proj XLA matmul.
Chain B: kernels/mha_block.py — everything in one pallas call.

Shapes: HuBERT-base encoder layer, bf16. Amortized fori_loop methodology.

Run: python scripts/bench_mha_block.py [BATCH [ITERS [T,D,H]]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
if len(sys.argv) > 3:
    T, D, H = (int(x) for x in sys.argv[3].split(","))
else:
    T, D, H = 320, 768, 12


def main():
    import jax
    import jax.numpy as jnp

    from speechclip_tpu.kernels.attention_vmem import _forward as vmem_fwd
    from speechclip_tpu.kernels.mha_block import _forward as block_fwd
    from speechclip_tpu.kernels.mha_block import _reference
    from speechclip_tpu.ops.attention import padding_bias, sdpa_xla

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    wi = jnp.asarray((rng.standard_normal((D, 3 * D)) * 0.03).astype(np.float32)).astype(jnp.bfloat16)
    bi = jnp.asarray((rng.standard_normal(3 * D) * 0.03).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((D, D)) * 0.03).astype(np.float32)).astype(jnp.bfloat16)
    bo = jnp.asarray((rng.standard_normal(D) * 0.03).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, BATCH).astype(np.int32))

    def timed(name, fn):
        f = jax.jit(fn)
        ref = float(jnp.sum(f(x, wi, bi, wo, bo, lens).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(f(x, wi, bi, wo, bo, lens).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:32s} {dt*1e3:7.2f} ms/iter   checksum {ref:.1f}")
        return dt

    def loop(body):
        def fn(x, wi, bi, wo, bo, lens):
            def step(i, acc):
                out = body(x + (acc[0] * 0).astype(x.dtype), wi, bi, wo, bo, lens)
                return jnp.ones((1,), jnp.float32) * jnp.mean(
                    out.astype(jnp.float32)
                ) + i * 0.0

            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((1,), jnp.float32))

        return fn

    def split(z):
        b = z.shape[0]
        return z.reshape(b, T, H, D // H).transpose(0, 2, 1, 3)

    def merge(z):
        b = z.shape[0]
        return z.transpose(0, 2, 1, 3).reshape(b, T, D)

    def chain_xla(x, wi, bi, wo, bo, lens):
        qkv = x @ wi + bi.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        kpm = pos >= lens[:, None]
        out, _ = sdpa_xla(split(q), split(k), split(v), padding_bias(kpm))
        return merge(out) @ wo + bo.astype(x.dtype)

    def chain_vmem(x, wi, bi, wo, bo, lens):
        qkv = x @ wi + bi.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = vmem_fwd(split(q), split(k), split(v), lens, False)
        return merge(out) @ wo + bo.astype(x.dtype)

    def fused(x, wi, bi, wo, bo, lens):
        return block_fwd(x, wi, bi, wo, bo, lens, H)

    timed("chain: XLA sdpa", loop(chain_xla))
    timed("chain: vmem attention kernel", loop(chain_vmem))
    timed("fused mha_block", loop(fused))

    of = np.asarray(fused(x, wi, bi, wo, bo, lens), np.float32)
    oc = np.asarray(chain_vmem(x, wi, bi, wo, bo, lens), np.float32)
    print(f"max |fused - chain| = {np.abs(of - oc).max():.3e}")


if __name__ == "__main__":
    main()
