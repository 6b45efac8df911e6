"""Weak-scaling collective inventory: data=1/2/4/8 at fixed per-device batch.

Compiles the REAL sharded train step (tiny dims, the driver-dryrun shape)
on virtual CPU meshes and reports, per data-axis size: the collectives
XLA's SPMD partitioner inserted (count + payload bytes per step) and the
measured per-step wall time on the virtual mesh. The collective inventory
is the hardware-independent part — it pins the SCALING.md cost model
(feature all-gather + grad reduce, and NOTHING rank-3); CPU wall times
only sanity-check that the step executes at every mesh size (virtual CPU
devices share one host — no speedup is expected, only no blow-up).

Run: python scripts/weak_scaling_table.py [PER_DEVICE_BATCH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PER_DEVICE_BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from speechclip_tpu.config import flagship_tiny_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops.attention import kernel_mesh
    from speechclip_tpu.parallel.hlo_inspect import (
        collective_bytes,
        collective_results,
    )
    from speechclip_tpu.parallel import make_mesh
    from speechclip_tpu.training import (
        build_optimizer,
        create_train_state,
        jit_train_step,
        make_train_step,
        place_state,
        shard_batch,
    )

    cfg = flagship_tiny_config()
    cfg.trainer.precision = 32
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    step = jit_train_step(make_train_step(model, tx), donate=False)

    print(
        f"| data | global batch | all-gather (n, KB/step) | "
        f"all-reduce (n, KB/step) | rank-3 gathers | step ms (virtual CPU) |"
    )
    print("|---|---|---|---|---|---|")
    for d in (1, 2, 4, 8):
        b = PER_DEVICE_BATCH * d
        rng = np.random.default_rng(0)
        batch = {
            "wav": jnp.asarray(
                rng.standard_normal((b, 2000)).astype(np.float32)
            ),
            "wav_len": jnp.asarray(rng.integers(1000, 2001, b)),
            "image": jnp.asarray(
                rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
            ),
            "id": jnp.asarray(np.arange(b) // 2),
        }
        mesh = make_mesh(devices=jax.devices()[:d], data=d, model=1)
        state = place_state(
            create_train_state(model, tx, jax.random.key(0)), mesh
        )
        sharded = shard_batch(batch, mesh)
        with kernel_mesh(mesh):
            compiled = step.lower(state, sharded).compile()
            txt = compiled.as_text()
            inv = collective_bytes(txt)
            rank3 = sum(
                1
                for op, dt, dims in collective_results(txt)
                if op == "all-gather"
                and dt.startswith(("f", "bf"))
                and len(dims) >= 3
            )
            state, metrics = step(state, sharded)  # warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, metrics = step(state, sharded)
                float(metrics["train_loss"])  # host sync
                times.append(time.perf_counter() - t0)
        ag = inv.get("all-gather", (0, 0))
        ar_n = inv.get("all-reduce", (0, 0))[0] + inv.get(
            "reduce-scatter", (0, 0)
        )[0]
        ar_b = inv.get("all-reduce", (0, 0))[1] + inv.get(
            "reduce-scatter", (0, 0)
        )[1]
        print(
            f"| {d} | {b} | {ag[0]}, {ag[1]/1e3:.1f} | {ar_n}, {ar_b/1e3:.1f} "
            f"| {rank3} | {np.median(times)*1e3:.0f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
