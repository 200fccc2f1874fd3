"""Benchmark driver: G1 Pippenger MSM throughput on one chip (BASELINE.md:26).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The baseline constant is the reference's comparable unit: arkworks BN254 G1
variable-base MSM with the `asm`+`parallel` features on a 16-core worker node
(the reference's per-worker shape, BASELINE.md "1.5M-constraint subcircuit"
config) — approximately 2^20 points in ~0.55 s, i.e. ~1.9e6 points/sec. The
reference repo publishes no absolute numbers (BASELINE.json `published: {}`),
so this is the standard figure for that stack; vs_baseline > 1 means one TPU
chip beats a 16-core arkworks worker.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MSM_PTS_PER_SEC = 1.9e6
N = 1 << 20


def _make_points(n: int):
    """n valid G1 points: 512 distinct generator multiples, tiled (bucket
    accumulation cost is data-independent; distinctness avoids degenerate
    doubling fast paths in the add formulas)."""
    import hekaton_tpu.curves.host as ch
    from hekaton_tpu.curves.jax_curve import G1

    base = []
    p = ch.g1_gen()
    for _ in range(512):
        base.append(p)
        p = ch.pt_dbl(p)
    reps = (n + len(base) - 1) // len(base)
    ax, ay = G1.pack_affine(base)
    ax = np.tile(ax, (reps, 1))[:n]
    ay = np.tile(ay, (reps, 1))[:n]
    return ax, ay


def _make_scalars(n: int):
    """(n, 16) u32 plain 16-bit limbs, < 2^253 so every scalar is < R."""
    rng = np.random.RandomState(7)
    sc = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    sc[:, 15] &= (1 << 13) - 1
    return sc


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hekaton_tpu.curves.jax_curve import G1
    from hekaton_tpu.msm.pippenger import msm_tpu

    ax, ay = _make_points(N)
    sc = _make_scalars(N)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)

    import numpy as np_

    fn = jax.jit(lambda x, y, s: msm_tpu(G1, x, y, s))
    # warmup / compile. NB: materialize via np.asarray — on the remote (axon)
    # backend block_until_ready can return without surfacing device faults,
    # which silently produces nonsense timings.
    out = fn(ax, ay, sc)
    _ = np_.asarray(out.x)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(ax, ay, sc)
        _ = np_.asarray(out.x)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    value = N / dt

    print(
        json.dumps(
            {
                "metric": "msm_g1_2^20_points_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "points/sec",
                "vs_baseline": round(value / BASELINE_MSM_PTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
