"""A/B microbench of MSM designs on the real chip.

Usage: python benches/msm_ab.py [v10|v10m|v9|v9m|v8|v7|v7m|v7mp|v6|v6p|v5|v4|v2|both|all] [log2n] [c] [L] [G]
  v10 = transposed-placement planar slab + pairwise-tree (v10m: mega)
  v9  = per-window batched sorts + pairwise-tree rounds (v9m: mega level-1)
  v8  = padded-sort plan + pairwise-tree fused batched-affine rounds
  v7  = padded-sort plan (zero gathers) + per-step batched-affine slab adds
  v7m = padded-sort plan + RCB mega kernel (v7mp: proj accumulators)
  v6  = gather plan + mega kernel (the v5/r3 production path; v6p: proj)
  v5/v4 = gather plan, per-step gathers, affine/proj; v2 = unsigned Jacobian.
  both = [v10, v10m]; all = [v10, v10m, v9, v8, v7m].
Prints per-design wall time + points/sec after a warmup run.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "v5"
    logn = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    G = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    n = 1 << logn

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _make_points, _make_scalars
    from hekaton_tpu.curves.jax_curve import G1
    from hekaton_tpu.msm import pippenger as pp

    ax, ay = _make_points(n)
    sc = _make_scalars(n)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)

    designs = {
        "v10": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="pair", plan="tsort"),
        "v10m": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="mega", plan="tsort"),
        "v9": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="pair", plan="wsort"),
        "v9m": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="mega", plan="wsort"),
        "v8": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="pair", plan="sort"),
        "v7": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="steps", plan="sort"),
        "v7m": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="mega", plan="sort"),
        "v7mp": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="proj", level1="mega", plan="sort"),
        "v6": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", level1="mega", plan="gather"),
        "v6p": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="proj", level1="mega", plan="gather"),
        "v5": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="affine", G=G, level1="steps", plan="gather"),
        "v4": lambda x, y, s: pp.msm_tpu(G1, x, y, s, c=c, L=L, accum="proj", G=G, level1="steps", plan="gather"),
        "v2": lambda x, y, s: pp.msm_tpu_jac(G1, x, y, s, c=c, L=L),
    }
    names = {"both": ["v10", "v10m"], "all": ["v10", "v10m", "v9", "v8", "v7m"]}.get(which, [which])
    for name in names:
        fn = jax.jit(designs[name])
        # NB: materialize via np.asarray — on the remote (axon) backend
        # block_until_ready can return without blocking (see bench.py)
        t0 = time.time()
        out = fn(ax, ay, sc)
        np.asarray(out.x)
        t_compile = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn(ax, ay, sc)
            np.asarray(out.x)
            times.append(time.time() - t0)
        dt = sorted(times)[len(times) // 2]
        print(
            f"{name}: n=2^{logn} c={c} L={L}  warm {dt:.3f}s = "
            f"{n/dt:,.0f} pts/s  (first-call {t_compile:.1f}s)",
            flush=True,
        )
        # correctness spot-check vs small host-verified msm on a prefix
        if len(sys.argv) <= 5:
            m = 64
            ref = jax.jit(lambda x, y, s: pp.msm(G1, x, y, s, K=8))(ax[:m], ay[:m], sc[:m])
            got = jax.jit(designs[name])(ax[:m], ay[:m], sc[:m])
            assert G1.unpack_jacobian(jax.tree.map(lambda a: a[None], ref)) == G1.unpack_jacobian(
                jax.tree.map(lambda a: a[None], got)
            ), f"{name} mismatch at n={m}"
            print(f"{name}: prefix-64 correctness ok", flush=True)


if __name__ == "__main__":
    main()
