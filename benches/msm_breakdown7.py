"""Stage breakdown of the v7 (padded-sort plan) MSM on the chip.

Times the PRODUCTION stage functions of msm_tpu(plan="sort"):
  plan    = _plan_sorted (digit extraction, key pre-sort, payload sort)
  level1  = plan + the level-1 slab accumulation (mega kernel or steps)
  full    = the whole msm_tpu; tail = full - level1.
Usage: python benches/msm_breakdown7.py [logn c L level1 accum plan]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    level1 = sys.argv[4] if len(sys.argv) > 4 else "mega"
    accum = sys.argv[5] if len(sys.argv) > 5 else "affine"
    plan = sys.argv[6] if len(sys.argv) > 6 else "sort"
    n = 1 << logn

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _make_points, _make_scalars
    from hekaton_tpu.curves import pallas_curve as _pc
    from hekaton_tpu.curves.jax_curve import G1
    from hekaton_tpu.fields import jax_field as jf
    from hekaton_tpu.msm import pippenger as pp

    ax, ay = _make_points(n)
    sc = _make_scalars(n)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    assert level1 in ("mega", "pair", "steps", "interleave"), level1
    assert plan in ("sort", "wsort", "tsort"), plan
    plan_fn = pp._plan_sorted_w if plan == "wsort" else pp._plan_sorted
    neg_fn = lambda y: jf.neg(jf.FQ, y)
    col_pad = _pc.MEGA_BLKC if level1 == "mega" else (_pc.BLK if level1 == "pair" else 1)

    def plan_only(ax, ay, scalars):
        if plan == "tsort":
            planes, col_bucket, _ = pp._plan_sorted_t(
                ax, ay, scalars, c, L, 254, neg_fn, blkc=_pc.MEGA_BLKC
            )
            return jnp.sum(planes[0][:, :, :64]), jnp.sum(col_bucket)
        rows, col_bucket, _ = plan_fn(
            ax, ay, scalars, c, L, 254, neg_fn, col_pad=col_pad
        )
        # scalar outputs only (multi-MB outputs pay the remote-tunnel D2H)
        return jnp.sum(rows[:64, :64]), jnp.sum(col_bucket)

    def through_level1(ax, ay, scalars):
        from hekaton_tpu.curves.affine import aff_for_curve

        ops = aff_for_curve(G1)
        if plan == "tsort":
            planes, col_bucket, _ = pp._plan_sorted_t(
                ax, ay, scalars, c, L, 254, neg_fn, blkc=_pc.MEGA_BLKC
            )
            slab_t = _pc.interleave_slab_t(planes)
            if level1 == "interleave":
                return jnp.sum(slab_t[:16, :64]), jnp.sum(col_bucket)
            if level1 == "mega":
                x, y, z = _pc.l1_rcb_mega(slab_t, L)
                return jnp.sum(x[:64]), jnp.sum(col_bucket)
            acc = ops.unpack_rows(_pc.l1_aff_halves_t(slab_t, L).T)
            return jnp.sum(acc.x[:64]), jnp.sum(col_bucket)
        rows, col_bucket, (W, B, NB, n_in, ncols, nlimb) = plan_fn(
            ax, ay, scalars, c, L, 254, neg_fn, col_pad=col_pad
        )
        if level1 == "mega":
            x, y, z = _pc.l1_rcb_mega(rows.T, L)
            return jnp.sum(x[:64]), jnp.sum(col_bucket)
        if level1 == "pair":
            acc = pp._level1_pair(ops, rows, ncols, L)
        else:
            acc = pp._level1_rows(ops, rows, ncols, L, ax.shape[1:], step=ops.add_packed)
        return jnp.sum(acc.x[:64]), jnp.sum(col_bucket)

    def full(ax, ay, scalars):
        out = pp.msm_tpu(G1, ax, ay, scalars, c=c, L=L, accum=accum, level1=level1, plan=plan)
        return jnp.sum(out.x), jnp.sum(out.z)

    for name, fn in (("plan", plan_only), ("plan+level1", through_level1), ("full", full)):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(ax, ay, sc)
        np.asarray(out[0])
        t_c = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = jfn(ax, ay, sc)
            np.asarray(out[0])
            times.append(time.time() - t0)
        dt = sorted(times)[len(times) // 2]
        print(f"{name}: {dt:.3f}s (first-call {t_c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
