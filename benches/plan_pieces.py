"""Sub-stage timing of the wsort MSM plan at 2^20 (on the chip).

Pieces: digits (signed digit extraction), presort (batched key-only sort),
padbuild (searchsorted/pad keys/operand concats), paysort (the 17-operand
payload sort), slab (stack+reshape of sorted words into the column slab).
Each piece is timed cumulatively (jit boundaries can't split a fused
program exactly, so piece N's program re-runs pieces < N; the per-piece
cost is the successive difference).
Usage: python benches/plan_pieces.py [logn c L]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n = 1 << logn

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _make_points, _make_scalars
    from hekaton_tpu.fields import jax_field as jf
    from hekaton_tpu.msm import pippenger as pp

    u32 = jnp.uint32
    ax, ay = _make_points(n)
    sc = _make_scalars(n)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    neg_fn = lambda y: jf.neg(jf.FQ, y)
    B = (1 << (c - 1)) + 1
    SENT = jnp.uint32(0xFFFFFFFF)

    def digits(ax, ay, sc):
        mag, neg = pp.signed_digits_for_windows(sc, c, 254)
        return jnp.sum(mag), jnp.sum(neg)

    def presort(ax, ay, sc):
        mag, neg = pp.signed_digits_for_windows(sc, c, 254)
        sk0 = jax.lax.sort(mag, dimension=1)
        return jnp.sum(sk0[:, ::1024]), jnp.sum(neg)

    def _build_ops(ax, ay, sc):
        mag, neg = pp.signed_digits_for_windows(sc, c, 254)
        W = mag.shape[0]
        N = ax.shape[0]
        nlimb = 16
        sk0 = jax.lax.sort(mag, dimension=1)
        ids = jnp.arange(B, dtype=mag.dtype)
        starts = jax.vmap(lambda row: jnp.searchsorted(row, ids, side="left"))(sk0).astype(u32)
        ends = jnp.concatenate([starts[:, 1:], jnp.full((W, 1), N, u32)], axis=1)
        counts = ends - starts
        pads = (jnp.uint32(L) - (counts % jnp.uint32(L))) % jnp.uint32(L)
        pad_keys = jnp.where(
            jnp.arange(L - 1, dtype=u32)[None, None, :] < pads[:, :, None],
            ids[None, :, None],
            SENT,
        ).reshape(W, B * (L - 1))
        npad = pad_keys.shape[1]
        M0 = N + npad
        M = ((M0 + L - 1) // L) * L
        tail_n = M - M0

        def _pack2(a):
            a = a.reshape(a.shape[0], nlimb)
            return a[:, 0::2] | (a[:, 1::2] << 16)

        pax = _pack2(ax)
        pay = _pack2(ay)
        payn = _pack2(neg_fn(ay))
        negb = neg.astype(bool)
        zpad = jnp.zeros((W, npad + tail_n), u32)
        keys = jnp.concatenate([mag, pad_keys, jnp.full((W, tail_n), SENT)], axis=1)
        sort_ops = [keys]
        for j in range(8):
            sort_ops.append(
                jnp.concatenate([jnp.broadcast_to(pax[:, j][None, :], (W, N)), zpad], axis=1)
            )
        for j in range(8):
            sort_ops.append(
                jnp.concatenate(
                    [jnp.where(negb, payn[:, j][None, :], pay[:, j][None, :]), zpad], axis=1
                )
            )
        return sort_ops

    def padbuild(ax, ay, sc):
        ops = _build_ops(ax, ay, sc)
        return jnp.sum(ops[0][:, ::1024]), jnp.sum(ops[3][:, ::1024])

    def paysort(ax, ay, sc):
        ops = _build_ops(ax, ay, sc)
        out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
        return jnp.sum(out[0][:, ::1024]), jnp.sum(out[3][:, ::1024])

    def slab(ax, ay, sc):
        ops = _build_ops(ax, ay, sc)
        out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
        swords = list(out[1:])
        W, M = out[0].shape
        rows = jnp.stack(swords, axis=-1).reshape(W * M // L, L * 16)
        return jnp.sum(rows[:64, :64]), jnp.sum(out[0][:, ::1024])

    for name, fn in (
        ("digits", digits),
        ("presort", presort),
        ("padbuild", padbuild),
        ("paysort", paysort),
        ("slab", slab),
    ):
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
