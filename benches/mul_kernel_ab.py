"""A/B of Montgomery-multiply kernel designs on the chip.

Measures ns per modular multiply per lane via K iterated dependent muls
(x <- x*y) inside one Pallas kernel, amortizing launch + any limb-format
conversion. Designs:
  a: production tile_mul — 16-bit limbs, interleaved CIOS, lo/hi split
     accumulate into a (17, B) running tile (curves/pallas_curve.py).
  b: 13-bit limbs (20 rows), deferred-carry CIOS: 26-bit products
     accumulate directly (no lo/hi splits); one sublane roll per round.
Usage: python benches/mul_kernel_ab.py [a|b|both] [K]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hekaton_tpu.curves import pallas_curve as pc
from hekaton_tpu.fields.bn254 import P
from hekaton_tpu.fields.jax_field import FQ, FieldSpec

u32 = jnp.uint32
BLK = 1024
N = 1 << 17

# --- design b: 13-bit limbs, 20 rows, deferred carries ----------------------
LB = 13
NL13 = 20
M13 = np.uint32((1 << LB) - 1)
_SPEC13 = FieldSpec(P, "fq13", nlimbs=1)  # placeholder; we derive consts here
R13 = 1 << (LB * NL13)
NINV13 = (-pow(P, -1, 1 << LB)) % (1 << LB)
P13 = [(P >> (LB * i)) & int(M13) for i in range(NL13)]


def _to13(x16):
    """(16, B) 16-bit canonical rows -> (20, B) 13-bit rows."""
    rows = []
    for i in range(NL13):
        bit = i * LB
        limb, sh = bit // 16, bit % 16
        v = x16[limb : limb + 1] >> sh
        if sh + LB > 16 and limb + 1 < 16:
            v = v | (x16[limb + 1 : limb + 2] << (16 - sh))
        rows.append(v & M13)
    return jnp.concatenate(rows, axis=0)


def _to16(x13):
    """(20, B) canonical 13-bit rows -> (16, B) 16-bit rows."""
    rows = []
    for i in range(16):
        bit = i * 16
        limb, sh = bit // LB, bit % LB
        v = x13[limb : limb + 1] >> sh
        if sh + 16 > LB and limb + 1 < NL13:
            v = v | (x13[limb + 1 : limb + 2] << (LB - sh))
        if sh + 16 > 2 * LB and limb + 2 < NL13:
            v = v | (x13[limb + 2 : limb + 3] << (2 * LB - sh))
        rows.append(v & np.uint32(0xFFFF))
    return jnp.concatenate(rows, axis=0)


def tile_mul13(a, b, p_col13):
    """CIOS over 13-bit limbs: products accumulate raw (26-bit) in u32."""
    blk = a.shape[1]
    zero = jnp.zeros((1, blk), u32)
    t = jnp.zeros((NL13 + 1, blk), u32)
    for i in range(NL13):
        prod = a[i : i + 1, :] * b  # (20, B), 26-bit values
        t = t + jnp.concatenate([prod, zero], axis=0)
        m = ((t[0:1, :] & M13) * np.uint32(NINV13)) & M13
        q = m * p_col13  # 26-bit
        t = t + jnp.concatenate([q, zero], axis=0)
        carry = t[0:1, :] >> LB
        t = jnp.concatenate([t[1:2, :] + carry, t[2:, :], zero], axis=0)
    # canonicalize: values < 2^20ish per row
    out = []
    carry = jnp.zeros((1, blk), u32)
    for k in range(NL13):
        v = t[k : k + 1, :] + carry
        out.append(v & M13)
        carry = v >> LB
    r = jnp.concatenate(out, axis=0)
    top = carry + t[NL13 : NL13 + 1]
    # conditional subtract p
    borrow = jnp.zeros((1, blk), u32)
    rows = []
    for k in range(NL13):
        d = r[k : k + 1] - np.uint32(P13[k]) - borrow
        rows.append(d & M13)
        borrow = (d >> LB) & 1
    diff = jnp.concatenate(rows, axis=0)
    take = jnp.logical_or(top >= 1, borrow == 0)
    return jnp.where(take, diff, r)


def _kern_a(p_ref, x_ref, y_ref, o_ref, *, K):
    p_col = p_ref[:]
    x = x_ref[:].T
    y = y_ref[:].T
    for _ in range(K):
        x = pc.tile_mul(x, y, p_col)
    o_ref[:] = x.T


def _kern_b(p_ref, x_ref, y_ref, o_ref, *, K):
    del p_ref
    p13 = jnp.concatenate([jnp.full((1, BLK), np.uint32(v), u32) for v in P13], axis=0)
    x = _to13(x_ref[:].T)
    y = _to13(y_ref[:].T)
    for _ in range(K):
        x = tile_mul13(x, y, p13)
    o_ref[:] = _to16(x).T


@functools.lru_cache(maxsize=None)
def _build(name, K, n_blocks):
    kern = functools.partial({"a": _kern_a, "b": _kern_b}[name], K=K)
    p_arr = np.asarray(pc._P_ARR)

    def call(x, y):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, 16), u32),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((16, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(jnp.asarray(p_arr), x, y)

    return jax.jit(call)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rng = np.random.RandomState(3)

    def pk(vals):
        return np.asarray(FQ.pack(vals))

    xs = pk([int(x) % P for x in rng.randint(1, 2**62, size=N)])
    ys = pk([int(x) % P for x in rng.randint(1, 2**62, size=N)])
    x, y = jnp.asarray(xs), jnp.asarray(ys)

    # host ground truth for correctness: x * y^K * R^-K ... just compare designs
    outs = {}
    for name in ["a", "b"] if which == "both" else [which]:
        f = _build(name, K, N // BLK)
        t0 = time.time()
        o = f(x, y)
        np.asarray(o)
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            o = f(x, y)
            outs[name] = np.asarray(o)
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        per = dt / (K * N) * 1e9
        print(f"design {name}: K={K} N=2^17  {dt*1e3:.2f} ms  -> {per:.3f} ns/mul/lane (compile {tc:.0f}s)", flush=True)
    if len(outs) == 2:
        match = bool((outs["a"] == outs["b"]).all())
        print("designs agree:", match, flush=True)


if __name__ == "__main__":
    main()
