"""Pallas TPU kernels: fused G1 Jacobian point operations.

Each kernel runs an entire group operation (8M+5S mixed add, 2M+5S double)
in VMEM on the limbs-first (16, BLK) layout, composing the tile-level
Montgomery field ops below — one kernel launch instead of ~13 XLA-fused
multiplies with HBM round-trips. Edge handling (infinity lanes, equal-x)
mirrors curves/jax_curve.py:63-140 branchlessly.

Layout note: batch stays on the vector lanes; all field values are canonical
16-bit limbs in u32 rows. G2 (Fq2) variants of the complete RCB kernels live
at the bottom of this file: an Fq2 tile is a pair of (16, BLK) component
tiles and a G2 point row is 32 limbs (c0 || c1 per coordinate). Without
them the canonical-scale G2 MSM inlines ~19 MB of limb arithmetic into one
XLA program, which OOM-kills the remote compile helper.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.bn254 import LIMB_BITS, LIMB_MASK, NLIMBS
from ..fields.jax_field import FQ

u32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)

BLK = 1024

_P_LIMBS = tuple(int(x) for x in FQ.p_limbs)
_NINV0 = int(FQ.ninv_limbs[0])
_P_ARR = np.array(_P_LIMBS, dtype=np.uint32).reshape(NLIMBS, 1)


# ---------------------------------------------------------------------------
# tile-level field ops on (16, BLK) canonical limb values
# ---------------------------------------------------------------------------


def _carry_canon(rows):
    """(16, BLK) columns with values < 2^17-ish -> canonical limbs + carry row."""
    out = []
    carry = jnp.zeros_like(rows[0:1])
    for k in range(NLIMBS):
        v = rows[k : k + 1] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.concatenate(out, axis=0), carry


def _sub_p(r, top):
    """Conditionally subtract the modulus: r (canonical), top carry row."""
    borrow = jnp.zeros_like(top)
    rows = []
    for k in range(NLIMBS):
        d = r[k : k + 1] - np.uint32(_P_LIMBS[k]) - borrow
        rows.append(d & MASK)
        borrow = (d >> LIMB_BITS) & 1
    diff = jnp.concatenate(rows, axis=0)
    take = jnp.logical_or(top >= 1, borrow == 0)
    return jnp.where(take, diff, r)


def tile_add(a, b):
    s, carry = _carry_canon(a + b)
    return _sub_p(s, carry)


def tile_sub(a, b):
    """a - b mod p: borrow-chain subtract, then add p back on underflow."""
    borrow = jnp.zeros_like(a[0:1])
    rows = []
    for k in range(NLIMBS):
        d = a[k : k + 1] - b[k : k + 1] - borrow
        rows.append(d & MASK)
        borrow = (d >> LIMB_BITS) & 1
    diff = jnp.concatenate(rows, axis=0)
    wrapped = borrow  # (1, BLK): 1 iff a < b
    carry = jnp.zeros_like(borrow)
    out = []
    for k in range(NLIMBS):
        v = diff[k : k + 1] + np.uint32(_P_LIMBS[k]) * wrapped + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.concatenate(out, axis=0)


def tile_mul(a, b, p_col):
    """Fused CIOS Montgomery product on (16, BLK) tiles (see pallas_field).

    Per round, m is derived scalar-side from t[0] + lo(a_i*b_0) BEFORE any
    bulk accumulation, so the a_i*b and m*p partial products merge into ONE
    lo/hi padded add pair instead of two (the (17, BLK) concat+add chains
    are the dominant non-multiply cost of the kernel)."""
    blk = a.shape[1]
    zero_row = jnp.zeros((1, blk), u32)

    def at_lo(x):
        return jnp.concatenate([x, zero_row], axis=0)

    def at_hi(x):
        return jnp.concatenate([zero_row, x], axis=0)

    t = jnp.zeros((NLIMBS + 1, blk), u32)
    for i in range(NLIMBS):
        prod = a[i : i + 1, :] * b
        plo = prod & MASK
        phi = prod >> LIMB_BITS
        # only lo(prod[0]) lands in column 0, so m folds it in directly
        m = ((t[0:1, :] + plo[0:1, :]) * np.uint32(_NINV0)) & MASK
        q = m * p_col
        t = t + at_lo(plo + (q & MASK)) + at_hi(phi + (q >> LIMB_BITS))
        carry = t[0:1, :] >> LIMB_BITS
        t = jnp.concatenate([t[1:2, :] + carry, t[2:, :], zero_row], axis=0)

    r, top = _carry_canon(t[:NLIMBS])
    top = top + t[NLIMBS : NLIMBS + 1]
    return _sub_p(r, top)


def tile_sqr(a, p_col):
    return tile_mul(a, a, p_col)


def tile_is_zero(a):
    return jnp.all(a == 0, axis=0, keepdims=True)  # (1, BLK) bool


def tile_select(cond, a, b):
    return jnp.where(cond, a, b)  # cond (1, BLK) broadcasts over sublanes


_ONE_MONT = tuple(int(x) for x in FQ.one_mont)


def _const_col(vals, blk):
    """(16, blk) tile from 16 Python ints (scalar constants only — Mosaic
    rejects captured constant arrays)."""
    return jnp.concatenate([jnp.full((1, blk), np.uint32(v), u32) for v in vals], axis=0)


def _dbl_tiles(x, y, z, p_col):
    """dbl-2009-l (a=0), mirrors jax_curve.dbl (infinity-safe: z3 = 2yz)."""
    a = tile_sqr(x, p_col)
    b = tile_sqr(y, p_col)
    c = tile_sqr(b, p_col)
    d0 = tile_sqr(tile_add(x, b), p_col)
    d1 = tile_sub(tile_sub(d0, a), c)
    d = tile_add(d1, d1)
    e = tile_add(tile_add(a, a), a)
    ff = tile_sqr(e, p_col)
    x3 = tile_sub(ff, tile_add(d, d))
    c4 = tile_add(tile_add(c, c), tile_add(c, c))
    c8 = tile_add(c4, c4)
    y3 = tile_sub(tile_mul(e, tile_sub(d, x3), p_col), c8)
    z3 = tile_mul(tile_add(y, y), z, p_col)
    return x3, y3, z3


def _madd_tiles(x1, y1, z1, ax, ay, p_col):
    """madd-2007-bl with branchless edges, mirrors jax_curve.add_mixed."""
    one = _const_col(_ONE_MONT, x1.shape[1])
    q_inf = jnp.logical_and(tile_is_zero(ax), tile_is_zero(ay))
    p_inf = tile_is_zero(z1)

    z1z1 = tile_sqr(z1, p_col)
    u2 = tile_mul(ax, z1z1, p_col)
    s2 = tile_mul(tile_mul(ay, z1, p_col), z1z1, p_col)
    h = tile_sub(u2, x1)
    rr = tile_sub(s2, y1)
    same_x = tile_is_zero(h)
    same_y = tile_is_zero(rr)

    hh = tile_sqr(h, p_col)
    i = tile_add(tile_add(hh, hh), tile_add(hh, hh))
    j = tile_mul(h, i, p_col)
    r2 = tile_add(rr, rr)
    v = tile_mul(x1, i, p_col)
    x3 = tile_sub(tile_sub(tile_sqr(r2, p_col), j), tile_add(v, v))
    yj = tile_mul(y1, j, p_col)
    y3 = tile_sub(tile_mul(r2, tile_sub(v, x3), p_col), tile_add(yj, yj))
    z3 = tile_sub(tile_sub(tile_sqr(tile_add(z1, h), p_col), z1z1), hh)

    # doubling escape
    dx, dy, dz = _dbl_tiles(x1, y1, z1, p_col)
    dbl_case = jnp.logical_and(same_x, same_y)
    x3 = tile_select(dbl_case, dx, x3)
    y3 = tile_select(dbl_case, dy, y3)
    z3 = tile_select(dbl_case, dz, z3)
    # opposite points -> infinity
    inf_case = jnp.logical_and(same_x, jnp.logical_not(same_y))
    zero = jnp.zeros_like(z3)
    z3 = tile_select(inf_case, zero, z3)
    # p at infinity -> q (as jacobian with z = 1 or 0)
    qz = tile_select(q_inf, zero, one)
    x3 = tile_select(p_inf, ax, x3)
    y3 = tile_select(p_inf, ay, y3)
    z3 = tile_select(p_inf, qz, z3)
    # q at infinity -> p  (overrides: if both infinite, result z = z1 = 0)
    x3 = tile_select(jnp.logical_and(q_inf, jnp.logical_not(p_inf)), x1, x3)
    y3 = tile_select(jnp.logical_and(q_inf, jnp.logical_not(p_inf)), y1, y3)
    z3 = tile_select(jnp.logical_and(q_inf, jnp.logical_not(p_inf)), z1, z3)
    return x3, y3, z3


def _add_tiles(x1, y1, z1, x2, y2, z2, p_col):
    """add-2007-bl with branchless edges, mirrors jax_curve.add."""
    p_inf = tile_is_zero(z1)
    q_inf = tile_is_zero(z2)
    z1z1 = tile_sqr(z1, p_col)
    z2z2 = tile_sqr(z2, p_col)
    u1 = tile_mul(x1, z2z2, p_col)
    u2 = tile_mul(x2, z1z1, p_col)
    s1 = tile_mul(tile_mul(y1, z2, p_col), z2z2, p_col)
    s2 = tile_mul(tile_mul(y2, z1, p_col), z1z1, p_col)
    h = tile_sub(u2, u1)
    rr = tile_sub(s2, s1)
    same_x = tile_is_zero(h)
    same_y = tile_is_zero(rr)

    i = tile_sqr(tile_add(h, h), p_col)
    j = tile_mul(h, i, p_col)
    r2 = tile_add(rr, rr)
    v = tile_mul(u1, i, p_col)
    x3 = tile_sub(tile_sub(tile_sqr(r2, p_col), j), tile_add(v, v))
    s1j = tile_mul(s1, j, p_col)
    y3 = tile_sub(tile_mul(r2, tile_sub(v, x3), p_col), tile_add(s1j, s1j))
    z3 = tile_mul(tile_sub(tile_sub(tile_sqr(tile_add(z1, z2), p_col), z1z1), z2z2), h, p_col)

    dx, dy, dz = _dbl_tiles(x1, y1, z1, p_col)
    dbl_case = jnp.logical_and(same_x, same_y)
    x3 = tile_select(dbl_case, dx, x3)
    y3 = tile_select(dbl_case, dy, y3)
    z3 = tile_select(dbl_case, dz, z3)
    inf_case = jnp.logical_and(same_x, jnp.logical_not(same_y))
    z3 = tile_select(inf_case, jnp.zeros_like(z3), z3)
    for (src_x, src_y, src_z, cond) in (
        (x2, y2, z2, p_inf),
        (x1, y1, z1, jnp.logical_and(q_inf, jnp.logical_not(p_inf))),
    ):
        x3 = tile_select(cond, src_x, x3)
        y3 = tile_select(cond, src_y, y3)
        z3 = tile_select(cond, src_z, z3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# complete-formula (RCB15, a=0) tiles on homogeneous projective coordinates
# ---------------------------------------------------------------------------


def tile_mul9(a):
    """9*a mod p via the add chain 3a = a+a+a, 9a = 3a+3a+3a — 4 canonical
    modular adds (~1/8 of a tile_mul); the mul-by-3b constant of RCB a=0
    formulas (b=3 for BN254 G1)."""
    a3 = tile_add(tile_add(a, a), a)
    return tile_add(tile_add(a3, a3), a3)


def _pmadd_rcb_tiles(x1, y1, z1, ax, ay, p_col):
    """(X1:Y1:Z1) + affine (ax, ay): RCB15 Algorithm 8 (a=0), complete —
    identity accumulator, doubling and inverse all flow through the same
    straight-line code. The affine (0,0) sentinel is resolved by ONE select
    (ay == 0 identifies it: curve points have y != 0 on prime-order b=3)."""
    q_inf = tile_is_zero(ay)
    t0 = tile_mul(x1, ax, p_col)
    t1 = tile_mul(y1, ay, p_col)
    t3 = tile_mul(tile_add(ax, ay), tile_add(x1, y1), p_col)
    t3 = tile_sub(t3, tile_add(t0, t1))
    t4 = tile_add(tile_mul(ay, z1, p_col), y1)
    y3 = tile_add(tile_mul(ax, z1, p_col), x1)
    x3 = tile_add(t0, t0)
    t0 = tile_add(x3, t0)
    t2 = tile_mul9(z1)
    z3 = tile_add(t1, t2)
    t1 = tile_sub(t1, t2)
    y3 = tile_mul9(y3)
    x3 = tile_sub(tile_mul(t3, t1, p_col), tile_mul(t4, y3, p_col))
    y3 = tile_add(tile_mul(t1, z3, p_col), tile_mul(y3, t0, p_col))
    z3 = tile_add(tile_mul(z3, t4, p_col), tile_mul(t0, t3, p_col))
    x3 = tile_select(q_inf, x1, x3)
    y3 = tile_select(q_inf, y1, y3)
    z3 = tile_select(q_inf, z1, z3)
    return x3, y3, z3


def _padd_rcb_tiles(x1, y1, z1, x2, y2, z2, p_col):
    """Complete projective add: RCB15 Algorithm 7 (a=0). Zero edge cases."""
    t0 = tile_mul(x1, x2, p_col)
    t1 = tile_mul(y1, y2, p_col)
    t2 = tile_mul(z1, z2, p_col)
    t3 = tile_mul(tile_add(x1, y1), tile_add(x2, y2), p_col)
    t3 = tile_sub(t3, tile_add(t0, t1))
    t4 = tile_mul(tile_add(y1, z1), tile_add(y2, z2), p_col)
    t4 = tile_sub(t4, tile_add(t1, t2))
    y3 = tile_mul(tile_add(x1, z1), tile_add(x2, z2), p_col)
    y3 = tile_sub(y3, tile_add(t0, t2))
    x3 = tile_add(t0, t0)
    t0 = tile_add(x3, t0)
    t2 = tile_mul9(t2)
    z3 = tile_add(t1, t2)
    t1 = tile_sub(t1, t2)
    y3 = tile_mul9(y3)
    x3 = tile_sub(tile_mul(t3, t1, p_col), tile_mul(t4, y3, p_col))
    y3 = tile_add(tile_mul(t1, z3, p_col), tile_mul(y3, t0, p_col))
    z3 = tile_add(tile_mul(z3, t4, p_col), tile_mul(t0, t3, p_col))
    return x3, y3, z3


def _pdbl_rcb_tiles(x, y, z, p_col):
    """Complete projective double: RCB15 Algorithm 9 (a=0)."""
    t0 = tile_sqr(y, p_col)
    z3 = tile_add(t0, t0)
    z3 = tile_add(z3, z3)
    z3 = tile_add(z3, z3)
    t1 = tile_mul(y, z, p_col)
    t2 = tile_mul9(tile_sqr(z, p_col))
    x3 = tile_mul(t2, z3, p_col)
    y3 = tile_add(t0, t2)
    z3 = tile_mul(t1, z3, p_col)
    t1 = tile_add(t2, t2)
    t2 = tile_add(t1, t2)
    t0 = tile_sub(t0, t2)
    y3 = tile_mul(t0, y3, p_col)
    y3 = tile_add(x3, y3)
    t1 = tile_mul(x, y, p_col)
    x3 = tile_mul(t0, t1, p_col)
    x3 = tile_add(x3, x3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# batched-affine bucket accumulation tiles (MSM v5)
#
# Affine + affine with a shared batched inversion: ~4 in-kernel multiplies
# per add (1S prep + 1M + 1S + 1M finish) plus ~3 multiplies amortized in the
# jax_field.batch_inv product tree — vs 13 for the complete RCB projective
# mixed add. Completeness is kept branchlessly: (0,0) is the infinity
# sentinel (y = 0 never occurs for points on prime-order a=0 curves), equal-x
# lanes route through the tangent (doubling) numerator/denominator, and
# inverse pairs produce the sentinel. Split into two kernels around the
# inversion: prep emits (den, num); fin consumes 1/den.
# ---------------------------------------------------------------------------


def _aff_flags(x1, y1, px, py):
    q_inf = tile_is_zero(py)
    p_inf = tile_is_zero(y1)
    dx = tile_sub(px, x1)
    dy = tile_sub(py, y1)
    same_x = tile_is_zero(dx)
    dbl = jnp.logical_and(same_x, tile_is_zero(dy))
    return q_inf, p_inf, dx, dy, same_x, dbl


def _num_tiles(x1, dy, dbl, p_col):
    """The slope numerator: dy on chord lanes, 3*x1^2 on doubling lanes.
    The squaring (1 of the ~8 muls of a batched-affine add) runs under a
    block-level `lax.cond`: doubling lanes only occur when the same point
    appears twice in one bucket, so most blocks skip it at runtime."""
    any_dbl = jnp.any(dbl)

    def with_dbl(x1=x1, dy=dy, dbl=dbl, p_col=p_col):
        x1sq = tile_sqr(x1, p_col)
        return tile_select(dbl, tile_add(tile_add(x1sq, x1sq), x1sq), dy)

    return jax.lax.cond(any_dbl, with_dbl, lambda: dy)


def _aff_prep_tiles(x1, y1, px, py, p_col):
    """(den, num) of the affine chord/tangent slope for (x1,y1) + (px,py).

    Generic lanes: den = px - x1, num = py - y1. Doubling lanes (same point):
    den = 2*y1, num = 3*x1^2. Degenerate lanes (either operand infinite, or
    inverse pair) get den = 1 so the batched inversion stays well-defined —
    the finish kernel selects their real result."""
    q_inf, p_inf, dx, dy, same_x, dbl = _aff_flags(x1, y1, px, py)
    den = tile_select(dbl, tile_add(y1, y1), dx)
    num = _num_tiles(x1, dy, dbl, p_col)
    degen = jnp.logical_or(
        jnp.logical_or(q_inf, p_inf), jnp.logical_and(same_x, jnp.logical_not(dbl))
    )
    one = _const_col(_ONE_MONT, x1.shape[1])
    den = tile_select(degen, one, den)
    return den, num


def _aff_fin_tiles(x1, y1, px, py, inv, num, p_col):
    """Affine sum from the inverted denominator: lam = num/den,
    x3 = lam^2 - x1 - x2, y3 = lam*(x1 - x3) - y1; flags recomputed (cheap
    subs) rather than carried through HBM."""
    q_inf, p_inf, dx, dy, same_x, dbl = _aff_flags(x1, y1, px, py)
    lam = tile_mul(num, inv, p_col)
    x2s = tile_select(dbl, x1, px)
    x3 = tile_sub(tile_sub(tile_sqr(lam, p_col), x1), x2s)
    y3 = tile_sub(tile_mul(lam, tile_sub(x1, x3), p_col), y1)
    inverse = jnp.logical_and(
        jnp.logical_and(same_x, jnp.logical_not(dbl)),
        jnp.logical_not(jnp.logical_or(p_inf, q_inf)),
    )
    zero = jnp.zeros_like(x3)
    x3 = tile_select(inverse, zero, x3)
    y3 = tile_select(inverse, zero, y3)
    x3 = tile_select(q_inf, x1, x3)
    y3 = tile_select(q_inf, y1, y3)
    x3 = tile_select(p_inf, px, x3)
    y3 = tile_select(p_inf, py, y3)
    return x3, y3


def _aff_den_tiles(x1, y1, px, py, p_col):
    """The masked slope denominator alone (no squarings): generic = px - x1,
    doubling = 2*y1, degenerate (either infinity / inverse pair) = 1."""
    q_inf, p_inf, dx, dy, same_x, dbl = _aff_flags(x1, y1, px, py)
    den = tile_select(dbl, tile_add(y1, y1), dx)
    degen = jnp.logical_or(
        jnp.logical_or(q_inf, p_inf), jnp.logical_and(same_x, jnp.logical_not(dbl))
    )
    return tile_select(degen, _const_col(_ONE_MONT, x1.shape[1]), den)


def _aff_root_kernel(p_ref, x1_ref, y1_ref, px_ref, py_ref, root_ref):
    """Fused-affine kernel A: per-block product-tree ROOT of the masked
    denominators. The caller inverts the (n_blocks,) roots with one fused
    Fermat sweep; kernel B walks the tree back down. Halving is by
    contiguous halves (lane-aligned), not adjacent pairs. The roots array
    rides as ONE full-size block (TPU rejects (1, 16) output blocks); each
    grid step dynamic-stores its row."""
    p_col = p_ref[:]
    den = _aff_den_tiles(x1_ref[:].T, y1_ref[:].T, px_ref[:].T, py_ref[:].T, p_col)
    cur = den
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        cur = tile_mul(cur[:, :half], cur[:, half:], p_col)
    root_ref[pl.ds(pl.program_id(0), 1), :] = cur.T


def _aff_fin_tree_kernel(p_ref, x1_ref, y1_ref, px_ref, py_ref, rinv_ref, ox_ref, oy_ref):
    """Fused-affine kernel B: recompute the denominator tree (cheaper than
    round-tripping the levels through HBM), walk down from the inverted
    root to per-lane 1/den, then finish the complete affine add."""
    p_col = p_ref[:]
    x1, y1 = x1_ref[:].T, y1_ref[:].T
    px, py = px_ref[:].T, py_ref[:].T
    den = _aff_den_tiles(x1, y1, px, py, p_col)
    levels = []
    cur = den
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        left, right = cur[:, :half], cur[:, half:]
        levels.append((left, right))
        cur = tile_mul(left, right, p_col)
    inv = rinv_ref[pl.ds(pl.program_id(0), 1), :].T  # (16, 1)
    for left, right in reversed(levels):
        il = tile_mul(inv, right, p_col)
        ir = tile_mul(inv, left, p_col)
        inv = jnp.concatenate([il, ir], axis=1)
    # num as in _aff_prep_tiles, then the shared finish
    _, _, _, dy, _, dbl = _aff_flags(x1, y1, px, py)
    num = _num_tiles(x1, dy, dbl, p_col)
    x3, y3 = _aff_fin_tiles(x1, y1, px, py, inv, num, p_col)
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T


def _l1_mega_kernel(p_ref, slab_ref, ox_ref, oy_ref, oz_ref):
    """Level-1 as ONE kernel: accumulate all L bucket rows of a column block
    entirely in VMEM. The slab is the pre-gathered point stream laid out
    (L*16, ncols) so step r's packed rows are the static sublane band
    [r*16, r*16+16) — no transposes, no per-step HBM round-trips for the
    accumulator, and Mosaic double-buffers the next block's slab DMA behind
    the RCB adds. fori_loop keeps the traced program at one add body."""
    p_col = p_ref[:]
    blkc = ox_ref.shape[0]
    L = slab_ref.shape[0] // NLIMBS

    def body(r, acc):
        x, y, z = acc
        rows_t = slab_ref[pl.ds(r * NLIMBS, NLIMBS), :]  # (16, BLKC)
        px, py = _unpack_rows_tiles(rows_t)
        return _pmadd_rcb_tiles(x, y, z, px, py, p_col)

    one = _const_col(_ONE_MONT, blkc)
    zero = jnp.zeros((NLIMBS, blkc), u32)
    x, y, z = jax.lax.fori_loop(0, L, body, (zero, one, zero))
    ox_ref[:] = x.T
    oy_ref[:] = y.T
    oz_ref[:] = z.T


MEGA_BLKC = 1024


def _interleave_slab_t_kernel(*refs):
    plane_refs, o_ref = refs[:-1], refs[-1]
    for r in range(plane_refs[0].shape[0]):
        for j in range(16):
            o_ref[r * 16 + j, :] = plane_refs[j][r, :]


@functools.lru_cache(maxsize=None)
def _build_interleave_slab_t(W: int, nb: int, mcols: int, L: int, chunk: int, interpret: bool):
    n_cols = W * mcols
    gb = L // 8  # 8-row g-groups per window
    plane_spec = pl.BlockSpec((8, chunk), lambda t, ci: (t, ci), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (8 * NLIMBS, chunk),
        lambda t, ci: (t % gb, (t // gb) * nb + ci),
        memory_space=pltpu.VMEM,
    )

    def call(planes):
        return pl.pallas_call(
            _interleave_slab_t_kernel,
            out_shape=jax.ShapeDtypeStruct((L * NLIMBS, n_cols), u32),
            grid=(W * gb, nb),
            in_specs=[plane_spec] * 16,
            out_specs=out_spec,
            interpret=interpret,
        )(*planes)

    return call


def interleave_slab_t(planes, blkc: int = MEGA_BLKC):
    """16 (W, L, mcols) word planes (transposed-placement sort output) ->
    the (L*16, W*mcols) TRANSPOSED packed slab the mega/halves kernels
    consume. Blocks are (8, chunk) groups of full-width contiguous plane
    rows mapping to 128 contiguous output rows, so every DMA granule is
    a multi-KB contiguous run. A first cut blocked (1, L, blkc)/(L*16,
    blkc); that transfer pattern ran latency-bound at ~0.4 s for 2.9 GB —
    the same per-row-latency wall as the v4-v6 random gathers. This
    kernel replaces the XLA `stack(...,-1).reshape(...)` interleave whose
    minor-16 intermediate is 8x tile-padded (~0.45 s at 2^20;
    benches/plan_pieces.py). Requires L % 8 == 0 (the production shapes);
    callers fall back to the XLA interleave otherwise."""
    W, L, mcols = planes[0].shape
    assert L % 8 == 0, "interleave kernel wants 8-row g-groups"
    nb = 1
    while mcols // nb > 8192 or mcols % nb:
        nb += 1
    flat = tuple(p.reshape(W * L, mcols) for p in planes)
    call = _build_interleave_slab_t(W, nb, mcols, L, mcols // nb, interpret=not _on_tpu())
    return call(flat)


@functools.lru_cache(maxsize=None)
def _build_l1_mega(n_blocks: int, n_cols: int, L: int, interpret: bool, blkc: int = MEGA_BLKC):
    def call(slab_t):
        return pl.pallas_call(
            _l1_mega_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((n_cols, NLIMBS), u32) for _ in range(3)),
            grid=(n_blocks,),
            in_specs=[
                _spec_p(),
                pl.BlockSpec((L * NLIMBS, blkc), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((blkc, NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(3)
            ),
            interpret=interpret,
        )(jnp.asarray(_P_ARR), slab_t)

    return call


def l1_rcb_mega(slab_t, L: int, blkc: int = MEGA_BLKC):
    """Run the level-1 mega kernel on a (L*16, ncols) transposed slab of
    packed 64 B rows; ncols must be a multiple of the block width (the
    plan pads with infinity-row columns). Returns projective (x, y, z) as
    (ncols, 16) arrays."""
    ncols = slab_t.shape[1]
    assert ncols % blkc == 0
    call = _build_l1_mega(ncols // blkc, ncols, L, interpret=not _on_tpu(), blkc=blkc)
    return call(slab_t)


def _horner_kernel(p_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref, *, W, c):
    """Whole window-Horner combine in ONE launch: acc = sum_w 2^(cw) * S_w,
    MSB window first (c complete doublings + one complete add per window),
    on (16, 1) column tiles that never leave VMEM. The XLA fallback runs the
    same ~(W-1)*(c+1) point ops as sequential width-1 HLO ops — hundreds of
    tiny latency-bound launches' worth of work for ~1 ms of VPU time."""
    p_col = p_ref[:]

    def col(ref, i):
        return ref[pl.ds(i, 1), :].T  # (1, 16) row -> (16, 1) column tile

    def dbl_body(_, acc):
        return _pdbl_rcb_tiles(*acc, p_col)

    def body(i, acc):
        acc = jax.lax.fori_loop(0, c, dbl_body, acc)
        w = W - 2 - i
        return _padd_rcb_tiles(*acc, col(x_ref, w), col(y_ref, w), col(z_ref, w), p_col)

    acc = (col(x_ref, W - 1), col(y_ref, W - 1), col(z_ref, W - 1))
    x, y, z = jax.lax.fori_loop(0, W - 1, body, acc)
    ox_ref[:] = x.T
    oy_ref[:] = y.T
    oz_ref[:] = z.T


@functools.lru_cache(maxsize=None)
def _build_horner(W: int, c: int, interpret: bool):
    kern = functools.partial(_horner_kernel, W=W, c=c)

    def call(x, y, z):
        return pl.pallas_call(
            kern,
            out_shape=tuple(jax.ShapeDtypeStruct((1, NLIMBS), u32) for _ in range(3)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
            interpret=interpret,
        )(jnp.asarray(_P_ARR), x, y, z)

    return call


def horner_fold(x, y, z, c: int):
    """(W, 16) BN254-G1 projective window sums -> the final projective point
    (three (16,) arrays) via the complete RCB double/add chain in one fused
    kernel."""
    W = x.shape[0]
    call = _build_horner(W, int(c), interpret=not _on_tpu())
    ox, oy, oz = call(x, y, z)
    return ox[0], oy[0], oz[0]


def _unpack_rows_tiles(rows_t):
    """(16, BLK) packed 64 B table rows (2 limbs/u32: 8 words x || 8 words y)
    -> ((16, BLK) px, (16, BLK) py) canonical limb tiles. In-kernel this is
    16 mask/shift row ops — the XLA-side unpack was a minor-dim interleave
    relayout materialized through HBM on every level-1 step."""
    px_rows, py_rows = [], []
    for i in range(8):
        r = rows_t[i : i + 1]
        px_rows += [r & MASK, r >> LIMB_BITS]
    for i in range(8, 16):
        r = rows_t[i : i + 1]
        py_rows += [r & MASK, r >> LIMB_BITS]
    return jnp.concatenate(px_rows, axis=0), jnp.concatenate(py_rows, axis=0)


def _aff_root_packed_kernel(p_ref, x1_ref, y1_ref, rows_ref, root_ref):
    p_col = p_ref[:]
    px, py = _unpack_rows_tiles(rows_ref[:].T)
    den = _aff_den_tiles(x1_ref[:].T, y1_ref[:].T, px, py, p_col)
    cur = den
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        cur = tile_mul(cur[:, :half], cur[:, half:], p_col)
    root_ref[pl.ds(pl.program_id(0), 1), :] = cur.T


def _aff_fin_tree_packed_kernel(p_ref, x1_ref, y1_ref, rows_ref, rinv_ref, ox_ref, oy_ref):
    p_col = p_ref[:]
    x1, y1 = x1_ref[:].T, y1_ref[:].T
    px, py = _unpack_rows_tiles(rows_ref[:].T)
    den = _aff_den_tiles(x1, y1, px, py, p_col)
    levels = []
    cur = den
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        left, right = cur[:, :half], cur[:, half:]
        levels.append((left, right))
        cur = tile_mul(left, right, p_col)
    inv = rinv_ref[pl.ds(pl.program_id(0), 1), :].T
    for left, right in reversed(levels):
        il = tile_mul(inv, right, p_col)
        ir = tile_mul(inv, left, p_col)
        inv = jnp.concatenate([il, ir], axis=1)
    _, _, _, dy, _, dbl = _aff_flags(x1, y1, px, py)
    num = _num_tiles(x1, dy, dbl, p_col)
    x3, y3 = _aff_fin_tiles(x1, y1, px, py, inv, num, p_col)
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T


@functools.lru_cache(maxsize=None)
def _build_aff_fused_packed(n_blocks: int, n_pts: int, interpret: bool):
    root_spec = pl.BlockSpec((n_blocks, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def call_root(*arrs):
        return pl.pallas_call(
            _aff_root_packed_kernel,
            out_shape=jax.ShapeDtypeStruct((n_blocks, NLIMBS), u32),
            grid=(n_blocks,),
            in_specs=[_spec_p()] + [_spec_pt() for _ in range(3)],
            out_specs=root_spec,
            interpret=interpret,
        )(jnp.asarray(_P_ARR), *arrs)

    def call_fin(*arrs):
        return pl.pallas_call(
            _aff_fin_tree_packed_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((n_pts, NLIMBS), u32) for _ in range(2)),
            grid=(n_blocks,),
            in_specs=[_spec_p()] + [_spec_pt() for _ in range(3)] + [root_spec],
            out_specs=(_spec_pt(), _spec_pt()),
            interpret=interpret,
        )(jnp.asarray(_P_ARR), *arrs)

    return call_root, call_fin


def aff_add_mixed_packed(x1, y1, rows):
    """Complete batched-affine (x1,y1) + unpack(rows): the level-1 hot op.
    `rows` are 64 B packed x||y table rows ((n, 16) u32, 2 limbs/word);
    unpacking happens inside the kernels."""
    from ..fields import jax_field as jf

    shape = x1.shape
    flat = [a.reshape(-1, NLIMBS) for a in (x1, y1, rows)]
    n = flat[0].shape[0]
    m = ((n + BLK - 1) // BLK) * BLK
    if m != n:
        flat = [jnp.concatenate([a, jnp.zeros((m - n, NLIMBS), u32)]) for a in flat]
    call_root, call_fin = _build_aff_fused_packed(m // BLK, m, interpret=not _on_tpu())
    roots = call_root(*flat)
    rinv = jf.batch_inv(jf.FQ, roots)
    x3, y3 = call_fin(*flat, rinv)
    return x3[:n].reshape(shape), y3[:n].reshape(shape)


@functools.lru_cache(maxsize=None)
def _build_aff_fused(n_blocks: int, n_pts: int, interpret: bool):
    # the (n_blocks, 16) roots array travels whole (constant index map):
    # 46 KB of VMEM at 2^20-scale widths, far below per-row block minimums
    root_spec = pl.BlockSpec((n_blocks, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def call_root(*arrs):
        return pl.pallas_call(
            _aff_root_kernel,
            out_shape=jax.ShapeDtypeStruct((n_blocks, NLIMBS), u32),
            grid=(n_blocks,),
            in_specs=[_spec_p()] + [_spec_pt() for _ in range(4)],
            out_specs=root_spec,
            interpret=interpret,
        )(jnp.asarray(_P_ARR), *arrs)

    def call_fin(*arrs):
        return pl.pallas_call(
            _aff_fin_tree_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((n_pts, NLIMBS), u32) for _ in range(2)),
            grid=(n_blocks,),
            in_specs=[_spec_p()] + [_spec_pt() for _ in range(4)] + [root_spec],
            out_specs=(_spec_pt(), _spec_pt()),
            interpret=interpret,
        )(jnp.asarray(_P_ARR), *arrs)

    return call_root, call_fin


def aff_add_fused(x1, y1, px, py):
    """Complete batched-affine add, fully fused: kernel A (denominator
    product-tree roots) -> one Fermat-kernel batch inversion of the roots ->
    kernel B (tree walk-down + affine finish). Three launches per call —
    same launch structure as one RCB kernel, at ~8 in-kernel multiplies per
    lane instead of 13 (and 2-coordinate accumulators)."""
    from ..fields import jax_field as jf

    shape = x1.shape
    flat = [a.reshape(-1, NLIMBS) for a in (x1, y1, px, py)]
    n = flat[0].shape[0]
    m = ((n + BLK - 1) // BLK) * BLK
    if m != n:
        flat = [jnp.concatenate([a, jnp.zeros((m - n, NLIMBS), u32)]) for a in flat]
    call_root, call_fin = _build_aff_fused(m // BLK, m, interpret=not _on_tpu())
    roots = call_root(*flat)
    rinv = jf.batch_inv(jf.FQ, roots)
    x3, y3 = call_fin(*flat, rinv)
    return x3[:n].reshape(shape), y3[:n].reshape(shape)


def _pack_rows_tiles(x, y):
    """Inverse of _unpack_rows_tiles: two (16, BLK) canonical limb tiles ->
    one (16, BLK) packed-word tile (2 limbs/u32: 8 x-words || 8 y-words)."""
    rows = []
    for i in range(8):
        rows.append(x[2 * i : 2 * i + 1] | (x[2 * i + 1 : 2 * i + 2] << LIMB_BITS))
    for i in range(8):
        rows.append(y[2 * i : 2 * i + 1] | (y[2 * i + 1 : 2 * i + 2] << LIMB_BITS))
    return jnp.concatenate(rows, axis=0)


def _halves_pair(vt, k, i):
    """Unpack pair i of a (l*16, BLK) transposed packed slab split into
    halves (element i pairs with element k+i). Recomputed on demand — tiles
    are cheap to rebuild from the resident slab block, and RETAINING k
    pairs of unpacked tiles overflows the kernel's scoped VMEM at k=16."""
    ax, ay = _unpack_rows_tiles(vt[i * NLIMBS : (i + 1) * NLIMBS])
    bx, by = _unpack_rows_tiles(vt[(k + i) * NLIMBS : (k + i + 1) * NLIMBS])
    return ax, ay, bx, by


def _aff_halves_root_kernel(p_ref, v_ref, root_ref, *, k, tr=False):
    """Fused halves-pair kernel A: v is (BLK, l*16) — each row holds one
    slab column's l packed elements; element i pairs with element k+i
    (k = l/2). Emits the per-block product root of ALL k*BLK masked slope
    denominators (prefix chain along k, then a lane tree). With tr=True
    the block arrives already transposed ((l*16, BLK) — the orientation
    the interleave kernel emits), skipping the in-kernel transpose."""
    p_col = p_ref[:]
    vt = v_ref[:] if tr else v_ref[:].T  # (l*16, BLK)
    prefix = None
    for i in range(k):
        den = _aff_den_tiles(*_halves_pair(vt, k, i), p_col)
        prefix = den if prefix is None else tile_mul(prefix, den, p_col)
    cur = prefix
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        cur = tile_mul(cur[:, :half], cur[:, half:], p_col)
    root_ref[pl.ds(pl.program_id(0), 1), :] = cur.T


def _aff_halves_fin_kernel(p_ref, v_ref, rinv_ref, o_ref, *, k, tr=False):
    """Fused halves-pair kernel B: walk the rebuilt lane tree down from the
    inverted block root to per-lane 1/P_{k-1}, back-substitute along the
    k prefix chain to every element's 1/den (the classic Montgomery batch-
    inversion sequence), finish the k complete affine adds, and emit the
    sums PACKED as a (BLK, (l/2)*16) slab — the next round's input, with
    the minor dim wide at every scale (a narrow-minor (M, 16) layout at
    2^20 scale is 8x tile-padded = 11 GB in HBM). Only the k-tile prefix
    chain is retained; pairs/denominators are recomputed where needed to
    stay inside scoped VMEM."""
    p_col = p_ref[:]
    vt = v_ref[:] if tr else v_ref[:].T
    prefixes = []
    prefix = None
    for i in range(k):
        den = _aff_den_tiles(*_halves_pair(vt, k, i), p_col)
        prefix = den if prefix is None else tile_mul(prefix, den, p_col)
        prefixes.append(prefix)
    levels = []
    cur = prefixes[-1]
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        left, right = cur[:, :half], cur[:, half:]
        levels.append((left, right))
        cur = tile_mul(left, right, p_col)
    inv = rinv_ref[pl.ds(pl.program_id(0), 1), :].T
    for left, right in reversed(levels):
        il = tile_mul(inv, right, p_col)
        ir = tile_mul(inv, left, p_col)
        inv = jnp.concatenate([il, ir], axis=1)
    # inv = 1/P_{k-1} per lane; back-substitute: 1/den_i = inv_run * P_{i-1}
    inv_run = inv
    for i in reversed(range(k)):
        ax, ay, bx, by = _halves_pair(vt, k, i)
        inv_i = tile_mul(inv_run, prefixes[i - 1], p_col) if i > 0 else inv_run
        _, _, _, dy, _, dbl = _aff_flags(ax, ay, bx, by)
        num = _num_tiles(ax, dy, dbl, p_col)
        x3, y3 = _aff_fin_tiles(ax, ay, bx, by, inv_i, num, p_col)
        if tr:
            o_ref[i * NLIMBS : (i + 1) * NLIMBS, :] = _pack_rows_tiles(x3, y3)
        else:
            o_ref[:, i * NLIMBS : (i + 1) * NLIMBS] = _pack_rows_tiles(x3, y3).T
        if i > 0:
            den_i = _aff_den_tiles(ax, ay, bx, by, p_col)
            inv_run = tile_mul(inv_run, den_i, p_col)


@functools.lru_cache(maxsize=None)
def _build_aff_halves(n_blocks: int, n_rows: int, k: int, interpret: bool, blk: int = BLK, tr: bool = False):
    root_spec = pl.BlockSpec((n_blocks, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if tr:
        v_spec = pl.BlockSpec((2 * k * NLIMBS, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((k * NLIMBS, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((k * NLIMBS, n_rows), u32)
    else:
        v_spec = pl.BlockSpec((blk, 2 * k * NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((blk, k * NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_rows, k * NLIMBS), u32)
    kern_root = functools.partial(_aff_halves_root_kernel, k=k, tr=tr)
    kern_fin = functools.partial(_aff_halves_fin_kernel, k=k, tr=tr)

    def call_root(v):
        return pl.pallas_call(
            kern_root,
            out_shape=jax.ShapeDtypeStruct((n_blocks, NLIMBS), u32),
            grid=(n_blocks,),
            in_specs=[_spec_p(), v_spec],
            out_specs=root_spec,
            interpret=interpret,
        )(jnp.asarray(_P_ARR), v)

    def call_fin(v, rinv):
        return pl.pallas_call(
            kern_fin,
            out_shape=out_shape,
            grid=(n_blocks,),
            in_specs=[_spec_p(), v_spec, root_spec],
            out_specs=o_spec,
            interpret=interpret,
        )(jnp.asarray(_P_ARR), v, rinv)

    return call_root, call_fin


def l1_aff_halves_t(slab_t, L: int, max_blk: int = BLK):
    """MSM v11 level-1 (pair path) in TRANSPOSED orientation end-to-end:
    every halves-pairing round consumes and emits (l*16, ncols) slabs —
    the orientation the interleave kernel produces — so no round pays an
    in-kernel block transpose. Returns the final (16, ncols) packed rows
    (callers transpose once at the tiny terminal shape)."""
    from ..fields import jax_field as jf

    ncols = slab_t.shape[1]
    assert L & (L - 1) == 0 and slab_t.shape[0] == L * NLIMBS
    interp = not _on_tpu()
    l = L
    while l > 1:
        k = l // 2
        blk = min(max_blk, BLK if k <= 8 else max(128, BLK * 8 // k))
        assert ncols % blk == 0
        call_root, call_fin = _build_aff_halves(ncols // blk, ncols, k, interp, blk=blk, tr=True)
        roots = call_root(slab_t)
        rinv = jf.batch_inv(jf.FQ, roots)
        slab_t = call_fin(slab_t, rinv)
        l = k
    return slab_t


def l1_aff_halves(rows, L: int, max_blk: int = BLK):
    """MSM v8 level-1: reduce the (ncols, L*16) packed slab to one affine
    point per column by log2(L) rounds of halves-pairing — round r adds
    element i to element l/2+i of every column (same bucket by
    construction), all adds of a round sharing one batch inversion. The
    slab keeps its wide-minor layout at every round; returns the final
    (ncols, 16) packed rows. ncols must be a multiple of the block width."""
    from ..fields import jax_field as jf

    ncols = rows.shape[0]
    assert ncols % min(max_blk, BLK) == 0 and L & (L - 1) == 0
    interp = not _on_tpu()
    l = L
    while l > 1:
        k = l // 2
        # scoped VMEM scales with blk*k: shrink the block width for the wide
        # early rounds (k=16 at blk=1024 overflowed the 16 MB scoped limit
        # at 2^20 scale) so every round's working set stays ~constant
        blk = min(max_blk, BLK if k <= 8 else max(128, BLK * 8 // k))
        call_root, call_fin = _build_aff_halves(ncols // blk, ncols, k, interp, blk=blk)
        roots = call_root(rows)
        rinv = jf.batch_inv(jf.FQ, roots)
        rows = call_fin(rows, rinv)
        l = k
    return rows


def _aff_prep_kernel(p_ref, x1_ref, y1_ref, px_ref, py_ref, den_ref, num_ref):
    den, num = _aff_prep_tiles(x1_ref[:].T, y1_ref[:].T, px_ref[:].T, py_ref[:].T, p_ref[:])
    den_ref[:] = den.T
    num_ref[:] = num.T


def _aff_fin_kernel(p_ref, x1_ref, y1_ref, px_ref, py_ref, inv_ref, num_ref, ox_ref, oy_ref):
    x3, y3 = _aff_fin_tiles(
        x1_ref[:].T,
        y1_ref[:].T,
        px_ref[:].T,
        py_ref[:].T,
        inv_ref[:].T,
        num_ref[:].T,
        p_ref[:],
    )
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T


# ---------------------------------------------------------------------------
# G2: Fq2 tiles (pairs of (16, BLK) component tiles) + complete RCB kernels
# ---------------------------------------------------------------------------


def f2_add(a, b):
    return (tile_add(a[0], b[0]), tile_add(a[1], b[1]))


def f2_sub(a, b):
    return (tile_sub(a[0], b[0]), tile_sub(a[1], b[1]))


def f2_mul(a, b, p_col):
    """Karatsuba over Fq[u]/(u^2+1): 3 tile_muls (matches jax_field.fq2_mul)."""
    t0 = tile_mul(a[0], b[0], p_col)
    t1 = tile_mul(a[1], b[1], p_col)
    c0 = tile_sub(t0, t1)
    s = tile_mul(tile_add(a[0], a[1]), tile_add(b[0], b[1]), p_col)
    c1 = tile_sub(tile_sub(s, t0), t1)
    return (c0, c1)


def f2_is_zero(a):
    return jnp.logical_and(tile_is_zero(a[0]), tile_is_zero(a[1]))


def f2_select(cond, a, b):
    return (tile_select(cond, a[0], b[0]), tile_select(cond, a[1], b[1]))


def _b3_g2_limbs():
    """Montgomery limbs of 3*b' = 9/(9+u) (the RCB mul-by-3b constant for
    BN254 G2, /root/reference twist b' = 3/(9+u)) as two 16-int tuples."""
    from .host import B_G2

    b3 = B_G2 + B_G2 + B_G2
    return (
        tuple(int(x) for x in FQ.pack([b3.c0])[0]),
        tuple(int(x) for x in FQ.pack([b3.c1])[0]),
    )


_B3_G2 = _b3_g2_limbs()


def f2_mul_b3(a, p_col, blk):
    """a * (3b') for the G2 twist constant — a full Fq2 constant, so this is
    one Karatsuba mul against a broadcast constant tile (unlike G1's 9*a
    add chain)."""
    c = (_const_col(_B3_G2[0], blk), _const_col(_B3_G2[1], blk))
    return f2_mul(a, c, p_col)


def _pmadd_rcb_g2_tiles(x1, y1, z1, ax, ay, p_col):
    """G2 mixed add — RCB15 Algorithm 8 (a=0) over Fq2; mirrors
    curves/proj.py ProjOps.add_mixed. The affine (0,0) sentinel is resolved
    by one select (curve points in the prime-order G2 subgroup have y != 0:
    y = 0 implies order 2)."""
    blk = x1[0].shape[1]
    q_inf = f2_is_zero(ay)
    t0 = f2_mul(x1, ax, p_col)
    t1 = f2_mul(y1, ay, p_col)
    t3 = f2_mul(f2_add(ax, ay), f2_add(x1, y1), p_col)
    t3 = f2_sub(t3, f2_add(t0, t1))
    t4 = f2_add(f2_mul(ay, z1, p_col), y1)
    y3 = f2_add(f2_mul(ax, z1, p_col), x1)
    x3 = f2_add(t0, t0)
    t0 = f2_add(x3, t0)
    t2 = f2_mul_b3(z1, p_col, blk)
    z3 = f2_add(t1, t2)
    t1 = f2_sub(t1, t2)
    y3 = f2_mul_b3(y3, p_col, blk)
    x3 = f2_sub(f2_mul(t3, t1, p_col), f2_mul(t4, y3, p_col))
    y3 = f2_add(f2_mul(t1, z3, p_col), f2_mul(y3, t0, p_col))
    z3 = f2_add(f2_mul(z3, t4, p_col), f2_mul(t0, t3, p_col))
    x3 = f2_select(q_inf, x1, x3)
    y3 = f2_select(q_inf, y1, y3)
    z3 = f2_select(q_inf, z1, z3)
    return x3, y3, z3


def _padd_rcb_g2_tiles(x1, y1, z1, x2, y2, z2, p_col):
    """G2 complete projective add — RCB15 Algorithm 7 (a=0) over Fq2."""
    blk = x1[0].shape[1]
    t0 = f2_mul(x1, x2, p_col)
    t1 = f2_mul(y1, y2, p_col)
    t2 = f2_mul(z1, z2, p_col)
    t3 = f2_mul(f2_add(x1, y1), f2_add(x2, y2), p_col)
    t3 = f2_sub(t3, f2_add(t0, t1))
    t4 = f2_mul(f2_add(y1, z1), f2_add(y2, z2), p_col)
    t4 = f2_sub(t4, f2_add(t1, t2))
    y3 = f2_mul(f2_add(x1, z1), f2_add(x2, z2), p_col)
    y3 = f2_sub(y3, f2_add(t0, t2))
    x3 = f2_add(t0, t0)
    t0 = f2_add(x3, t0)
    t2 = f2_mul_b3(t2, p_col, blk)
    z3 = f2_add(t1, t2)
    t1 = f2_sub(t1, t2)
    y3 = f2_mul_b3(y3, p_col, blk)
    x3 = f2_sub(f2_mul(t3, t1, p_col), f2_mul(t4, y3, p_col))
    y3 = f2_add(f2_mul(t1, z3, p_col), f2_mul(y3, t0, p_col))
    z3 = f2_add(f2_mul(z3, t4, p_col), f2_mul(t0, t3, p_col))
    return x3, y3, z3


def _pdbl_rcb_g2_tiles(x, y, z, p_col):
    """G2 complete projective double — RCB15 Algorithm 9 (a=0) over Fq2."""
    blk = x[0].shape[1]
    t0 = f2_mul(y, y, p_col)
    z3 = f2_add(t0, t0)
    z3 = f2_add(z3, z3)
    z3 = f2_add(z3, z3)
    t1 = f2_mul(y, z, p_col)
    t2 = f2_mul_b3(f2_mul(z, z, p_col), p_col, blk)
    x3 = f2_mul(t2, z3, p_col)
    y3 = f2_add(t0, t2)
    z3 = f2_mul(t1, z3, p_col)
    t1 = f2_add(t2, t2)
    t2 = f2_add(t1, t2)
    t0 = f2_sub(t0, t2)
    y3 = f2_mul(t0, y3, p_col)
    y3 = f2_add(x3, y3)
    t1 = f2_mul(x, y, p_col)
    x3 = f2_mul(t0, t1, p_col)
    x3 = f2_add(x3, x3)
    return x3, y3, z3


def _g2_split(t):
    """(32, BLK) row-major G2 coordinate -> (c0, c1) pair of (16, BLK) tiles."""
    return (t[:NLIMBS], t[NLIMBS:])


def _g2_cat(a):
    return jnp.concatenate([a[0], a[1]], axis=0)


def _pmadd_rcb_g2_kernel(p_ref, x_ref, y_ref, z_ref, ax_ref, ay_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _pmadd_rcb_g2_tiles(
        _g2_split(x_ref[:].T),
        _g2_split(y_ref[:].T),
        _g2_split(z_ref[:].T),
        _g2_split(ax_ref[:].T),
        _g2_split(ay_ref[:].T),
        p_col,
    )
    ox_ref[:] = _g2_cat(x3).T
    oy_ref[:] = _g2_cat(y3).T
    oz_ref[:] = _g2_cat(z3).T


def _padd_rcb_g2_kernel(
    p_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref, ox_ref, oy_ref, oz_ref
):
    p_col = p_ref[:]
    x3, y3, z3 = _padd_rcb_g2_tiles(
        _g2_split(x1_ref[:].T),
        _g2_split(y1_ref[:].T),
        _g2_split(z1_ref[:].T),
        _g2_split(x2_ref[:].T),
        _g2_split(y2_ref[:].T),
        _g2_split(z2_ref[:].T),
        p_col,
    )
    ox_ref[:] = _g2_cat(x3).T
    oy_ref[:] = _g2_cat(y3).T
    oz_ref[:] = _g2_cat(z3).T


def _pdbl_rcb_g2_kernel(p_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _pdbl_rcb_g2_tiles(
        _g2_split(x_ref[:].T), _g2_split(y_ref[:].T), _g2_split(z_ref[:].T), p_col
    )
    ox_ref[:] = _g2_cat(x3).T
    oy_ref[:] = _g2_cat(y3).T
    oz_ref[:] = _g2_cat(z3).T


# ---------------------------------------------------------------------------
# pallas_call wrappers ((n, 16) interface layout)
# ---------------------------------------------------------------------------


def _spec_pt(width: int = NLIMBS):
    return pl.BlockSpec((BLK, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _spec_p():
    return pl.BlockSpec((NLIMBS, 1), lambda *_: (0, 0), memory_space=pltpu.VMEM)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _madd_kernel(p_ref, x_ref, y_ref, z_ref, ax_ref, ay_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _madd_tiles(
        x_ref[:].T, y_ref[:].T, z_ref[:].T, ax_ref[:].T, ay_ref[:].T, p_col
    )
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T
    oz_ref[:] = z3.T


def _dbl_kernel(p_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _dbl_tiles(x_ref[:].T, y_ref[:].T, z_ref[:].T, p_col)
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T
    oz_ref[:] = z3.T


def _add_kernel(p_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _add_tiles(
        x1_ref[:].T, y1_ref[:].T, z1_ref[:].T, x2_ref[:].T, y2_ref[:].T, z2_ref[:].T, p_col
    )
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T
    oz_ref[:] = z3.T


def _pmadd_rcb_kernel(p_ref, x_ref, y_ref, z_ref, ax_ref, ay_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _pmadd_rcb_tiles(
        x_ref[:].T, y_ref[:].T, z_ref[:].T, ax_ref[:].T, ay_ref[:].T, p_col
    )
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T
    oz_ref[:] = z3.T


def _padd_rcb_kernel(p_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _padd_rcb_tiles(
        x1_ref[:].T, y1_ref[:].T, z1_ref[:].T, x2_ref[:].T, y2_ref[:].T, z2_ref[:].T, p_col
    )
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T
    oz_ref[:] = z3.T


def _pdbl_rcb_kernel(p_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
    p_col = p_ref[:]
    x3, y3, z3 = _pdbl_rcb_tiles(x_ref[:].T, y_ref[:].T, z_ref[:].T, p_col)
    ox_ref[:] = x3.T
    oy_ref[:] = y3.T
    oz_ref[:] = z3.T


_KERNELS = {
    "madd": (_madd_kernel, 5, NLIMBS, 3),
    "dbl": (_dbl_kernel, 3, NLIMBS, 3),
    "add": (_add_kernel, 6, NLIMBS, 3),
    "pmadd_rcb": (_pmadd_rcb_kernel, 5, NLIMBS, 3),
    "padd_rcb": (_padd_rcb_kernel, 6, NLIMBS, 3),
    "pdbl_rcb": (_pdbl_rcb_kernel, 3, NLIMBS, 3),
    "pmadd_rcb_g2": (_pmadd_rcb_g2_kernel, 5, 2 * NLIMBS, 3),
    "padd_rcb_g2": (_padd_rcb_g2_kernel, 6, 2 * NLIMBS, 3),
    "pdbl_rcb_g2": (_pdbl_rcb_g2_kernel, 3, 2 * NLIMBS, 3),
    "aff_prep": (_aff_prep_kernel, 4, NLIMBS, 2),
    "aff_fin": (_aff_fin_kernel, 6, NLIMBS, 2),
}


@functools.lru_cache(maxsize=None)
def _build(kernel_name: str, n_blocks: int, n_pts: int, interpret: bool):
    kernel, n_in, width, n_out = _KERNELS[kernel_name]
    outs = tuple(jax.ShapeDtypeStruct((n_pts, width), u32) for _ in range(n_out))

    def call(*arrs):
        return pl.pallas_call(
            kernel,
            out_shape=outs,
            grid=(n_blocks,),
            in_specs=[_spec_p()] + [_spec_pt(width) for _ in range(n_in)],
            out_specs=tuple(_spec_pt(width) for _ in range(n_out)),
            interpret=interpret,
        )(jnp.asarray(_P_ARR), *arrs)

    return call


def _run(kernel_name: str, arrs):
    """Flatten batch dims, pad to BLK, run, un-pad."""
    width = _KERNELS[kernel_name][2]
    shape = arrs[0].shape
    flat = [a.reshape(-1, width) for a in arrs]
    n = flat[0].shape[0]
    m = ((n + BLK - 1) // BLK) * BLK
    if m != n:
        flat = [jnp.concatenate([a, jnp.zeros((m - n, width), u32)]) for a in flat]
    call = _build(kernel_name, m // BLK, m, interpret=not _on_tpu())
    outs = call(*flat)
    return tuple(o[:n].reshape(shape) for o in outs)


def madd(x, y, z, ax, ay):
    return _run("madd", [x, y, z, ax, ay])


def dbl(x, y, z):
    return _run("dbl", [x, y, z])


def add(x1, y1, z1, x2, y2, z2):
    return _run("add", [x1, y1, z1, x2, y2, z2])


def pmadd_rcb(x, y, z, ax, ay):
    return _run("pmadd_rcb", [x, y, z, ax, ay])


def padd_rcb(x1, y1, z1, x2, y2, z2):
    return _run("padd_rcb", [x1, y1, z1, x2, y2, z2])


def pdbl_rcb(x, y, z):
    return _run("pdbl_rcb", [x, y, z])


def aff_prep(x1, y1, px, py):
    """(den, num) for the batched-affine add (MSM v5 accumulation)."""
    return _run("aff_prep", [x1, y1, px, py])


def aff_fin(x1, y1, px, py, inv, num):
    """Affine sum (x3, y3) from the batch-inverted denominator."""
    return _run("aff_fin", [x1, y1, px, py, inv, num])


def pmadd_rcb_g2(x, y, z, ax, ay):
    """G2 mixed add on (..., 2, 16) Fq2 coordinate arrays."""
    return _run("pmadd_rcb_g2", [x, y, z, ax, ay])


def padd_rcb_g2(x1, y1, z1, x2, y2, z2):
    return _run("padd_rcb_g2", [x1, y1, z1, x2, y2, z2])


def pdbl_rcb_g2(x, y, z):
    return _run("pdbl_rcb_g2", [x, y, z])
