"""Batched COMPLETE affine group ops with shared (tree) batch inversion —
the MSM v5 bucket-accumulation arithmetic.

Rationale: the complete RCB projective mixed add costs 13 field multiplies
per lane; an affine + affine add costs 2M + 2S *plus one field inversion*,
and Montgomery's simultaneous-inversion trick amortizes the inversion to
~3 multiplies per lane (jax_field.batch_inv: a log-depth product tree with
ONE Fermat inversion at the root). Net: ~7 multiplies per accumulated point
— every GPU-era MSM record uses this trick; the TPU version replaces the
warp-level prefix products with tree levels of full-width Pallas CIOS
multiplies. Affine accumulators also carry 2 coordinates instead of 3,
shrinking the collapse/suffix stages' data movement by a third.

Completeness is branchless (same contract as curves/proj.py): (0,0) is the
infinity sentinel (y = 0 never happens on prime-order a=0 curves), equal-x
lanes take the tangent slope (doubling), inverse pairs produce the sentinel,
and degenerate denominators are masked to 1 before the shared inversion.

Replaces the hot-path role of arkworks' batch_add_in_place affine bucket
loops (reference L0, /root/reference/cp-groth16/src/prover.rs:88-129 MSM
calls into ark-ec's scalar_mul backends).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..fields import jax_field as jf


class Aff(NamedTuple):
    """Affine point batch; (0,0) = infinity."""

    x: jnp.ndarray
    y: jnp.ndarray


def _big_mul(spec, a, b):
    """mont_mul that dispatches large batches to the Pallas CIOS kernel
    (the XLA formulas run ~17x slower at MSM widths; the kernel is
    limb-count-generic, so BLS12-381's 24-limb Fq rides it too)."""
    if jf._pallas_available() and a.size // spec.nlimbs >= 2048:
        from ..fields.pallas_field import mont_mul_pallas

        return mont_mul_pallas(spec, a, b)
    return jf.mont_mul(spec, a, b)


class AffineOps:
    """Complete batched-affine ops namespace, templated on prime-field ops.

    Only meaningful for a=0 short-Weierstrass groups of prime order (no
    2-torsion: y == 0 identifies the sentinel unambiguously).
    """

    def __init__(self, fops, name: str):
        self.f = fops
        self.name = name

    # -- constructors / structure -------------------------------------------
    def inf(self, batch_shape=()) -> Aff:
        f = self.f
        return Aff(f.zeros(batch_shape), f.zeros(batch_shape))

    def is_inf(self, p: Aff):
        return self.f.is_zero(p.y)

    def select(self, cond, p: Aff, q: Aff) -> Aff:
        f = self.f
        return Aff(f.select(cond, p.x, q.x), f.select(cond, p.y, q.y))

    def neg(self, p: Aff) -> Aff:
        f = self.f
        ny = f.select(self.is_inf(p), f.zeros(p.x.shape[: p.x.ndim - f.ndim]), f.neg(p.y))
        return Aff(p.x, ny)

    # -- the add (generic path; Pallas subclass overrides with fused kernels;
    # multiplies here dispatch through _big_mul so large batches on curves
    # without fused kernels — BLS12-381 G1 — still use the Pallas CIOS) ----
    def _prep(self, p: Aff, q: Aff):
        f = self.f
        q_inf = self.is_inf(q)
        p_inf = self.is_inf(p)
        dx = f.sub(q.x, p.x)
        dy = f.sub(q.y, p.y)
        same_x = f.is_zero(dx)
        dbl = jnp.logical_and(same_x, f.is_zero(dy))
        x1sq = _big_mul(f.spec, p.x, p.x)
        num_dbl = f.add(f.add(x1sq, x1sq), x1sq)
        den = f.select(dbl, f.add(p.y, p.y), dx)
        num = f.select(dbl, num_dbl, dy)
        degen = jnp.logical_or(jnp.logical_or(q_inf, p_inf), same_x & ~dbl)
        batch = p.x.shape[: p.x.ndim - f.ndim]
        den = f.select(degen, f.one(batch), den)
        return den, num

    def _fin(self, p: Aff, q: Aff, inv, num) -> Aff:
        f = self.f
        q_inf = self.is_inf(q)
        p_inf = self.is_inf(p)
        dx = f.sub(q.x, p.x)
        dy = f.sub(q.y, p.y)
        same_x = f.is_zero(dx)
        dbl = jnp.logical_and(same_x, f.is_zero(dy))
        lam = _big_mul(f.spec, num, inv)
        x2s = f.select(dbl, p.x, q.x)
        x3 = f.sub(f.sub(_big_mul(f.spec, lam, lam), p.x), x2s)
        y3 = f.sub(_big_mul(f.spec, lam, f.sub(p.x, x3)), p.y)
        inverse = same_x & ~dbl & ~(p_inf | q_inf)
        batch = p.x.shape[: p.x.ndim - f.ndim]
        zero = f.zeros(batch)
        x3 = f.select(inverse, zero, x3)
        y3 = f.select(inverse, zero, y3)
        x3 = f.select(q_inf, p.x, x3)
        y3 = f.select(q_inf, p.y, y3)
        x3 = f.select(p_inf, q.x, x3)
        y3 = f.select(p_inf, q.y, y3)
        return Aff(x3, y3)

    def add(self, p: Aff, q: Aff) -> Aff:
        """Complete P + Q (both affine with the (0,0) sentinel)."""
        den, num = self._prep(p, q)
        inv = jf.batch_inv(self.f.spec, den)
        return self._fin(p, q, inv, num)

    def unpack_rows(self, rows) -> Aff:
        """(n, nlimbs) packed 64 B-style table rows (2 limbs/u32, x || y
        halves) -> affine point batch with canonical (n, nlimbs) limbs."""
        nl = self.f.spec.nlimbs
        xw, yw = rows[..., : nl // 2], rows[..., nl // 2 :]

        def up(p):
            lo = p & jnp.uint32(0xFFFF)
            hi = p >> 16
            return jnp.stack([lo, hi], axis=-1).reshape(p.shape[:-1] + (nl,))

        return Aff(up(xw), up(yw))

    def add_packed(self, p: Aff, rows) -> Aff:
        """P + unpack(rows) — the MSM level-1 hot op; the Pallas subclass
        unpacks inside the fused kernels (the XLA unpack is a minor-dim
        interleave relayout materialized through HBM)."""
        return self.add(p, self.unpack_rows(rows))

    def pack_rows(self, p: Aff):
        """Affine batch -> (n, nlimbs) packed table rows (2 limbs/u32)."""

        def pk(a):
            return a[..., 0::2] | (a[..., 1::2] << 16)

        return jnp.concatenate([pk(p.x), pk(p.y)], axis=-1)

    def add_pairs_packed(self, v):
        """(m, 2*nlimbs) packed PAIRS (a || b rows) -> (m, nlimbs) packed
        sums: the MSM v8 pairwise-tree round op. Every add is independent,
        so the whole round shares one batch inversion; the Pallas subclass
        runs it as two fused kernels with zero XLA-side relayouts."""
        nw = v.shape[-1] // 2
        out = self.add(self.unpack_rows(v[:, :nw]), self.unpack_rows(v[:, nw:]))
        return self.pack_rows(out)

    # -- interop --------------------------------------------------------------
    def from_proj(self, x, y, z) -> Aff:
        """Batched homogeneous-projective -> affine via ONE tree batch
        inversion (~3 multiplies/element vs ~380 for vectorized Fermat);
        z == 0 lanes become the (0,0) sentinel."""
        f = self.f
        batch = x.shape[: x.ndim - f.ndim]
        inf = f.is_zero(z)
        zs = f.select(inf, f.one(batch), z)
        zinv = jf.batch_inv(f.spec, zs)
        ax = _big_mul(f.spec, x, zinv)
        ay = _big_mul(f.spec, y, zinv)
        zero = f.zeros(batch)
        return Aff(f.select(inf, zero, ax), f.select(inf, zero, ay))

    def to_jacobian(self, p: Aff):
        from .jax_curve import Jac

        f = self.f
        batch = p.x.shape[: p.x.ndim - f.ndim]
        z = f.select(self.is_inf(p), f.zeros(batch), f.one(batch))
        return Jac(p.x, p.y, z)


class PallasAffG1Ops(AffineOps):
    """BN254 G1 affine ops dispatching large batches to the fused Pallas
    prep/fin kernels (curves/pallas_curve.py); small batches / non-TPU run
    the XLA formulas (trace-time static dispatch, like PallasProjG1Ops)."""

    MIN_LANES = 128

    @staticmethod
    def _use_pallas(arr) -> bool:
        from . import pallas_curve as _pc

        if not _pc._on_tpu():
            return False
        n = int(np.prod(arr.shape[:-1])) if arr.ndim > 1 else 1
        return n >= PallasAffG1Ops.MIN_LANES

    def add(self, p: Aff, q: Aff) -> Aff:
        if not self._use_pallas(p.x):
            return super().add(p, q)
        from . import pallas_curve as _pc

        return Aff(*_pc.aff_add_fused(p.x, p.y, q.x, q.y))

    def add_packed(self, p: Aff, rows) -> Aff:
        if not self._use_pallas(p.x):
            return super().add_packed(p, rows)
        from . import pallas_curve as _pc

        return Aff(*_pc.aff_add_mixed_packed(p.x, p.y, rows))


AFF_G1 = PallasAffG1Ops(jf.FqOps, "g1_aff")

_AFF_BLS = None


def aff_for_curve(curve) -> AffineOps:
    """Complete-affine ops matching a CurveOps' base field (G1 curves only:
    the Fq2/G2 path stays on the fused RCB projective kernels)."""
    assert curve.f.ndim == 1, "batched-affine accumulation is a G1 path"
    from ..fields.bn254 import P as P254

    if curve.f.spec.modulus == P254:
        return AFF_G1
    global _AFF_BLS
    if _AFF_BLS is None:
        _AFF_BLS = AffineOps(curve.f, "g1_bls381_aff")
    return _AFF_BLS
