"""Homogeneous-projective curve arithmetic with COMPLETE addition formulas
(Renes-Costello-Batina 2015, j-invariant-0 algorithms 7/8/9) for TPU.

Why a second coordinate system next to curves/jax_curve.py's Jacobian ops:
the Jacobian add/madd formulas are incomplete — every batched add pays a
branchless "doubling escape" (a full 2M+5S doubling computed and selected
away) plus infinity selects, which is ~35% of the kernel's multiply count.
The RCB formulas are complete over the whole group: identity (0:1:0),
doubling (P+P) and inverse (P+(-P)) all flow through the SAME straight-line
code, so the MSM accumulation kernels (msm/pippenger.py) run zero escapes
and zero accumulator selects. Mixed add costs 11M + 2 mul-by-3b (vs
8M+5S+7 escape muls), full add 12M + 2 mul-by-3b.

The only residual edge is the *affine* operand of a mixed add: affine
coordinates cannot represent the identity, so the (0,0) padding sentinel
(used by the MSM gather tables) is handled by one final select. For curve
points y != 0 always holds on prime-order a=0 curves, so `ay == 0` alone
identifies the sentinel.

Replaces the hot-path role of arkworks' `ark-ec` batched ops (reference L0,
/root/reference/cp-groth16/src/prover.rs:88-129 MSM inner loops).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..fields import jax_field as jf
from .jax_curve import Jac


class Proj(NamedTuple):
    """Homogeneous projective point: x = X/Z, y = Y/Z; identity = (0:1:0)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class ProjOps:
    """Complete-formula group ops, templated on a FieldOps namespace.

    `b3_host` is 3*b of the curve as a host int (b=3 for BN254 G1 -> 9).
    """

    def __init__(self, fops, b3_host: int, name: str):
        self.f = fops
        self.name = name
        self.b3_host = b3_host
        # Montgomery-form constant, materialized lazily per backend
        self._b3 = np.asarray(fops.pack([b3_host])[0])

    # -- constructors -------------------------------------------------------
    def inf(self, batch_shape=()) -> Proj:
        f = self.f
        return Proj(f.zeros(batch_shape), f.one(batch_shape), f.zeros(batch_shape))

    def from_affine(self, ax, ay) -> Proj:
        """(0,0) sentinel lanes become the identity (0:1:0)."""
        f = self.f
        inf_mask = f.is_zero(ay)
        batch = ax.shape[: ax.ndim - f.ndim]
        y = f.select(inf_mask, f.one(batch), ay)
        z = f.select(inf_mask, f.zeros(batch), f.one(batch))
        return Proj(ax, y, z)

    def is_inf(self, p: Proj):
        return self.f.is_zero(p.z)

    def select(self, cond, p: Proj, q: Proj) -> Proj:
        f = self.f
        return Proj(
            f.select(cond, p.x, q.x), f.select(cond, p.y, q.y), f.select(cond, p.z, q.z)
        )

    def neg(self, p: Proj) -> Proj:
        return Proj(p.x, self.f.neg(p.y), p.z)

    def mul_b3(self, a):
        return self.f.mul(a, jnp.asarray(self._b3))

    # -- group law (RCB15, a=0) ---------------------------------------------
    def add(self, p: Proj, q: Proj) -> Proj:
        """Complete P + Q — RCB15 Algorithm 7 (a=0). No edge cases."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        t0 = f.mul(x1, x2)
        t1 = f.mul(y1, y2)
        t2 = f.mul(z1, z2)
        t3 = f.mul(f.add(x1, y1), f.add(x2, y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.mul(f.add(y1, z1), f.add(y2, z2))
        t4 = f.sub(t4, f.add(t1, t2))
        y3 = f.mul(f.add(x1, z1), f.add(x2, z2))
        y3 = f.sub(y3, f.add(t0, t2))
        x3 = f.add(t0, t0)
        t0 = f.add(x3, t0)
        t2 = self.mul_b3(t2)
        z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        y3 = self.mul_b3(y3)
        x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        y3 = f.add(f.mul(t1, z3), f.mul(y3, t0))
        z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        return Proj(x3, y3, z3)

    def add_mixed(self, p: Proj, ax, ay) -> Proj:
        """P + (affine Q) — RCB15 Algorithm 8 (a=0, Z2=1). Complete except
        the affine identity sentinel (0,0), resolved by one final select."""
        f = self.f
        x1, y1, z1 = p
        q_inf = f.is_zero(ay)  # y == 0 only for the sentinel on prime-order a=0 curves
        t0 = f.mul(x1, ax)
        t1 = f.mul(y1, ay)
        t3 = f.mul(f.add(ax, ay), f.add(x1, y1))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.add(f.mul(ay, z1), y1)
        y3 = f.add(f.mul(ax, z1), x1)
        x3 = f.add(t0, t0)
        t0 = f.add(x3, t0)
        t2 = self.mul_b3(z1)
        z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        y3 = self.mul_b3(y3)
        x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        y3 = f.add(f.mul(t1, z3), f.mul(y3, t0))
        z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        res = Proj(x3, y3, z3)
        return self.select(q_inf, p, res)

    def dbl(self, p: Proj) -> Proj:
        """2P — RCB15 Algorithm 9 (a=0). Complete (identity-safe)."""
        f = self.f
        x, y, z = p
        t0 = f.sqr(y)
        z3 = f.add(t0, t0)
        z3 = f.add(z3, z3)
        z3 = f.add(z3, z3)
        t1 = f.mul(y, z)
        t2 = f.sqr(z)
        t2 = self.mul_b3(t2)
        x3 = f.mul(t2, z3)
        y3 = f.add(t0, t2)
        z3 = f.mul(t1, z3)
        t1 = f.add(t2, t2)
        t2 = f.add(t1, t2)
        t0 = f.sub(t0, t2)
        y3 = f.mul(t0, y3)
        y3 = f.add(x3, y3)
        t1 = f.mul(x, y)
        x3 = f.mul(t0, t1)
        x3 = f.add(x3, x3)
        return Proj(x3, y3, z3)

    # -- interop -------------------------------------------------------------
    def to_jacobian(self, p: Proj) -> Jac:
        """(X:Y:Z) -> Jacobian (XZ, YZ^2, Z): x=XZ/Z^2=X/Z, y=YZ^2/Z^3=Y/Z."""
        f = self.f
        z2 = f.sqr(p.z)
        return Jac(f.mul(p.x, p.z), f.mul(p.y, z2), p.z)

    def from_jacobian(self, p: Jac) -> Proj:
        """Jacobian (X, Y, Z) -> (XZ : Y : Z^3); Z=0 maps to (0:Y:0) = inf."""
        f = self.f
        return Proj(f.mul(p.x, p.z), p.y, f.mul(f.sqr(p.z), p.z))


class PallasProjG1Ops(ProjOps):
    """BN254 G1 projective ops dispatching large batches to the fused Pallas
    RCB kernels (curves/pallas_curve.py); small batches / non-TPU use the
    XLA formulas above (trace-time static dispatch, like PallasG1Ops)."""

    MIN_LANES = 128

    @staticmethod
    def _use_pallas(arr) -> bool:
        from . import pallas_curve as _pc

        if not _pc._on_tpu():
            return False
        n = int(np.prod(arr.shape[:-1])) if arr.ndim > 1 else 1
        return n >= PallasProjG1Ops.MIN_LANES

    def add(self, p: Proj, q: Proj) -> Proj:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Proj(*_pc.padd_rcb(p.x, p.y, p.z, q.x, q.y, q.z))
        return super().add(p, q)

    def add_mixed(self, p: Proj, ax, ay) -> Proj:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Proj(*_pc.pmadd_rcb(p.x, p.y, p.z, ax, ay))
        return super().add_mixed(p, ax, ay)

    def dbl(self, p: Proj) -> Proj:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Proj(*_pc.pdbl_rcb(p.x, p.y, p.z))
        return super().dbl(p)


PROJ_G1 = PallasProjG1Ops(jf.FqOps, 9, "g1_proj")


class PallasProjG2Ops(ProjOps):
    """BN254 G2 projective ops dispatching large batches to the fused Fq2
    Pallas RCB kernels. Besides speed, this bounds the MSM program size:
    the inlined XLA Fq2 formulas made the canonical-scale G2 MSM a ~19 MB
    MLIR module that OOM-killed the remote compile helper."""

    MIN_LANES = 128

    @staticmethod
    def _use_pallas(arr) -> bool:
        from . import pallas_curve as _pc

        if not _pc._on_tpu():
            return False
        n = int(np.prod(arr.shape[:-2])) if arr.ndim > 2 else 1
        return n >= PallasProjG2Ops.MIN_LANES

    def add(self, p: Proj, q: Proj) -> Proj:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Proj(*_pc.padd_rcb_g2(p.x, p.y, p.z, q.x, q.y, q.z))
        return super().add(p, q)

    def add_mixed(self, p: Proj, ax, ay) -> Proj:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Proj(*_pc.pmadd_rcb_g2(p.x, p.y, p.z, ax, ay))
        return super().add_mixed(p, ax, ay)

    def dbl(self, p: Proj) -> Proj:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Proj(*_pc.pdbl_rcb_g2(p.x, p.y, p.z))
        return super().dbl(p)

_PROJ_BLS = None


def proj_for_curve(curve) -> ProjOps:
    """The complete-formula ops matching a CurveOps' base field: BN254 G1
    (Pallas-fused), BLS12-381 G1 (generic XLA over 24 limbs), or BN254 G2."""
    if curve.f.ndim == 2:
        return proj_g2()
    from ..fields.bn254 import P as P254

    if curve.f.spec.modulus == P254:
        return PROJ_G1
    from ..fields.bls12_381 import B_G1, P as P381

    assert curve.f.spec.modulus == P381, "unknown base field for projective ops"
    global _PROJ_BLS
    if _PROJ_BLS is None:
        _PROJ_BLS = ProjOps(curve.f, 3 * B_G1, "g1_bls381_proj")
    return _PROJ_BLS


_PROJ_G2 = None


def proj_g2() -> ProjOps:
    """Complete projective ops for G2 (b' = 3/(9+u), so b3 = 9/(9+u));
    large TPU batches run the fused Fq2 Pallas RCB kernels, everything else
    the generic XLA formulas over Fq2."""
    global _PROJ_G2
    if _PROJ_G2 is None:
        from .host import B_G2

        _PROJ_G2 = PallasProjG2Ops(jf.Fq2Ops, B_G2 * 3, "g2_proj")
    return _PROJ_G2
