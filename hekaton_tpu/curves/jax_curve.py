"""Batched Jacobian-coordinate curve arithmetic for TPU, generic over the field.

G1 instantiates over Fq ((..., 16) limbs), G2 over Fq2 ((..., 2, 16) limbs) —
the short-Weierstrass a=0 formulas are identical, so the code is templated on
a FieldOps namespace. All edge cases (infinity, doubling, inverse points) are
handled branchlessly with selects so the ops vectorize over the VPU and can be
used inside lax loops and shard_map.

Replaces arkworks' `ark-ec` group kernels (reference L0 —
/root/reference/distributed-prover/Cargo.toml:12-19) with TPU-resident batch ops.

Representation:
  Jacobian: NamedTuple (x, y, z) of field arrays; infinity <=> z == 0.
  Affine:   (x, y) field arrays; infinity encoded as (0, 0) — not on curve
            for b=3, so the sentinel is unambiguous.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..fields import jax_field as jf
from ..fields.bn254 import NLIMBS


class Jac(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class CurveOps:
    def __init__(self, fops, name: str):
        self.f = fops
        self.name = name

    # -- constructors -------------------------------------------------------
    def inf(self, batch_shape=()) -> Jac:
        f = self.f
        return Jac(f.one(batch_shape), f.one(batch_shape), f.zeros(batch_shape))

    def from_affine(self, ax, ay) -> Jac:
        """Affine (x, y) arrays -> Jacobian; (0,0) lanes become infinity."""
        f = self.f
        inf_mask = jnp.logical_and(f.is_zero(ax), f.is_zero(ay))
        batch = ax.shape[: ax.ndim - f.ndim]
        z = f.select(inf_mask, f.zeros(batch), f.one(batch))
        return Jac(ax, ay, z)

    def is_inf(self, p: Jac):
        return self.f.is_zero(p.z)

    def select(self, cond, p: Jac, q: Jac) -> Jac:
        f = self.f
        return Jac(f.select(cond, p.x, q.x), f.select(cond, p.y, q.y), f.select(cond, p.z, q.z))

    def neg(self, p: Jac) -> Jac:
        return Jac(p.x, self.f.neg(p.y), p.z)

    # -- group law -----------------------------------------------------------
    def dbl(self, p: Jac) -> Jac:
        """2P via dbl-2009-l (a=0): 2M + 5S. Infinity-safe (z3 = 2yz = 0)."""
        f = self.f
        a = f.sqr(p.x)
        b = f.sqr(p.y)
        c = f.sqr(b)
        d0 = f.sqr(f.add(p.x, b))
        d = f.add(f.sub(f.sub(d0, a), c), f.sub(f.sub(d0, a), c))  # 2((x+b)^2-a-c)
        e = f.add(f.add(a, a), a)
        ff = f.sqr(e)
        x3 = f.sub(ff, f.add(d, d))
        c8 = f.add(f.add(c, c), f.add(c, c))
        c8 = f.add(c8, c8)
        y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
        z3 = f.mul(f.add(p.y, p.y), p.z)
        return Jac(x3, y3, z3)

    def add(self, p: Jac, q: Jac) -> Jac:
        """P + Q via add-2007-bl with branchless edge handling (~12M + 6S)."""
        f = self.f
        z1z1 = f.sqr(p.z)
        z2z2 = f.sqr(q.z)
        u1 = f.mul(p.x, z2z2)
        u2 = f.mul(q.x, z1z1)
        s1 = f.mul(f.mul(p.y, q.z), z2z2)
        s2 = f.mul(f.mul(q.y, p.z), z1z1)
        h = f.sub(u2, u1)
        rr = f.sub(s2, s1)
        same_x = f.is_zero(h)
        same_y = f.is_zero(rr)

        i = f.sqr(f.add(h, h))
        j = f.mul(h, i)
        r2 = f.add(rr, rr)
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.sqr(r2), j), f.add(v, v))
        s1j = f.mul(s1, j)
        y3 = f.sub(f.mul(r2, f.sub(v, x3)), f.add(s1j, s1j))
        z3 = f.mul(f.sub(f.sub(f.sqr(f.add(p.z, q.z)), z1z1), z2z2), h)
        res = Jac(x3, y3, z3)

        res = self.select(jnp.logical_and(same_x, same_y), self.dbl(p), res)
        res = self.select(jnp.logical_and(same_x, jnp.logical_not(same_y)), self.inf(same_x.shape), res)
        res = self.select(self.is_inf(p), q, res)
        res = self.select(self.is_inf(q), p, res)
        return res

    def add_mixed(self, p: Jac, ax, ay) -> Jac:
        """P + (affine Q) via madd-2007-bl (~8M + 5S) with edge handling."""
        f = self.f
        q_inf = jnp.logical_and(f.is_zero(ax), f.is_zero(ay))
        z1z1 = f.sqr(p.z)
        u2 = f.mul(ax, z1z1)
        s2 = f.mul(f.mul(ay, p.z), z1z1)
        h = f.sub(u2, p.x)
        rr = f.sub(s2, p.y)
        same_x = f.is_zero(h)
        same_y = f.is_zero(rr)

        hh = f.sqr(h)
        i = f.add(f.add(hh, hh), f.add(hh, hh))
        j = f.mul(h, i)
        r2 = f.add(rr, rr)
        v = f.mul(p.x, i)
        x3 = f.sub(f.sub(f.sqr(r2), j), f.add(v, v))
        yj = f.mul(p.y, j)
        y3 = f.sub(f.mul(r2, f.sub(v, x3)), f.add(yj, yj))
        z3 = f.sub(f.sub(f.sqr(f.add(p.z, h)), z1z1), hh)
        res = Jac(x3, y3, z3)

        res = self.select(jnp.logical_and(same_x, same_y), self.dbl(p), res)
        res = self.select(jnp.logical_and(same_x, jnp.logical_not(same_y)), self.inf(same_x.shape), res)
        batch = ax.shape[: ax.ndim - f.ndim]
        q_jac = Jac(ax, ay, f.select(q_inf, f.zeros(batch), f.one(batch)))
        res = self.select(self.is_inf(p), q_jac, res)
        res = self.select(q_inf, p, res)
        return res

    # -- host interop ---------------------------------------------------------
    def pack_affine(self, host_points) -> tuple:
        """Host affine points (None = infinity) -> (ax, ay) device-ready arrays."""
        f = self.f
        xs, ys = [], []
        for pt in host_points:
            if pt is None:
                if f.ndim == 1:
                    xs.append(0)
                    ys.append(0)
                else:
                    from ..fields.host import Fq2

                    xs.append(Fq2.zero())
                    ys.append(Fq2.zero())
            else:
                xs.append(pt[0])
                ys.append(pt[1])
        return np.asarray(f.pack(xs)), np.asarray(f.pack(ys))

    def unpack_jacobian(self, p: Jac) -> list:
        """Device Jacobian points -> host affine points (None = infinity)."""
        f = self.f
        xs = f.unpack(np.asarray(p.x))
        ys = f.unpack(np.asarray(p.y))
        zs = f.unpack(np.asarray(p.z))
        out = []
        for x, y, z in zip(xs, ys, zs):
            if (z == 0) if isinstance(z, int) else z.is_zero():
                out.append(None)
                continue
            if isinstance(z, int):
                mod = f.spec.modulus
                zi = pow(z, mod - 2, mod)
                zi2 = zi * zi % mod
                out.append((x * zi2 % mod, y * zi2 * zi % mod))
            else:
                zi = z.inv()
                zi2 = zi.square()
                out.append((x * zi2, y * zi2 * zi))
        return out

    def unpack_affine(self, ax, ay) -> list:
        f = self.f
        xs = f.unpack(np.asarray(ax))
        ys = f.unpack(np.asarray(ay))
        out = []
        for x, y in zip(xs, ys):
            zero = (x == 0 and y == 0) if isinstance(x, int) else (x.is_zero() and y.is_zero())
            out.append(None if zero else (x, y))
        return out


class PallasG1Ops(CurveOps):
    """G1 ops that dispatch large batches to the fused Pallas point kernels
    (curves/pallas_curve.py) on TPU; small batches and non-TPU backends use
    the XLA formulas above. The threshold is evaluated at trace time (static
    shapes), so each jit specialization picks one path."""

    MIN_LANES = 128

    @staticmethod
    def _use_pallas(arr) -> bool:
        import numpy as _np

        from . import pallas_curve as _pc

        if not _pc._on_tpu():
            return False
        n = int(_np.prod(arr.shape[:-1])) if arr.ndim > 1 else 1
        return n >= PallasG1Ops.MIN_LANES

    def dbl(self, p: Jac) -> Jac:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Jac(*_pc.dbl(p.x, p.y, p.z))
        return super().dbl(p)

    def add(self, p: Jac, q: Jac) -> Jac:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Jac(*_pc.add(p.x, p.y, p.z, q.x, q.y, q.z))
        return super().add(p, q)

    def add_mixed(self, p: Jac, ax, ay) -> Jac:
        if self._use_pallas(p.x):
            from . import pallas_curve as _pc

            return Jac(*_pc.madd(p.x, p.y, p.z, ax, ay))
        return super().add_mixed(p, ax, ay)


G1 = PallasG1Ops(jf.FqOps, "g1")
G2 = CurveOps(jf.Fq2Ops, "g2")


def g1_bls12_381() -> CurveOps:
    """G1 over BLS12-381 (24-limb base field); XLA kernels only for now —
    the Pallas point kernels are BN254-specialized (curves/pallas_curve.py)."""
    from ..fields.bls12_381 import NLIMBS_FQ, P as P381

    spec = jf.FieldSpec(P381, "fq_bls381", nlimbs=NLIMBS_FQ)
    return CurveOps(jf.make_fp_ops(spec), "g1_bls381")
