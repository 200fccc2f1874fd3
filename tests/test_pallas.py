"""Pallas kernels vs the XLA/host ground truth (interpreter mode on CPU;
the same kernels are exercised compiled on real TPU by bench.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import hekaton_tpu.curves.host as ch
from hekaton_tpu.curves.jax_curve import G1, Jac
from hekaton_tpu.fields import jax_field as jf
from hekaton_tpu.fields.bn254 import P, R

rng = np.random.RandomState(77)


def test_pallas_mont_mul_matches_xla():
    from hekaton_tpu.fields.pallas_field import mont_mul_pallas

    for spec in (jf.FQ, jf.FR):
        vals_a = [rng.randint(0, 2**62) * rng.randint(0, 2**62) % spec.modulus for _ in range(16)]
        vals_b = [rng.randint(0, 2**62) * rng.randint(0, 2**62) % spec.modulus for _ in range(16)]
        a = jnp.asarray(spec.pack(vals_a))
        b = jnp.asarray(spec.pack(vals_b))
        assert bool(jnp.all(mont_mul_pallas(spec, a, b) == jf.mont_mul(spec, a, b)))
    # edge values
    edge = [0, 1, P - 1, P - 2, (1 << 255) % P]
    a = jnp.asarray(jf.FQ.pack(edge))
    b = jnp.asarray(jf.FQ.pack(list(reversed(edge))))
    assert bool(jnp.all(mont_mul_pallas(jf.FQ, a, b) == jf.mont_mul(jf.FQ, a, b)))


def test_pallas_point_kernels_match_host():
    from hekaton_tpu.curves import pallas_curve as pc

    n = 10
    pts = [ch.pt_mul(ch.g1_gen(), int(k)) for k in rng.randint(1, 2**30, size=n)]
    pts[3] = None  # infinity lane
    qs = [ch.pt_mul(ch.g1_gen(), int(k)) for k in rng.randint(1, 2**30, size=n)]
    qs[5] = None
    qs[7] = pts[7]  # doubling case
    qs[8] = (pts[8][0], (-pts[8][1]) % ch.P)  # opposite -> infinity

    ax, ay = G1.pack_affine(pts)
    bx, by = G1.pack_affine(qs)
    p_jac = G1.from_affine(jnp.asarray(ax), jnp.asarray(ay))
    q_jac = G1.from_affine(jnp.asarray(bx), jnp.asarray(by))
    expected = [ch.pt_add(p, q) for p, q in zip(pts, qs)]

    out = pc.madd(p_jac.x, p_jac.y, p_jac.z, jnp.asarray(bx), jnp.asarray(by))
    assert G1.unpack_jacobian(Jac(*out)) == expected
    out = pc.dbl(p_jac.x, p_jac.y, p_jac.z)
    assert G1.unpack_jacobian(Jac(*out)) == [ch.pt_dbl(p) if p else None for p in pts]
    out = pc.add(p_jac.x, p_jac.y, p_jac.z, q_jac.x, q_jac.y, q_jac.z)
    assert G1.unpack_jacobian(Jac(*out)) == expected


def test_pallas_g2_rcb_kernels_match_host():
    """Fused Fq2 RCB kernels (G2 MSM hot path) vs host ground truth,
    including every completeness case: doubling through add, inverse pair,
    identity accumulator, and the affine (0,0) sentinel."""
    from hekaton_tpu.curves import pallas_curve as pc
    from hekaton_tpu.curves.jax_curve import G2
    from hekaton_tpu.curves.proj import Proj, proj_g2

    pg2 = proj_g2()
    n = 5
    ps = [ch.pt_mul(ch.g2_gen(), int(k)) for k in rng.randint(1, 2**30, size=n)]
    qs = [ch.pt_mul(ch.g2_gen(), int(k)) for k in rng.randint(1, 2**30, size=n)]
    ps += [ps[0], ps[1], None, ps[2]]
    qs += [ps[0], ch.pt_neg(ps[1]), qs[0], None]  # dbl, inverse, inf+Q, Q+(0,0)
    ax, ay = G2.pack_affine(ps)
    bx, by = G2.pack_affine(qs)
    P = pg2.from_affine(jnp.asarray(ax), jnp.asarray(ay))
    Q = pg2.from_affine(jnp.asarray(bx), jnp.asarray(by))
    expected = [ch.pt_add(p, q) for p, q in zip(ps, qs)]

    out = pc.pmadd_rcb_g2(P.x, P.y, P.z, jnp.asarray(bx), jnp.asarray(by))
    assert G2.unpack_jacobian(pg2.to_jacobian(Proj(*out))) == expected
    out = pc.padd_rcb_g2(P.x, P.y, P.z, Q.x, Q.y, Q.z)
    # from_affine maps the (0,0) sentinel lane to the identity, so the
    # complete full add agrees with pt_add on every lane including the last
    assert G2.unpack_jacobian(pg2.to_jacobian(Proj(*out))) == expected
    out = pc.pdbl_rcb_g2(P.x, P.y, P.z)
    assert G2.unpack_jacobian(pg2.to_jacobian(Proj(*out))) == [
        ch.pt_dbl(p) if p else None for p in ps
    ]


def test_pallas_mont_mul_bls12_381_24_limbs():
    """The CIOS kernel is limb-count-generic: BLS12-381's 24-limb Fq rides
    the same fused kernel (and batch_inv's tree/Fermat stages with it)."""
    import jax.numpy as jnp

    from hekaton_tpu.fields.bls12_381 import NLIMBS_FQ, P as P381

    spec = jf.FieldSpec(P381, "fq_bls381", nlimbs=NLIMBS_FQ)
    from hekaton_tpu.fields.pallas_field import mont_mul_pallas

    vals_a = [int(rng.randint(1, 2**62)) * int(rng.randint(1, 2**62)) % P381 for _ in range(9)]
    vals_a += [0, 1, P381 - 1]
    vals_b = list(reversed(vals_a))
    a = jnp.asarray(spec.pack(vals_a))
    b = jnp.asarray(spec.pack(vals_b))
    assert bool(jnp.all(mont_mul_pallas(spec, a, b) == jf.mont_mul(spec, a, b)))
    nz = jnp.asarray(spec.pack([v or 1 for v in vals_a]))
    assert bool(jnp.all(jf.batch_inv(spec, nz) == jf.mont_inv(spec, nz)))


def test_pallas_affine_halves_kernels_match_host():
    """Fused halves-pairing batched-affine kernels (MSM v8 level-1) vs host
    ground truth: a (BLK, L*16) slab whose first columns hold doubling
    pairs, inverse pairs and identity (all-zero) elements reduces to the
    correct per-column sums."""
    from hekaton_tpu.curves import pallas_curve as pc
    from hekaton_tpu.curves.affine import AFF_G1, Aff

    L = 4
    ncols = pc.BLK
    cols = []
    g = ch.g1_gen()
    cols.append([ch.pt_mul(g, 3), ch.pt_mul(g, 5), ch.pt_mul(g, 7), ch.pt_mul(g, 11)])
    cols.append([ch.pt_mul(g, 9), ch.pt_mul(g, 9), None, ch.pt_mul(g, 2)])  # dbl pair
    cols.append([ch.pt_mul(g, 4), None, ch.pt_neg(ch.pt_mul(g, 4)), None])  # inverse pair
    cols.append([None, None, None, None])  # all identity
    cols.append([ch.pt_mul(g, 13), None, None, None])
    expected = [ch.msm_host(c, [1] * L) for c in cols]

    slab = np.zeros((ncols, L * 16), np.uint32)
    for j, col in enumerate(cols):
        ax, ay = G1.pack_affine(col)
        packed = np.asarray(
            AFF_G1.pack_rows(Aff(jnp.asarray(ax), jnp.asarray(ay)))
        )  # (L, 16)
        slab[j] = packed.reshape(-1)
    out = AFF_G1.unpack_rows(pc.l1_aff_halves(jnp.asarray(slab), L))
    got = G1.unpack_jacobian(AFF_G1.to_jacobian(out))
    assert got[: len(cols)] == expected
    assert got[len(cols)] is None  # untouched all-zero column -> identity

    # generic pairwise path (CPU/BLS fallback in _level1_pair) agrees
    from hekaton_tpu.curves.affine import AffineOps
    from hekaton_tpu.msm.pippenger import _level1_pair

    generic = AffineOps(AFF_G1.f, "g1_aff_generic")
    acc = _level1_pair(generic, jnp.asarray(slab), ncols, L)
    got2 = G1.unpack_jacobian(AFF_G1.to_jacobian(acc))
    assert got2[: len(cols)] == expected
