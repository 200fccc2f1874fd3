"""BLS12-381 G1 field/curve/MSM over the generalized 24-limb kernels
(north-star curve; the protocol pipeline itself stays on BN254 like the
reference's)."""
import random

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hekaton_tpu.curves.jax_curve import Jac, g1_bls12_381
from hekaton_tpu.fields import bls12_381 as bls
from hekaton_tpu.fields import jax_field as jf

rng = random.Random(11)


# minimal host reference (affine, python ints)
def _h_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    P = bls.P
    if p[0] == q[0]:
        if (p[1] + q[1]) % P == 0:
            return None
        lam = 3 * p[0] * p[0] * pow(2 * p[1], P - 2, P) % P
    else:
        lam = (q[1] - p[1]) * pow(q[0] - p[0], P - 2, P) % P
    x = (lam * lam - p[0] - q[0]) % P
    return (x, (lam * (p[0] - x) - p[1]) % P)


def _h_mul(p, k):
    acc = None
    while k:
        if k & 1:
            acc = _h_add(acc, p)
        p = _h_add(p, p)
        k >>= 1
    return acc


@pytest.fixture(scope="module")
def curve():
    return g1_bls12_381()


def test_bls_field_mul_matches_host(curve):
    spec = curve.f.spec
    assert spec.nlimbs == 24
    a_vals = [rng.randrange(bls.P) for _ in range(8)]
    b_vals = [rng.randrange(bls.P) for _ in range(8)]
    a = jnp.asarray(spec.pack(a_vals))
    b = jnp.asarray(spec.pack(b_vals))
    got = spec.unpack(jf.mont_mul(spec, a, b))
    assert got == [x * y % bls.P for x, y in zip(a_vals, b_vals)]


def test_bls_g1_ops_match_host(curve):
    ks = [rng.randrange(1, 2**40) for _ in range(6)]
    pts = [_h_mul(bls.G1_GEN, k) for k in ks]
    ax, ay = curve.pack_affine(pts)
    p = curve.from_affine(jnp.asarray(ax), jnp.asarray(ay))
    got = curve.unpack_jacobian(curve.dbl(p))
    assert got == [_h_mul(bls.G1_GEN, 2 * k) for k in ks]
    q = curve.add_mixed(p, jnp.asarray(ax), jnp.asarray(ay))
    assert curve.unpack_jacobian(q) == got  # P + P == 2P via the dbl escape


def test_bls_msm_matches_host(curve):
    import numpy as np

    from hekaton_tpu.fields.bn254 import to_limbs
    from hekaton_tpu.msm.pippenger import msm

    n = 32
    pts = [_h_mul(bls.G1_GEN, rng.randrange(1, 2**40)) for _ in range(n)]
    scal = [rng.randrange(bls.R) for _ in range(n)]
    ax, ay = curve.pack_affine(pts)
    # NB: pack_scalars reduces mod BN254-r; BLS scalars pack raw (255 bits
    # fit the same 16-limb layout)
    sc = np.asarray([to_limbs(s, 16) for s in scal], dtype=np.uint32)
    out = jax.jit(lambda x, y, s: msm(curve, x, y, s, nbits=255))(
        jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    )
    got = curve.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
    exp = None
    for p, s in zip(pts, scal):
        exp = _h_add(exp, _h_mul(p, s))
    assert got == exp


def test_bls_msm_tpu_matches_host(curve):
    """The TPU-structured MSM (signed digits, complete projective adds via
    proj_for_curve) on the 24-limb BLS12-381 G1."""
    import numpy as np

    from hekaton_tpu.fields.bn254 import to_limbs
    from hekaton_tpu.msm.pippenger import msm_tpu

    n = 40
    pts = [_h_mul(bls.G1_GEN, rng.randrange(1, 2**40)) for _ in range(n)]
    pts[2] = None
    scal = [rng.randrange(bls.R) for _ in range(n)]
    scal[0] = 0
    scal[1] = bls.R - 1
    ax, ay = curve.pack_affine(pts)
    sc = np.asarray([to_limbs(s, 16) for s in scal], dtype=np.uint32)
    out = jax.jit(lambda x, y, s: msm_tpu(curve, x, y, s, c=6, L=8, nbits=255))(
        jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    )
    got = curve.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
    exp = None
    for p, s in zip(pts, scal):
        exp = _h_add(exp, _h_mul(p, s)) if p is not None else exp
    assert got == exp
