"""Complete-formula projective ops (curves/proj.py) vs host ground truth.

The RCB15 algorithms are transcribed straight-line formulas; these tests
exercise every completeness case the Jacobian path needs escapes for:
doubling through add, inverse pairs, identity operands, and the affine
(0,0) sentinel of mixed add.
"""
import numpy as np
import jax.numpy as jnp

import hekaton_tpu.curves.host as ch
from hekaton_tpu.curves.jax_curve import G1
from hekaton_tpu.curves.proj import PROJ_G1


def _rand_pts(n, seed=0):
    rng = np.random.RandomState(seed)
    pts = []
    for k in rng.randint(1, 2**60, size=n):
        pts.append(ch.pt_mul(ch.g1_gen(), int(k)))
    return pts


def _pack(pts):
    ax, ay = G1.pack_affine(pts)
    return jnp.asarray(ax), jnp.asarray(ay)


def _unpack_proj(p):
    return G1.unpack_jacobian(PROJ_G1.to_jacobian(p))


def test_proj_add_complete():
    ps = _rand_pts(6, seed=1)
    qs = _rand_pts(6, seed=2)
    # adversarial lanes: P+P (doubling), P+(-P) (inverse), inf+Q, P+inf, inf+inf
    ps += [ps[0], ps[1], None, ps[2], None]
    qs += [ps[0], ch.pt_neg(ps[1]), qs[0], None, None]
    P = PROJ_G1.from_affine(*_pack(ps))
    Q = PROJ_G1.from_affine(*_pack(qs))
    got = _unpack_proj(PROJ_G1.add(P, Q))
    exp = [ch.pt_add(p, q) for p, q in zip(ps, qs)]
    assert got == exp


def test_proj_add_mixed_complete():
    ps = _rand_pts(5, seed=3)
    qs = _rand_pts(5, seed=4)
    ps += [ps[0], ps[1], None, ps[2]]
    qs += [ps[0], ch.pt_neg(ps[1]), qs[0], None]  # None -> (0,0) sentinel
    P = PROJ_G1.from_affine(*_pack(ps))
    ax, ay = _pack(qs)
    got = _unpack_proj(PROJ_G1.add_mixed(P, ax, ay))
    exp = [ch.pt_add(p, q) for p, q in zip(ps, qs)]
    assert got == exp


def test_proj_dbl():
    ps = _rand_pts(4, seed=5) + [None]
    P = PROJ_G1.from_affine(*_pack(ps))
    got = _unpack_proj(PROJ_G1.dbl(P))
    exp = [ch.pt_dbl(p) for p in ps]
    assert got == exp


def test_proj_jacobian_roundtrip():
    ps = _rand_pts(3, seed=6) + [None]
    P = PROJ_G1.from_affine(*_pack(ps))
    jac = PROJ_G1.to_jacobian(P)
    back = PROJ_G1.from_jacobian(jac)
    assert _unpack_proj(back) == ps
