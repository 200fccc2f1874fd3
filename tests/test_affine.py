"""Batched complete-affine ops (curves/affine.py) + tree batch inversion
(jax_field.batch_inv) vs host ground truth — the MSM v5 accumulation path.

Exercises every completeness case the shared-inversion trick must mask:
identity operands (both sides), doubling through add, inverse pairs, and
the (0,0) affine sentinel, in both the generic XLA formulas and the fused
Pallas prep/fin kernels (interpreter mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import hekaton_tpu.curves.host as ch
from hekaton_tpu.curves.affine import AFF_G1, Aff
from hekaton_tpu.curves.jax_curve import G1
from hekaton_tpu.fields import jax_field as jf
from hekaton_tpu.fields.bn254 import P, R

rng = np.random.RandomState(123)


def test_batch_inv_matches_fermat():
    for spec in (jf.FQ, jf.FR):
        for m in (1, 2, 13, 70):  # non-powers of two exercise the padding
            vals = [rng.randint(1, 2**62) * rng.randint(1, 2**62) % spec.modulus or 1 for _ in range(m)]
            vals[0] = 1
            if m > 2:
                vals[1] = spec.modulus - 1
            a = jnp.asarray(spec.pack(vals))
            got = jf.batch_inv(spec, a)
            exp = jf.mont_inv(spec, a)
            assert bool(jnp.all(got == exp)), f"{spec.name} m={m}"


def test_batch_inv_batch_dims():
    vals = [rng.randint(1, 2**62) * rng.randint(1, 2**62) % P or 1 for _ in range(12)]
    a = jnp.asarray(jf.FQ.pack(vals)).reshape(3, 4, 16)
    got = jf.batch_inv(jf.FQ, a)
    exp = jf.mont_inv(jf.FQ, a)
    assert got.shape == a.shape
    assert bool(jnp.all(got == exp))


def _rand_pts(n, seed):
    r = np.random.RandomState(seed)
    return [ch.pt_mul(ch.g1_gen(), int(k)) for k in r.randint(1, 2**60, size=n)]


def _adversarial_pairs():
    ps = _rand_pts(6, seed=1)
    qs = _rand_pts(6, seed=2)
    # doubling, inverse pair, inf+Q, P+inf, inf+inf
    ps += [ps[0], ps[1], None, ps[2], None]
    qs += [ps[0], ch.pt_neg(ps[1]), qs[0], None, None]
    return ps, qs


def _pack_aff(pts):
    ax, ay = G1.pack_affine(pts)
    return Aff(jnp.asarray(ax), jnp.asarray(ay))


def _unpack_aff(p: Aff):
    return G1.unpack_jacobian(AFF_G1.to_jacobian(p))


def test_affine_add_complete_generic():
    ps, qs = _adversarial_pairs()
    got = _unpack_aff(AffineOpsAdd(_pack_aff(ps), _pack_aff(qs)))
    exp = [ch.pt_add(p, q) for p, q in zip(ps, qs)]
    assert got == exp


def AffineOpsAdd(p, q):
    # force the generic XLA path (bypasses the Pallas TPU dispatch)
    from hekaton_tpu.curves.affine import AffineOps

    return AffineOps(jf.FqOps, "g1_aff_generic").add(p, q)


def test_affine_pallas_kernels_match_host():
    from hekaton_tpu.curves import pallas_curve as pc

    ps, qs = _adversarial_pairs()
    p = _pack_aff(ps)
    q = _pack_aff(qs)
    den, num = pc.aff_prep(p.x, p.y, q.x, q.y)
    inv = jf.batch_inv(jf.FQ, den)
    x3, y3 = pc.aff_fin(p.x, p.y, q.x, q.y, inv, num)
    got = _unpack_aff(Aff(x3, y3))
    exp = [ch.pt_add(a, b) for a, b in zip(ps, qs)]
    assert got == exp


def test_fermat_inv_pallas_matches_mont_inv():
    from hekaton_tpu.fields.pallas_field import fermat_inv_pallas

    vals = [0, 1, P - 1] + [rng.randint(1, 2**62) * rng.randint(1, 2**62) % P or 1 for _ in range(9)]
    a = jnp.asarray(jf.FQ.pack(vals))
    got = fermat_inv_pallas(jf.FQ, a)
    exp = jf.mont_inv(jf.FQ, a)
    assert bool(jnp.all(got == exp))


def test_affine_fused_kernels_match_host():
    """The production fused path: kernel A (den tree roots) -> root Fermat ->
    kernel B (walk-down + finish), on every completeness case."""
    from hekaton_tpu.curves import pallas_curve as pc

    ps, qs = _adversarial_pairs()
    p = _pack_aff(ps)
    q = _pack_aff(qs)
    x3, y3 = pc.aff_add_fused(p.x, p.y, q.x, q.y)
    got = _unpack_aff(Aff(x3, y3))
    exp = [ch.pt_add(a, b) for a, b in zip(ps, qs)]
    assert got == exp


def test_affine_packed_kernels_match_host():
    """The level-1 production op: P + unpack(packed 64 B row), fused kernels
    vs the generic unpack path vs host, incl. the all-zero sentinel row."""
    from hekaton_tpu.curves import pallas_curve as pc

    ps, qs = _adversarial_pairs()
    p = _pack_aff(ps)
    q = _pack_aff(qs)
    rows = jnp.concatenate(
        [q.x[:, 0::2] | (q.x[:, 1::2] << 16), q.y[:, 0::2] | (q.y[:, 1::2] << 16)], axis=-1
    )
    exp = [ch.pt_add(a, b) for a, b in zip(ps, qs)]
    # generic path
    got = _unpack_aff(AFF_G1.add_packed(p, rows))
    assert got == exp
    # fused kernels (interpret mode on CPU)
    x3, y3 = pc.aff_add_mixed_packed(p.x, p.y, rows)
    assert _unpack_aff(Aff(x3, y3)) == exp


def test_affine_chain_matches_host():
    """Sequential bucket-style accumulation through AFF_G1.add (dispatching
    class, generic path on CPU), including a forced doubling step."""
    pts = _rand_pts(5, seed=3)
    pts.append(pts[0])  # re-add the first point later -> generic, then dbl
    acc = AFF_G1.inf(())
    acc = jax.tree.map(lambda a: a[None], acc)  # (1, 16) batch
    expected = None
    for pt in pts:
        q = _pack_aff([pt])
        acc = AFF_G1.add(acc, q)
        expected = ch.pt_add(expected, pt)
    assert _unpack_aff(acc) == [expected]


def test_msm_tpu_affine_vs_proj_accum():
    """msm_tpu with accum="affine" (v5 default) and accum="proj" (v4) agree
    with the host MSM on a stress batch: zero/one/R-1 scalars, duplicated
    (point, scalar) pairs (forced doubling inside a bucket), an infinity
    table row, and inverse-pair bucket collisions via s and -s on the same
    point (same window magnitudes, opposite signs)."""
    from hekaton_tpu.msm import pippenger as msm_mod

    n = 40
    r = np.random.RandomState(5)
    pts = [ch.pt_mul(ch.g1_gen(), int(k)) for k in r.randint(1, 2**60, size=n)]
    pts[4] = None
    pts[7] = pts[6]
    scalars = [int(x) for x in r.randint(1, 2**60, size=n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    scalars[6] = scalars[7]  # duplicate pair -> doubling
    pts[9] = pts[8]
    scalars[9] = R - scalars[8]  # s*P + (R-s)*P: opposite-sign digit collisions
    expected = ch.msm_host(pts, scalars)
    ax, ay = G1.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    ax, ay, sc = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc)
    for accum in ("affine", "proj"):
        f = jax.jit(
            lambda ax, ay, sc, a=accum: msm_mod.msm_tpu(G1, ax, ay, sc, c=6, L=8, accum=a)
        )
        out = f(ax, ay, sc)
        got = G1.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
        assert got == expected, accum
