"""Device curve ops and Pippenger MSM vs host ground truth (small sizes)."""
import random

import jax
import jax.numpy as jnp
import numpy as np

from hekaton_tpu.curves import host as ch
from hekaton_tpu.curves.jax_curve import G1, G2, Jac
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.msm import pippenger as msm_mod

rng = random.Random(7)


def _host_g1_points(n):
    return [ch.pt_mul(ch.g1_gen(), rng.randrange(1, R)) for _ in range(n)]


def test_jac_add_dbl_matches_host():
    pts = _host_g1_points(6) + [None, None]
    qts = _host_g1_points(6) + [_host_g1_points(1)[0], None]
    # include doubling and inverse cases
    pts.append(qts[0])  # same point -> dbl
    qts.append(qts[0])
    pts.append(qts[1])
    qts.append(ch.pt_neg(qts[1]))  # P + (-P) = inf

    ax, ay = G1.pack_affine(pts)
    bx, by = G1.pack_affine(qts)
    p = G1.from_affine(jnp.asarray(ax), jnp.asarray(ay))
    q = G1.from_affine(jnp.asarray(bx), jnp.asarray(by))

    f = jax.jit(lambda p, q: (G1.add(p, q), G1.dbl(p), G1.add_mixed(p, q.x, q.y)))
    s, d, m = f(p, q)
    assert G1.unpack_jacobian(s) == [ch.pt_add(a, b) for a, b in zip(pts, qts)]
    assert G1.unpack_jacobian(d) == [ch.pt_dbl(a) for a in pts]
    assert G1.unpack_jacobian(m) == [ch.pt_add(a, b) for a, b in zip(pts, qts)]


def test_g2_jac_ops():
    hpts = [ch.pt_mul(ch.g2_gen(), rng.randrange(1, R)) for _ in range(3)] + [None]
    ax, ay = G2.pack_affine(hpts)
    p = G2.from_affine(jnp.asarray(ax), jnp.asarray(ay))
    f = jax.jit(lambda p: (G2.dbl(p), G2.add(p, G2.dbl(p))))
    d, t = f(p)
    assert G2.unpack_jacobian(d) == [ch.pt_dbl(a) for a in hpts]
    assert G2.unpack_jacobian(t) == [ch.pt_mul(a, 3) for a in hpts]


def _msm_case(n, scalars=None, curve=G1, gen=None):
    gen = gen or ch.g1_gen()
    pts = [ch.pt_mul(gen, rng.randrange(1, R)) for _ in range(n)]
    if scalars is None:
        scalars = [rng.randrange(R) for _ in range(n)]
    expected = ch.msm_host(pts, scalars)
    ax, ay = curve.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    f = jax.jit(lambda ax, ay, sc: msm_mod.msm(curve, ax, ay, sc, K=8))
    out = f(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc))
    got = curve.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
    assert got == expected, f"n={n}"


def test_msm_small():
    _msm_case(3)


def test_msm_medium_with_dups_and_zeros():
    n = 50
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    scalars[3] = scalars[4] = 12345  # duplicate digits stress segmented sums
    _msm_case(n, scalars)


def test_msm_g2():
    _msm_case(5, curve=G2, gen=ch.g2_gen())


def test_msm_tpu_signed_digits_matches_host():
    """The TPU-structured MSM (signed windows, complete projective adds,
    padded-bucket gathers, halving collapse) vs host, at a small window
    width so the XLA:CPU path stays fast. Stresses: zero/one/R-1 scalars,
    duplicated points+scalars (equal-point adds inside one bucket), and an
    infinity point in the table."""
    n = 60
    pts = [ch.pt_mul(ch.g1_gen(), rng.randrange(1, R)) for _ in range(n)]
    pts[5] = None  # infinity sentinel row in the table
    pts[7] = pts[6]  # duplicate point
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    scalars[6] = scalars[7]  # duplicate (point, scalar) -> forced doubling case
    expected = ch.msm_host(pts, scalars)
    ax, ay = G1.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    f = jax.jit(lambda ax, ay, sc: msm_mod.msm_tpu(G1, ax, ay, sc, c=6, L=8))
    out = f(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc))
    got = G1.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
    assert got == expected


def test_msm_tpu_g2_matches_host():
    """msm_tpu generalizes to G2 (flattened Fq2 coords, generic complete
    projective formulas) — the path big G2 MSMs must take on TPU, where the
    scatter-flushing msm() faulted at canonical scale."""
    n = 24
    pts = [ch.pt_mul(ch.g2_gen(), rng.randrange(1, R)) for _ in range(n)]
    pts[3] = None
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = R - 1
    expected = ch.msm_host(pts, scalars)
    ax, ay = G2.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    f = jax.jit(lambda ax, ay, sc: msm_mod.msm_tpu(G2, ax, ay, sc, c=6, L=8))
    out = f(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc))
    got = G2.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
    assert got == expected


def test_signed_digit_decomposition():
    """Signed window digits recompose to the scalar."""
    c = 13
    vals = [0, 1, R - 1, rng.randrange(R), (1 << 253) - 1, 1 << 200]
    sc = jnp.asarray(msm_mod.pack_scalars(vals))
    mag, neg = msm_mod.signed_digits_for_windows(sc, c)
    mag, neg = np.asarray(mag), np.asarray(neg)
    for i, v in enumerate(vals):
        total = sum(
            (-1 if neg[w, i] else 1) * int(mag[w, i]) << (c * w)
            for w in range(mag.shape[0])
        )
        assert total == v, f"scalar {i}"
        assert mag[:, i].max() <= 1 << (c - 1)


def test_fixed_base_msm():
    base = ch.pt_mul(ch.g1_gen(), 9999)
    table = msm_mod.fixed_base_table_host(base, G1)
    scalars = [0, 1, 5, rng.randrange(R), R - 1]
    sc = jnp.asarray(msm_mod.pack_scalars(scalars))
    tx, ty = jnp.asarray(table[0]), jnp.asarray(table[1])
    f = jax.jit(lambda sc: msm_mod.fixed_base_msm(G1, (tx, ty), sc))
    out = f(sc)
    got = G1.unpack_jacobian(out)
    assert got == [ch.pt_mul(base, s) for s in scalars]


def test_to_affine_device():
    pts = _host_g1_points(4) + [None]
    ax, ay = G1.pack_affine(pts)
    p = G1.from_affine(jnp.asarray(ax), jnp.asarray(ay))
    d = jax.jit(lambda p: msm_mod.to_affine_device(G1, G1.dbl(p)))(p)
    assert G1.unpack_affine(*d) == [ch.pt_dbl(a) for a in pts]


def test_msm_tpu_pair_level1_matches_host():
    """msm_tpu level1="pair" (v8: pairwise-tree batched-affine rounds over
    the sorted slab) vs host, with the same stress set as the signed-digit
    test: zero/one/R-1 scalars, duplicate (point, scalar) pairs (doubling
    pairs inside a column), and an infinity table row."""
    n = 60
    pts = [ch.pt_mul(ch.g1_gen(), rng.randrange(1, R)) for _ in range(n)]
    pts[5] = None
    pts[7] = pts[6]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    scalars[6] = scalars[7]
    expected = ch.msm_host(pts, scalars)
    ax, ay = G1.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    f = jax.jit(lambda ax, ay, sc: msm_mod.msm_tpu(G1, ax, ay, sc, c=6, L=8, level1="pair"))
    out = f(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc))
    got = G1.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
    assert got == expected


def test_msm_tpu_wsort_plan_matches_host():
    """msm_tpu plan="wsort" (v9: per-window batched sorts; tail-sentinel
    columns alias the next window's weight-0 digit-0 bucket) vs host, with
    the standard stress set, for both level-1 paths."""
    n = 60
    pts = [ch.pt_mul(ch.g1_gen(), rng.randrange(1, R)) for _ in range(n)]
    pts[5] = None
    pts[7] = pts[6]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    scalars[6] = scalars[7]
    expected = ch.msm_host(pts, scalars)
    ax, ay = G1.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    for level1 in ("steps", "pair"):
        f = jax.jit(
            lambda ax, ay, sc, l1=level1: msm_mod.msm_tpu(
                G1, ax, ay, sc, c=6, L=8, plan="wsort", level1=l1
            )
        )
        out = f(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc))
        got = G1.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
        assert got == expected, level1


def test_msm_tpu_tsort_plan_matches_host():
    """msm_tpu plan="tsort" (v10: transposed-placement payload sort ->
    word-planar slab, planar level-1 kernels) vs host, with the standard
    stress set, for both planar level-1 paths."""
    n = 60
    pts = [ch.pt_mul(ch.g1_gen(), rng.randrange(1, R)) for _ in range(n)]
    pts[5] = None
    pts[7] = pts[6]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1
    scalars[6] = scalars[7]
    expected = ch.msm_host(pts, scalars)
    ax, ay = G1.pack_affine(pts)
    sc = msm_mod.pack_scalars(scalars)
    # mega at L=8 runs the interleave kernel (interpret); pair at L=4 takes
    # the XLA-interleave fallback — both orientations covered
    for level1, L in (("mega", 8), ("pair", 4)):
        f = jax.jit(
            lambda ax, ay, sc, l1=level1, L=L: msm_mod.msm_tpu(
                G1, ax, ay, sc, c=6, L=L, plan="tsort", level1=l1
            )
        )
        out = f(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(sc))
        got = G1.unpack_jacobian(jax.tree.map(lambda a: a[None], out))[0]
        assert got == expected, level1
