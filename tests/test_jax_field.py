"""TPU limb-field kernels vs host Python-int ground truth."""
import random

import jax
import numpy as np

from hekaton_tpu.fields import jax_field as jf
from hekaton_tpu.fields.bn254 import P, R

rng = random.Random(1)


def _vecs(spec, n, lo=0):
    vals = [rng.randrange(lo, spec.modulus) for _ in range(n)]
    return vals, jax.numpy.asarray(spec.pack(vals))


def test_pack_roundtrip():
    for spec in (jf.FQ, jf.FR):
        vals, arr = _vecs(spec, 8)
        assert spec.unpack(np.asarray(arr)) == vals


def test_add_sub_neg():
    for spec in (jf.FQ, jf.FR):
        a_vals, a = _vecs(spec, 32)
        b_vals, b = _vecs(spec, 32)
        m = spec.modulus
        assert spec.unpack(jf.add(spec, a, b)) == [(x + y) % m for x, y in zip(a_vals, b_vals)]
        assert spec.unpack(jf.sub(spec, a, b)) == [(x - y) % m for x, y in zip(a_vals, b_vals)]
        assert spec.unpack(jf.neg(spec, a)) == [(-x) % m for x in a_vals]


def test_mont_mul_matches_host():
    for spec in (jf.FQ, jf.FR):
        a_vals, a = _vecs(spec, 32)
        b_vals, b = _vecs(spec, 32)
        m = spec.modulus
        got = spec.unpack(jf.mont_mul(spec, a, b))
        assert got == [x * y % m for x, y in zip(a_vals, b_vals)]
        # edge values
        edge = [0, 1, m - 1, m - 2, 2]
        ea = jax.numpy.asarray(spec.pack(edge))
        got = spec.unpack(jf.mont_mul(spec, ea, ea))
        assert got == [x * x % m for x in edge]


def test_mont_inv():
    spec = jf.FQ
    a_vals, a = _vecs(spec, 8, lo=1)
    got = spec.unpack(jf.mont_inv(spec, a))
    assert got == [pow(x, -1, P) for x in a_vals]
    # inv(0) = 0 convention
    z = jax.numpy.asarray(spec.pack([0]))
    assert spec.unpack(jf.mont_inv(spec, z)) == [0]


def test_fq2_mul():
    from hekaton_tpu.fields.host import Fq2

    a_vals = [Fq2(rng.randrange(P), rng.randrange(P)) for _ in range(16)]
    b_vals = [Fq2(rng.randrange(P), rng.randrange(P)) for _ in range(16)]
    a = jax.numpy.asarray(jf.Fq2Ops.pack(a_vals))
    b = jax.numpy.asarray(jf.Fq2Ops.pack(b_vals))
    got = jf.Fq2Ops.unpack(jf.fq2_mul(a, b))
    assert got == [x * y for x, y in zip(a_vals, b_vals)]
    got = jf.Fq2Ops.unpack(jf.fq2_sqr(a))
    assert got == [x.square() for x in a_vals]


def test_batched_shapes_and_jit():
    spec = jf.FR
    a_vals, a = _vecs(spec, 24)
    a3 = a.reshape(2, 3, 4, 16)
    f = jax.jit(lambda x: jf.mont_mul(spec, x, x))
    out = np.asarray(f(a3)).reshape(24, 16)
    assert spec.unpack(out) == [x * x % R for x in a_vals]
