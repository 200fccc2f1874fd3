"""NTT vs naive host DFT; roundtrips; coset evaluation identities."""
import random

import jax
import jax.numpy as jnp

from hekaton_tpu.fields import jax_field as jf
from hekaton_tpu.fields.bn254 import R
from hekaton_tpu.ntt import ntt as nttm

rng = random.Random(11)


def _naive_dft(vals, omega):
    n = len(vals)
    return [sum(vals[j] * pow(omega, i * j, R) for j in range(n)) % R for i in range(n)]


def test_ntt_matches_naive_small():
    for n in (4, 16):
        vals = [rng.randrange(R) for _ in range(n)]
        x = jnp.asarray(jf.FR.pack(vals))
        out = jf.FR.unpack(jax.jit(nttm.ntt)(x))
        assert out == _naive_dft(vals, nttm.root_of_unity(n))


def test_ntt_roundtrip_large():
    n = 1024  # exercises the four-step split path
    vals = [rng.randrange(R) for _ in range(n)]
    x = jnp.asarray(jf.FR.pack(vals))
    f = jax.jit(lambda x: nttm.ntt(nttm.ntt(x), inverse=True))
    assert jf.FR.unpack(f(x)) == vals


def test_ntt_four_step_matches_naive():
    n = 512  # split path (n1=32? no: 512 -> n1=32*... any >256)
    vals = [rng.randrange(R) for _ in range(n)]
    x = jnp.asarray(jf.FR.pack(vals))
    out = jf.FR.unpack(jax.jit(nttm.ntt)(x))
    # spot-check a few output positions against the naive DFT
    omega = nttm.root_of_unity(n)
    for i in (0, 1, 7, 255, 511):
        expect = sum(vals[j] * pow(omega, i * j, R) for j in range(n)) % R
        assert out[i] == expect, i


def test_coset_roundtrip_and_eval():
    n = 64
    vals = [rng.randrange(R) for _ in range(n)]
    x = jnp.asarray(jf.FR.pack(vals))
    f = jax.jit(lambda x: nttm.coset_intt(nttm.coset_ntt(x)))
    assert jf.FR.unpack(f(x)) == vals
    # coset_ntt output i = poly(g * w^i)
    out = jf.FR.unpack(jax.jit(nttm.coset_ntt)(x))
    omega = nttm.root_of_unity(n)
    g = nttm.COSET_GEN
    for i in (0, 3, 63):
        pt = g * pow(omega, i, R) % R
        expect = 0
        for c in reversed(vals):
            expect = (expect * pt + c) % R
        assert out[i] == expect


def test_batched_ntt():
    n = 32
    vals = [[rng.randrange(R) for _ in range(n)] for _ in range(3)]
    x = jnp.stack([jnp.asarray(jf.FR.pack(v)) for v in vals])
    out = jax.jit(nttm.ntt)(x)
    om = nttm.root_of_unity(n)
    for b in range(3):
        assert jf.FR.unpack(out[b]) == _naive_dft(vals[b], om)


def test_domain_lagrange():
    d = nttm.Domain(8)
    t = rng.randrange(R)
    ls = d.lagrange_coeffs_at(t)
    # sum L_i(t) == 1; sum L_i(t) * w^i == t  (interpolation of identity)
    assert sum(ls) % R == 1
    els = d.elements()
    assert sum(l * e for l, e in zip(ls, els)) % R == t % R
