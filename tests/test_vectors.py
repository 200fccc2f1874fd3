"""Cross-validation against independently generated fixtures
(tests/vectors/bn254_vectors.json, provenance in gen_vectors.py): the host
algebra, the JAX limb kernels, the native C++ library, and the SHA-256
gadget must all reproduce numbers computed by a foreign implementation path
(plain ints + sympy affine Weierstrass + hashlib). A wrong Montgomery
constant, limb-packing bug, or group-law sign error fails here.

(The reference acceptance line asked for arkworks-generated vectors; the
build image has no Rust toolchain, so these are the independent substitute —
see BASELINE.md "Cross-validation".)
"""
import json
import os

import pytest

import hekaton_tpu.curves.host as ch
from hekaton_tpu.fields.bn254 import P, R
from hekaton_tpu.fields.host import fq_inv, fr_inv

VEC = json.load(open(os.path.join(os.path.dirname(__file__), "vectors", "bn254_vectors.json")))


def test_field_vectors_host():
    for v in VEC["fr_mul"]:
        assert v["a"] * v["b"] % R == v["prod"]
        assert fr_inv(v["a"]) == v["inv_a"]
    for v in VEC["fq_mul"]:
        assert fq_inv(v["a"]) == v["inv_a"]


def test_field_vectors_jax_kernels():
    import jax

    import hekaton_tpu.fields.jax_field as jf

    for spec, key in ((jf.FR, "fr_mul"), (jf.FQ, "fq_mul")):
        a = spec.pack([v["a"] for v in VEC[key]])
        b = spec.pack([v["b"] for v in VEC[key]])
        out = jax.jit(lambda x, y, s=spec: jf.mont_mul(s, x, y))(a, b)
        import numpy as np

        assert spec.unpack(np.asarray(out)) == [v["prod"] for v in VEC[key]]


def test_g1_vectors_host():
    g = ch.g1_gen()
    assert g == (1, 2), "generator must match the EIP-196 standard point"
    for v in VEC["g1_mul"]:
        assert ch.pt_mul(g, v["k"]) == (v["x"], v["y"])
    for v in VEC["g1_add"]:
        assert ch.pt_add((v["ax"], v["ay"]), (v["bx"], v["by"])) == (v["sx"], v["sy"])
    m = VEC["g1_msm"]
    pts = [(p["x"], p["y"]) for p in m["points"]]
    assert ch.msm_host(pts, m["scalars"]) == (m["rx"], m["ry"])


def test_g1_vectors_jax_msm():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hekaton_tpu.curves.jax_curve import G1
    from hekaton_tpu.msm.pippenger import msm, pack_scalars, to_affine_device

    m = VEC["g1_msm"]
    pts = [(p["x"], p["y"]) for p in m["points"]]
    ax, ay = G1.pack_affine(pts)
    out = jax.jit(lambda a, b, s: msm(G1, a, b, s))(
        jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(pack_scalars(m["scalars"]))
    )
    oax, oay = to_affine_device(G1, out)
    assert G1.unpack_affine(np.asarray(oax), np.asarray(oay))[0] == (m["rx"], m["ry"])


def test_g1_vectors_native():
    from hekaton_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    from hekaton_tpu.native import accel

    g = ch.g1_gen()
    for v in VEC["g1_mul"][:4]:
        assert accel.pt_mul(g, v["k"]) == (v["x"], v["y"])


def test_sha256_vectors():
    from hekaton_tpu.hashes.sha256_gadget import sha256_native

    for v in VEC["sha256"]:
        assert sha256_native(bytes.fromhex(v["msg"])).hex() == v["digest"]


def test_sha256_gadget_vectors():
    from hekaton_tpu.hashes.sha256_gadget import sha256_digest_var, witness_bytes
    from hekaton_tpu.r1cs.builder import ConstraintSystem

    v = VEC["sha256"][1]  # "abc"
    cs = ConstraintSystem()
    digest = sha256_digest_var(cs, witness_bytes(cs, bytes.fromhex(v["msg"])))
    got = bytes(
        sum(bit.value << i for i, bit in enumerate(byte)) for byte in digest
    )
    assert got.hex() == v["digest"]
    assert cs.is_satisfied()
