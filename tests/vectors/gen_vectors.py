"""Generate cross-validation fixtures from an INDEPENDENT implementation.

Provenance: the Rust toolchain (and hence arkworks) is not available in this
build image, so true arkworks-generated vectors cannot be produced here.
Instead these fixtures are computed by a deliberately foreign implementation
path that shares NOTHING with the framework's field/curve code:

  - field vectors: plain Python int arithmetic (pow/%) — no limbs, no
    Montgomery form, no REDC;
  - curve vectors: textbook AFFINE short-Weierstrass formulas over GF(p)
    with sympy's mod_inverse — no Jacobian coordinates, no batched formulas;
  - scalar mults: plain double-and-add on the affine formulas;
  - SHA-256: hashlib (NIST-validated).

A wrong Montgomery constant, limb-packing bug, or group-law sign error in
the framework cannot reproduce these numbers. Regenerate with:
    python tests/vectors/gen_vectors.py
"""
import hashlib
import json
import os
import random

from sympy import mod_inverse

# BN254 constants from the curve standard (EIP-196 "alt_bn128" parameters)
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
G1 = (1, 2)


def aff_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * mod_inverse(2 * y1 % P, P) % P
    else:
        lam = (y2 - y1) * mod_inverse((x2 - x1) % P, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def aff_mul(pt, k):
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = aff_add(acc, add)
        add = aff_add(add, add)
        k >>= 1
    return acc


def main():
    rng = random.Random(20260817)
    out = {"provenance": "independent affine-Weierstrass (sympy mod_inverse) + plain int arithmetic; see gen_vectors.py", "curve": "bn254"}

    out["fr_mul"] = []
    for _ in range(8):
        a, b = rng.randrange(R), rng.randrange(R)
        out["fr_mul"].append({"a": a, "b": b, "prod": a * b % R, "inv_a": pow(a, R - 2, R)})
    out["fq_mul"] = []
    for _ in range(8):
        a, b = rng.randrange(P), rng.randrange(P)
        out["fq_mul"].append({"a": a, "b": b, "prod": a * b % P, "inv_a": pow(a, P - 2, P)})

    out["g1_mul"] = []
    for k in [1, 2, 3, 7, 0xFFFF, rng.randrange(R), rng.randrange(R), R - 1]:
        x, y = aff_mul(G1, k)
        out["g1_mul"].append({"k": k, "x": x, "y": y})

    out["g1_add"] = []
    for _ in range(4):
        j, k = rng.randrange(1, R), rng.randrange(1, R)
        a, b = aff_mul(G1, j), aff_mul(G1, k)
        s = aff_add(a, b)
        out["g1_add"].append({"ax": a[0], "ay": a[1], "bx": b[0], "by": b[1], "sx": s[0], "sy": s[1]})

    # a small MSM: sum k_i * (i+1)G computed entirely with affine formulas
    ks = [rng.randrange(R) for _ in range(8)]
    acc = None
    pts = []
    for i, k in enumerate(ks):
        base = aff_mul(G1, i + 1)
        pts.append(base)
        acc = aff_add(acc, aff_mul(base, k))
    out["g1_msm"] = {
        "scalars": ks,
        "points": [{"x": p[0], "y": p[1]} for p in pts],
        "rx": acc[0],
        "ry": acc[1],
    }

    out["sha256"] = [
        {"msg": m.hex(), "digest": hashlib.sha256(m).hexdigest()}
        for m in (b"", b"abc", bytes(range(64)), b"hekaton-tpu cross-check")
    ]

    path = os.path.join(os.path.dirname(__file__), "bn254_vectors.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
