"""Distributed four-step NTT with an explicit all-to-all stage exchange.

The reference's FFTs are single-host rayon loops (ark-poly); the TPU-native
equivalent shards the four-step factorization n = n1*n2 over the mesh "pts"
axis (SURVEY.md §2.5 P4: "NTT butterflies via all-to-all"):

  view x as the (n1, n2) matrix x[j1, j2] = x[j1*n2 + j2], COLUMN-sharded
  (each device owns n2/D full columns):
    1. local length-n1 NTTs down the owned columns,
    2. local cross-twiddle multiply (the twiddle table ships pre-sharded),
    3. ALL-TO-ALL: re-shard from columns to rows (the only communication),
    4. local length-n2 NTTs along the owned rows.

Output is the (n1, n2) bit-ordered matrix X[k1 + n1*k2] = B[k1, k2],
ROW-sharded; `sharded_ntt` returns it in natural order (XLA inserts the
final gather/transpose as demanded by the output sharding).

The sub-NTT roots line up with the local plans because
root_of_unity(n)^n2 == root_of_unity(n1) in our two-adic tower.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import jax_field as jf
from ..fields.bn254 import NLIMBS, R
from ..fields.host import fr_inv
from . import ntt as nttm

try:
    from jax import shard_map as _new_shard_map

    def _shard_map(f, **kw):
        kw.setdefault("check_vma", kw.pop("check_rep", False))
        return _new_shard_map(f, **kw)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


@functools.lru_cache(maxsize=None)
def _cross_twiddles(n1: int, n2: int, inverse: bool) -> np.ndarray:
    omega = nttm.root_of_unity(n1 * n2)
    if inverse:
        omega = fr_inv(omega)
    rows = []
    for k1 in range(n1):
        wk = pow(omega, k1, R)
        row, cur = [], 1
        for _ in range(n2):
            row.append(cur)
            cur = cur * wk % R
        rows.append(row)
    flat = [v for row in rows for v in row]
    return jf.FR.pack(flat).reshape(n1, n2, NLIMBS)


def make_sharded_ntt(mesh: Mesh, n: int, axis: str = "pts", inverse: bool = False):
    """Returns a jittable f((n, 16) natural order) -> (n, 16) natural order,
    sharded over mesh[axis] with one all-to-all between the two NTT stages."""
    D = mesh.shape[axis]
    bits = n.bit_length() - 1
    n1 = 1 << ((bits + 1) // 2)
    n2 = n // n1
    assert n1 % D == 0 and n2 % D == 0, f"four-step split {n1}x{n2} must be divisible by {D}"
    tw = jnp.asarray(_cross_twiddles(n1, n2, inverse))
    ninv_mont = jnp.asarray(jf.FR.pack([fr_inv(n)])[0])

    def local(x2, tw_local):
        # x2: (n1, n2/D, 16) — full columns of the owned j2 range
        xt = jnp.swapaxes(x2, 0, 1)  # (n2/D, n1, 16)
        a = nttm.ntt(xt, inverse=inverse)
        a = jnp.swapaxes(a, 0, 1)  # (n1, n2/D, 16)
        t = jf.mont_mul(jf.FR, a, tw_local)
        # all-to-all: columns -> rows (split the n1 axis, concat the n2 axis)
        b_in = jax.lax.all_to_all(t, axis, split_axis=0, concat_axis=1, tiled=True)
        # (n1/D, n2, 16): local length-n2 NTTs along axis 1
        b = nttm.ntt(b_in, inverse=inverse)
        return b

    f = _shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(axis, None, None),
        check_rep=False,
    )

    def run(x):
        x2 = x.reshape(n1, n2, NLIMBS)
        b = f(x2, tw)  # (n1, n2, 16) with X[k1 + n1*k2] = b[k1, k2]
        # inverse scaling: the local stages applied 1/n1 and 1/n2 = 1/n total
        return jnp.swapaxes(b, 0, 1).reshape(n, NLIMBS)

    return run
