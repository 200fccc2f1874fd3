"""SPMD distributed prover: stage-0 commit + stage-1 prove over a device mesh.

TPU-native replacement for the reference's MPI runtime
(/root/reference/mpi-snark/src/bin/node.rs:461-604):

 - the reference scatters per-subcircuit requests from a coordinator rank to
   W worker ranks and gathers fixed-size responses; here the whole batch of
   subcircuits is a stacked tensor sharded over the mesh "sub" axis, and the
   "gather" is just the jit output sharding (or an all_gather when a
   replicated result is required).
 - the reference's intra-worker rayon parallelism (node.rs:745-795) is the
   kernel grid itself.
 - MSM point ranges are additionally sharded over the "pts" axis; partial
   Pippenger results are combined with an all_gather + Jacobian fold (the
   collective bucket reduction of SURVEY.md §2.5 P4 — point addition is not a
   ring op, so psum does not apply; the gathered partials are tiny).
 - the QAP witness map (batched four-step NTT) runs with the batch dimension
   sharded over "sub"; within a subcircuit, XLA GSPMD inserts the all-to-alls
   for the four-step transposes when the NTT dimension is sharded over "pts".

All functions are pure and jittable; the host coordinator (exec tree,
Fiat-Shamir, pairings) stays off-device by design (SURVEY.md §7).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _new_shard_map  # jax >= 0.8

    def shard_map(f=None, **kw):  # adapt: check_rep was renamed check_vma
        kw.setdefault("check_vma", kw.pop("check_rep", False))
        return _new_shard_map(f, **kw) if f is not None else _new_shard_map(**kw)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.jax_curve import G1, G2, CurveOps, Jac
from ..fields import jax_field as jf
from ..fields.bn254 import NLIMBS, R
from ..fields.host import fr_inv
from ..msm.pippenger import msm
from ..ntt import ntt as nttm
from ..ntt.ntt import COSET_GEN


def make_mesh(n_devices: int | None = None, sub: int | None = None, pts: int | None = None) -> Mesh:
    """2-D mesh (sub, pts): subcircuit data-parallel x MSM/NTT point-parallel."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if sub is None or pts is None:
        # favor the subcircuit axis (it's the scalable dimension)
        pts = pts or (2 if n % 2 == 0 and n > 2 else 1)
        sub = n // pts
    assert sub * pts == n, f"mesh {sub}x{pts} != {n} devices"
    import numpy as np

    return Mesh(np.array(devs[:n]).reshape(sub, pts), ("sub", "pts"))


def fold_partials(curve: CurveOps, parts: Jac) -> Jac:
    """Fold a small leading axis of Jacobian partials with point adds."""
    n = parts.x.shape[0]
    acc = jax.tree.map(lambda a: a[0], parts)
    for i in range(1, n):
        acc = curve.add(acc, jax.tree.map(lambda a: a[i], parts))
    return acc


def sharded_msm_fn(mesh: Mesh, curve: CurveOps = G1):
    """MSM with the point dimension sharded over the full mesh.

    Input: ax, ay [n, ...limbs], scalars [n, 16]; every device computes a
    local Pippenger over its chunk, then partials are gathered and folded.
    Output is replicated.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(("sub", "pts"), None),
            P(("sub", "pts"), None),
            P(("sub", "pts"), None),
        ),
        out_specs=P(),
        check_rep=False,
    )
    def _sharded(ax, ay, sc):
        part = msm(curve, ax, ay, sc)
        parts = jax.lax.all_gather(part, ("sub", "pts"))
        return fold_partials(curve, parts)

    return _sharded


def _witness_map_device(a, b, c, zinv_mont):
    """h = (A*B - C)/Z over the coset; batched over leading dims."""
    ca = nttm.coset_ntt(nttm.ntt(a, inverse=True))
    cb = nttm.coset_ntt(nttm.ntt(b, inverse=True))
    cc = nttm.coset_ntt(nttm.ntt(c, inverse=True))
    q = jf.mont_mul(jf.FR, jf.sub(jf.FR, jf.mont_mul(jf.FR, ca, cb), cc), zinv_mont)
    return nttm.coset_intt(q)


@dataclass
class ProverStepKeys:
    """Per-shape CRS tensors for the batched prover step (device arrays).

    All point tables are shared across the subcircuit batch — the CRS-dedup
    of the reference (mpi-snark/src/data_structures.rs:72-83) taken to its
    limit: one unique shape per batch.
    """

    ck_ax: jnp.ndarray  # stage-0 committer bases      [m0, NLIMBS]
    ck_ay: jnp.ndarray
    a_ax: jnp.ndarray  # A-query bases                 [ncols, NLIMBS]
    a_ay: jnp.ndarray
    h_ax: jnp.ndarray  # H-query bases                 [m-1 padded to m, NLIMBS]
    h_ay: jnp.ndarray
    l_ax: jnp.ndarray  # last-stage committer bases    [m1, NLIMBS]
    l_ay: jnp.ndarray


class DistributedProverStep:
    """The two barriered compute phases of the distributed prover, as one
    jitted SPMD program each (the reference's scatter->compute->gather rounds,
    node.rs:477-604).

    stage0(w0):   per-subcircuit commitment MSMs  — w0 [S, m0, 16] plain limbs
    stage1(...):  per-subcircuit QAP witness map + A/H/L MSMs

    Subcircuits are sharded over "sub"; every per-subcircuit MSM is further
    sharded over "pts" with an all_gather+fold combine.
    """

    def __init__(self, mesh: Mesh, keys: ProverStepKeys, domain_size: int):
        self.mesh = mesh
        self.keys = keys
        self.domain_size = domain_size
        zinv = fr_inv((pow(COSET_GEN, domain_size, R) - 1) % R)
        self._zinv_mont = jnp.asarray(jf.FR.pack([zinv])[0])

        spec_batch = P("sub", "pts", None)  # [S, m, 16]: sub over S, pts over m
        spec_pts = P("pts", None)  # point tables [m, ...limbs]: replicated over sub

        def _local_msm_batch(ax, ay, sc_batch):
            """vmap local Pippenger over the subcircuit batch, fold over pts."""
            part = jax.vmap(lambda sc: msm(G1, ax, ay, sc))(sc_batch)
            parts = jax.lax.all_gather(part, "pts")  # [pts, S_local, ...]
            return fold_partials(G1, parts)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec_pts, spec_pts, spec_batch),
            out_specs=P("sub", None),
            check_rep=False,
        )
        def _stage0(ck_ax, ck_ay, w0):
            return _local_msm_batch(ck_ax, ck_ay, w0)

        self._stage0 = jax.jit(_stage0)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("sub", None, None),  # a_evals [S, m, 16] mont
                P("sub", None, None),
                P("sub", None, None),
                spec_batch,  # full assignment scalars [S, ncols, 16] plain
                spec_batch,  # h scalars are computed on device; placeholder spec
                spec_pts,
                spec_pts,
                spec_pts,
                spec_pts,
                spec_pts,
                spec_pts,
            ),
            out_specs=(P("sub", None), P("sub", None), P("sub", None)),
            check_rep=False,
        )
        def _stage1(a_ev, b_ev, c_ev, assignment, w1, a_ax, a_ay, h_ax, h_ay, l_ax, l_ay):
            # QAP witness map: batched NTTs over the local subcircuits
            h = _witness_map_device(a_ev, b_ev, c_ev, self._zinv_mont)
            # h is in Montgomery form; MSM digit extraction needs plain limbs
            # (mont_mul by plain 1 multiplies by R^{-1}).
            one_plain = jnp.asarray(jf.FR.pack([1], mont=False)[0])
            h_plain = jf.mont_mul(jf.FR, h, one_plain)
            # the H query has domain_size-1 rows; mask the padded last scalar
            h_plain = h_plain.at[..., -1, :].set(0)
            # the h scalars are full-length on every pts shard; slice locally
            pts_idx = jax.lax.axis_index("pts")
            m_local = h_ax.shape[0]
            h_plain = jax.lax.dynamic_slice_in_dim(
                h_plain, pts_idx * m_local, m_local, axis=-2
            )
            proof_a = _local_msm_batch(a_ax, a_ay, assignment)
            proof_h = _local_msm_batch(h_ax, h_ay, h_plain)
            proof_l = _local_msm_batch(l_ax, l_ay, w1)
            return proof_a, proof_h, proof_l

        self._stage1 = jax.jit(_stage1)

    def stage0(self, w0):
        k = self.keys
        return self._stage0(k.ck_ax, k.ck_ay, w0)

    def stage1(self, a_ev, b_ev, c_ev, assignment, w1):
        k = self.keys
        return self._stage1(
            a_ev, b_ev, c_ev, assignment, w1, k.a_ax, k.a_ay, k.h_ax, k.h_ay, k.l_ax, k.l_ay
        )
