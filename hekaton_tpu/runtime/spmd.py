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
    """Fold a small leading axis of Jacobian partials with point adds.

    A fori_loop, not a Python loop: the add is traced ONCE however many
    shards fold (a Python loop instantiated pts-1 separate adds, which
    multiplied XLA:CPU compile latency across every MSM group)."""
    n = parts.x.shape[0]
    if n == 1:
        return jax.tree.map(lambda a: a[0], parts)
    acc0 = jax.tree.map(lambda a: a[0], parts)

    def body(i, acc):
        nxt = jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False), parts)
        return curve.add(acc, nxt)

    return jax.lax.fori_loop(1, n, body, acc0)


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
    # B-query bases (prover.rs:92-108): G1 copy + G2 copy. None = A/H/L-only
    # step (the committed-MSM subset; the full prover step passes all six).
    b_ax: jnp.ndarray | None = None  # [ncols, NLIMBS]
    b_ay: jnp.ndarray | None = None
    bh_x: jnp.ndarray | None = None  # [ncols, 2, NLIMBS] (G2 affine, Fq2)
    bh_y: jnp.ndarray | None = None


class DistributedProverStep:
    """The two barriered compute phases of the distributed prover, as one
    jitted SPMD program each (the reference's scatter->compute->gather rounds,
    node.rs:477-604).

    stage0(w0):   per-subcircuit commitment MSMs  — w0 [S, m0, 16] plain limbs
    stage1(...):  per-subcircuit QAP witness map + A/H/L MSMs

    Subcircuits are sharded over "sub"; every per-subcircuit MSM is further
    sharded over "pts" with an all_gather+fold combine.
    """

    def __init__(
        self,
        mesh: Mesh,
        keys: ProverStepKeys,
        domain_size: int,
        compiler_options: dict | None = None,
        nbits: int = 254,
        batched_tables: bool = False,
        force_ladder: bool = False,
    ):
        self.mesh = mesh
        self.keys = keys
        self.domain_size = domain_size
        # scalar bit-width for MSM digit extraction: 254 for real Fr scalars;
        # the driver dryrun passes a small width matched to its tiny random
        # scalars so the correctness of the sharded program stays checkable
        # while the ladder loops stay short
        self.nbits = nbits
        # batched_tables=False: CRS tables shared by the whole batch (one
        # unique subcircuit shape — the dedup fast path, minimal HBM).
        # batched_tables=True: a leading [S] table axis, sharded over "sub"
        # like the scalars — each subcircuit carries ITS OWN CRS reference,
        # exactly the reference's per-request pattern (node.rs:489-507), so
        # one compiled program serves a heterogeneous batch.
        self.batched_tables = batched_tables
        # force_ladder: compute EVERY MSM with the batched double-and-add
        # ladder even above the small-N threshold. The ladder does ~13x the
        # curve-op work of Pippenger but in perfectly vectorized width-N
        # steps with a ~3x smaller traced program — the right trade on the
        # XLA:CPU test/virtual-mesh path where compile latency dominates.
        # Production TPU keeps the size-dispatched Pippenger (default).
        self.force_ladder = force_ladder
        zinv = fr_inv((pow(COSET_GEN, domain_size, R) - 1) % R)
        self._zinv_mont = jnp.asarray(jf.FR.pack([zinv])[0])

        spec_batch = P("sub", "pts", None)  # [S, m, 16]: sub over S, pts over m
        if batched_tables:
            spec_tab = P("sub", "pts", None)  # [S, m, NLIMBS]
            spec_g2 = P("sub", "pts", None, None)  # [S, m, 2, NLIMBS]
        else:
            spec_tab = P("pts", None)  # [m, NLIMBS]: replicated over sub
            spec_g2 = P("pts", None, None)

        def _msm_over_batch(curve, ax, ay, sc_batch, ladder=False):
            """vmap local MSM over the subcircuit batch (pairing per-subcircuit
            tables when batched), then fold partials over the pts axis."""
            from ..msm.pippenger import _msm_ladder

            one = (
                (lambda tx, ty, sc: _msm_ladder(curve, tx, ty, sc, nbits=self.nbits))
                if (ladder or self.force_ladder)
                else (lambda tx, ty, sc: msm(curve, tx, ty, sc, nbits=self.nbits))
            )
            if self.batched_tables:
                part = jax.vmap(one)(ax, ay, sc_batch)
            else:
                part = jax.vmap(lambda sc: one(ax, ay, sc))(sc_batch)
            parts = jax.lax.all_gather(part, "pts")  # [pts, S_local, ...]
            return fold_partials(curve, parts)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec_tab, spec_tab, spec_batch),
            out_specs=P("sub", None),
            check_rep=False,
        )
        def _stage0(ck_ax, ck_ay, w0):
            return _msm_over_batch(G1, ck_ax, ck_ay, w0)

        self._stage0 = jax.jit(_stage0, compiler_options=compiler_options)

        self._has_b = keys.b_ax is not None
        in_specs = [
            P("sub", None, None),  # a_evals [S, m, 16] mont
            P("sub", None, None),
            P("sub", None, None),
            spec_batch,  # full assignment scalars [S, ncols, 16] plain
            spec_batch,  # last-stage witness scalars [S, m1, 16] plain
            spec_tab,  # a table
            spec_tab,
            spec_tab,  # h table
            spec_tab,
            spec_tab,  # l table
            spec_tab,
        ]
        n_out = 3
        if self._has_b:
            in_specs += [spec_tab, spec_tab, spec_g2, spec_g2]
            n_out = 5

        tab_len_ax = 1 if batched_tables else 0

        def _msm_grouped(entries):
            """entries: name -> (tx, ty, scalars [S_local, n, 16]). MSMs with
            equal table length run as ONE vmapped program over a stacked
            table (smaller traced graph, one batched kernel); all partials
            fold over the pts axis."""
            from collections import defaultdict

            by_len = defaultdict(list)
            for name, (tx, ty, sc) in entries.items():
                by_len[tx.shape[tab_len_ax]].append((name, tx, ty, sc))
            out = {}
            for items in by_len.values():
                if len(items) == 1:
                    name, tx, ty, sc = items[0]
                    out[name] = _msm_over_batch(G1, tx, ty, sc)
                    continue
                tabs_x = jnp.stack([t for _, t, _, _ in items])
                tabs_y = jnp.stack([t for _, _, t, _ in items])
                sc3 = jnp.stack([s for _, _, _, s in items])

                from ..msm.pippenger import _msm_ladder

                one = (
                    (lambda x, y, sc: _msm_ladder(G1, x, y, sc, nbits=self.nbits))
                    if self.force_ladder
                    else (lambda x, y, sc: msm(G1, x, y, sc, nbits=self.nbits))
                )
                if self.batched_tables:

                    def grp(tx, ty, scs):
                        return jax.vmap(one)(tx, ty, scs)

                else:

                    def grp(tx, ty, scs):
                        return jax.vmap(lambda sc: one(tx, ty, sc))(scs)

                part = jax.vmap(grp)(tabs_x, tabs_y, sc3)  # Jac [k, S_local]
                parts = jax.lax.all_gather(part, "pts")  # [pts, k, S_local]
                folded = fold_partials(G1, parts)  # [k, S_local]
                for k_i, (name, _, _, _) in enumerate(items):
                    out[name] = jax.tree.map(lambda a, i=k_i: a[i], folded)
            return out

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=tuple(P("sub", None) for _ in range(n_out)),
            check_rep=False,
        )
        def _stage1(a_ev, b_ev, c_ev, assignment, w1, a_ax, a_ay, h_ax, h_ay, l_ax, l_ay, *btabs):
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
            m_local = h_ax.shape[tab_len_ax]
            h_plain = jax.lax.dynamic_slice_in_dim(
                h_plain, pts_idx * m_local, m_local, axis=-2
            )
            entries = {
                "a": (a_ax, a_ay, assignment),
                "h": (h_ax, h_ay, h_plain),
                "l": (l_ax, l_ay, w1),
            }
            if self._has_b:
                b_ax, b_ay, bh_x, bh_y = btabs
                entries["bg"] = (b_ax, b_ay, assignment)
            res = _msm_grouped(entries)
            if not self._has_b:
                return res["a"], res["h"], res["l"]
            # B query in G2 (prover.rs:92-108)
            proof_bh = _msm_over_batch(G2, bh_x, bh_y, assignment)
            return res["a"], res["h"], res["l"], res["bg"], proof_bh

        self._stage1 = jax.jit(_stage1, compiler_options=compiler_options)

    def stage0(self, w0, keys: "ProverStepKeys | None" = None):
        k = keys or self.keys
        return self._stage0(k.ck_ax, k.ck_ay, w0)

    def stage1(self, a_ev, b_ev, c_ev, assignment, w1, keys: "ProverStepKeys | None" = None):
        """Returns (A, H, L) partial-MSM Jacobians, plus (B_g1, B_g2) when the
        keys carry the B-query tables.

        `keys` overrides the tables bound at construction: the jitted SPMD
        programs take the CRS tensors as arguments, so one compiled step
        serves every unique subcircuit CRS of the same padded shape (the
        reference's CRS-dedup, data_structures.rs:72-83, without recompiles).
        """
        k = keys or self.keys
        args = [a_ev, b_ev, c_ev, assignment, w1, k.a_ax, k.a_ay, k.h_ax, k.h_ay, k.l_ax, k.l_ay]
        if self._has_b:
            args += [k.b_ax, k.b_ay, k.bh_x, k.bh_y]
        return self._stage1(*args)
