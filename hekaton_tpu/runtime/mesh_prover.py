"""Mesh-sharded distributed prover: the REAL work pipeline over a device mesh.

This is the TPU-native replacement for the reference's two MPI
scatter->compute->gather rounds (/root/reference/mpi-snark/src/bin/node.rs:
461-604): instead of chunking per-subcircuit requests over W worker ranks,
the per-subcircuit prover algebra — the stage-0 commitment MSM
(cp-groth16/src/committer.rs:85-91) and the stage-1 QAP witness map plus
A/B(G1)/B(G2)/H/L MSMs (cp-groth16/src/prover.rs:88-129) — is batched into
stacked tensors sharded over the mesh's "sub" axis, with each MSM's point
range further sharded over "pts" (SURVEY.md §2.5 P1/P4).

Each batch row carries its own CRS tables (DistributedProverStep
batched_tables mode) padded to one common shape per QAP domain size, exactly
mirroring the reference's per-request proving-key references
(node.rs:489-507) — so ONE compiled SPMD program per stage serves the whole
heterogeneous workload, and the whole stage is ONE device call.

Constraint synthesis (name-driven, irregular) stays on the host, exactly as
the survey prescribes (§7 "Dynamic-shape constraint synthesis vs XLA"); the
mesh programs consume witness tensors + CRS point tables and return proof
group elements. Proof assembly (a handful of per-proof host point adds) and
everything coordinator-side (exec tree, Fiat-Shamir, pairings) remain
host-side by design.

RNG streams mirror the sequential worker path (protocol/worker.py +
cli.cmd_work) exactly, so mesh-produced proofs are BIT-IDENTICAL to the
single-process pipeline — tested in tests/test_mesh_prover.py.
"""
from __future__ import annotations

import numpy as np

from ..cpgroth16.data_structures import Proof
from ..curves import host as ch
from ..curves.jax_curve import G1, G2
from ..fields import jax_field as jf
from ..fields.bn254 import R
from ..msm.pippenger import pack_scalars
from ..protocol.subcircuit import SubcircuitWithPortalsProver
from ..protocol.worker import Stage0Response, Stage1Response
from ..r1cs.builder import ConstraintSystem
from ..utils.rng import Rng
from .spmd import DistributedProverStep, ProverStepKeys


def _pad_points(points: list, n: int) -> list:
    """Pad a host point table with infinity (contributes identity)."""
    assert len(points) <= n
    return list(points) + [None] * (n - len(points))


def _pad_scalars(vals: list, n: int) -> list:
    assert len(vals) <= n
    return [v % R for v in vals] + [0] * (n - len(vals))


class MeshProver:
    """Batched two-phase prover over a (sub x pts) mesh.

    Usage (mirrors node.rs work, with the scatter/gather replaced by
    shard_map sharding):

        mp = MeshProver(mesh, keys)
        resps0 = mp.stage0_all(rng, circuit_cls, reqs0)   # one sharded call
        ... host coordinator: super-com + exec tree ...
        resps1 = mp.stage1_all(rng, circuit_cls, reqs1)   # one sharded call
    """

    def __init__(self, mesh, keys, compiler_options: dict | None = None,
                 force_ladder: bool = False):
        self.mesh = mesh
        self.keys = keys  # runtime.keys.ProvingKeys
        self.sub_ax = mesh.devices.shape[0]
        self.pts_ax = mesh.devices.shape[1]
        self.compiler_options = compiler_options
        self.force_ladder = force_ladder
        self._states = {}  # subcircuit idx -> [wrapper, cs, com, kappa]
        self._steps = {}  # domain m -> DistributedProverStep
        self._rep_tabs = {}  # representative idx -> dict of packed np tables
        # one common padded shape per QAP domain size, maxed over all unique
        # CRSs — so a heterogeneous workload needs one compiled program pair
        self._shape_for_m = {}
        for pk in keys.minimal_pks.values():
            m = pk.domain_size
            m0, nc, m1 = (
                self._ceil(len(pk.ck.deltas_abc_g[0])),
                self._ceil(len(pk.a_g)),
                self._ceil(len(pk.ck.deltas_abc_g[-1])),
            )
            cur = self._shape_for_m.get(m, (0, 0, 0))
            m0, nc, m1 = max(cur[0], m0), max(cur[1], nc), max(cur[2], m1)
            # unify table lengths so MSMs fuse into as few traced groups as
            # possible: L up to A/B always; and when the domain m covers the
            # assignment width, lift A/B/L to m so the H query joins the SAME
            # fused group — one G1 MSM instantiation for the whole stage
            # (padded rows cost only stream/lane length)
            if m1 <= nc:
                m1 = nc
            if nc <= m:
                nc = m1 = m
            self._shape_for_m[m] = (m0, nc, m1)

    def _ceil(self, n: int) -> int:
        p = self.pts_ax
        return max(p, ((n + p - 1) // p) * p)

    def _tables_for(self, rep: int) -> dict:
        """Per-unique-CRS point tables, padded to the domain's common shape
        (packed once, reused for every subcircuit mapping to this rep —
        the reference's CRS dedup, data_structures.rs:72-83)."""
        if rep in self._rep_tabs:
            return self._rep_tabs[rep]
        pk = self.keys.minimal_pks[rep]
        m0, nc, m1 = self._shape_for_m[pk.domain_size]
        m = pk.domain_size

        def g1(points, n):
            return G1.pack_affine(_pad_points(points, n))

        tabs = {
            "ck": g1(pk.ck.deltas_abc_g[0].points, m0),
            "a": g1(pk.a_g.points, nc),
            "bg": g1(pk.b_g.points, nc),
            "bh": G2.pack_affine(_pad_points(pk.b_h.points, nc)),
            # H query has m-1 rows; the device program masks the padded last scalar
            "h": g1(pk.h_g.points, m),
            "l": g1(pk.ck.deltas_abc_g[-1].points, m1),
        }
        self._rep_tabs[rep] = tabs
        return tabs

    def _step_for(self, m: int, keys: ProverStepKeys) -> DistributedProverStep:
        if m not in self._steps:
            self._steps[m] = DistributedProverStep(
                self.mesh, keys, domain_size=m,
                compiler_options=self.compiler_options,
                batched_tables=True,
                force_ladder=self.force_ladder,
            )
        return self._steps[m]

    def _pad_batch(self, n_rows: int) -> int:
        s = self.sub_ax
        return max(s, ((n_rows + s - 1) // s) * s)

    @staticmethod
    def _stack(rows):
        import jax.numpy as jnp

        return jnp.asarray(np.stack(rows))

    def _batched_keys(self, items, m: int, S: int) -> ProverStepKeys:
        """[S]-stacked per-subcircuit CRS tables (pad rows reuse item 0's
        tables; their scalars are zero so they contribute identity)."""
        tabs = [self._tables_for(rep) for rep in items]
        tabs += [tabs[0]] * (S - len(tabs))
        st = lambda key, comp: self._stack([t[key][comp] for t in tabs])
        return ProverStepKeys(
            st("ck", 0), st("ck", 1), st("a", 0), st("a", 1),
            st("h", 0), st("h", 1), st("l", 0), st("l", 1),
            b_ax=st("bg", 0), b_ay=st("bg", 1), bh_x=st("bh", 0), bh_y=st("bh", 1),
        )

    # -- stage 0: commitments ---------------------------------------------

    def stage0_all(self, rng: Rng, circuit_cls, reqs: list) -> list:
        """Batched equivalent of process_stage0_request over all requests.

        Per subcircuit the host synthesizes the stage-0 witness (the two
        subtraces — subcircuit_circuit.rs:139-159); the commitment MSMs for
        the whole batch run as ONE sharded program call
        (committer.rs:85-91 batched over the mesh)."""
        prepared = []  # (idx, rep, witness, com_seed, kappa)
        for req in reqs:
            idx = req.subcircuit_idx
            prover = SubcircuitWithPortalsProver(circuit_cls, 2)
            prover.subcircuit_idx = idx
            prover.time_ordered_subtrace = req.time_ordered_subtrace
            prover.addr_ordered_subtrace = req.addr_ordered_subtrace
            pk0 = self.keys.minimal_pks[self.keys.representatives[idx]]
            fast = getattr(pk0, "compiled", None) is not None
            cs = ConstraintSystem(value_only=fast)
            prover.generate_constraints(0, cs)
            # value-only mode defers satisfiability to the stage-1 compiled check
            assert fast or cs.is_satisfied(), f"unsatisfied stage-0 constraint @ {idx}"
            witness = cs.current_stage_witness()
            # seed/kappa stream identical to the sequential worker
            # (worker.py process_stage0_request_get_cb)
            com_seed = rng.fork(str(idx).encode()).next_seed()
            kappa = Rng(com_seed).next_fr()
            rep = self.keys.representatives[idx]
            prepared.append((idx, rep, witness, com_seed, kappa))
            self._states[idx] = [prover, cs, None, kappa]

        responses = {}
        by_m = {}
        for item in prepared:
            m = self.keys.minimal_pks[item[1]].domain_size
            by_m.setdefault(m, []).append(item)
        for m, items in by_m.items():
            m0, _, _ = self._shape_for_m[m]
            S = self._pad_batch(len(items))
            skeys = self._batched_keys([it[1] for it in items], m, S)
            step = self._step_for(m, skeys)
            rows = [pack_scalars(_pad_scalars(w, m0)) for _, _, w, _, _ in items]
            rows += [pack_scalars([0] * m0)] * (S - len(items))
            coms = step.stage0(self._stack(rows), keys=skeys)
            host_coms = G1.unpack_jacobian(coms)
            for (idx, rep, _, seed, kappa), base in zip(items, host_coms):
                pk = self.keys.minimal_pks[rep]
                com = ch.pt_add(base, ch.pt_mul(pk.ck.last_delta_g, kappa))
                self._states[idx][2] = com
                responses[idx] = Stage0Response(idx, com, seed)
        return [responses[r.subcircuit_idx] for r in reqs]

    # -- stage 1: proofs ----------------------------------------------------

    def stage1_all(self, rng: Rng, circuit_cls, reqs1: list) -> list:
        """Batched equivalent of process_stage1_request_with_cb: host fills
        the wrapper circuit (leaf/path/root/challenges) and synthesizes the
        last stage; the witness map + five proof MSMs for the whole batch run
        as ONE sharded program call; proofs are assembled host-side
        (prover.rs:80-148, committer.rs:106-121)."""
        from ..cpgroth16.prover import _matrix_evals

        prepared = []
        for req in reqs1:
            idx = req.subcircuit_idx
            wrapper, cs, com, kappa = self._states[idx]
            underlying = circuit_cls.new(req.circ_params)
            underlying.set_serialized_witnesses(idx, req.serialized_witnesses)
            wrapper.circ = underlying
            wrapper.num_subcircuits = underlying.num_subcircuits()
            wrapper.cur_leaf = req.cur_leaf
            wrapper.next_leaf_membership = req.next_leaf_membership
            wrapper.root = req.root
            wrapper.challenges = req.cur_leaf.evals.challenge_list()
            wrapper.generate_constraints(1, cs)
            rep = self.keys.representatives[idx]
            pk = self.keys.minimal_pks[rep]
            z = cs.full_assignment()
            w1 = cs.current_stage_witness()
            if cs.value_only:
                a_ev, b_ev, c_ev = pk.compiled.evals(z, pk.domain_size, check=True)
            else:
                assert cs.is_satisfied(), f"unsatisfied stage-1 constraint @ {idx}"
                a_ev, b_ev, c_ev = _matrix_evals(cs, pk.domain_size)
            # r/s stream identical to cli.cmd_work's sequential path
            rng_i = rng.fork(b"s1" + str(idx).encode())
            r, s = rng_i.next_fr(), rng_i.next_fr()
            prepared.append((idx, rep, z, w1, a_ev, b_ev, c_ev, r, s, com, kappa))

        responses = {}
        by_m = {}
        for item in prepared:
            m = self.keys.minimal_pks[item[1]].domain_size
            by_m.setdefault(m, []).append(item)
        for m, items in by_m.items():
            m0, ncols, m1 = self._shape_for_m[m]
            S = self._pad_batch(len(items))
            npad = S - len(items)
            skeys = self._batched_keys([it[1] for it in items], m, S)
            step = self._step_for(m, skeys)

            def batch(pack, vals, width):
                rows = [pack(_pad_scalars(v, width)) for v in vals]
                rows += [pack([0] * width)] * npad
                return self._stack(rows)

            a_evs = batch(jf.FR.pack, [it[4] for it in items], m)
            b_evs = batch(jf.FR.pack, [it[5] for it in items], m)
            c_evs = batch(jf.FR.pack, [it[6] for it in items], m)
            assignment = batch(pack_scalars, [it[2] for it in items], ncols)
            w1s = batch(pack_scalars, [it[3] for it in items], m1)

            pa, ph, pl, pbg, pbh = step.stage1(
                a_evs, b_evs, c_evs, assignment, w1s, keys=skeys
            )
            a_acc = G1.unpack_jacobian(pa)
            h_acc = G1.unpack_jacobian(ph)
            l_acc = G1.unpack_jacobian(pl)
            bg_acc = G1.unpack_jacobian(pbg)
            bh_acc = G2.unpack_jacobian(pbh)

            for k, (idx, rep, _, _, _, _, _, r, s, com, kappa) in enumerate(items):
                pk = self.keys.minimal_pks[rep]
                # proof assembly: prover.rs:88-148 + committer.rs:106-121
                a_pt = ch.pt_add(ch.pt_add(a_acc[k], pk.vk.alpha_g), ch.pt_mul(pk.last_delta_g, r))
                b_pt_h = ch.pt_add(
                    ch.pt_add(bh_acc[k], pk.vk.beta_h), ch.pt_mul(pk.vk.last_delta_h, s)
                )
                b_pt_g = ch.pt_add(
                    ch.pt_add(bg_acc[k], pk.beta_g), ch.pt_mul(pk.last_delta_g, s)
                )
                c_pt = ch.pt_mul(a_pt, s)
                c_pt = ch.pt_add(c_pt, ch.pt_mul(b_pt_g, r))
                c_pt = ch.pt_sub(c_pt, ch.pt_mul(pk.last_delta_g, r * s % R))
                c_pt = ch.pt_add(c_pt, l_acc[k])
                c_pt = ch.pt_add(c_pt, h_acc[k])
                # C -= kappa * delta_0 over the committed stage
                c_pt = ch.pt_sub(c_pt, ch.pt_mul(pk.deltas_g[0], kappa))
                responses[idx] = Stage1Response(idx, Proof(a_pt, b_pt_h, c_pt, [com]))
        return [responses[r.subcircuit_idx] for r in reqs1]
