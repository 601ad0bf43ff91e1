"""Fused MPPI rollout as ONE Pallas TPU kernel.

The XLA rollout (solver vmap-of-scan over the engine step) is correct but
launch-overhead-bound on TPU: a panda_pick substep costs ~6 ms at K=1000 even
though its arithmetic is ~10 µs — hundreds of small fusions each pay ~20 µs of
launch overhead, ×120 substeps per command. This kernel collapses the ENTIRE
rollout — H-step loop × substeps × full articulated physics × contacts × cost
— into one `pallas_call`: samples live in VPU lanes ((8,128) tiles of 1024
samples), the physics is straight-line component code (fused_physics.py), and
the only launch is the kernel itself.

Layout
------
* state:  (NS, 8·G, 128)  NS = 13·A root slots + q + qd + 3·B net-cf slots
* V:      (H, nu, 8·G, 128) control perturbations
* scales: (B, 8·G, 128) mass, (n_geom, 8·G, 128) friction (per-env DR)
* out:    costs (H, 8·G, 128), vis (H, 3, 8·G, 128)
grid = (G,) over sample tiles of 1024.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics.dynamics import build_actor_masks
from .fused_physics import LaneView, fk_lanes, substep_lanes

TILE = 1024  # samples per grid cell = 8 sublanes × 128 lanes


def unpack_rows(arr, A, D, B):
    """(NS, 8, 128) kernel rows → state dict of tile tuples."""
    st = {
        "root_pos": [], "root_quat": [], "root_linvel": [], "root_angvel": [],
        "q": [], "qd": [], "net_cf": [],
    }
    r = 0
    for a in range(A):
        st["root_pos"].append((arr[r], arr[r + 1], arr[r + 2]))
        st["root_quat"].append((arr[r + 3], arr[r + 4], arr[r + 5], arr[r + 6]))
        st["root_linvel"].append((arr[r + 7], arr[r + 8], arr[r + 9]))
        st["root_angvel"].append((arr[r + 10], arr[r + 11], arr[r + 12]))
        r += 13
    for d in range(D):
        st["q"].append(arr[r]); r += 1
    for d in range(D):
        st["qd"].append(arr[r]); r += 1
    for b in range(B):
        st["net_cf"].append((arr[r], arr[r + 1], arr[r + 2]))
        r += 3
    return st


def state_to_carry(st, A, D, B, n_fc):
    """state dict → iteration-invariant PYTREE carry of individual tiles.

    The loop carries (substeps, H steps) used to be a single packed
    (NSR, 8, 128) array, which cost a jnp.stack of ~NSR rows + NSR slice reads
    PER SUBSTEP — pure data movement on the same order as the physics math
    itself (the round-3 phase profile showed the base loop dominating the
    kernel). A pytree carry keeps every tile as its own buffer: fori_loop
    threads them by reference and the pack/unpack ops disappear. Float slots
    (e.g. net-cf of bodies with no contact candidates) are canonicalized to
    tiles so the structure matches across iterations.

    λ rides as the per-pair-block structure fused_physics produces:
    (lam_n (S,8,128), lam_t 3-tuple of (S,8,128)) per swept block — a few
    dozen leaves instead of the old 4·n_fc individual tiles."""
    ref = st["root_pos"][0][0]
    zero = ref * 0.0

    def t(x):
        return x + zero if isinstance(x, (int, float)) else x

    ncf = st.get("net_cf", [(0.0, 0.0, 0.0)] * B)
    lam = st.get("lam") if n_fc else None
    return (
        tuple(tuple(t(v) for v in st["root_pos"][a]) for a in range(A)),
        tuple(tuple(t(v) for v in st["root_quat"][a]) for a in range(A)),
        tuple(tuple(t(v) for v in st["root_linvel"][a]) for a in range(A)),
        tuple(tuple(t(v) for v in st["root_angvel"][a]) for a in range(A)),
        tuple(t(st["q"][d]) for d in range(D)),
        tuple(t(st["qd"][d]) for d in range(D)),
        tuple(tuple(t(v) for v in ncf[b]) for b in range(B)),
        tuple((ln, tuple(lt)) for ln, lt in lam) if lam is not None else (),
    )


def carry_to_state(carry, n_fc):
    """PYTREE carry → state dict (list/tuple views, no data movement)."""
    rp, rq, rlv, rav, q, qd, ncf, lam = carry
    st = {
        "root_pos": list(rp), "root_quat": list(rq),
        "root_linvel": list(rlv), "root_angvel": list(rav),
        "q": list(q), "qd": list(qd), "net_cf": list(ncf),
    }
    if n_fc:
        st["lam"] = list(lam)
    return st


def unpack_lam_rows(arr0, NS, swept_S):
    """λ rows of the packed kernel input → per-block structure. Row layout is
    4 consecutive rows [λ_n, λ_t·3] per candidate, candidates in batched block
    order (free_cand_indices)."""
    lam = []
    c0 = 0
    for S_ in swept_S:
        ln = jnp.stack([arr0[NS + 4 * (c0 + s)] for s in range(S_)])
        lt = tuple(
            jnp.stack([arr0[NS + 4 * (c0 + s) + 1 + i] for s in range(S_)])
            for i in range(3)
        )
        lam.append((ln, lt))
        c0 += S_
    return lam


def pack_lam_rows(lam):
    """Per-block λ structure → flat row list (inverse of unpack_lam_rows)."""
    rows = []
    for ln, lt in lam:
        for s in range(ln.shape[0]):
            rows += [ln[s], lt[0][s], lt[1][s], lt[2][s]]
    return rows


def pack_rows(st, A, B):
    rows = []
    for a in range(A):
        rows += list(st["root_pos"][a]) + list(st["root_quat"][a])
        rows += list(st["root_linvel"][a]) + list(st["root_angvel"][a])
    rows += list(st["q"]) + list(st["qd"])
    ncf = st.get("net_cf", [(0.0, 0.0, 0.0)] * B)
    zero = rows[0] * 0.0
    for b in range(B):
        for cmp_ in ncf[b]:
            rows.append(cmp_ + zero if isinstance(cmp_, float) else cmp_)
    return jnp.stack(rows)


class FusedRollout:
    def __init__(
        self,
        built,                      # scene.builder.BuiltScene
        engine,                     # physics.step.Engine
        cost_fn: Callable,          # (LaneView, t:int-traced) -> (8,128) tile
        H: int,
        K: int,
        vis_body: Optional[int] = None,
        interpret: bool = False,
        impulse_sweeps: int = 2,
        controls_dtype=jnp.bfloat16,
        world_fidelity: bool = True,
        substeps: Optional[int] = None,
        profile: Optional[dict] = None,
        manifold: str = "full",
    ):
        # profile: optional per-phase ablation flags for scripts/
        # profile_kernel.py — {"skip_contacts": bool, "skip_dynamics": bool,
        # "zero_cost": bool}. Physically wrong; timing only.
        self.profile = profile or {}
        # controls ride in VMEM for the whole rollout — (H,nu,8G,128) f32 can
        # push the kernel past the 16 MB VMEM budget; bf16 perturbations lose
        # <0.5% of noise resolution and halve that buffer
        self.controls_dtype = controls_dtype
        self.impulse_sweeps = impulse_sweeps
        # world_fidelity=True: rollouts run the world step's exact contact
        # treatment (persistent-λ warm start carried across the whole
        # H×substeps trajectory, seeded from the world's converged contact
        # state, + stiction snap) — the planner model's grasp-hold prediction
        # matches the world engine. False: no λ carry across substeps and no
        # snap (4·n_fc fewer VMEM rows) — sufficient for push/locomotion
        # tasks. Both modes share the mass-splitting Jacobi sweeps with
        # vector-cone friction (r4: same algorithm as the XLA engine).
        self.world_fidelity = world_fidelity
        # planner-model substep override (MPPIConfig.rollout_substeps): the
        # rollout may integrate coarser than the world sim — physics cost is
        # linear in substeps and MPC models tolerate coarser integration than
        # the plant. None = match the world engine exactly.
        self.substeps = engine.substeps if substeps is None else int(substeps)
        self.dt_sub = engine.scene.dt / self.substeps
        self.built = built
        self.engine = engine
        self.scene = built.scene
        self.cost_fn = cost_fn
        self.H = H
        self.K = K
        self.G = -(-K // TILE)
        self.KP = self.G * TILE
        self.nu = built.cmd_map.nu
        self.vis_body = vis_body
        self.interpret = interpret
        self.masks_list = [build_actor_masks(a) for a in self.scene.actors]

        s = self.scene
        self.A, self.D, self.B = s.nactor, s.ndof, s.nbody
        self.NS = 13 * self.A + 2 * self.D + 3 * self.B
        # persistent-λ rows: rollouts run the same world-fidelity contact
        # treatment as the world step (vector cone + warm start + stiction
        # snap), with λ carried across the whole H×substeps trajectory and
        # SEEDED from the world's converged contact state — the planner
        # model's grasp-hold prediction matches the world engine
        from .fused_physics import free_cand_indices

        # planner-model manifold (MPPIConfig.rollout_manifold): "reduced"
        # rebuilds the contact tables with corners-only box-box sampling
        # (8 vs 14 bbc samples) — ~40% fewer narrowphase + swept candidates
        # on pick-class scenes. Only meaningful for the fast-fidelity model:
        # world fidelity shares the world's persistent-λ rows, which are
        # indexed by the WORLD tables' candidate order.
        if manifold == "reduced" and not world_fidelity:
            from ...physics.contact import build_contact_tables

            self.tables = build_contact_tables(s, bbc_samples=8)
        else:
            self.tables = engine.tables
        self.fc_idx = free_cand_indices(s, self.tables)
        from .fused_physics import pair_blocks, swept_blocks

        self.swept_S = [blk["S"] for blk in swept_blocks(s, self.tables)]
        # box-sample offset table → broadcast (SC,8,128) kernel input
        # (Pallas cannot capture array constants inside the kernel)
        sconst_np = pair_blocks(s, self.tables)[1]
        self.SC = max(len(sconst_np), 1)
        self._sconst = jnp.broadcast_to(
            jnp.asarray(np.resize(sconst_np, self.SC), jnp.float32)[:, None, None],
            (self.SC, 8, 128),
        )
        self.n_fc = len(self.fc_idx) if world_fidelity else 0
        self.NSR = self.NS + 4 * self.n_fc
        self._run = jax.jit(self._build_call())

    def retrace(self):
        self._run = jax.jit(self._build_call())

    # ------------------------------------------------------------------
    # state packing helpers (kernel side: python lists of (8,128) tiles)
    # ------------------------------------------------------------------
    def _unpack(self, arr):
        return unpack_rows(arr, self.A, self.D, self.B)

    # ------------------------------------------------------------------
    def _kernel(self, state_ref, V_ref, mass_ref, fric_ref, sconst_ref,
                cost_ref, vis_ref):
        scene, tables = self.scene, self.tables
        dt_sub = self.dt_sub
        substeps = self.substeps
        cmdW = self.built.cmd_map.W                      # (D, nu) static
        binarize = self.built.cmd_map.binarize_dofs

        mass_tiles = [mass_ref[b] for b in range(self.B)]
        fric_tiles = [fric_ref[g] for g in range(self.scene.ngeom)]
        sconst_arr = sconst_ref[:]

        NS, n_fc = self.NS, self.n_fc
        A, D, B = self.A, self.D, self.B

        def h_body(t, carry):
            st = carry_to_state(carry, n_fc)
            u = V_ref[t].astype(jnp.float32)              # (nu, 8, 128)
            u_tiles = [u[j] for j in range(self.nu)]
            # command map: dof_target = W @ u (+ gripper binarize)
            tgt = []
            for d in range(self.D):
                acc = 0.0
                for j in range(self.nu):
                    w = float(cmdW[d, j])
                    if w != 0.0:
                        acc = acc + u_tiles[j] * w
                if isinstance(acc, float):
                    acc = jnp.zeros_like(u_tiles[0])
                tgt.append(acc)
            for dof, src, lo, hi, th, band in binarize:
                uc = u_tiles[src]
                if band > 0.0:
                    # hysteresis hold branch from the CURRENT finger position
                    # (see CommandMap.apply) — rollouts model the same latching
                    # gripper the world runs
                    cur_open = st["q"][dof] > lo + 0.75 * (hi - lo)
                    tgt[dof] = jnp.where(
                        uc > th + band, hi,
                        jnp.where(uc < th - band, lo,
                                  jnp.where(cur_open, hi, lo)),
                    )
                else:
                    tgt[dof] = jnp.where(uc > th, hi, lo)

            def sub_body(_, carry_s):
                s2 = carry_to_state(carry_s, n_fc)
                s2["dof_target"] = tgt
                s2 = substep_lanes(
                    scene, tables, self.masks_list, s2, fric_tiles, mass_tiles, dt_sub,
                    impulse_sweeps=self.impulse_sweeps,
                    world_fidelity=self.world_fidelity,
                    skip_contacts=self.profile.get("skip_contacts", False),
                    skip_dynamics=self.profile.get("skip_dynamics", False),
                    sconst=sconst_arr,
                )
                return state_to_carry(s2, A, D, B, n_fc)

            carry = jax.lax.fori_loop(0, substeps, sub_body, carry)

            # cost on the post-step state
            if self.profile.get("zero_cost", False):
                # profiling ablation: skip the cost section's FK + view + cost
                # — but write a PHYSICS-DEPENDENT value, or Mosaic dead-code-
                # eliminates the entire substep loop (the kernel's only other
                # output is vis): the r3 profile's "cost section" delta was
                # really the whole physics being deleted
                stf = carry_to_state(carry, n_fc)
                alive = stf["q"][0] if self.D else stf["root_pos"][0][0]
                cost_ref[t] = alive
                vis_ref[t] = jnp.zeros((3, 8, 128), jnp.bfloat16)
                return carry
            stf = carry_to_state(carry, n_fc)
            pos, quat, linv, angv, _ = fk_lanes(scene, stf)
            view = LaneView(
                scene, pos, quat, linv, angv, stf["net_cf"],
                stf["q"], stf["qd"],
                stf["root_pos"], stf["root_quat"], stf["root_linvel"],
            )
            cost_ref[t] = self.cost_fn(view, t)
            if self.vis_body is not None:
                vb = pos[self.vis_body]
                vis_ref[t] = jnp.stack([vb[0], vb[1], vb[2]]).astype(jnp.bfloat16)
            else:
                vis_ref[t] = jnp.zeros((3, 8, 128), jnp.bfloat16)
            return carry

        arr0 = state_ref[:]
        st0 = self._unpack(arr0)
        if n_fc:
            st0["lam"] = unpack_lam_rows(arr0, NS, self.swept_S)
        jax.lax.fori_loop(0, self.H, h_body,
                          state_to_carry(st0, A, D, B, n_fc))

    def _build_call(self):
        H, nu, NS, G = self.H, self.nu, self.NSR, self.G
        B, NG, SC = self.B, self.scene.ngeom, self.SC

        grid_spec = pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NS, 8, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, nu, 8, 128), lambda g: (0, 0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 8, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NG, 8, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SC, 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((H, 8, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 3, 8, 128), lambda g: (0, 0, g, 0), memory_space=pltpu.VMEM),
            ),
        )

        ctl_dt = self.controls_dtype

        def run(state_arr, V_arr, mass_arr, fric_arr, sconst_arr):
            V_arr = V_arr.astype(ctl_dt)
            return pl.pallas_call(
                self._kernel,
                grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((H, 8 * G, 128), jnp.float32),
                    # vis is display-only → bf16 halves its VMEM footprint
                    jax.ShapeDtypeStruct((H, 3, 8 * G, 128), jnp.bfloat16),
                ),
                interpret=self.interpret,
                # see FusedWorldStep: the default 16 MB scoped-vmem budget is
                # a few hundred KB short on grasp scenes since the couple-
                # contact solve (Ψ blocks, factors) joined the kernel
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024
                ),
            )(state_arr, V_arr, mass_arr, fric_arr, sconst_arr)

        return run

    # ------------------------------------------------------------------
    # host-side layout conversion
    # ------------------------------------------------------------------
    def _to_lanes(self, x_k):
        """(K, ...) → (..., 8G, 128) with K padded."""
        x = jnp.moveaxis(x_k, 0, -1)                      # (..., K)
        pad = self.KP - self.K
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[..., -1:], pad, axis=-1)], axis=-1)
        return x.reshape(x.shape[:-1] + (self.G, 8, 128)).reshape(
            x.shape[:-1] + (8 * self.G, 128)
        )

    def _from_lanes(self, x):
        """(..., 8G, 128) → (K, ...)."""
        y = x.reshape(x.shape[:-2] + (self.G, 8, 128)).reshape(x.shape[:-2] + (self.KP,))
        return jnp.moveaxis(y[..., : self.K], -1, 0)

    def rollout(self, sim_state_K, params_K, V_khn):
        """sim_state_K: SimState with leading K; params_K: ModelParams (K,·);
        V_khn: (K, H, nu). Returns (costs (K,H), vis (H,K,3))."""
        A, D = self.A, self.D
        parts = [
            sim_state_K.root_state.reshape(self.K, 13 * A),
            sim_state_K.q,
            sim_state_K.qd,
            jnp.zeros((self.K, 3 * self.B), jnp.float32),
        ]
        if self.n_fc:
            # seed the rollout's persistent λ from the WORLD's converged
            # contact impulses: a rollout branching from a held grasp starts
            # with the grip's stiction already resolved
            lam = sim_state_K.contact_lam
            if lam is not None and lam.shape[-2:] == (self.engine.tables.n_con, 4):
                lam_sel = lam[:, self.fc_idx, :].reshape(self.K, 4 * self.n_fc)
            else:
                lam_sel = jnp.zeros((self.K, 4 * self.n_fc), jnp.float32)
            parts.append(lam_sel)
        rows = jnp.concatenate(parts, axis=1)              # (K, NSR)
        return self._rollout_packed(rows, params_K, V_khn)

    def _rollout_packed(self, rows, params_K, V_khn):
        state_arr = self._to_lanes(rows)                   # (NS, 8G, 128)
        V_arr = self._to_lanes(V_khn)                      # (H, nu, 8G, 128)
        mass_arr = self._to_lanes(params_K.body_mass_scale)
        fric_arr = self._to_lanes(params_K.geom_friction)
        costs_l, vis_l = self._run(state_arr, V_arr, mass_arr, fric_arr,
                                   self._sconst)
        costs = self._from_lanes(costs_l)                  # (K, H)
        vis = jnp.moveaxis(self._from_lanes(vis_l.astype(jnp.float32)), 0, 1)  # (H,K,3)
        return costs, vis


class FusedWorldStep:
    """The 1-env WORLD control step as ONE Pallas kernel.

    The XLA world path is launch-overhead-bound on this backend (~20 µs per
    fusion × thousands of small fusions ≈ 50 ms per dt — RT 0.7, below the
    reference's own real-time bar, `examples/panda/world.py:52-59`). Here the
    whole dt (all substeps of full-fidelity physics: implicit couple contacts,
    two-way GS impulse sweeps) is one kernel launch; the env rides in lane
    (0,0) of a single tile. `impulse_sweeps` defaults higher than the rollout
    kernel's 2 — the world pays it once per dt, not K×H times.
    """

    def __init__(self, built, engine, impulse_sweeps: int = 16, interpret: bool = False):
        from ...physics.dynamics import build_actor_masks
        from .fused_physics import free_cand_indices, pair_blocks, swept_blocks

        self.built = built
        self.engine = engine
        self.scene = built.scene
        # default 16 = contact.impulse_contact_pass's iteration count: the
        # fused sweeps run the SAME mass-splitting Jacobi since the r4 pair-
        # block restructure, so matching counts makes the two world paths
        # converge identically. Paid once per control dt — cheap.
        self.impulse_sweeps = impulse_sweeps
        self.interpret = interpret
        self.masks_list = [build_actor_masks(a) for a in self.scene.actors]
        s = self.scene
        self.A, self.D, self.B = s.nactor, s.ndof, s.nbody
        self.NS = 13 * self.A + 2 * self.D + 3 * self.B
        # persistent contact-impulse rows (λ_n + λ_t vector per impulse
        # candidate) — warm starting across substeps AND control steps,
        # shared with SimState.contact_lam via the table-index map
        self.fc_idx = free_cand_indices(s, engine.tables)
        self.swept_S = [blk["S"] for blk in swept_blocks(s, engine.tables)]
        sconst_np = pair_blocks(s, engine.tables)[1]
        self.SC = max(len(sconst_np), 1)
        self._sconst = jnp.broadcast_to(
            jnp.asarray(np.resize(sconst_np, self.SC), jnp.float32)[:, None, None],
            (self.SC, 8, 128),
        )
        self.n_fc = len(self.fc_idx)
        self.NSW = self.NS + 4 * self.n_fc
        self._run = jax.jit(self._build_call())

    def _kernel(self, state_ref, tgt_ref, mass_ref, fric_ref, sconst_ref, out_ref):
        scene = self.scene
        dt_sub = self.engine.dt_sub
        substeps = self.engine.substeps
        mass_tiles = [mass_ref[b] for b in range(self.B)]
        fric_tiles = [fric_ref[g] for g in range(self.scene.ngeom)]
        sconst_arr = sconst_ref[:]
        tgt = [tgt_ref[d] for d in range(self.D)]
        NS, n_fc = self.NS, self.n_fc

        A, D, B = self.A, self.D, self.B

        def sub_body(i, carry_s):
            s2 = carry_to_state(carry_s, n_fc)
            s2["dof_target"] = tgt
            s2 = substep_lanes(
                scene, self.engine.tables, self.masks_list, s2,
                fric_tiles, mass_tiles, dt_sub,
                impulse_sweeps=self.impulse_sweeps,
                world_fidelity=True, sconst=sconst_arr,
            )
            return state_to_carry(s2, A, D, B, n_fc)

        arr0 = state_ref[:]
        st0 = unpack_rows(arr0, A, D, B)
        if n_fc:
            st0["lam"] = unpack_lam_rows(arr0, NS, self.swept_S)
        carry = jax.lax.fori_loop(0, substeps, sub_body,
                                  state_to_carry(st0, A, D, B, n_fc))
        sf = carry_to_state(carry, n_fc)
        rows = pack_rows(sf, A, B)
        if n_fc:
            rows = jnp.concatenate([rows, jnp.stack(pack_lam_rows(sf["lam"]))])
        out_ref[:] = rows

    def _build_call(self):
        NSW, D, B, NG, SC = self.NSW, self.D, self.B, self.scene.ngeom, self.SC
        grid_spec = pl.GridSpec(
            grid=(1,),
            in_specs=[
                pl.BlockSpec((NSW, 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((max(D, 1), 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NG, 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SC, 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NSW, 8, 128), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
        )

        def run(state_arr, tgt_arr, mass_arr, fric_arr, sconst_arr):
            return pl.pallas_call(
                self._kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((NSW, 8, 128), jnp.float32),
                interpret=self.interpret,
                # default scoped-vmem budget is 16 MB; the rolled sweep carry +
                # operational-space blocks (Ψ, factors) need a little more on
                # grasp scenes — raise toward the physical VMEM like the
                # upstream pallas flash-attention kernels do
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024
                ),
            )(state_arr, tgt_arr, mass_arr, fric_arr, sconst_arr)

        return run

    # ------------------------------------------------------------------
    @staticmethod
    def _bcast(v):
        """scalar vector (n,) → (n, 8, 128) tiles (env 0 in every lane)."""
        return jnp.broadcast_to(v[:, None, None], (v.shape[0], 8, 128))

    def step_rows(self, rows, tgt, mass_scale, geom_friction):
        """rows (NS,), tgt (D,), scales (B,)/(G,) → new rows (NS,).
        Jit-friendly: everything stays on device."""
        out = self._run(
            self._bcast(rows),
            self._bcast(tgt if self.D else jnp.zeros((1,), jnp.float32)),
            self._bcast(mass_scale),
            self._bcast(geom_friction),
            self._sconst,
        )
        return out[:, 0, 0]

    def step(self, state, params):
        """SimState (1-env, no leading axis) → SimState after one control dt.
        Body caches are refreshed; the persistent-λ cache rides in
        SimState.contact_lam — the same rows the XLA engine warm-starts from,
        so the two world paths share grasp-hold continuity."""
        A, D, B = self.A, self.D, self.B
        NS = self.NS
        parts = [
            state.root_state.reshape(13 * A),
            state.q, state.qd,
            jnp.zeros((3 * B,), jnp.float32),
        ]
        if self.n_fc:
            lam = state.contact_lam
            if lam is None or lam.shape[-2:] != (self.engine.tables.n_con, 4):
                lam_sel = jnp.zeros((self.n_fc, 4), jnp.float32)
            else:
                lam_sel = lam[self.fc_idx]
            parts.append(lam_sel.reshape(4 * self.n_fc))
        rows = jnp.concatenate(parts)
        out = self.step_rows(
            rows, state.dof_target, params.body_mass_scale, params.geom_friction
        )
        st = state.with_root_state(out[: 13 * A].reshape(A, 13))
        st = st._replace(
            q=out[13 * A : 13 * A + D],
            qd=out[13 * A + D : 13 * A + 2 * D],
            net_contact_force=out[13 * A + 2 * D : NS].reshape(B, 3),
        )
        if self.n_fc and state.contact_lam is not None and \
                state.contact_lam.shape[-2:] == (self.engine.tables.n_con, 4):
            lam_out = out[NS:].reshape(self.n_fc, 4)
            st = st._replace(
                contact_lam=state.contact_lam.at[self.fc_idx].set(lam_out)
            )
        return self.engine.refresh(st)
