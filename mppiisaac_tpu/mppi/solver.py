"""The MPPI solver — functional JAX core with full knob parity to the
reference's external `mppi_torch` dep (SURVEY §2.2 table; contract observed at
`/root/reference` `mppi_isaac.py:43-49` and `benchmarks/point_robot/setup/mppi.yaml`).

Design (TPU-first, not a translation):
* `command()` is ONE jitted XLA program: Cranley–Patterson-randomized Halton
  (or Gaussian) noise → `lax.scan` over the horizon stepping the K-batched
  dynamics → per-step batched costs → softmax weighting → control update.
  The reference crosses the Python↔CUDA boundary H times per command and a
  TCP hop besides; here nothing leaves the chip.
* Sampling bases (Halton tables, B-spline interpolation matrix, Savitzky–
  Golay coefficients) are deterministic → precomputed host-side once and
  closed over as constants.
* Solver state (U, λ, Σ, PRNG key) is an explicit pytree `MppiCarry`, so the
  whole planner can itself be vmapped/scanned/sharded (e.g. ensembles).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import MPPIConfig
from .sampling import bspline_interp_matrix, halton, savgol_coeffs


class MppiCarry(NamedTuple):
    U: jnp.ndarray          # (H, nu) nominal control sequence
    lambda_: jnp.ndarray    # () temperature
    sigma: jnp.ndarray      # (nu, nu) sampling covariance
    key: jnp.ndarray        # PRNG key
    t0: Any = 0             # () int32 — world control steps executed so far
                            # (phase clock for time-indexed tape priors)


class MPPIPlanner:
    """dynamics: (state, u (nu,), t) -> state   — PER-SAMPLE pytree step
    running_cost: (state, t) -> () cost        — per-sample
    prior: optional (state, t) -> (nu,) command, applied to one sample
      CLOSED-LOOP inside the rollout (XLA path only — a state-dependent
      per-step callback cannot ride the fused kernel).
    tape_prior: optional (state_single, t0) -> (H, nu) control tape, computed
      ONCE per command from the measured world state and the global step clock
      and injected as one sample's full control sequence. Works on BOTH the
      XLA and fused paths (it never enters the rollout kernel). This is the
      natural form for rhythmic priors (quadruped gaits) where phase
      continuity across commands matters more than per-step feedback.
    vis_fn: optional (state) -> (d,) per-step visualization payload

    The planner vmaps the whole per-sample H-step rollout over K
    (vmap-of-scan). This layout matters on TPU: it keeps the batch dimension
    innermost in the loop nest, which XLA schedules ~100× better than
    scan-of-vmapped-body on the same ops. `command(state0)` expects state0
    K-batched on the leading axis (broadcast your world state).
    """

    def __init__(
        self,
        cfg: MPPIConfig,
        nx: int,
        dynamics: Callable,
        running_cost: Callable,
        prior: Optional[Callable] = None,
        vis_fn: Optional[Callable] = None,
        fused=None,
        tape_prior: Optional[Callable] = None,
    ):
        # `fused`: optional ops.pallas.fused_rollout.FusedRollout — replaces
        # the vmap-of-scan rollout with one Pallas kernel (state0 must then be
        # a (SimState_K, ModelParams_K) tuple)
        self.fused = fused
        self.nx = nx
        nu = np.asarray(cfg.noise_sigma, dtype=np.float64).shape[0] if cfg.noise_sigma is not None else nx
        self.nu = nu
        self.cfg = cfg.resolved(nu)
        self.dynamics = dynamics
        self.running_cost = running_cost
        self.prior = prior
        self.tape_prior = tape_prior
        self.vis_fn = vis_fn

        c = self.cfg
        K, H = c.num_samples, c.horizon

        # ---- static sampling bases ----
        if c.mppi_mode == "halton-spline":
            n_knots = max(c.spline_degree + 1, H // c.knot_scale)
            self._interp = jnp.asarray(
                bspline_interp_matrix(n_knots, H, c.spline_degree), jnp.float32
            )
            sample_dims = n_knots * nu
            self._n_knots = n_knots
        else:
            self._interp = None
            sample_dims = H * nu
            self._n_knots = H
        if c.sampling_method == "halton":
            # full-width table: ghalton has no dimension cap, and tiling a
            # capped table would correlate noise across horizon steps
            self._halton_base = jnp.asarray(halton(K, sample_dims, skip=1), jnp.float32)
            self._halton_dims = sample_dims
            self._sample_dims = sample_dims
        else:
            self._halton_base = None
            self._sample_dims = sample_dims

        if c.filter_u:
            w = min(H if H % 2 == 1 else H - 1, 9)
            self._sg = jnp.asarray(savgol_coeffs(w, 2), jnp.float32) if w >= 5 else None
        else:
            self._sg = None

        # when set (parallel.sharding), softmax reductions become cross-chip
        # collectives over this mesh axis; n_shards lets special samples
        # (null action, prior tape) land on exactly ONE shard — the last,
        # which owns global sample indices K_total-1 / K_total-2 under the
        # global-Halton-slice layout — so the sharded sample set is identical
        # to the single-device one instead of carrying n duplicates
        self.axis_name: Optional[str] = None
        self.n_shards: int = 1

        self._command = jax.jit(self._command_impl)
        self.carry = self.init_carry()

    # ------------------------------------------------------------------
    def init_carry(self) -> MppiCarry:
        c = self.cfg
        U0 = (
            jnp.asarray(c.U_init, jnp.float32)
            if c.U_init is not None
            else jnp.broadcast_to(jnp.asarray(c.u_init, jnp.float32), (c.horizon, self.nu)).copy()
        )
        return MppiCarry(
            U=U0,
            lambda_=jnp.asarray(c.lambda_, jnp.float32),
            sigma=jnp.asarray(c.noise_sigma, jnp.float32),
            key=jax.random.PRNGKey(c.seed_val),
            t0=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _sample_noise(self, key, sigma):
        """→ (K, H, nu) noise ε with covariance `sigma` per (sample, step)."""
        c = self.cfg
        K, H, nu = c.num_samples, c.horizon, self.nu
        L = jnp.linalg.cholesky(
            sigma + jnp.eye(nu, dtype=sigma.dtype) * 1e-8
        )
        if c.sampling_method == "halton":
            # Cranley–Patterson rotation refreshes the deterministic table
            shift = jax.random.uniform(key, (self._sample_dims,))
            base = self._halton_base
            if base.shape[0] != K:
                # sharded solver: the table is the GLOBAL K_total-point set and
                # this shard owns a distinct K-row slice — the union of shards
                # stays one low-discrepancy set (same CP shift everywhere)
                idx = jax.lax.axis_index(self.axis_name) * K
                base = jax.lax.dynamic_slice_in_dim(base, idx, K, 0)
            u01 = jnp.mod(base + shift, 1.0)
            z = jax.scipy.special.ndtri(jnp.clip(u01, 1e-6, 1 - 1e-6))
            z = z.reshape(K, self._n_knots, nu)
        else:
            z = jax.random.normal(key, (K, self._n_knots, nu))
        eps = jnp.einsum("ktj,ij->kti", z, L) + jnp.asarray(c.noise_mu, jnp.float32)
        if self._interp is not None:
            # (H, n_knots) @ (K, n_knots, nu) → (K, H, nu)
            eps = jnp.einsum("ht,ktn->khn", self._interp, eps)
        return eps

    # ------------------------------------------------------------------
    def _command_impl(self, carry: MppiCarry, state0):
        c = self.cfg
        K, H, nu = c.num_samples, c.horizon, self.nu
        key, sub = jax.random.split(carry.key)
        eps = self._sample_noise(sub, carry.sigma)            # (K,H,nu)

        u_min = jnp.asarray(c.u_min, jnp.float32)
        u_max = jnp.asarray(c.u_max, jnp.float32)
        # special samples (null action / prior tape) occupy the LAST global
        # sample slots; when sharded, only the last shard injects them so the
        # global sample set matches the single-device one exactly
        if self.axis_name is not None and self.n_shards > 1:
            on_edge = jax.lax.axis_index(self.axis_name) == (self.n_shards - 1)
        else:
            on_edge = jnp.asarray(True)
        V = jnp.clip(carry.U[None] + eps, u_min, u_max)       # (K,H,nu)
        if c.sample_null_action:
            V = V.at[K - 1].set(jnp.where(on_edge, 0.0, V[K - 1]))
        if self.tape_prior is not None and c.use_priors:
            # one sample rolls the prior's full tape; eps_eff below uses the
            # ACTUAL controls so a winning tape drags U toward the tape itself
            st1 = jax.tree.map(lambda x: x[0], state0)
            tape = jnp.clip(
                self.tape_prior(st1, carry.t0).astype(jnp.float32), u_min, u_max
            )
            if c.prior_blend > 0.0:
                # biased MPPI: shift the sampling MEAN toward the tape. The
                # importance term below still measures deviation from U, so a
                # good blend drags U toward the tape and a bad one decays it.
                a = jnp.float32(c.prior_blend)
                V = jnp.clip((1 - a) * carry.U[None] + a * tape[None] + eps, u_min, u_max)
                if c.sample_null_action:
                    V = V.at[K - 1].set(jnp.where(on_edge, 0.0, V[K - 1]))
            V = V.at[K - 2].set(jnp.where(on_edge, tape, V[K - 2]))
        eps_eff = V - carry.U[None]

        sigma_inv = jnp.linalg.inv(
            carry.sigma + jnp.eye(nu, dtype=carry.sigma.dtype) * 1e-8
        )

        gamma = jnp.asarray(c.rollout_var_discount, jnp.float32) ** jnp.arange(H)
        ts = jnp.arange(H)
        use_prior = self.prior is not None and c.use_priors
        roles = jnp.zeros(K, jnp.int32)
        if use_prior:
            roles = roles.at[K - 2].set(jnp.where(on_edge, 1, 0))

        if self.fused is not None:
            sim_state_K, params_K = state0
            costs, vis = self.fused.rollout(sim_state_K, params_K, V * c.u_scale)
        else:
            def rollout_one(state, V_k, role):
                def body(st, inp):
                    t, u_t = inp                               # u_t (nu,)
                    if use_prior:
                        pu = jnp.clip(self.prior(st, t), u_min, u_max)
                        u_t = jnp.where(role == 1, pu, u_t)
                    st = self.dynamics(st, u_t * c.u_scale, t)
                    cost = self.running_cost(st, t)
                    vis = self.vis_fn(st) if self.vis_fn is not None else jnp.zeros((0,))
                    return st, (cost, vis, u_t)

                _, (costs_k, vis_k, u_k) = jax.lax.scan(body, state, (ts, V_k))
                return costs_k, vis_k, u_k                     # (H,), (H,d), (H,nu)

            costs, vis, u_seq = jax.vmap(rollout_one)(state0, V, roles)  # (K,H), ...
            vis = jnp.swapaxes(vis, 0, 1)                      # (H,K,d)
            if use_prior:
                # the prior sample applies closed-loop actions, not its drawn
                # noise — the softmax update must use the ACTUAL controls or a
                # winning prior sample drags U toward unrelated noise
                eps_eff = u_seq - carry.U[None]

        # action (control-noise) cost — MPPI information-theoretic term
        if c.noise_abs_cost:
            act_cost = carry.lambda_ * jnp.einsum(
                "khj,ij->khi", jnp.abs(eps_eff), jnp.abs(sigma_inv)
            )
            action_cost = jnp.sum(jnp.abs(carry.U[None]) * act_cost, axis=(-1, -2))
        else:
            act_cost = carry.lambda_ * jnp.einsum("khj,ij->khi", eps_eff, sigma_inv)
            action_cost = jnp.sum(carry.U[None] * act_cost, axis=(-1, -2))

        S = jnp.sum(costs * gamma[None], axis=1) + action_cost  # (K,)
        ax = self.axis_name
        beta = jnp.min(S)
        if ax is not None:
            beta = jax.lax.pmin(beta, ax)
        scaled = -(S - beta) / jnp.maximum(carry.lambda_, 1e-6)
        eta = jnp.sum(jnp.exp(scaled))
        if ax is not None:
            eta = jax.lax.psum(eta, ax)
        w = jnp.exp(scaled) / eta                               # (K,) global weights

        dU = jnp.einsum("k,khn->hn", w, eps_eff)
        if ax is not None:
            dU = jax.lax.psum(dU, ax)
        U_new = carry.U + dU
        if self._sg is not None:
            half = self._sg.shape[0] // 2
            Upad = jnp.concatenate(
                [U_new[:1].repeat(half, 0), U_new, U_new[-1:].repeat(half, 0)], 0
            )
            U_new = jnp.stack(
                [
                    jnp.einsum(
                        "w,wn->n", self._sg, jax.lax.dynamic_slice_in_dim(Upad, t, self._sg.shape[0], 0)
                    )
                    for t in range(H)
                ]
            )
        U_new = jnp.clip(U_new, u_min, u_max)

        action = U_new[: c.u_per_command] * c.u_scale          # (u_per_command, nu)

        # shift for next iteration
        U_shift = jnp.concatenate(
            [
                U_new[c.u_per_command :],
                jnp.broadcast_to(
                    jnp.asarray(c.u_init, jnp.float32), (c.u_per_command, nu)
                ),
            ]
        )

        lam = carry.lambda_
        if c.update_lambda:
            lam = jnp.where(
                eta > c.eta_u_bound,
                lam * 0.9,
                jnp.where(eta < c.eta_l_bound, lam * 1.1, lam),
            )
            lam = jnp.clip(lam, 1e-4, 1e2)

        sigma = carry.sigma
        if c.update_cov:
            weighted = jnp.einsum("k,khi,khj->ij", w, eps_eff, eps_eff) / H
            if ax is not None:
                weighted = jax.lax.psum(weighted, ax)
            sigma = 0.9 * sigma + 0.1 * weighted
            sigma = sigma + jnp.eye(nu, dtype=sigma.dtype) * 1e-5

        new_carry = MppiCarry(
            U=U_shift, lambda_=lam, sigma=sigma, key=key,
            t0=carry.t0 + c.u_per_command,
        )
        info = {
            "costs": S,
            "weights": w,
            "eta": eta,
            "vis": vis,          # (H, K, d) per-step visualization payload
            "best_cost": beta,
        }
        return action, new_carry, info

    # ------------------------------------------------------------------
    def command(self, state0):
        """Stateful convenience wrapper (parity with mppi_torch's
        `MPPIPlanner.command(state)`, `mppi_isaac.py:84,113`). Returns the
        (u_per_command, nu) action (squeezed to (nu,) when 1)."""
        action, self.carry, self.last_info = self._command(self.carry, state0)
        if self.cfg.u_per_command == 1:
            return action[0]
        return action

    def reset(self):
        self.carry = self.init_carry()

    def retrace(self):
        """Drop the compiled command so closures (objective weights, priors)
        re-trace with their current values — the functional analog of the
        reference's planner rebuild in `update_mppi_params`
        (`mppi_isaac.py:129-137`)."""
        self._command = jax.jit(self._command_impl)
        if self.fused is not None:
            self.fused.retrace()

    def update_noise_sigma(self, sigma):
        """Online re-tuning (parity: `update_mppi_params` rebuilds the planner,
        `mppi_isaac.py:129-137` — here it's one pytree field)."""
        self.cfg.noise_sigma = np.asarray(sigma, dtype=np.float64)
        self.carry = self.carry._replace(sigma=jnp.asarray(sigma, jnp.float32))
