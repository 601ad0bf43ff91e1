"""MPPIisaacPlanner — the planner orchestrator.

API parity with the reference's class of the same name
(`/root/reference` `mppiisaac/planner/mppi_isaac.py:18-137`): `compute_action`,
`compute_action_tensor`, `reset_rollout_sim`, `command`, `get_rollouts`,
`update_weights`, `update_mppi_params`, `add_to_env`.

Architecture inversion: the reference's dynamics callback mutates a stateful
C++ sim and returns a placeholder; here dynamics/cost are pure functions over
a K-batched SimState pytree and the whole `command()` is one jitted XLA
program (sample → H-step lax.scan rollout → cost → update). Rollout-sim reset
is just "broadcast the world state K-wide" — exact, including rigid-body state
the reference cannot restore (`mppi_isaac.py:101-105`).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mppi.solver import MPPIPlanner
from ..runtime.sim import Simulation, broadcast_state, sample_model_params
from ..runtime.transport import bytes_to_jnp, jnp_to_bytes
from ..utils.config_store import ExampleConfig
from .observables import SimView


class MPPIisaacPlanner:
    def __init__(
        self,
        cfg: ExampleConfig,
        objective,
        prior: Optional[Callable] = None,
        randomize: bool = True,
        use_fused: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.objective = objective
        self._prior = prior
        self._randomize = randomize
        self._use_fused = use_fused
        K = cfg.mppi.num_samples

        self.sim = Simulation(
            cfg=cfg.isaacgym,
            actors=cfg.actors,
            init_positions=cfg.initial_actor_positions,
            num_envs=K,
            device=cfg.mppi.device,
            randomize=randomize,
            seed=cfg.mppi.seed_val,
        )
        self._build_solver()

    def _build_solver(self):
        """(Re)build everything downstream of the sim: rollout closures, the
        fused kernel, the MPPI solver and the jitted full-command program.
        Called from __init__ and whenever the scene (add_to_env) or a
        structural solver knob (update_mppi_params) changes — the functional
        analog of the reference's planner rebuild (`mppi_isaac.py:129-137`)."""
        cfg = self.cfg
        objective = self.objective
        prior = self._prior
        randomize = self._randomize
        use_fused = self._use_fused
        K = cfg.mppi.num_samples
        if self.sim.num_envs != K:
            # num_samples changed: the rollout sim is K-batched → rebuild it
            # (the reference's rollout sim is likewise num_envs=K)
            self.sim = Simulation(
                cfg=cfg.isaacgym,
                actors=cfg.actors,
                init_positions=cfg.initial_actor_positions,
                num_envs=K,
                device=cfg.mppi.device,
                randomize=randomize,
                seed=cfg.mppi.seed_val,
            )
        built = self.sim.built
        engine = self.sim.engine
        params_K = self.sim.params if randomize else None
        if params_K is None:
            params_K = sample_model_params(built, engine, K, seed=cfg.mppi.seed_val)
        self._params_K = params_K

        # PER-SAMPLE rollout functions (the solver vmaps the whole H-scan over
        # K — vmap-of-scan, see mppi/solver.py). The rollout "state" is
        # (SimState, ModelParams) so per-env domain randomization rides along.
        def dynamics(state, u, t):
            st, pr = state
            st = st._replace(dof_target=built.cmd_map.apply(u, st.q))
            return (engine.step(st, pr), pr)

        def running_cost(state, t):
            st, _ = state
            return self.objective.compute_cost(SimView(built, st))

        if built.visualize_bodies:
            vb = built.visualize_bodies[0]

            def vis_fn(state):
                return state[0].body_pos[vb]
        else:
            vis_fn = None

        # two prior forms (mppi/solver.py): a `.tape(view, t0) -> (H, nu)`
        # prior is evaluated once per command outside the rollout and is
        # fused-kernel-compatible; a `.compute_command(view)` prior is a
        # closed-loop per-step callback (XLA rollout only — the reference's
        # fabrics form, `mppi_isaac.py:38-41`)
        prior_fn = tape_fn = None
        if prior is not None and hasattr(prior, "tape"):
            def tape_fn(state_single, t0):
                return prior.tape(SimView(built, state_single[0]), t0)
        elif prior is not None:
            def prior_fn(state, t):
                return prior.compute_command(SimView(built, state[0]))

        # fused Pallas rollout: one kernel for the whole H×substeps×physics×
        # cost rollout — used when the objective provides a kernel cost and we
        # are on a real accelerator (interpret mode is available for tests)
        if use_fused is None:
            use_fused = (
                hasattr(objective, "kernel_cost")
                and prior_fn is None
                and jax.default_backend() not in ("cpu",)
            )
        fused = None
        if use_fused and hasattr(objective, "kernel_cost"):
            from ..ops.pallas.fused_rollout import FusedRollout

            fused = FusedRollout(
                built,
                engine,
                cost_fn=objective.kernel_cost(built.scene),
                H=cfg.mppi.horizon,
                K=K,
                vis_body=built.visualize_bodies[0] if built.visualize_bodies else None,
                interpret=jax.default_backend() == "cpu",
                impulse_sweeps=cfg.mppi.rollout_sweeps,
                world_fidelity=cfg.mppi.rollout_fidelity != "fast",
                substeps=cfg.mppi.rollout_substeps,
                manifold=getattr(cfg.mppi, "rollout_manifold", "full"),
            )

        self.mppi = MPPIPlanner(
            cfg.mppi,
            cfg.nx,
            dynamics=dynamics,
            running_cost=running_cost,
            prior=prior_fn,
            tape_prior=tape_fn,
            vis_fn=vis_fn,
            fused=fused,
        )
        self._last_vis = None

        # fully-jitted control step: broadcast world state K-wide + command in
        # ONE program (per-op dispatch on this backend costs ~20µs; a dozen
        # host-dispatched broadcasts add ~100ms otherwise)
        def _full(carry, world_state):
            def bc(x):
                return jnp.broadcast_to(x[0], (K,) + x.shape[1:])

            state_K = jax.tree.map(bc, world_state)
            return self.mppi._command_impl(carry, (state_K, self._params_K))

        self._full_command = jax.jit(_full)

    # ------------------------------------------------------------------
    @property
    def built(self):
        return self.sim.built

    def fused_factory(self):
        """``K_shard -> FusedRollout`` for the multi-chip sharded path
        (parallel/sharding.sharded_command): every shard gets the fused
        Pallas kernel over its own K/n lanes. None when the objective has no
        kernel cost."""
        objective = self.objective
        if not hasattr(objective, "kernel_cost"):
            return None
        built, engine, cfg = self.built, self.sim.engine, self.cfg

        def make(K_shard):
            from ..ops.pallas.fused_rollout import FusedRollout

            return FusedRollout(
                built, engine,
                cost_fn=objective.kernel_cost(built.scene),
                H=cfg.mppi.horizon, K=K_shard,
                vis_body=built.visualize_bodies[0] if built.visualize_bodies else None,
                interpret=jax.default_backend() == "cpu",
                impulse_sweeps=cfg.mppi.rollout_sweeps,
                world_fidelity=cfg.mppi.rollout_fidelity != "fast",
                substeps=cfg.mppi.rollout_substeps,
                manifold=getattr(cfg.mppi, "rollout_manifold", "full"),
            )

        return make

    def _retrace(self):
        """Re-trace every compiled program that closes over the objective /
        prior / weights (the fused kernel's cost_fn closure included)."""
        self.mppi.retrace()
        self._full_command = jax.jit(self._full_command.__wrapped__)

    def update_objective(self, objective):
        """Replace the objective (benchmark setGoal path). The fused kernel's
        cost_fn is a closure over the OLD objective instance — rebuild it from
        the new one before retracing, or trials 2+ keep chasing trial 1's
        goal."""
        self.objective = objective
        if self.mppi.fused is not None and hasattr(objective, "kernel_cost"):
            self.mppi.fused.cost_fn = objective.kernel_cost(self.built.scene)
        self._retrace()

    # ------------------------------------------------------------------
    def _command_from_current_state(self) -> jnp.ndarray:
        action = self.mppi.command((self.sim.state, self._params_K))
        self._last_vis = self.mppi.last_info.get("vis")
        return action

    def compute_action(self, q, qdot, obst=None, obst_tensor=None) -> np.ndarray:
        """Direct-call entry (benchmark path, reference `mppi_isaac.py:71-85`)."""
        self.sim.reset_root_state()
        self.sim.reset_robot_state(q, qdot)
        if obst is not None:
            self.sim.update_root_state_by_obstacles(obst)
        if obst_tensor is not None:
            self.sim.update_root_state_by_obstacles(
                [np.asarray(o)[:3] for o in obst_tensor]
            )
        self.sim.save_root_state()
        return np.asarray(self._command_from_current_state())

    def reset_rollout_sim(self, dof_state_tensor, root_state_tensor):
        dof = bytes_to_jnp(dof_state_tensor)       # (D,2) or flat (2D,)
        root = bytes_to_jnp(root_state_tensor)     # (A,13)
        if dof.ndim == 1:
            dof = dof.reshape(-1, 2)
        A = self.sim.built.scene.nactor
        if root.reshape(-1, 13).shape[0] != A:
            raise ValueError(
                f"root_state covers {root.reshape(-1, 13).shape[0]} actors but the "
                f"planner scene has {A} — after add_to_env the world must send "
                f"state for the SAME actor list (reference restarts both sims)"
            )
        K = self.cfg.mppi.num_samples
        st = self.sim.state
        st = st.with_dof_state(jnp.broadcast_to(dof, (K,) + dof.shape))
        st = st.with_root_state(jnp.broadcast_to(root, (K,) + root.shape))
        self.sim.state = self.sim._refresh_fn(st)

    def reset_rollout_from_state(self, world_state):
        """Zero-copy on-device path: broadcast a 1-env world SimState K-wide
        (collapses the reference's serialize→TCP→deserialize round-trip,
        `transport.py:5-14` + `mppi_isaac.py:87-99`)."""
        K = self.cfg.mppi.num_samples

        def bc(x):
            return jnp.broadcast_to(x[0], (K,) + x.shape[1:])

        self.sim.state = jax.tree.map(bc, world_state)

    def compute_action_from_state(self, world_state) -> jnp.ndarray:
        self.objective.reset()
        action, self.mppi.carry, info = self._full_command(self.mppi.carry, world_state)
        self.mppi.last_info = info
        self._last_vis = info.get("vis")
        if self.cfg.mppi.u_per_command == 1:
            return action[0]
        return action

    def compute_action_tensor(self, dof_state_tensor, root_state_tensor) -> bytes:
        """RPC-facing entry (reference `mppi_isaac.py:107-110`)."""
        self.objective.reset()
        self.reset_rollout_sim(dof_state_tensor, root_state_tensor)
        return self.command()

    def command(self) -> bytes:
        return jnp_to_bytes(self._command_from_current_state())

    def add_to_env(self, env_cfg_additions):
        """Scene mutation RPC (reference `mppi_isaac.py:115-116` →
        `isaacgym_wrapper.py:423-427`): the sim rebuilds itself with the new
        actors (preserving pre-existing poses), and the solver closures are
        rebuilt over the NEW scene — keeping the mutated actor list, the
        objective, and the prior (a fresh __init__ from the original
        cfg.actors would silently drop all three)."""
        self.sim.add_to_envs(env_cfg_additions)
        self.cfg.actors = list(self.sim.env_cfg)
        self._build_solver()

    def get_rollouts(self) -> bytes:
        """(H, K, 3) visualize-link trajectories of the last command
        (reference `get_rollouts`, `mppi_isaac.py:118-124`)."""
        if self._last_vis is None or self._last_vis.shape[-1] == 0:
            return jnp_to_bytes(np.zeros((1, 1, 1), np.float32))
        return jnp_to_bytes(self._last_vis)

    def get_rollouts_array(self) -> np.ndarray:
        if self._last_vis is None:
            return np.zeros((1, 1, 3), np.float32)
        return np.asarray(self._last_vis)

    def update_weights(self, weights):
        """Online re-tuning RPC (reference `mppi_isaac.py:126-127`). The cost
        closure is traced into the compiled command, so retrace."""
        self.objective.weights = weights
        self._retrace()

    # structural knobs whose change requires a full solver rebuild (shapes /
    # static sampling bases / kernel dims change) — the reference rebuilds its
    # MPPIPlanner wholesale for ANY param change (`mppi_isaac.py:129-137`)
    _STRUCTURAL_PARAMS = frozenset(
        {
            "horizon", "num_samples", "mppi_mode", "sampling_method",
            "u_per_command", "filter_u", "knot_scale", "spline_degree",
        }
    )

    def update_mppi_params(self, params):
        structural = False
        for k, v in params.items():
            if k == "noise_sigma":
                continue
            if hasattr(self.cfg.mppi, k):
                setattr(self.cfg.mppi, k, v)
                # the solver holds a resolved COPY of the config — mirror
                # non-structural fields onto it so the retrace sees them
                setattr(self.mppi.cfg, k, v)
                if k in self._STRUCTURAL_PARAMS:
                    structural = True
        if structural:
            self._build_solver()
        if "noise_sigma" in params:
            self.mppi.update_noise_sigma(params["noise_sigma"])
        if not structural:
            # non-structural fields (lambda_, u_scale, bounds, …) are traced
            # constants inside the compiled command — retrace to apply them
            non_noise = [k for k in params if k != "noise_sigma"]
            if non_noise:
                self._retrace()
