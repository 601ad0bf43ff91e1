"""Single-process control loop: world sim + MPPI planner in one process.

The reference splits world and planner across two processes over zerorpc TCP
solely because Isaac Gym can't host two sims in one process
(`/root/reference` `docs/source/structure.rst:37`, `examples/panda/world.py:33-59`).
A JAX sim has no such constraint — world and rollout sims are two pytrees —
so the split collapses and the per-step TCP round-trip disappears (the
BASELINE.json north-star structure). Real-time pacing + FPS/RT metrics parity:
`examples/panda/world.py:52-59`.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..planner.mppi_isaac import MPPIisaacPlanner
from ..utils.config_store import ExampleConfig
from .sim import Simulation


@dataclass
class LoopMetrics:
    fps: List[float] = field(default_factory=list)
    rt_factor: List[float] = field(default_factory=list)
    solver_time: List[float] = field(default_factory=list)
    path_length: float = 0.0
    steps: int = 0
    success_step: Optional[int] = None
    final_state_finite: bool = True

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "mean_fps": float(np.mean(self.fps)) if self.fps else 0.0,
            "mean_rt": float(np.mean(self.rt_factor)) if self.rt_factor else 0.0,
            "mean_solver_time_ms": float(np.mean(self.solver_time) * 1e3) if self.solver_time else 0.0,
            "path_length": self.path_length,
            "success_step": self.success_step,
            "time2goal": (None if self.success_step is None else self.success_step),
        }


def run_task(
    cfg: ExampleConfig,
    objective,
    prior=None,
    n_steps: Optional[int] = None,
    real_time: bool = False,
    success_fn: Optional[Callable] = None,
    observer: Optional[Callable] = None,
    verbose: bool = False,
    randomize: bool = True,
    device_steps: int = 1,
    chunk_observer: Optional[Callable] = None,
    use_fused: Optional[bool] = None,
) -> LoopMetrics:
    """success_fn(world: Simulation) -> bool; observer(step, world, action).

    device_steps > 1 runs that many control steps (plan + world step) as ONE
    jitted on-device scan between host round-trips. The host↔device dispatch
    on this backend costs ~47 ms per call regardless of payload — more than
    the 10 ms planner kernel itself — so per-step host dispatch caps the loop
    at ~15 Hz while the chunked loop amortizes one round-trip over N steps.
    Success detection stays exact: the scan stacks every intermediate world
    state and the host replays them against success_fn once per chunk.
    (Per-step host observers / real-time pacing force device_steps=1.)"""
    world = Simulation(
        cfg=cfg.isaacgym,
        actors=cfg.actors,
        init_positions=cfg.initial_actor_positions,
        num_envs=1,
    )
    # place the goal marker from cfg.goal (the reference moves it via viewer
    # teleop; headless runs set it here; rollouts read it from world state)
    if getattr(cfg, "goal", None) is not None and "goal" in [s_.name for s_ in world.built.specs]:
        # preserve the goal MARKER's configured height when cfg.goal is 2D
        # (the reference leaves the marker at its yaml pose, z=0.5 — a z=0
        # goal drags 3D-distance objectives downward by the body height)
        gp = np.asarray(world.get_actor_position_by_name("goal"))[0].astype(np.float64)
        g = np.asarray(cfg.goal, dtype=np.float64).reshape(-1)
        gp[: len(g)] = g[:3]
        world.set_actor_position_by_name("goal", gp)
    planner = MPPIisaacPlanner(cfg, objective, prior, randomize=randomize,
                               use_fused=use_fused)
    metrics = LoopMetrics()
    n = n_steps if n_steps is not None else cfg.n_steps
    dt = cfg.isaacgym.dt
    prev_pos = None

    if device_steps > 1 and observer is None and not real_time:
        return _run_chunked(
            cfg, world, planner, metrics, n, dt, device_steps,
            success_fn=success_fn, verbose=verbose,
            chunk_observer=chunk_observer,
        )

    for step in range(n):
        t0 = time.perf_counter()
        action = planner.compute_action_from_state(world.state)
        action = jax.block_until_ready(action)
        t1 = time.perf_counter()
        # device arrays flow straight into the world step — the only host
        # fetch below is ONE batched device_get (each small transfer is a
        # full host<->device round-trip; N separate np.asarray calls would
        # serialize N of them into the loop)
        world.apply_robot_cmd(action)
        world.step()
        action_h, rp = jax.device_get((action, world.state.root_pos[0, 0]))
        t2 = time.perf_counter()

        metrics.solver_time.append(t1 - t0)
        actual = t2 - t0
        metrics.fps.append(1.0 / max(actual, 1e-9))
        metrics.rt_factor.append(dt / max(actual, 1e-9))
        metrics.steps = step + 1

        # path length of the first robot's root/ee
        if prev_pos is not None:
            metrics.path_length += float(np.linalg.norm(rp - prev_pos))
        prev_pos = rp
        action = action_h

        if observer is not None:
            observer(step, world, action)
        if verbose:
            print(
                f"step {step}: FPS {metrics.fps[-1]:8.1f}  RT {metrics.rt_factor[-1]:6.2f}  "
                f"solver {metrics.solver_time[-1]*1e3:7.2f} ms"
            )
        if success_fn is not None and metrics.success_step is None and success_fn(world):
            metrics.success_step = step
            break
        if real_time and actual < dt:
            time.sleep(dt - actual)
    metrics.final_state_finite = bool(
        all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree.leaves(world.state)
        )
    )
    return metrics


def _run_chunked(
    cfg, world, planner, metrics, n, dt, device_steps,
    success_fn=None, verbose=False, chunk_fns=None, chunk_observer=None,
) -> LoopMetrics:
    """N control steps per host round-trip: scan(plan → apply → world-step)
    entirely on device, stacking each post-step world SimState; the host
    fetches the small stacked states once per chunk for success/metrics.
    chunk_fns: optional prebuilt (chunk, unpack) from _build_chunk — reusing
    it across episodes skips the (minutes-long on this backend) re-jit."""
    if chunk_fns is None:
        chunk_fns = _build_chunk(cfg, world, planner, device_steps)
    chunk, _unpack = chunk_fns
    step = 0
    prev_pos = None
    while step < n:
        t0 = time.perf_counter()
        planner.objective.reset()
        carry, wstate, packed = chunk(planner.mppi.carry, world.state)
        planner.mppi.carry = carry
        world.state = wstate
        states_list, actions_h = _unpack(np.asarray(packed))
        t1 = time.perf_counter()

        per = (t1 - t0) / device_steps
        for i in range(device_steps):
            if step >= n:
                break
            metrics.solver_time.append(per)
            metrics.fps.append(1.0 / max(per, 1e-9))
            metrics.rt_factor.append(dt / max(per, 1e-9))
            metrics.steps = step + 1
            rp = np.asarray(states_list[i].root_pos[0, 0])
            if prev_pos is not None:
                metrics.path_length += float(np.linalg.norm(rp - prev_pos))
            prev_pos = rp
            if chunk_observer is not None:
                # host-side observer on the stacked post-step states: per-step
                # telemetry WITHOUT forcing the (minutes-to-compile on this
                # backend) device_steps=1 loop — diagnostics reuse the cached
                # chunked program
                chunk_observer(step, _StateProxy(world, states_list[i]),
                               actions_h[i])
            if success_fn is not None and metrics.success_step is None:
                world_i = _StateProxy(world, states_list[i])
                if success_fn(world_i):
                    metrics.success_step = step
                    # rewind the live world to the success step
                    world.state = world_i.state
                    break
            step += 1
        if verbose:
            print(
                f"chunk @{metrics.steps}: {per*1e3:7.2f} ms/step  RT {dt/max(per,1e-9):6.2f}"
            )
        if metrics.success_step is not None:
            break
    metrics.final_state_finite = bool(
        all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree.leaves(world.state)
        )
    )
    return metrics


def _build_chunk(cfg, world, planner, device_steps):
    """Jit the device-side N-step scan once; returns (chunk, unpack)."""
    cmd_map = world.built.cmd_map
    world_step = world._step_fn          # jitted; inlined when traced below
    full_command = planner._full_command
    u_pc = cfg.mppi.u_per_command

    def body(carry, _):
        mppi_carry, wstate = carry
        action, mppi_carry, _info = full_command(mppi_carry, wstate)
        u = action if u_pc == 1 else action[:1]     # (1, nu) = (num_envs, nu)
        wstate = wstate._replace(dof_target=cmd_map.apply(u, wstate.q))
        wstate = world_step(wstate, world.params)
        return (mppi_carry, wstate), (action[0], wstate)

    # the host fetch must be ONE buffer: this backend charges a full
    # round-trip per fetched array (~25-45 ms), and a stacked SimState pytree
    # is ~15 leaves — packing device-side turns ~3 s/chunk of transfers into
    # one ~45 ms fetch
    tmpl_leaves, tree_def = jax.tree.flatten(world.state)
    leaf_shapes = [tuple(l.shape) for l in tmpl_leaves]
    leaf_sizes = [int(np.prod(s)) if s else 1 for s in leaf_shapes]

    @jax.jit
    def chunk(mppi_carry, wstate):
        (mppi_carry, wstate), (actions, states) = jax.lax.scan(
            body, (mppi_carry, wstate), None, length=device_steps
        )
        flat = jnp.concatenate(
            [
                l.reshape(device_steps, -1).astype(jnp.float32)
                for l in jax.tree.leaves(states)
            ],
            axis=1,
        )
        packed = jnp.concatenate(
            [flat, actions.reshape(device_steps, -1).astype(jnp.float32)], axis=1
        )
        return mppi_carry, wstate, packed

    def _unpack(packed_h):
        """(N, X) host array → (list of per-step SimState, actions)."""
        acts = packed_h[:, sum(leaf_sizes):]
        states = []
        for i in range(device_steps):
            row, off, leaves = packed_h[i], 0, []
            for sz, sh in zip(leaf_sizes, leaf_shapes):
                leaves.append(row[off: off + sz].reshape(sh))
                off += sz
            states.append(jax.tree.unflatten(tree_def, leaves))
        return states, acts

    return chunk, _unpack


def run_task_episodes(
    cfg: ExampleConfig,
    objective,
    seeds,
    prior=None,
    n_steps: Optional[int] = None,
    success_fn: Optional[Callable] = None,
    device_steps: int = 16,
    randomize: bool = True,
    verbose: bool = False,
):
    """Multi-episode protocol on ONE build: the world, planner, and the
    chunked device loop are constructed and compiled once, then each seed
    runs a fresh episode (initial poses restored, solver carry re-keyed).
    This is the reference's tuning/benchmark episode loop
    (`examples/panda_pick/tuning.py:74-113`, reset via
    `reset_to_initial_poses`) minus the per-episode sim rebuild — on this
    backend a rebuild costs minutes of recompilation per episode.
    Returns {seed: LoopMetrics}."""
    world = Simulation(
        cfg=cfg.isaacgym,
        actors=cfg.actors,
        init_positions=cfg.initial_actor_positions,
        num_envs=1,
    )
    if getattr(cfg, "goal", None) is not None and "goal" in [s_.name for s_ in world.built.specs]:
        # preserve the goal MARKER's configured height when cfg.goal is 2D
        # (the reference leaves the marker at its yaml pose, z=0.5 — a z=0
        # goal drags 3D-distance objectives downward by the body height)
        gp = np.asarray(world.get_actor_position_by_name("goal"))[0].astype(np.float64)
        g = np.asarray(cfg.goal, dtype=np.float64).reshape(-1)
        gp[: len(g)] = g[:3]
        world.set_actor_position_by_name("goal", gp)
    goal_state = world.state
    planner = MPPIisaacPlanner(cfg, objective, prior, randomize=randomize)
    chunk_fns = _build_chunk(cfg, world, planner, device_steps)
    n = n_steps if n_steps is not None else cfg.n_steps
    dt = cfg.isaacgym.dt

    results = {}
    for seed in seeds:
        world.state = goal_state          # initial poses incl. goal marker
        planner.mppi.carry = planner.mppi.init_carry()._replace(
            key=jax.random.PRNGKey(int(seed))
        )
        metrics = _run_chunked(
            cfg, world, planner, LoopMetrics(), n, dt, device_steps,
            success_fn=success_fn, verbose=verbose, chunk_fns=chunk_fns,
        )
        results[seed] = metrics
        if verbose:
            print(f"seed {seed}: {metrics.summary()}")
    return results


class _StateProxy:
    """Simulation look-alike pinned to one stacked state (success replay)."""

    def __init__(self, world, state):
        self._world = world
        self.state = state
        self.built = world.built

    @property
    def view(self):
        from ..planner.observables import SimView

        return SimView(self.built, self.state)

    def __getattr__(self, name):
        return getattr(self._world, name)
