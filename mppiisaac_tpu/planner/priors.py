"""Prior policies biasing MPPI sampling — capability parity with the
reference's geometric-fabrics priors (`/root/reference` `mppiisaac/priors/`:
`fabrics_point.py:14-62`, `fabrics_panda.py:17-82`). The reference computes an
acceleration from a casadi-backed fabrics planner and integrates it to a
velocity command, with a NaN guard (`fabrics_point.py:56-57`); it is hooked
into the solver as `prior(state, t) → command` (`mppi_isaac.py:38-41`).

Here priors are pure JAX functions of a per-sample SimView (jit/vmap-safe, so
they run INSIDE the rollout at zero host cost — the reference evaluates its
prior once per step outside the GPU). Two analytic priors cover the
reference's two families:

* PointNavigationPrior — attractor + obstacle-repulsor velocity field for
  holonomic bases (the fabrics_point capability).
* ArmJacobianPrior — geometric-Jacobian-transpose end-effector attraction for
  arms (the fabrics_panda capability; FK comes from the engine itself instead
  of re-deriving it from a second URDF).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .observables import SimView


def _nan_guard(u):
    """Zero the command if anything went non-finite (reference
    `fabrics_point.py:56-57`)."""
    bad = ~jnp.all(jnp.isfinite(u))
    return jnp.where(bad, jnp.zeros_like(u), u)


class PointNavigationPrior:
    """Velocity-field prior for planar holonomic robots (nu = 3: vx, vy, ω)."""

    def __init__(
        self,
        robot: str = "point_robot",
        goal_actor: str = "goal",
        obstacle_actors: Sequence[str] = (),
        k_attract: float = 1.0,
        k_repel: float = 0.4,
        influence: float = 1.0,
        max_speed: float = 1.0,
    ):
        self.robot = robot
        self.goal_actor = goal_actor
        self.obstacles = list(obstacle_actors)
        self.k_attract = k_attract
        self.k_repel = k_repel
        self.influence = influence
        self.max_speed = max_speed

    def compute_command(self, view: SimView) -> jnp.ndarray:
        q = view.actor_q(self.robot)
        pos = q[..., :2]
        goal = view.actor_position(self.goal_actor)[..., :2]
        v = self.k_attract * (goal - pos)
        for ob in self.obstacles:
            opos = view.actor_position(ob)[..., :2]
            d = pos - opos
            dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
            rep = self.k_repel * d / jnp.maximum(dist, 1e-3) ** 2
            v = v + jnp.where(dist < self.influence, rep, 0.0)
        speed = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v * jnp.minimum(1.0, self.max_speed / jnp.maximum(speed, 1e-6))
        u = jnp.concatenate([v, jnp.zeros(v.shape[:-1] + (1,))], axis=-1)
        return _nan_guard(u)


class QuadrupedGaitPrior:
    """Rhythmic trot tape for quadrupeds (anymal) — a TIME-INDEXED prior.

    The reference's priors are closed-loop per-step policies; a gait instead
    needs PHASE CONTINUITY across control steps, which the tape-prior form
    provides (mppi/solver.py `tape_prior`): once per command this emits the
    next H steps of a diagonal-trot velocity-target tape, phase-locked to the
    global control-step clock, steered toward the goal from the measured base
    pose. MPPI samples around it; replanning supplies the balance feedback an
    open-loop trot lacks (matches the reference's emergent-gait task,
    `examples/anymal/planner.py:22-48`).

    Joint layout: (HAA, HFE, KFE) × (LF, RF, LH, RH), velocity drive.
    Stance half: HFE pushes the body forward (+push sweeps thighs back);
    swing half: HFE returns, KFE lifts then lowers the foot.
    """

    def __init__(
        self,
        robot: str = "anymal",
        goal_actor: str = "goal",
        H: int = 12,
        dt: float = 0.1,
        freq: float = 1.0,          # gait cycles per second
        push: float = 0.8,          # stance HFE velocity target (rad/s)
        lift: float = 1.5,          # swing KFE velocity target
        k_turn: float = 0.8,        # differential-stride steering gain
        stop_radius: float = 0.4,   # taper stride to zero inside this
        duty: float = 0.5,          # stance fraction (0.5 trot … 0.75 crawl)
        phases=None,                # per-leg phase offsets (LF, RF, LH, RH)
        posture_gain: float = 2.0,  # PD pull of joints toward the rest pose
    ):
        self.robot = robot
        self.goal_actor = goal_actor
        self.H = int(H)
        self.dt = float(dt)
        self.freq = float(freq)
        self.push = float(push)
        self.lift = float(lift)
        self.k_turn = float(k_turn)
        self.stop_radius = float(stop_radius)
        self.duty = float(duty)
        self.posture_gain = float(posture_gain)
        # default = diagonal trot: LF+RH lead, RF+LH a half-period behind;
        # a walking crawl is duty=0.75, phases (0, .5, .75, .25)
        self._phase = np.asarray(
            phases if phases is not None else [0.0, 0.5, 0.5, 0.0], np.float32
        )  # LF RF LH RH
        self._left = np.array([1.0, 0.0, 1.0, 0.0], np.float32)   # LF LH are left

    def tape(self, view: SimView, t0) -> jnp.ndarray:
        from ..physics.math3d import quat_to_yaw

        base = view.link_position("base", self.robot)
        goal = view.actor_position(self.goal_actor)
        quat = view.actor_orientation(self.robot)
        yaw = quat_to_yaw(quat)
        to_goal = goal[..., :2] - base[..., :2]
        dist = jnp.linalg.norm(to_goal)
        hdg_err = jnp.arctan2(to_goal[..., 1], to_goal[..., 0]) - yaw
        hdg_err = jnp.arctan2(jnp.sin(hdg_err), jnp.cos(hdg_err))  # wrap ±π

        stride = jnp.clip(dist / self.stop_radius, 0.0, 1.0)
        fwd = stride * jnp.clip(jnp.cos(hdg_err), 0.0, 1.0)       # gate on facing
        turn = stride * self.k_turn * jnp.sin(hdg_err)
        # left legs shorten stride when turning left (turn > 0), and vice versa
        leg_gain = fwd[None] + turn[None] * jnp.where(
            jnp.asarray(self._left) > 0, -1.0, 1.0
        )                                                          # (4,)

        t = t0 + jnp.arange(self.H)                                # (H,)
        ph = (t[:, None] * (self.dt * self.freq) + self._phase[None]) % 1.0
        d = self.duty
        in_stance = ph < d
        sw = jnp.clip((ph - d) / (1 - d), 0.0, 1.0)                # swing progress
        # swing HFE returns faster than stance pushes so the thigh angle is
        # periodic: push·duty == ret·(1−duty)
        ret = self.push * d / (1 - d)
        hfe = jnp.where(in_stance, self.push, -ret) * leg_gain[None]
        kfe = jnp.where(
            in_stance, 0.0, jnp.where(sw < 0.5, self.lift, -self.lift)
        ) * jnp.maximum(jnp.abs(leg_gain[None]), 0.2 * stride)
        haa = jnp.zeros_like(hfe)
        u = jnp.stack([haa, hfe, kfe], axis=-1).reshape(self.H, 12)  # (H, 4, 3)
        # posture PD: pull every joint back toward the rest pose (q = 0 is the
        # baked X-stance). Open-loop velocity gaits accumulate thigh drift
        # under load asymmetry until the body grounds; this closes that loop
        # through the prior itself (the tape sees the measured state).
        q = view.actor_q(self.robot)
        u = u + self.posture_gain * (-q)[None, :]
        return _nan_guard(u)


class ArmJacobianPrior:
    """Jacobian-transpose EE attraction for fixed-base arms (velocity mode).

    Uses the engine's own FK (body poses in the SimView) — the reference
    rebuilds panda FK from a separate bullet-flavored URDF
    (`fabrics_panda.py:99-101`).
    """

    def __init__(
        self,
        built,                       # BuiltScene (for joint topology)
        robot: str = "panda",
        ee_link: str = "panda_ee_tip",
        goal_actor: str = "goal",
        gain: float = 2.0,
        max_joint_vel: float = 1.0,
        nu: Optional[int] = None,
        obstacle_actors: Sequence[str] = (),
        k_repel: float = 0.3,
        influence: float = 0.5,
    ):
        self.built = built
        self.robot = robot
        self.ee_link = ee_link
        self.goal_actor = goal_actor
        self.gain = gain
        self.max_joint_vel = max_joint_vel
        # obstacle avoidance (reference fabrics_panda pads obstacles to
        # max_num_obstacles and repels the EE — `fabrics_panda.py:55-64`;
        # here the actor list is static at trace time, no padding needed)
        self.obstacles = list(obstacle_actors)
        self.k_repel = k_repel
        self.influence = influence
        scene = built.scene
        ai = scene.actor_index(robot)
        art = scene.actors[ai]
        # static chain info: bodies owning each dof, their local axes.
        # gripper/finger dofs are excluded — the prior steers the arm only
        self._art = art
        self._bo = scene.body_offset[ai]
        self._dof_bodies = [
            (int(art.dof_index[i]), self._bo + i, np.asarray(art.jaxis[i]), int(art.jtype[i]))
            for i in range(art.nbody)
            if art.dof_index[i] >= 0
            and "finger" not in art.dof_names[int(art.dof_index[i])]
        ]
        self.nu = nu or len(self._dof_bodies)

    def _jacobian(self, view: SimView):
        from ..physics.math3d import quat_rotate

        ee = view.link_position(self.ee_link, self.robot)
        cols = []
        for k, body, axis, jtype in sorted(self._dof_bodies):
            bq = view.state.body_quat[..., body, :]
            bp = view.state.body_pos[..., body, :]
            axis_w = quat_rotate(bq, jnp.asarray(axis, jnp.float32))
            if jtype == 1:  # revolute: J column = axis × (ee − joint)
                cols.append(jnp.cross(axis_w, ee - bp))
            else:           # prismatic
                cols.append(axis_w)
        return ee, jnp.stack(cols, axis=-1)               # (...,3,n)

    def compute_command(self, view: SimView) -> jnp.ndarray:
        ee, J = self._jacobian(view)
        goal = view.actor_position(self.goal_actor)
        v_des = self.gain * (goal - ee)                   # task-space velocity
        for ob in self.obstacles:
            opos = view.actor_position(ob)
            d = ee - opos
            dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
            rep = self.k_repel * d / jnp.maximum(dist, 1e-3) ** 2
            v_des = v_des + jnp.where(dist < self.influence, rep, 0.0)
        # damped least squares: qdot = Jᵀ (J Jᵀ + λ²I)⁻¹ v — tracks through
        # near-singular configurations where plain Jᵀ stalls
        lam2 = 0.01
        JJt = jnp.einsum("...ik,...jk->...ij", J, J) + lam2 * jnp.eye(3)
        y = jnp.linalg.solve(JJt, v_des[..., None])[..., 0]
        u = jnp.einsum("...ik,...i->...k", J, y)
        u = jnp.clip(u, -self.max_joint_vel, self.max_joint_vel)
        if self.nu > u.shape[-1]:
            u = jnp.concatenate(
                [u, jnp.zeros(u.shape[:-1] + (self.nu - u.shape[-1],))], axis=-1
            )
        return _nan_guard(u)
