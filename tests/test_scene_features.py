"""Scene-level features: dynamic scene mutation (add_to_envs), multi-robot
command mapping, domain randomization, diff-drive kinematics."""
import numpy as np
import pytest

from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.scene.builder import SimConfig


def test_add_to_envs_rebuild():
    """Geometry change → rebuild preserving existing actor poses (reference
    `add_to_envs` restart path, SURVEY §3.5)."""
    sim = Simulation(SimConfig(dt=0.05, substeps=1), ["point_robot", "goal"], num_envs=2)
    sim.apply_robot_cmd(np.array([1.0, 0, 0]))
    for _ in range(5):
        sim.step()
    q_before = np.asarray(sim.state.q)
    n_actors = sim.root_state.shape[1]
    sim.add_to_envs([
        {"type": "box", "name": "new_obstacle", "size": [0.2, 0.2, 0.4],
         "init_pos": [1.5, 0.0, 0.2], "mass": 2.0}
    ])
    assert sim.root_state.shape[1] == n_actors + 1
    np.testing.assert_allclose(np.asarray(sim.state.q), q_before, atol=1e-6)
    sim.step()  # new scene steps fine
    assert np.all(np.isfinite(np.asarray(sim.root_state)))


def test_multi_robot_command_layout():
    """Two point robots: nu = 6, commands route to each robot's dofs
    (reference multi-pointbot configs, `isaacgym_wrapper.py:101-106`)."""
    sim = Simulation(
        SimConfig(dt=0.05, substeps=1),
        ["point_robot", "point_robot", "goal"],
        init_positions=[[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]],
        num_envs=1,
    )
    assert sim.nu == 6
    sim.apply_robot_cmd(np.array([1.0, 0, 0, -1.0, 0, 0]))
    for _ in range(10):
        sim.step()
    q = np.asarray(sim.state.q[0])
    assert q[0] > 0.1 and q[3] < -0.1


def test_diff_drive_ik_straight_and_turn():
    """Boxer: (v, ω) commands → wheel speeds → chassis motion."""
    sim = Simulation(SimConfig(dt=0.05, substeps=2), ["boxer"], num_envs=1)
    # drive straight
    sim.apply_robot_cmd(np.array([0.5, 0.0]))
    for _ in range(40):
        sim.step()
    pos = np.asarray(sim.get_actor_position_by_name("boxer"))[0]
    assert pos[0] > 0.35, pos          # moved forward
    assert abs(pos[1]) < 0.12, pos     # roughly straight
    # turn in place
    sim2 = Simulation(SimConfig(dt=0.05, substeps=2), ["boxer"], num_envs=1)
    sim2.apply_robot_cmd(np.array([0.0, 1.5]))
    for _ in range(40):
        sim2.step()
    from mppiisaac_tpu.physics.math3d import quat_to_yaw
    import jax.numpy as jnp

    yaw = float(quat_to_yaw(sim2.get_actor_orientation_by_name("boxer")[0]))
    pos2 = np.asarray(sim2.get_actor_position_by_name("boxer"))[0]
    assert abs(yaw) > 0.5, yaw         # rotated
    # near origin (wheel stiction impulses make in-place turns grip harder
    # than the smoothed penalty did — a skid-steer turn walks a few cm more)
    assert np.linalg.norm(pos2[:2]) < 0.4, pos2


def test_domain_randomization_per_env():
    """Per-env mass/friction noise (stronger than the reference's
    once-per-process DR, `isaacgym_wrapper.py:450-482`)."""
    sim = Simulation(
        SimConfig(dt=0.05, substeps=1), ["point_robot", "block", "goal"],
        num_envs=16, randomize=True, seed=3,
    )
    ms = np.asarray(sim.params.body_mass_scale)
    block_bodies = slice(
        sim.scene.body_offset[1], sim.scene.body_offset[1] + sim.scene.actors[1].nbody
    )
    assert np.std(ms[:, block_bodies]) > 0.01      # envs differ
    fric = np.asarray(sim.params.geom_friction)
    assert np.std(fric) > 0.01


def test_planner_add_to_env_rpc():
    """Planner-level add_to_env (reference `mppi_isaac.py:115-116`): the RPC
    must rebuild the ROLLOUT scene with the addition — a fresh __init__ from
    the original cfg.actors silently drops it (round-1 bug)."""
    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.tasks.point_robot import PointRobotObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config(
        "tasks/point_robot", ["mppi.num_samples=8", "mppi.horizon=4"]
    )
    planner = MPPIisaacPlanner(cfg, PointRobotObjective(cfg), randomize=False)
    n_actors = len(planner.sim.built.specs)
    a0 = planner.compute_action(np.zeros(3), np.zeros(3))
    planner.add_to_env([
        {"type": "sphere", "name": "added_obstacle", "size": [0.3],
         "init_pos": [1.0, 0.0, 0.3], "mass": 1.0, "fixed": True}
    ])
    # the rollout sim now contains the addition
    assert len(planner.sim.built.specs) == n_actors + 1
    assert any(s.name == "added_obstacle" for s in planner.sim.built.specs)
    assert "added_obstacle" in [a.name for a in planner.cfg.actors] or any(
        getattr(a, "name", None) == "added_obstacle" for a in planner.cfg.actors
    )
    # and the planner still plans (rollout scene retraced over the new scene)
    a1 = planner.compute_action(np.zeros(3), np.zeros(3))
    assert np.all(np.isfinite(a1)) and a1.shape == a0.shape


def test_planner_update_mppi_params_structural():
    """Changing horizon/num_samples must take effect (reference rebuilds the
    planner, `mppi_isaac.py:129-137`; round-1 silently ignored them)."""
    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.tasks.point_robot import PointRobotObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config(
        "tasks/point_robot", ["mppi.num_samples=8", "mppi.horizon=4"]
    )
    planner = MPPIisaacPlanner(cfg, PointRobotObjective(cfg), randomize=False)
    planner.compute_action(np.zeros(3), np.zeros(3))
    planner.update_mppi_params({"horizon": 6, "num_samples": 16, "noise_sigma": (np.eye(3) * 0.4).tolist()})
    assert planner.mppi.cfg.horizon == 6
    assert planner.mppi.cfg.num_samples == 16
    assert planner.mppi.carry.U.shape[0] == 6
    np.testing.assert_allclose(np.asarray(planner.mppi.carry.sigma), np.eye(3) * 0.4, atol=1e-6)
    a = planner.compute_action(np.zeros(3), np.zeros(3))
    assert np.all(np.isfinite(a))


def test_effort_robot_fingers_stay_effort_driven():
    """Effort-mode robots keep RAW effort-driven fingers with no binarize —
    the reference fills ALL DOFs with DOF_MODE_EFFORT
    (`isaacgym_wrapper.py:493-507`) and its gripper binarize never fires for
    the omnipanda (name-matched to 'panda_gripper' only,
    `isaacgym_wrapper.py:561-565`). Round-3 regression: binarized
    position-targets fed as ~0.04 N efforts latched the omni gripper shut."""
    from mppiisaac_tpu.physics.model import DRIVE_EFFORT, DRIVE_POSITION
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", None)
    sim = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                     init_positions=cfg.initial_actor_positions, num_envs=1)
    art = sim.scene.actors[sim.scene.actor_index("omnipanda")]
    fm = [int(art.drive_mode[k]) for k, jn in enumerate(art.dof_names)
          if "finger" in jn]
    assert fm == [DRIVE_EFFORT, DRIVE_EFFORT]
    assert sim.built.cmd_map.binarize_dofs == []

    # velocity-mode gripper robots KEEP the position-drive override
    cfg2 = load_config("tasks/panda_pick", None)
    sim2 = Simulation(cfg=cfg2.isaacgym, actors=cfg2.actors,
                      init_positions=cfg2.initial_actor_positions, num_envs=1)
    art2 = sim2.scene.actors[sim2.scene.actor_index("panda")]
    fm2 = [int(art2.drive_mode[k]) for k, jn in enumerate(art2.dof_names)
           if "finger" in jn]
    assert fm2 == [DRIVE_POSITION, DRIVE_POSITION]
    assert len(sim2.built.cmd_map.binarize_dofs) == 2
