"""Grasp-hold under transport (VERDICT r1 item 1 done-criterion): a block
closed in the panda gripper must stay between the pads while the arm sweeps
~1 m — the failure mode round 1 shipped with was corner-first ejection during
the carry (reference picks survive this trivially via PhysX bilateral
contacts, `examples/panda_pick/planner.py:24-53`)."""
import numpy as np
import pytest

from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig


def _specs():
    return [
        ActorSpec(
            type="robot", name="panda", urdf_file="panda_gripper", fixed=True,
            gravity=False, gripper_binarize=True, gripper_open_threshold=0.25,
            # fingers start at 0.025 (5 cm pad gap with the flush pads — the
            # same 1 cm capture clearance this test staged before the r4
            # pad-offset fix): the block free-falls while the pads close, so
            # capture must land within ~0.05 s or it drops past them
            init_joint_pose=[0.0, 0, -0.94, 0, 0.0, 0, -2.8, 0, 0.0, 0,
                             1.8675, 0, 0.0, 0, 0.025, 0.0, 0.025, 0.0],
        ),
        ActorSpec(type="box", name="block", size=[0.04, 0.04, 0.04],
                  mass=0.001, friction=1.0,
                  # yawed 45° to align faces with the wrist's -45° home yaw
                  init_ori=[0.0, 0.0, 0.3826834, 0.9238795],
                  init_pos=[0.5, 0.0, 0.5]),
    ]


@pytest.fixture(scope="module")
def sim():
    return Simulation(SimConfig(dt=0.04, substeps=2), _specs(), num_envs=1)


def _ee(sim):
    return np.asarray(sim.view.link_position("panda_ee", "panda"))[0]


def test_grasp_holds_through_transport(sim):
    sim.reset_to_initial_poses()
    # place the block between the open fingers
    ee0 = _ee(sim)
    sim.set_actor_position_by_name("block", ee0)

    u = np.zeros(9, np.float32)
    u[8] = -1.0                       # close (binarized)
    sim.apply_robot_cmd(u)
    for _ in range(10):               # 0.4 s: capture
        sim.step()
    blk = np.asarray(sim.get_actor_position_by_name("block"))[0]
    assert np.linalg.norm(blk - _ee(sim)) < 0.05, "grasp capture failed"

    # sweep the base joint: EE travels an arc ~1 m
    u[0] = 1.2
    sim.apply_robot_cmd(u)
    path = 0.0
    prev = _ee(sim)
    for i in range(60):
        sim.step()
        ee = _ee(sim)
        path += float(np.linalg.norm(ee - prev))
        prev = ee
        blk = np.asarray(sim.get_actor_position_by_name("block"))[0]
        d = float(np.linalg.norm(blk - ee))
        assert d < 0.08, f"block separated at step {i}: |ee-blk|={d:.3f}"
    assert path > 0.7, f"arm barely moved ({path:.2f} m) — test vacuous"
    # still held at the end, and not fallen
    assert abs(blk[2] - ee[2]) < 0.06, (blk, ee)
