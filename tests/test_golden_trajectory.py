"""Golden-trajectory regression: a canonical contact-rich scene must keep
producing the same motion across refactors (SURVEY §4 'golden-trajectory
tests'). Goldens are summary statistics (robust to benign numeric jitter)."""
import jax
import jax.numpy as jnp
import numpy as np

from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig


def test_push_block_golden():
    specs = [
        ActorSpec(type="robot", name="point_robot", urdf_file="point_robot", fixed=True),
        ActorSpec(type="box", name="block", size=[0.3, 0.3, 0.3], mass=0.5,
                  init_pos=[0.6, 0.0, 0.15], friction=0.5),
    ]
    sim = Simulation(SimConfig(dt=0.05, substeps=2), specs, num_envs=1)
    for _ in range(60):
        sim.apply_robot_cmd(np.array([0.8, 0.0, 0.0]))
        sim.step()
    q = np.asarray(sim.state.q[0])
    block = np.asarray(sim.get_actor_position_by_name("block"))[0]
    # goldens re-recorded 2026-08-17 (reduced directional box-box manifold —
    # corner-only sampling shifts the push-contact normalization slightly):
    # robot drives forward, pushes the block 1-2 m; block stays upright on
    # the ground plane
    assert 1.5 < q[0] < 2.7, q
    assert block[0] > 1.3, block
    assert 0.10 < block[2] < 0.20, block          # resting, not sunk/launched
    assert abs(block[1]) < 0.15, block            # straight push
    ncf = np.asarray(sim.state.net_contact_force[0])
    bi = sim.scene.body_index("block")
    assert 3.0 < ncf[bi, 2] < 7.0, ncf[bi]        # supports ~0.5 kg weight


def test_boxer_drive_golden():
    sim = Simulation(SimConfig(dt=0.05, substeps=2), ["boxer"], num_envs=1)
    for _ in range(40):
        sim.apply_robot_cmd(np.array([1.0, 0.0]))
        sim.step()
    p = np.asarray(sim.get_actor_position_by_name("boxer"))[0]
    assert 1.2 < p[0] < 2.2, p                    # ~0.85 m/s effective speed
    assert abs(p[1]) < 0.2 and -0.03 <= p[2] < 0.1, p  # ~1 cm contact sag is nominal
