"""Many-balls demo — the analog of the reference's NVIDIA collision-group
demo (`/root/reference` `examples/1080_balls_of_solitude.py`): per-env
isolation (here by construction under vmap — no collision-group bookkeeping
needed) and whole-sim state snapshot/reset (here a pytree copy, bit-exact)."""
import sys

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

import numpy as np

from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig


def main(num_envs: int = 1080, n_balls: int = 4, steps: int = 100):
    rng = np.random.RandomState(0)
    actors = []
    for i in range(n_balls):
        actors.append(
            ActorSpec(
                type="sphere", name=f"ball{i}", size=[0.1], mass=1.0,
                init_pos=[0.3 * i - 0.45, 0.0, 0.5 + 0.25 * i], friction=0.8,
            )
        )
    sim = Simulation(SimConfig(dt=0.02, substeps=2), actors, num_envs=num_envs)

    snapshot = sim.save_state()                       # whole-sim snapshot
    for _ in range(steps):
        sim.step()
    z = np.asarray(sim.state.root_pos[:, :, 2])
    print(f"{num_envs} envs × {n_balls} balls after {steps} steps: "
          f"mean height {z.mean():.3f} (identical across envs: "
          f"{np.allclose(z, z[0], atol=1e-4)})")
    sim.restore_state(snapshot)                        # bit-exact reset
    assert np.array_equal(
        np.asarray(sim.state.root_pos), np.asarray(snapshot.root_pos)
    )
    print("snapshot restore: exact")


if __name__ == "__main__":
    main()
