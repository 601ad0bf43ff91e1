"""World process — 1-env sim + real-time control loop, talking to the planner
server over TCP with the reference's byte protocol (`/root/reference`
`examples/panda_pick/world.py:33-59`: per-step dof/root state down, action
bytes up, rollout buffer fetch, FPS/RT pacing)."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

import numpy as np

from mppiisaac_tpu.runtime.server import Client
from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.runtime.transport import bytes_to_jnp, torch_to_bytes
from mppiisaac_tpu.utils.config_store import load_config
from mppiisaac_tpu.utils.confsys import parse_cli


def main():
    cfg = load_config("tasks/panda_pick", parse_cli(sys.argv[1:]))
    sim = Simulation(cfg.isaacgym, cfg.actors, cfg.initial_actor_positions, num_envs=1)
    planner = Client().connect("tcp://127.0.0.1:4242")
    print("Mppi server found!")

    dt = cfg.isaacgym.dt
    for step in range(cfg.n_steps):
        t0 = time.perf_counter()
        action_bytes = planner.compute_action_tensor(
            torch_to_bytes(np.asarray(sim.dof_state[0])),
            torch_to_bytes(np.asarray(sim.root_state[0])),
        )
        action = np.asarray(bytes_to_jnp(action_bytes))
        sim.apply_robot_cmd(action)
        sim.step()
        elapsed = time.perf_counter() - t0
        if elapsed < dt:
            time.sleep(dt - elapsed)
        actual = time.perf_counter() - t0
        print(f"FPS: {1/actual:7.1f}  RT factor: {dt/actual:5.2f}")


if __name__ == "__main__":
    main()
