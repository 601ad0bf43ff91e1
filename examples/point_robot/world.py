"""Point-robot world process (two-process demo; see examples/panda_pick)."""
import sys, time
sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])
import numpy as np
from mppiisaac_tpu.runtime.server import Client
from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.runtime.transport import bytes_to_jnp, torch_to_bytes
from mppiisaac_tpu.utils.config_store import load_config
from mppiisaac_tpu.utils.confsys import parse_cli

def main():
    cfg = load_config("tasks/point_robot", parse_cli(sys.argv[1:]))
    sim = Simulation(cfg.isaacgym, cfg.actors, num_envs=1)
    planner = Client().connect("tcp://127.0.0.1:4242")
    for step in range(cfg.n_steps):
        t0 = time.perf_counter()
        action = np.asarray(bytes_to_jnp(planner.compute_action_tensor(
            torch_to_bytes(np.asarray(sim.dof_state[0])),
            torch_to_bytes(np.asarray(sim.root_state[0])))))
        sim.apply_robot_cmd(action); sim.step()
        dt = cfg.isaacgym.dt; el = time.perf_counter() - t0
        if el < dt: time.sleep(dt - el)
        print(f"FPS: {1/(time.perf_counter()-t0):7.1f}")

if __name__ == "__main__":
    main()
