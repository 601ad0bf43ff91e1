"""Runtime subsystems: transport wire-compat, RPC server/client, sim wrapper API."""
import numpy as np
import pytest

from mppiisaac_tpu.runtime import transport
from mppiisaac_tpu.runtime.server import Client, Server


def test_transport_roundtrip():
    x = np.random.RandomState(0).randn(4, 13).astype(np.float32)
    b = transport.torch_to_bytes(x)
    back = transport.bytes_to_jnp(b)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-7)


def test_transport_torch_wire_compat():
    torch = pytest.importorskip("torch")
    t = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    b = transport.torch_to_bytes(t)
    back = transport.bytes_to_torch(b)
    assert torch.equal(t, back)
    # jnp view too
    np.testing.assert_allclose(np.asarray(transport.bytes_to_jnp(b)), t.numpy())


class _FakePlanner:
    def __init__(self):
        self.weights = None

    def compute_action_tensor(self, dof_bytes, root_bytes):
        dof = transport.bytes_to_jnp(dof_bytes)
        return transport.jnp_to_bytes(np.asarray(dof) * 2.0)

    def update_weights(self, weights):
        self.weights = weights
        return "ok"

    def boom(self):
        raise ValueError("nope")


def test_rpc_roundtrip():
    planner = _FakePlanner()
    srv = Server(planner).bind("tcp://127.0.0.1:0")
    srv.run_in_thread()
    try:
        c = Client().connect(f"tcp://127.0.0.1:{srv.port}")
        x = np.ones((2, 2), np.float32)
        out = transport.bytes_to_jnp(
            c.compute_action_tensor(transport.torch_to_bytes(x), transport.torch_to_bytes(x))
        )
        np.testing.assert_allclose(np.asarray(out), 2 * x)
        assert c.update_weights({"nav": 2.0}) == "ok"
        assert planner.weights == {"nav": 2.0}
        with pytest.raises(RuntimeError):
            c.boom()
        c.close()
    finally:
        srv.stop()


def test_sim_wrapper_api():
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.builder import SimConfig

    sim = Simulation(SimConfig(dt=0.05, substeps=1), actors=["point_robot", "goal"], num_envs=3)
    assert sim.dof_state.shape == (3, 3, 2)
    assert sim.root_state.shape[1:] == (2, 13)
    sim.apply_robot_cmd(np.array([1.0, 0.0, 0.0]))
    sim.step()
    assert float(sim.dof_state[0, 0, 1]) > 0.05  # moving +x
    # named getters / setters
    g = sim.get_actor_position_by_name("goal")
    assert g.shape == (3, 3)
    sim.set_actor_position_by_name("goal", np.array([1.0, 2.0, 0.5]))
    np.testing.assert_allclose(np.asarray(sim.get_actor_position_by_name("goal"))[0], [1, 2, 0.5])
    # save / restore is exact
    snap = sim.save_state()
    for _ in range(3):
        sim.step()
    moved = np.asarray(sim.dof_state)
    sim.restore_state(snap)
    np.testing.assert_array_equal(np.asarray(sim.dof_state), np.asarray(snap.dof_state))
    assert not np.array_equal(moved, np.asarray(snap.dof_state))
    # reset_robot_state broadcast
    sim.reset_robot_state([0.5, 0.25, 0.1], [0, 0, 0])
    np.testing.assert_allclose(np.asarray(sim.dof_state)[:, :, 0], np.tile([0.5, 0.25, 0.1], (3, 1)), atol=1e-6)
