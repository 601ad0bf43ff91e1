"""End-to-end slice: point robot reaches its goal through the full
planner+physics stack (SURVEY §7.2 step 4)."""
import numpy as np

from mppiisaac_tpu.tasks import point_robot


def test_point_robot_reaches_goal():
    m = point_robot.run(
        overrides=["mppi.num_samples=64", "n_steps=60"], randomize=False
    )
    assert m.success_step is not None, m.summary()


def test_point_robot_chunked_device_loop():
    """device_steps>1 runs N control steps per host round-trip (one jitted
    scan) — must reach the goal like the per-step loop and report an exact
    in-chunk success step."""
    m = point_robot.run(
        overrides=["mppi.num_samples=64", "n_steps=60"],
        randomize=False, device_steps=8,
    )
    assert m.success_step is not None, m.summary()
    assert m.final_state_finite


def test_chunked_loop_chunk_observer():
    """chunk_observer receives every step's post-step state (from the stacked
    chunk fetch) with a Simulation-compatible view — the diagnostics hook that
    avoids the separately-compiled per-step observer path."""
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.utils.config_store import load_config
    from mppiisaac_tpu.tasks.point_robot import PointRobotObjective

    cfg = load_config("tasks/point_robot", ["mppi.num_samples=32"])
    seen = []

    def obs(step, world, action):
        q = np.asarray(world.view.actor_q("point_robot"))[0]
        seen.append((step, float(q[0]), np.asarray(action).shape))

    m = run_task(cfg, PointRobotObjective(cfg), n_steps=16, randomize=False,
                 device_steps=8, chunk_observer=obs)
    assert m.steps == 16
    assert [s for s, _, _ in seen] == list(range(16))
    # the robot moves: the observed x coordinate changes over the chunk
    assert abs(seen[-1][1] - seen[0][1]) > 1e-4


def test_multi_episode_runner_single_build():
    """run_task_episodes: one build + compile, N seeded episodes with state
    and solver-carry resets (the tuning/benchmark episode protocol,
    reference `examples/panda_pick/tuning.py:74-113`)."""
    from mppiisaac_tpu.runtime.loop import run_task_episodes
    from mppiisaac_tpu.utils.config_store import load_config
    from mppiisaac_tpu.tasks.point_robot import PointRobotObjective

    cfg = load_config("tasks/point_robot", ["mppi.num_samples=64"])
    goal = np.asarray(cfg.goal, np.float64).reshape(-1)[:2]

    def success(world):
        q = np.asarray(world.state.q[0, :2])
        return float(np.linalg.norm(q - goal)) < 0.2

    rs = run_task_episodes(
        cfg, PointRobotObjective(cfg), seeds=[0, 1], n_steps=60,
        success_fn=success, device_steps=8, randomize=False,
    )
    assert all(m.success_step is not None for m in rs.values()), {
        s: m.summary() for s, m in rs.items()
    }
