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
