"""End-to-end slice: point robot reaches its goal through the full
planner+physics stack (SURVEY §7.2 step 4)."""
import numpy as np

from mppiisaac_tpu.tasks import point_robot


def test_point_robot_reaches_goal():
    m = point_robot.run(
        overrides=["mppi.num_samples=64", "n_steps=60"], randomize=False
    )
    assert m.success_step is not None, m.summary()
