"""Rollout-model fidelity consistency (r5 omni root-cause regression).

The planner's model must converge grasp couples like the world kernel does:
at rollout_sweeps=2 a modeled grasp LOSES the block ~0.5 s in while the
world (8 Jacobi sweeps) holds it (scripts/diag_omni_model.py), so every
grasp rollout scored as worthless and the omni planner refused to close from
a perfect straddle. Guard the config invariant: grasp tasks that plan at
world fidelity ship rollout sweeps matching the fused world kernel (or a
value task-validated at the >=90% bar, like panda_pick's sweeps=1 10/10).
"""
import pytest

from mppiisaac_tpu.utils.config_store import load_config


def test_omni_rollout_sweeps_match_world():
    cfg = load_config("tasks/omni_panda_pick", [])
    assert cfg.mppi.rollout_fidelity == "world"
    assert int(cfg.mppi.rollout_sweeps) >= 8, (
        "omni rollout model must run the world kernel's 8 grasp-couple "
        "sweeps — at 2 the modeled grasp drops the block (diag_omni_model)"
    )


def test_pick_rollout_sweeps_validated():
    cfg = load_config("tasks/panda_pick", [])
    assert cfg.mppi.rollout_fidelity == "world"
    # 1 is the task-validated value (RESULTS_r5.json: 10/10 over 10 seeds)
    assert int(cfg.mppi.rollout_sweeps) in (1, 2)
