"""Committed TPU validation runner (replaces ad-hoc _exp*.py scripts).

Subcommands (run ONE at a time on the TPU — the tunnel serializes anyway):
  pick [fast|world] [n_seeds]   5-seed panda_pick sweep (reference success:
                                ||block-goal|| < 0.2, omni_panda_pick/world.py:66-75)
  omni [fast|world] [n_seeds]   omni_panda_pick (effort mode) sweep
  anymal [n_seeds]              anymal goal-reach episodes with gait prior
  suite                         one episode of every non-pick task
Each prints one JSON line per episode and a final JSON summary, and appends the
summary to RESULTS_r{N}.json (versioned task-suite gate; set VALIDATE_ROUND).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jax_cache():
    # persistent compile cache is configured by the mppiisaac_tpu package
    # import (threshold 0 — the axon backend reports ~0 s local compile time,
    # so any positive threshold filters out every write); nothing to do here
    pass


def _summ(results):
    ok = [s for s, m in results.items() if m.success_step is not None]
    return {
        "episodes": len(results),
        "successes": len(ok),
        "success_seeds": ok,
        "success_steps": {s: m.success_step for s, m in results.items()},
        # median, not mean: the first chunk of the first episode carries the
        # jit compile and would dominate a mean
        "median_ms_per_step": round(
            float(__import__("numpy").median(
                [t for m in results.values() for t in m.solver_time] or [0.0]
            )) * 1e3, 2),
    }


def _record(kind, summary):
    """Versioned task-suite gate: append this run's summary to the committed
    RESULTS_r{N}.json so red→green diffs are visible in-tree every round
    (round-2 verdict: results lived only in /tmp and died with the machine)."""
    rnd = os.environ.get("VALIDATE_ROUND", "5")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        f"RESULTS_r{rnd}.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc[kind] = summary
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"RECORDED {kind} -> {path}", flush=True)


def _fidelity(arg):
    if arg not in ("fast", "world"):
        raise SystemExit(f"fidelity must be 'fast' or 'world', got {arg!r}")
    return arg


def pick(fidelity="fast", n_seeds=5, task="panda_pick", substeps="", sweeps="",
         manifold=""):
    _jax_cache()
    import numpy as np

    from mppiisaac_tpu.runtime.loop import run_task_episodes
    from mppiisaac_tpu.utils.config_store import load_config

    if task == "panda_pick":
        from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective as Obj

        block = "panda_pick_block"
    else:
        from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective as Obj

        block = "block"
    over = [f"mppi.rollout_fidelity={_fidelity(fidelity)}"]
    if substeps:
        over.append(f"mppi.rollout_substeps={substeps}")
    if sweeps:
        over.append(f"mppi.rollout_sweeps={sweeps}")
    if manifold:
        over.append(f"mppi.rollout_manifold={manifold}")
    # extra hydra-style overrides via env (e.g. mppi.horizon=12 sweeps),
    # recorded in the results key so rows stay distinguishable
    extra = [o for o in os.environ.get("VALIDATE_EXTRA", "").split(",") if o]
    over += extra
    cfg = load_config(f"tasks/{task}", over)
    obj = Obj(cfg)

    def success(world):
        v = world.view
        b = np.asarray(v.actor_position(block))[0]
        g = np.asarray(v.actor_position("goal"))[0]
        return float(np.linalg.norm(b - g)) < 0.2

    t0 = time.perf_counter()
    # conf n_steps now matches the reference's 10000-step budget; the sweep
    # gate caps episodes at 1500 steps (60 s — same budget as omni) so the
    # ≥80% bar is measured against a bounded, documented horizon
    results = run_task_episodes(
        cfg, obj, seeds=list(range(int(n_seeds))), success_fn=success,
        n_steps=1500, device_steps=16, verbose=True,
    )
    s = _summ(results)
    s["task"], s["fidelity"], s["substeps"] = task, fidelity, substeps or "world-match"
    s["sweeps"] = sweeps or "default"
    if manifold:
        s["manifold"] = manifold
    s["wall_s"] = round(time.perf_counter() - t0, 1)
    print("SUMMARY " + json.dumps(s))
    print(f"SUCCESS {s['successes']}/{s['episodes']}")
    _record(f"{task}:{fidelity}:{substeps or 'world-match'}:sw{sweeps or 'd'}"
            + (f":{manifold}" if manifold else "")
            + (":" + ",".join(extra) if extra else ""), s)
    return s


def anymal(n_seeds=3, prior_mode="tape"):
    """prior_mode: 'tape' (default, gait tape prior) or 'none' — the reference
    reaches the goal with prior=None (`examples/anymal/planner.py:54`), so the
    no-prior sweep measures whether the gait is emergent here too."""
    _jax_cache()
    import numpy as np

    from mppiisaac_tpu.planner.priors import QuadrupedGaitPrior
    from mppiisaac_tpu.runtime.loop import run_task_episodes
    from mppiisaac_tpu.tasks.anymal import AnymalObjective
    from mppiisaac_tpu.utils.config_store import load_config

    over = ["mppi.use_priors=false"] if prior_mode == "none" else None
    cfg = load_config("tasks/anymal", over)
    obj = AnymalObjective(cfg)
    prior = None if prior_mode == "none" else QuadrupedGaitPrior(
        H=cfg.mppi.horizon, dt=cfg.isaacgym.dt)

    def success(world):
        v = world.view
        body = np.asarray(v.link_position("base", "anymal"))[0, :2]
        goal = np.asarray(v.actor_position("goal"))[0, :2]
        return float(np.linalg.norm(body - goal)) < 0.3

    t0 = time.perf_counter()
    results = run_task_episodes(
        cfg, obj, seeds=list(range(int(n_seeds))), prior=prior,
        success_fn=success, device_steps=16, verbose=True,
    )
    s = _summ(results)
    s["task"], s["prior"] = "anymal", prior_mode
    s["wall_s"] = round(time.perf_counter() - t0, 1)
    print("SUMMARY " + json.dumps(s))
    print(f"SUCCESS {s['successes']}/{s['episodes']}")
    _record("anymal" if prior_mode == "tape" else f"anymal:{prior_mode}", s)
    return s


def suite():
    """One episode per non-pick task (world-loop smoke + success)."""
    _jax_cache()
    import importlib

    def mod(m):
        return importlib.import_module(f"mppiisaac_tpu.tasks.{m}")

    plan = [
        ("point_robot", mod("point_robot").run, {}),
        ("panda", mod("panda_reach").run, {}),
        ("heijn_reach", mod("mobile_reach").run, {"robot": "heijn"}),
        ("heijn_push", mod("mobile_push").run, {"robot": "heijn"}),
        ("boxer_reach", mod("mobile_reach").run, {"robot": "boxer"}),
        ("boxer_push", mod("mobile_push").run, {"robot": "boxer"}),
        # conf n_steps matches the reference's 10000; the suite gate caps the
        # episode at 1500 steps — the |b-g|<0.4 gate (see tasks/
        # panda_stick_push.py + scripts/reach_analysis.py) lands ~step 1150
        ("panda_stick_push", mod("panda_stick_push").run, {"n_steps": 1500}),
        ("albert", mod("albert").run, {}),
        # r5: the two reference examples the suite previously skipped —
        # panda_effort exercises the effort-finger motor model in a full
        # planner loop, multi_jackal the multi-robot scene path
        # effort-mode reach creeps ~0.9 mm/step under the velocity penalty;
        # measured success at step 328 (r5 CPU diag) — cap 500 (the reference
        # example runs n_steps=10000 with no success bar at all)
        ("panda_effort", mod("panda_reach").run, {"task": "panda_effort",
                                                  "n_steps": 500}),
        ("multi_jackal", mod("multi_robot").run_jackal, {}),
    ]
    out = {}
    for name, fn, kw in plan:
        t0 = time.perf_counter()
        try:
            over = kw.pop("overrides", None)
            m = fn(overrides=over, device_steps=16, **kw)
            out[name] = {
                "success_step": m.success_step,
                "steps": m.steps,
                "finite": m.final_state_finite,
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        except Exception as e:  # keep sweeping; record the failure
            out[name] = {"error": repr(e)[:300]}
        print(f"TASK {name}: {json.dumps(out[name])}", flush=True)
    n_ok = sum(1 for v in out.values() if v.get("success_step") is not None)
    print("SUMMARY " + json.dumps(out))
    print(f"SUCCESS {n_ok}/{len(out)}")
    _record("suite", out)
    return out


def one(task, *overrides):
    """Single episode of any task with CLI-style overrides (diagnostics)."""
    _jax_cache()
    import importlib

    robot = None
    if task in ("boxer_push", "heijn_push"):
        modname, robot = "mobile_push", task.split("_")[0]
    elif task in ("boxer_reach", "heijn_reach"):
        modname, robot = "mobile_reach", task.split("_")[0]
    elif task == "panda":
        modname = "panda_reach"
    else:
        modname = task
    m = importlib.import_module(f"mppiisaac_tpu.tasks.{modname}")
    kw = {"robot": robot} if robot else {}
    t0 = time.perf_counter()
    met = m.run(overrides=list(overrides) or None, device_steps=16, **kw)
    out = {
        "task": task, "overrides": list(overrides),
        "success_step": met.success_step, "steps": met.steps,
        "finite": met.final_state_finite,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print("ONE " + json.dumps(out))
    _record(f"one:{task}" + (":" + ",".join(overrides) if overrides else ""), out)
    return out


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "pick"
    args = sys.argv[2:]
    if cmd == "pick":
        pick(*args)
    elif cmd == "omni":
        pick(args[0] if args else "fast", args[1] if len(args) > 1 else 5,
             task="omni_panda_pick")
    elif cmd == "anymal":
        anymal(*args)
    elif cmd == "suite":
        suite()
    elif cmd == "one":
        one(*args)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
