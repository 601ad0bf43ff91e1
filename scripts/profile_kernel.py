"""Per-phase cost profile of the fused rollout kernel (round-1/2 verdicts both
asked for this).

The axon tunnel exposes no device trace, so the profile is measured by PHASE
ABLATION: compile kernel variants with one section disabled and difference the
runtimes. Sections: FK+integrate (base), contact narrowphase+penalty, the
articulated velocity solve (CRBA+RNEA+cholesky+implicit couple), the GS
impulse sweeps, and the per-H-step cost/vis section.

Workload: the bench flagship — panda_pick, K=1000, H=30 (BASELINE.md).
Prints one JSON line per variant and a final breakdown; paste into PROFILE.md.

Usage: python scripts/profile_kernel.py [fast|world] [substeps] [sweeps] [manifold]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, H, ITERS = 1000, 30, 10


def time_variant(name, built, engine, cost_fn, vis_body, fidelity, substeps,
                 sweeps, profile, state_K, params_K, V, manifold="full"):
    import jax
    import numpy as np

    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout

    t0 = time.perf_counter()
    fr = FusedRollout(
        built, engine, cost_fn=cost_fn, H=H, K=K, vis_body=vis_body,
        interpret=jax.default_backend() == "cpu",
        impulse_sweeps=sweeps, world_fidelity=fidelity == "world",
        substeps=substeps, profile=profile, manifold=manifold,
    )
    # jit the WHOLE rollout call: the host-side (K,·)→lanes layout conversion
    # is otherwise dispatched as separate XLA calls, and on this backend each
    # dispatch costs ~25-45 ms — the first profile run measured ~30 ms of
    # conversion overhead per variant, drowning the ~2-6 ms kernel deltas
    run = jax.jit(fr.rollout)
    costs, _ = run(state_K, params_K, V)
    float(np.asarray(costs).sum())          # sync through a host read
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        costs, _ = run(state_K, params_K, V)
    float(np.asarray(costs).sum())
    dt = (time.perf_counter() - t0) / ITERS
    out = {"variant": name, "ms": round(dt * 1e3, 2),
           "compile_s": round(t_compile, 1), "sweeps": sweeps,
           "substeps": fr.substeps, "profile": profile}
    print(json.dumps(out), flush=True)
    return dt


def main(fidelity="fast", substeps=None, sweeps=None, manifold="reduced"):
    import jax
    import jax.numpy as jnp

    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config(
        "tasks/panda_pick",
        [f"mppi.num_samples={K}", f"mppi.horizon={H}",
         f"mppi.rollout_fidelity={fidelity}"]
        + ([f"mppi.rollout_substeps={substeps}"] if substeps else []),
    )
    planner = MPPIisaacPlanner(cfg, PandaPickObjective(cfg), randomize=True,
                               use_fused=False)  # we build kernels ourselves
    built, engine = planner.built, planner.sim.engine
    obj = planner.objective
    cost_fn = obj.kernel_cost(built.scene)
    vis_body = built.visualize_bodies[0] if built.visualize_bodies else None
    state_K, params_K = planner.sim.state, planner._params_K
    key = jax.random.PRNGKey(0)
    V = 0.1 * jax.random.normal(key, (K, H, built.cmd_map.nu), jnp.float32)
    sw = int(sweeps) if sweeps else cfg.mppi.rollout_sweeps
    sub = int(substeps) if substeps else None

    res = {}
    res["full"] = time_variant("full", built, engine, cost_fn, vis_body,
                               fidelity, sub, sw, {}, state_K, params_K, V, manifold=manifold)
    res["nocost"] = time_variant("nocost", built, engine, cost_fn, vis_body,
                                 fidelity, sub, sw, {"zero_cost": True},
                                 state_K, params_K, V, manifold=manifold)
    res["nosweeps"] = time_variant("nosweeps", built, engine, cost_fn, vis_body,
                                   fidelity, sub, 0, {}, state_K, params_K, V, manifold=manifold)
    res["nocontact"] = time_variant("nocontact", built, engine, cost_fn,
                                    vis_body, fidelity, sub, 0,
                                    {"skip_contacts": True}, state_K, params_K, V, manifold=manifold)
    res["fkonly"] = time_variant("fkonly", built, engine, cost_fn, vis_body,
                                 fidelity, sub, 0,
                                 {"skip_contacts": True, "skip_dynamics": True,
                                  "zero_cost": True},
                                 state_K, params_K, V, manifold=manifold)

    full = res["full"]
    breakdown = {
        "cost_section_ms": round((full - res["nocost"]) * 1e3, 2),
        "gs_sweeps_ms": round((full - res["nosweeps"]) * 1e3, 2),
        "contacts_ms": round((res["nosweeps"] - res["nocontact"]) * 1e3, 2),
        "artic_solve_ms": round((res["nocontact"] - res["fkonly"]) * 1e3, 2),
        "fk_integrate_base_ms": round(res["fkonly"] * 1e3, 2),
        "full_ms": round(full * 1e3, 2),
        "fidelity": fidelity,
        "substeps": sub or engine.substeps,
        "sweeps": sw, "manifold": manifold,
        "K": K, "H": H,
    }
    print("BREAKDOWN " + json.dumps(breakdown), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fast",
         sys.argv[2] if len(sys.argv) > 2 else None,
         sys.argv[3] if len(sys.argv) > 3 else None,
         sys.argv[4] if len(sys.argv) > 4 else "reduced")
