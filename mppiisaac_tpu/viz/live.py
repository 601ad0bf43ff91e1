"""Live interactive viewer with keyboard goal teleop.

Parity target: the reference's Vulkan viewer loop — online rollout-line
drawing (`isaacgym_wrapper.py:760-774`), WASD/QE goal moving (116-122,
621-637) — realized host-side on downloaded state/trajectory buffers
(SURVEY §2.2 'PhysX viewer' row). A matplotlib window (TkAgg/Qt when a
display exists) redraws the top-down scene each control step; key presses
move the "goal" actor through `set_actor_position_by_name`, which the next
`compute_action` immediately consumes — same semantics as the reference's
`interactive_goal_update`.

Headless fallback: with no display (matplotlib Agg), `update()` still runs —
optionally dumping frames for `save_episode_gif` — so the same run_task code
path works everywhere.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class LiveViewer:
    KEYMAP = {
        "a": (+0.1, 0.0, 0.0), "d": (-0.1, 0.0, 0.0),
        "w": (0.0, -0.1, 0.0), "s": (0.0, +0.1, 0.0),
        "q": (0.0, 0.0, +0.1), "e": (0.0, 0.0, -0.1),
    }

    def __init__(self, sim, goal_actor: str = "goal", frame_dir: Optional[str] = None,
                 lim: float = 3.0):
        import matplotlib

        self.sim = sim
        self.goal_actor = goal_actor
        self.frame_dir = frame_dir
        self.frames = []
        self.lim = lim
        self.interactive = matplotlib.get_backend().lower() != "agg"
        import matplotlib.pyplot as plt

        self.plt = plt
        self.fig, self.ax = plt.subplots(figsize=(6, 6))
        if self.interactive:
            self.fig.canvas.mpl_connect("key_press_event", self._on_key)
            plt.ion()
            self.fig.show()

    # -- teleop ------------------------------------------------------------
    def _on_key(self, event):
        d = self.KEYMAP.get((event.key or "").lower())
        if d is None:
            return
        has_goal = any(s.name == self.goal_actor for s in self.sim.built.specs)
        if not has_goal:
            return
        pos = np.asarray(self.sim.get_actor_position_by_name(self.goal_actor))[0]
        self.sim.set_actor_position_by_name(self.goal_actor, pos + np.asarray(d))

    # -- drawing -----------------------------------------------------------
    def update(self, step: int, rollouts: Optional[np.ndarray] = None):
        from ..physics.urdf import GEOM_BOX, GEOM_SPHERE
        from .render import plt_circle

        ax, plt = self.ax, self.plt
        ax.clear()
        scene, state = self.sim.scene, self.sim.state
        body_pos = np.asarray(state.body_pos[0])
        for ai, art in enumerate(scene.actors):
            spec = self.sim.built.specs[ai]
            col = tuple(np.clip(spec.color, 0, 1)) if spec.color else (0.4, 0.4, 0.8)
            for g in art.geoms:
                p = body_pos[scene.body_offset[ai] + g.body] + np.asarray(g.pos)
                if g.gtype == GEOM_BOX:
                    hx, hy, _ = g.size
                    ax.add_patch(plt.Rectangle((p[0] - hx, p[1] - hy), 2 * hx, 2 * hy,
                                               color=col, alpha=0.6))
                else:
                    ax.add_patch(plt_circle(plt, p[:2], max(float(g.size[0]), 0.02), col))
        if rollouts is not None:
            ro = np.asarray(rollouts)
            if ro.ndim == 3 and ro.size:
                stride = max(1, ro.shape[1] // 48)
                for k in range(0, ro.shape[1], stride):
                    ax.plot(ro[:, k, 0], ro[:, k, 1], color="green", alpha=0.2, lw=0.8)
        ax.set_xlim(-self.lim, self.lim)
        ax.set_ylim(-self.lim, self.lim)
        ax.set_aspect("equal")
        ax.set_title(f"step {step}  (wasd/qe move goal)" if self.interactive
                     else f"step {step}")
        if self.interactive:
            self.fig.canvas.draw_idle()
            self.fig.canvas.flush_events()
        elif self.frame_dir is not None:
            import os

            os.makedirs(self.frame_dir, exist_ok=True)
            path = f"{self.frame_dir}/frame_{step:05d}.png"
            self.fig.savefig(path, dpi=80)
            self.frames.append(path)

    def close(self):
        self.plt.close(self.fig)
