"""Host-side visualization — replaces the reference's PhysX/Vulkan viewer
(SURVEY §2.2: viewer, rollout line drawing `isaacgym_wrapper.py:760-774`,
interactive goal teleop 621-637) with headless matplotlib rendering fed by
downloaded state/trajectory buffers.

* `render_scene(...)`: top-down + 3D views of actors (primitive footprints)
* `draw_rollouts(...)`: the K visualize-link trajectories of the last MPPI
  command (green line strips, parity with `draw_lines`)
* `save_episode_gif(...)`: frame-by-frame episode capture
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..physics.urdf import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE


def _require_mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def render_scene(
    sim,
    rollouts: Optional[np.ndarray] = None,     # (H, K, 3)
    path: str = "scene.png",
    env: int = 0,
    elev: float = 35.0,
    azim: float = -60.0,
):
    """Render env `env` of a Simulation (actors as primitives) + rollout lines."""
    plt = _require_mpl()
    scene = sim.scene
    state = sim.state
    fig = plt.figure(figsize=(12, 6))
    ax3 = fig.add_subplot(1, 2, 1, projection="3d")
    ax2 = fig.add_subplot(1, 2, 2)

    body_pos = np.asarray(state.body_pos[env])
    colors = {}
    for ai, spec in enumerate(sim.built.specs):
        colors[ai] = tuple(np.clip(spec.color, 0, 1)) if spec.color else (0.5, 0.5, 0.5)

    gcursor = 0
    for ai, art in enumerate(scene.actors):
        col = colors[ai]
        for g in art.geoms:
            b = scene.body_offset[ai] + g.body
            p = body_pos[b] + np.asarray(g.pos)
            if g.gtype == GEOM_SPHERE:
                r = g.size[0]
                ax2.add_patch(plt_circle(plt, p[:2], r, col))
                ax3.scatter(*p, s=(r * 200) ** 2 * 0.5, c=[col], alpha=0.6)
            elif g.gtype == GEOM_BOX:
                hx, hy, hz = g.size
                ax2.add_patch(
                    plt.Rectangle(
                        (p[0] - hx, p[1] - hy), 2 * hx, 2 * hy,
                        color=col, alpha=0.5,
                    )
                )
                ax3.scatter(*p, s=60, c=[col], marker="s", alpha=0.6)
            else:
                r = g.size[0]
                ax2.add_patch(plt_circle(plt, p[:2], r, col))
                ax3.scatter(*p, s=40, c=[col], alpha=0.6)
        gcursor += len(art.geoms)

    if rollouts is not None and rollouts.size > 3:
        ro = np.asarray(rollouts)                       # (H, K, 3)
        step = max(1, ro.shape[1] // 64)                # subsample lines
        for k in range(0, ro.shape[1], step):
            ax2.plot(ro[:, k, 0], ro[:, k, 1], color="green", alpha=0.15, lw=0.7)
            ax3.plot(ro[:, k, 0], ro[:, k, 1], ro[:, k, 2], color="green", alpha=0.12, lw=0.6)

    for ax in (ax2,):
        ax.set_aspect("equal")
        ax.set_xlim(-3, 3)
        ax.set_ylim(-3, 3)
        ax.grid(alpha=0.2)
    ax3.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plt_circle(plt, center, r, color):
    return plt.Circle(center, r, color=color, alpha=0.5)


def save_episode_gif(frames: List[str], path: str = "episode.gif", fps: int = 10):
    """Assemble saved PNG frames into a GIF (requires pillow, gated)."""
    try:
        from PIL import Image
    except ImportError:
        return None
    imgs = [Image.open(f) for f in frames]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=1000 // fps, loop=0)
    return path


class InteractiveGoal:
    """Keyboard goal teleop — parity with the reference's WASD/QE viewer keys
    (`isaacgym_wrapper.py:116-122, 621-637`) using non-blocking stdin."""

    KEYMAP = {
        "a": (+0.1, 0.0, 0.0), "d": (-0.1, 0.0, 0.0),
        "w": (0.0, -0.1, 0.0), "s": (0.0, +0.1, 0.0),
        "q": (0.0, 0.0, +0.1), "e": (0.0, 0.0, -0.1),
    }

    def __init__(self, sim, goal_actor: str = "goal"):
        self.sim = sim
        self.goal_actor = goal_actor

    def poll(self):
        import select
        import sys

        moved = False
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1).lower()
            if ch in self.KEYMAP:
                d = np.asarray(self.KEYMAP[ch])
                pos = np.asarray(self.sim.get_actor_position_by_name(self.goal_actor))[0]
                self.sim.set_actor_position_by_name(self.goal_actor, pos + d)
                moved = True
        return moved
