"""Author the on-disk URDF asset library (`assets/urdf/` + `assets/meshes/`).

The reference ships franka_description-style URDFs whose collision geometry is
mesh files, loaded through Isaac Gym's C++ importer with no ``<inertial>``
elements (inertia derived from geometry — reference
`assets/urdf/panda_isaac/robots/franka_panda.urdf`, loader
`mppiisaac/utils/isaacgym_utils.py:14-58`). This script writes our own asset
files in that style: the Franka kinematic tree (public franka_description
frame values, identical to `scene/robots.py`), identified link masses (Gaz et
al., RA-L 2019), and per-link collision MESHES (tessellated OBJ) so the full
ingestion path — `parse_urdf(path, mesh_fit=...)` → `csrc/meshfit.cpp` →
primitive contacts — is exercised end-to-end.

Run:  python assets/generate.py     (idempotent; outputs are committed)
"""
from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

import sys

sys.path.insert(0, REPO)

from mppiisaac_tpu.scene.robots import _PANDA_CAPS, _PANDA_JOINTS, _PANDA_MASSES  # noqa: E402


# ---------------------------------------------------------------------------
# mesh tessellation (capsule / box → OBJ)
# ---------------------------------------------------------------------------


def capsule_obj(r: float, hl: float, n_seg=24, n_ring=8) -> str:
    """Capsule along +z, centered at origin: cylinder wall + two spherical
    caps, vertex cloud dense enough for a stable PCA fit."""
    verts = []
    for iz in range(9):
        z = -hl + 2.0 * hl * iz / 8.0
        for ia in range(n_seg):
            a = 2.0 * np.pi * ia / n_seg
            verts.append((r * np.cos(a), r * np.sin(a), z))
    for sign in (+1.0, -1.0):
        for ir in range(1, n_ring + 1):
            phi = 0.5 * np.pi * ir / n_ring
            rz = r * np.cos(phi)
            dz = r * np.sin(phi)
            for ia in range(n_seg):
                a = 2.0 * np.pi * ia / n_seg
                verts.append((rz * np.cos(a), rz * np.sin(a), sign * (hl + dz)))
    lines = [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in verts]
    return "\n".join(["# capsule r=%g hl=%g" % (r, hl)] + lines) + "\n"


def box_obj(hx: float, hy: float, hz: float, n=5) -> str:
    """Axis-aligned box, faces sampled on an n×n grid per face."""
    verts = []
    lin = np.linspace(-1.0, 1.0, n)
    for u in lin:
        for v in lin:
            verts += [
                (hx * u, hy * v, -hz), (hx * u, hy * v, hz),
                (hx * u, -hy, hz * v), (hx * u, hy, hz * v),
                (-hx, hy * u, hz * v), (hx, hy * u, hz * v),
            ]
    lines = [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in verts]
    return "\n".join(["# box %g %g %g" % (hx, hy, hz)] + lines) + "\n"


# ---------------------------------------------------------------------------
# URDF emission
# ---------------------------------------------------------------------------


def _inertial(mass, com, caps_r, caps_hl) -> str:
    i = 0.3 * mass * (caps_r * caps_r + caps_hl * caps_hl / 3.0)
    return (
        f'    <inertial><origin xyz="{com[0]} {com[1]} {com[2]}"/>'
        f'<mass value="{mass}"/>'
        f'<inertia ixx="{i:.6g}" iyy="{i:.6g}" izz="{i:.6g}" ixy="0" ixz="0" iyz="0"/>'
        "</inertial>\n"
    )


def _mesh_collision(mesh_rel, xyz, rpy) -> str:
    return (
        f'    <collision><origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" '
        f'rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>'
        f'<geometry><mesh filename="{mesh_rel}"/></geometry></collision>\n'
    )


def franka_urdf(gripper: bool) -> str:
    out = [f'<robot name="franka_panda{"_gripper" if gripper else ""}">\n']
    pi = float(np.pi)

    # link0 (pedestal)
    out.append('  <link name="panda_link0">\n')
    out.append(_inertial(2.9, (-0.02, 0, 0.08), 0.07, 0.08))
    out.append(_mesh_collision("../meshes/panda_link0.obj", (-0.04, 0, 0.08), (0, pi / 2, 0)))
    out.append("  </link>\n")

    for i, (xyz, rpy, lo, hi, eff, vel) in enumerate(_PANDA_JOINTS, start=1):
        r, hl, off, crpy = _PANDA_CAPS[i - 1]
        out.append(f'  <link name="panda_link{i}">\n')
        out.append(_inertial(_PANDA_MASSES[i - 1],
                             (off[0] * 0.5, off[1] * 0.5, off[2] * 0.5), r, hl))
        out.append(_mesh_collision(f"../meshes/panda_link{i}.obj", off, crpy))
        out.append("  </link>\n")
        out.append(
            f'  <joint name="panda_joint{i}" type="revolute">\n'
            f'    <parent link="panda_link{i-1}"/><child link="panda_link{i}"/>\n'
            f'    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>\n'
            '    <axis xyz="0 0 1"/>\n'
            f'    <limit lower="{lo}" upper="{hi}" effort="{eff}" velocity="{vel}"/>\n'
            '    <dynamics damping="1.0"/>\n'
            "  </joint>\n"
        )

    out.append('  <link name="panda_link8"><inertial><origin xyz="0 0 0"/>'
               '<mass value="0.01"/><inertia ixx="1e-5" iyy="1e-5" izz="1e-5" '
               'ixy="0" ixz="0" iyz="0"/></inertial></link>\n')
    out.append('  <joint name="panda_joint8" type="fixed">\n'
               '    <parent link="panda_link7"/><child link="panda_link8"/>\n'
               '    <origin xyz="0 0 0.107" rpy="0 0 0"/>\n  </joint>\n')

    if not gripper:
        out.append('  <link name="panda_ee"><inertial><origin xyz="0 0 0"/>'
                   '<mass value="0.01"/><inertia ixx="1e-6" iyy="1e-6" izz="1e-6" '
                   'ixy="0" ixz="0" iyz="0"/></inertial></link>\n')
        out.append(f'  <joint name="panda_ee_joint" type="fixed">\n'
                   f'    <parent link="panda_link8"/><child link="panda_ee"/>\n'
                   f'    <origin xyz="0 0 0" rpy="0 0 {-pi/4}"/>\n  </joint>\n')
    else:
        out.append('  <link name="panda_hand">\n')
        out.append(_inertial(0.73, (0, 0, 0.03), 0.06, 0.08))
        out.append(_mesh_collision("../meshes/panda_hand.obj", (0, 0, 0.03), (0, 0, 0)))
        out.append("  </link>\n")
        out.append(f'  <joint name="panda_hand_joint" type="fixed">\n'
                   f'    <parent link="panda_link8"/><child link="panda_hand"/>\n'
                   f'    <origin xyz="0 0 0" rpy="0 0 {-pi/4}"/>\n  </joint>\n')
        for fi, sy in (("1", 1.0), ("2", -1.0)):
            out.append(f'  <link name="panda_finger{fi}">\n')
            out.append(_inertial(0.015, (0, 0, 0.028), 0.014, 0.05))
            out.append(_mesh_collision("../meshes/panda_finger.obj", (0, 0, 0.028), (0, 0, 0)))
            out.append("  </link>\n")
            out.append(
                f'  <joint name="panda_finger_joint{fi}" type="prismatic">\n'
                f'    <parent link="panda_hand"/><child link="panda_finger{fi}"/>\n'
                f'    <origin xyz="0 {sy * 0.0} 0.0584" rpy="0 0 0"/>\n'
                f'    <axis xyz="0 {sy} 0"/>\n'
                '    <limit lower="0.0" upper="0.04" effort="20" velocity="0.2"/>\n'
                "  </joint>\n"
            )
        out.append('  <link name="panda_ee"><inertial><origin xyz="0 0 0"/>'
                   '<mass value="0.001"/><inertia ixx="1e-6" iyy="1e-6" izz="1e-6" '
                   'ixy="0" ixz="0" iyz="0"/></inertial></link>\n')
        out.append('  <joint name="panda_ee_joint" type="fixed">\n'
                   '    <parent link="panda_hand"/><child link="panda_ee"/>\n'
                   '    <origin xyz="0 0 0.1034" rpy="0 0 0"/>\n  </joint>\n')

    out.append("</robot>\n")
    return "".join(out)


def main():
    mesh_dir = os.path.join(HERE, "meshes")
    urdf_dir = os.path.join(HERE, "urdf")
    os.makedirs(mesh_dir, exist_ok=True)
    os.makedirs(urdf_dir, exist_ok=True)

    with open(os.path.join(mesh_dir, "panda_link0.obj"), "w") as f:
        f.write(capsule_obj(0.07, 0.08))
    for i, (r, hl, _, _) in enumerate(_PANDA_CAPS, start=1):
        with open(os.path.join(mesh_dir, f"panda_link{i}.obj"), "w") as f:
            f.write(capsule_obj(r, hl))
    with open(os.path.join(mesh_dir, "panda_hand.obj"), "w") as f:
        f.write(box_obj(0.06, 0.2, 0.08))
    with open(os.path.join(mesh_dir, "panda_finger.obj"), "w") as f:
        f.write(box_obj(0.034, 0.014, 0.05))

    for gripper, name in ((False, "franka_panda.urdf"), (True, "franka_panda_gripper.urdf")):
        with open(os.path.join(urdf_dir, name), "w") as f:
            f.write(franka_urdf(gripper))
    print(f"wrote assets under {HERE}")


if __name__ == "__main__":
    main()
