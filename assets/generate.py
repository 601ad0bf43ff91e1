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
            # pad inner face flush with the grasp plane: the mesh is offset
            # OUTWARD by its 7 mm half-thickness (the real Franka finger
            # collision extends outward from the joint plane; a centered pad
            # leaves 2q−14 mm between the pads — too narrow to cage the
            # 4 cm pick block at the tasks' working grips)
            out.append(_mesh_collision("../meshes/panda_finger.obj", (0, sy * 0.007, 0.028), (0, 0, 0)))
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


# ---------------------------------------------------------------------------
# generic procedural-robot → mesh-collision URDF emitter (reference layout)
# ---------------------------------------------------------------------------


def _quat_to_rpy(q):
    """xyzw quat → URDF rpy (extrinsic XYZ)."""
    x, y, z, w = (float(v) for v in q)
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return (roll, pitch, yaw)


def _prim_collision(g, xyz, rpy) -> str:
    from mppiisaac_tpu.physics.urdf import GEOM_CAPSULE, GEOM_SPHERE

    if g.gtype == GEOM_SPHERE:
        geom = f'<sphere radius="{float(g.size[0]):.6g}"/>'
    elif g.gtype == GEOM_CAPSULE:
        geom = (f'<capsule radius="{float(g.size[0]):.6g}" '
                f'length="{2.0 * float(g.size[1]):.6g}"/>')
    else:
        geom = (f'<box size="{2 * float(g.size[0]):.6g} '
                f'{2 * float(g.size[1]):.6g} {2 * float(g.size[2]):.6g}"/>')
    return (
        f'    <collision><origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" '
        f'rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>'
        f"<geometry>{geom}</geometry></collision>\n"
    )


def emit_mesh_urdf(robot_name: str, urdf_rel: str, mesh_rel_prefix: str,
                   use_meshes: bool = True):
    """Write assets/urdf/<urdf_rel> with per-link MESH collision elements
    tessellated from the procedural model's primitives (the reference ships
    mesh-collision URDFs in exactly this layout, e.g.
    `/root/reference/assets/urdf/albert/albert.urdf`,
    `anymal_c/urdf/anymal.urdf` — loader `isaacgym_utils.py:14-58`). The
    procedural model stays in scene/robots.py as the test oracle; tasks load
    THESE files through parse_urdf(path, mesh_fit=csrc/meshfit)."""
    from mppiisaac_tpu.physics.urdf import (
        GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, JOINT_FIXED, JOINT_PRISMATIC,
        JOINT_REVOLUTE, parse_urdf,
    )
    from mppiisaac_tpu.scene.robots import robot_urdf

    spec = parse_urdf(robot_urdf(robot_name))
    urdf_path = os.path.join(HERE, "urdf", urdf_rel)
    urdf_dir = os.path.dirname(urdf_path)
    mesh_dir = os.path.normpath(os.path.join(urdf_dir, mesh_rel_prefix))
    os.makedirs(urdf_dir, exist_ok=True)
    if use_meshes:
        os.makedirs(mesh_dir, exist_ok=True)

    out = [f'<robot name="{spec.name}">\n']
    # document order: root link first, then joints in spec order
    link_order = [spec.root_link] + [j.child for j in spec.joints]
    for ln in link_order:
        lk = spec.links[ln]
        out.append(f'  <link name="{ln}">\n')
        I = lk.inertia
        out.append(
            f'    <inertial><origin xyz="{lk.com[0]:.6g} {lk.com[1]:.6g} {lk.com[2]:.6g}"/>'
            f'<mass value="{max(lk.mass, 1e-3):.6g}"/>'
            f'<inertia ixx="{max(I[0][0], 1e-6):.6g}" iyy="{max(I[1][1], 1e-6):.6g}" '
            f'izz="{max(I[2][2], 1e-6):.6g}" ixy="{I[0][1]:.6g}" ixz="{I[0][2]:.6g}" '
            f'iyz="{I[1][2]:.6g}"/></inertial>\n'
        )
        for gi, g in enumerate(lk.geoms):
            rpy = _quat_to_rpy(g.quat)
            xyz = (f"{g.pos[0]:.6g}", f"{g.pos[1]:.6g}", f"{g.pos[2]:.6g}")
            rpy_s = (f"{rpy[0]:.6g}", f"{rpy[1]:.6g}", f"{rpy[2]:.6g}")
            if not use_meshes:
                # primitive collision elements, matching the reference's
                # primitive-style URDFs (e.g. assets/urdf/heijn/heijn.urdf,
                # point_robot.urdf have no mesh dir)
                out.append(_prim_collision(g, xyz, rpy_s))
                continue
            mesh_name = f"{ln}_{gi}.obj"
            if g.gtype == GEOM_SPHERE:
                obj = capsule_obj(float(g.size[0]), 0.0)
            elif g.gtype == GEOM_CAPSULE:
                obj = capsule_obj(float(g.size[0]), float(g.size[1]))
            else:
                obj = box_obj(float(g.size[0]), float(g.size[1]), float(g.size[2]))
            with open(os.path.join(mesh_dir, mesh_name), "w") as f:
                f.write(obj)
            out.append(_mesh_collision(f"{mesh_rel_prefix}/{mesh_name}", xyz, rpy_s))
        out.append("  </link>\n")
    for j in spec.joints:
        wide = (j.upper - j.lower) > 60.0
        if j.jtype == JOINT_FIXED:
            jt = "fixed"
        elif j.jtype == JOINT_PRISMATIC:
            jt = "prismatic"
        else:
            jt = "continuous" if wide else "revolute"
        rpy = _quat_to_rpy(j.origin_quat)
        out.append(
            f'  <joint name="{j.name}" type="{jt}">\n'
            f'    <parent link="{j.parent}"/><child link="{j.child}"/>\n'
            f'    <origin xyz="{j.origin_pos[0]:.6g} {j.origin_pos[1]:.6g} '
            f'{j.origin_pos[2]:.6g}" rpy="{rpy[0]:.6g} {rpy[1]:.6g} {rpy[2]:.6g}"/>\n'
        )
        if jt != "fixed":
            out.append(f'    <axis xyz="{j.axis[0]:.6g} {j.axis[1]:.6g} {j.axis[2]:.6g}"/>\n')
            if jt != "continuous":
                out.append(
                    f'    <limit lower="{j.lower:.6g}" upper="{j.upper:.6g}" '
                    f'effort="{j.effort:.6g}" velocity="{j.velocity:.6g}"/>\n'
                )
            else:
                out.append(f'    <limit effort="{j.effort:.6g}" velocity="{j.velocity:.6g}"/>\n')
            if j.damping or j.friction:
                out.append(f'    <dynamics damping="{j.damping:.6g}" friction="{j.friction:.6g}"/>\n')
        out.append("  </joint>\n")
    out.append("</robot>\n")
    with open(urdf_path, "w") as f:
        f.write("".join(out))
    print(f"wrote {urdf_path} (+{sum(len(spec.links[l].geoms) for l in link_order)} meshes)")


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

    # reference-layout mesh-collision URDFs for the mobile robots (the
    # reference asset tree: albert/albert.urdf, anymal_c/urdf/anymal.urdf,
    # boxer/boxer.urdf — `isaacgym_utils.py:14-58`)
    emit_mesh_urdf("albert", os.path.join("albert", "albert.urdf"), "meshes")
    emit_mesh_urdf("anymal", os.path.join("anymal_c", "urdf", "anymal.urdf"), "../meshes")
    emit_mesh_urdf("boxer", os.path.join("boxer", "boxer.urdf"), "meshes")
    emit_mesh_urdf("jackal", os.path.join("jackal", "jackal.urdf"), "meshes")
    emit_mesh_urdf("husky", os.path.join("husky_description", "husky.urdf"),
                   "meshes")
    emit_mesh_urdf("omni_panda",
                   os.path.join("omni_panda", "omniPandaWithGripper.urdf"),
                   "meshes")
    # primitive-style URDFs — the reference ships these two WITHOUT meshes
    # (assets/urdf/heijn/heijn.urdf, assets/urdf/point_robot.urdf)
    emit_mesh_urdf("heijn", os.path.join("heijn", "heijn.urdf"), "meshes",
                   use_meshes=False)
    emit_mesh_urdf("point_robot", "point_robot.urdf", "meshes",
                   use_meshes=False)
    print(f"wrote assets under {HERE}")


if __name__ == "__main__":
    main()
