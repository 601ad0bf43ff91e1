"""On-disk URDF ingestion: real asset files through `parse_urdf(path,
mesh_fit=...)` with the native mesh→primitive fitter (csrc/meshfit.cpp).

Reference analog: Isaac Gym's C++ URDF importer loading
franka_description-style URDFs with mesh collision elements and NO
``<inertial>`` tags (`mppiisaac/utils/isaacgym_utils.py:14-58`,
`assets/urdf/panda_isaac/robots/franka_panda.urdf`)."""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(REPO, "assets", "urdf", "franka_panda_gripper.urdf")

needs_assets = pytest.mark.skipif(
    not os.path.exists(ASSET), reason="run assets/generate.py first"
)


@needs_assets
def test_meshfit_recovers_primitives():
    from mppiisaac_tpu.ops import native

    fit = native.meshfit(os.path.join(REPO, "assets", "meshes", "panda_link5.obj"))
    assert fit is not None and fit["kind"] == 2        # capsule
    assert abs(fit["params"][0] - 0.05) < 5e-3         # radius
    assert abs(fit["params"][1] - 0.16) < 2e-2         # half length
    fit = native.meshfit(os.path.join(REPO, "assets", "meshes", "panda_finger.obj"))
    assert fit is not None and fit["kind"] == 1        # box (flat → not capsule)
    assert sorted(np.round(fit["half_extents"], 3)) == [0.014, 0.034, 0.05]


@needs_assets
def test_asset_urdf_parses_with_mesh_collisions():
    from mppiisaac_tpu.scene.assets import load_urdf_file

    rs = load_urdf_file(ASSET)
    # every arm link got a primitive from its mesh collision element
    for i in range(8):
        assert len(rs.links[f"panda_link{i}"].geoms) == 1, f"link{i}"
    assert len(rs.links["panda_hand"].geoms) == 1
    # identified masses (Gaz et al. 2019) carried through
    assert abs(rs.links["panda_link1"].mass - 4.97) < 1e-6
    # 9 movable joints (7 arm + 2 fingers)
    movable = [j for j in rs.joints if j.jtype != 0]
    assert len(movable) == 9


@needs_assets
def test_asset_fk_matches_procedural(tmp_path):
    """FK through the full engine: the disk asset and the procedural
    registry model must agree on EE placement at several configurations."""
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig

    def ee_at(urdf_file, q7):
        spec = ActorSpec(type="robot", name="panda", fixed=True,
                         urdf_file=urdf_file)
        sim = Simulation(SimConfig(dt=0.05, substeps=1), [spec], num_envs=1)
        nd = sim.scene.ndof
        ds = np.zeros((nd, 2), np.float32)
        ds[:7, 0] = q7
        sim.set_dof_state(ds)
        return np.asarray(sim.view.link_position("panda_ee", "panda"))[0]

    for q7 in (np.zeros(7),
               np.array([0.3, -0.6, 0.2, -1.8, 0.1, 1.5, 0.4]),
               np.array([-1.0, 0.5, 0.8, -2.2, -0.4, 2.4, -0.9])):
        a = ee_at("franka_panda_gripper.urdf", q7)
        b = ee_at("panda_gripper", q7)
        assert np.allclose(a, b, atol=1e-3), (q7, a, b)


@needs_assets
@pytest.mark.parametrize(
    "robot,urdf_rel,probe_link",
    [
        ("albert", "albert/albert.urdf", "mmrobot_link7"),
        ("anymal", "anymal_c/urdf/anymal.urdf", "LF_KFE"),
        ("boxer", "boxer/boxer.urdf", "ee_link"),
        ("jackal", "jackal/jackal.urdf", "ee_link"),
        ("husky", "husky_description/husky.urdf", "ee_link"),
        ("omni_panda", "omni_panda/omniPandaWithGripper.urdf", "panda_hand"),
        # primitive-style URDFs (no meshes — reference ships heijn.urdf and
        # point_robot.urdf the same way); exercises the primitive parse path
        ("heijn", "heijn/heijn.urdf", "front_link"),
        ("point_robot", "point_robot.urdf", "base_link"),
    ],
)
def test_mobile_asset_roundtrip(robot, urdf_rel, probe_link):
    """Reference-layout mesh-collision URDFs (albert / anymal_c / boxer —
    `/root/reference/assets/urdf/albert/albert.urdf`,
    `mppiisaac/utils/isaacgym_utils.py:14-58`) ingest through
    parse_urdf(path, mesh_fit=csrc/meshfit) and reproduce the procedural
    oracle: same joint structure, same FK, primitive fits within tolerance."""
    from mppiisaac_tpu.physics.urdf import parse_urdf
    from mppiisaac_tpu.scene.assets import load_urdf_file
    from mppiisaac_tpu.scene.robots import robot_urdf

    path = os.path.join(REPO, "assets", "urdf", *urdf_rel.split("/"))
    rs = load_urdf_file(path)
    oracle = parse_urdf(robot_urdf(robot))

    # identical joint structure (names, types, parents, limits)
    assert [j.name for j in rs.joints] == [j.name for j in oracle.joints]
    for ja, jb in zip(rs.joints, oracle.joints):
        assert ja.jtype == jb.jtype, ja.name
        assert ja.parent == jb.parent and ja.child == jb.child
        assert np.allclose(ja.origin_pos, jb.origin_pos, atol=1e-5), ja.name
        assert np.allclose(ja.axis, jb.axis, atol=1e-5), ja.name

    # every oracle collision produced a fitted primitive of sane size
    for ln, lk in oracle.links.items():
        assert len(rs.links[ln].geoms) == len(lk.geoms), ln
        for ga, gb in zip(rs.links[ln].geoms, lk.geoms):
            # size agreement: boxes up to PCA axis ordering; otherwise the
            # radius (fit may change type, e.g. sphere → short capsule)
            from mppiisaac_tpu.physics.urdf import GEOM_BOX

            if ga.gtype == GEOM_BOX and gb.gtype == GEOM_BOX:
                a_s = sorted(float(v) for v in ga.size)
                b_s = sorted(float(v) for v in gb.size)
                assert np.allclose(a_s, b_s, atol=0.02), (ln, a_s, b_s)
            else:
                assert abs(float(ga.size[0]) - float(gb.size[0])) < 0.02, ln

    # FK through the full engine at a bent configuration
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig

    def probe(urdf_file):
        spec = ActorSpec(type="robot", name=robot, fixed=True,
                         urdf_file=urdf_file)
        sim = Simulation(SimConfig(dt=0.05, substeps=1), [spec], num_envs=1)
        nd = sim.scene.ndof
        ds = np.zeros((nd, 2), np.float32)
        ds[:, 0] = 0.3 * np.sin(np.arange(nd))
        sim.set_dof_state(ds)
        return np.asarray(sim.view.link_position(probe_link, robot))[0]

    a = probe(urdf_rel)
    b = probe(robot)
    assert np.allclose(a, b, atol=1e-3), (a, b)


def test_missing_inertial_derived_from_geometry():
    """Importer parity: links without <inertial> get density-derived
    mass/COM/inertia from their collision primitives."""
    from mppiisaac_tpu.physics.urdf import parse_urdf

    xml = """<robot name="r">
      <link name="base">
        <collision><origin xyz="0 0 0.1"/>
          <geometry><box size="0.2 0.2 0.2"/></geometry></collision>
      </link>
    </robot>"""
    rs = parse_urdf(xml)
    l = rs.links["base"]
    assert abs(l.mass - 8.0) < 1e-6                      # 0.008 m³ × 1000 kg/m³
    assert np.allclose(l.com, [0, 0, 0.1])
    # box inertia m/3 h² about COM (h = 0.1)
    assert abs(l.inertia[0, 0] - 8.0 / 3.0 * 0.02) < 1e-9
    assert abs(l.inertia[0, 1]) < 1e-12
