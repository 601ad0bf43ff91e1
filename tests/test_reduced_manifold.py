"""rollout_manifold=reduced: the corners-only planner-model contact tables.

The fast-fidelity fused rollout may rebuild its contact tables with 8 bbc
samples (corners only) instead of the world's 14 (corners + face centers) —
~40% fewer swept candidates on pick-class scenes (fused_rollout.py manifold
param). These tests pin the table algebra and the behavioral equivalence of
the reduced narrowphase on a resting box stack (XLA path — cheap on CPU;
the fused kernel consumes the identical tables)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.physics.contact import (
    build_contact_tables,
    compute_contact_forces,
)
from mppiisaac_tpu.physics.step import Engine
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig, build_scene


@pytest.fixture(scope="module")
def boxes():
    specs = [
        # free block resting on a fixed table box (the bbc pair), both
        # directions kept by the volume gate
        ActorSpec(type="box", name="table", size=[0.6, 0.6, 0.2],
                  init_pos=[0.0, 0.0, 0.1], fixed=True, friction=0.5),
        ActorSpec(type="box", name="block", size=[0.08, 0.08, 0.08],
                  init_pos=[0.0, 0.0, 0.245], mass=0.2, friction=0.5),
    ]
    return build_scene(specs, SimConfig(dt=0.05, substeps=2))


def test_reduced_tables_shape(boxes):
    s = boxes.scene
    full = build_contact_tables(s)
    red = build_contact_tables(s, bbc_samples=8)
    assert full.bbc_samples == 14 and red.bbc_samples == 8
    # same pair set, fewer flat candidates: Δ = (14-8)·n_bbc_pairs
    assert len(red.bbc_a) == len(full.bbc_a)
    assert full.n_con - red.n_con == 6 * len(full.bbc_a)
    # ordering contract: the reduced table is a prefix-consistent enumeration
    # (all non-bbc groups identical)
    n_nonbbc = full.n_con - full.bbc_samples * len(full.bbc_a)
    np.testing.assert_array_equal(
        red.con_geom_a[:n_nonbbc], full.con_geom_a[:n_nonbbc]
    )


def test_reduced_narrowphase_supports_resting_box(boxes):
    """A block resting flat on a table: corner samples alone carry the
    face-face patch (4 corners inside), so the reduced manifold's total
    normal force must match the full manifold's within a few percent."""
    s = boxes.scene
    engine = Engine(s, use_impulse=False)
    st = boxes.initial_state(engine)
    full = build_contact_tables(s)
    red = build_contact_tables(s, bbc_samples=8)
    bi = s.actor_index("block")

    def settle_z(tables):
        eng = Engine(s, use_impulse=False)
        eng.tables = tables
        x = st
        for _ in range(40):
            x = eng.step(x)
        return float(x.root_pos[bi, 2]), float(jnp.abs(x.root_linvel[bi]).max())

    z_full, v_full = settle_z(full)
    z_red, v_red = settle_z(red)
    assert abs(z_full - z_red) < 2e-3, (z_full, z_red)
    assert v_full < 0.05 and v_red < 0.05
    # resting height sane: table top 0.2 + half block 0.04 − penetration
    assert 0.2 < z_red < 0.26
