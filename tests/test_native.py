"""Native C++ components: Halton core parity and mesh fitting."""
import os
import struct
import tempfile

import numpy as np
import pytest

from mppiisaac_tpu.ops import native


def test_native_halton_matches_numpy():
    lib = native.load("halton")
    if lib is None:
        pytest.skip("g++ unavailable")
    nat = native.halton(256, 8, skip=5)
    assert nat is not None and nat.shape == (256, 8)
    # numpy reference implementation (mppi/sampling.py fallback)
    from mppiisaac_tpu.mppi import sampling

    ref = sampling._halton_numpy(256, 8, skip=5)
    np.testing.assert_allclose(nat, ref, atol=1e-12)


def _write_binary_stl(path, tris):
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 1))
            for v in t:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def test_meshfit_box():
    lib = native.load("meshfit")
    if lib is None:
        pytest.skip("g++ unavailable")
    # a 0.2 x 0.4 x 0.6 box centered at (1,2,3): 12 triangles' corners suffice
    hx, hy, hz = 0.1, 0.2, 0.3
    c = np.array([1.0, 2.0, 3.0])
    corners = [
        c + [sx * hx, sy * hy, sz * hz]
        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
    ]
    tris = [corners[:3], corners[3:6], [corners[6], corners[7], corners[0]]]
    # use all corners across tris to cover the extents
    tris = [
        [corners[0], corners[1], corners[2]],
        [corners[3], corners[4], corners[5]],
        [corners[6], corners[7], corners[0]],
        [corners[1], corners[4], corners[7]],
    ]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "box.stl")
        _write_binary_stl(p, tris)
        fit = native.meshfit(p)
    assert fit is not None
    # PCA axes aren't exactly box axes for a sparse corner sample; the fit
    # must be centered right and enclose (but not wildly exceed) the extents
    np.testing.assert_allclose(fit["pos"], c, atol=0.1)
    assert hz - 1e-5 <= sorted(fit["half_extents"])[-1] < 2.0 * hz


def test_meshfit_elongated_capsule():
    lib = native.load("meshfit")
    if lib is None:
        pytest.skip("g++ unavailable")
    # long thin rod along x → capsule
    rng = np.random.RandomState(0)
    pts = np.stack([
        rng.uniform(-0.5, 0.5, 300),
        0.02 * rng.randn(300),
        0.02 * rng.randn(300),
    ], 1)
    tris = [pts[i:i + 3] for i in range(0, 297, 3)]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "rod.stl")
        _write_binary_stl(p, tris)
        fit = native.meshfit(p)
    assert fit is not None
    assert fit["kind"] == 2  # capsule
    assert 0.3 < fit["params"][1] + fit["params"][0] < 0.6  # half length + r
