import os

import numpy as np
import pytest

from tauray_tpu.io import exr

REF = "/root/reference"


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip", "piz"])
@pytest.mark.parametrize("dtype", [np.float16, np.float32])
def test_roundtrip(tmp_path, compression, dtype):
    rng = np.random.default_rng(42)
    img = rng.standard_normal((67, 93, 3)).astype(np.float32)
    img[5:20, 5:20] = 0.25  # constant block exercises RLE paths
    path = str(tmp_path / "t.exr")
    exr.write_rgb(path, img, compression=compression, half=dtype == np.float16)
    back = exr.read_rgb(path)
    expect = img.astype(dtype).astype(np.float32)
    np.testing.assert_array_equal(back, expect)


def test_roundtrip_large_piz(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((128, 256, 3)) * 4.0).astype(np.float32)
    path = str(tmp_path / "t.exr")
    exr.write_rgb(path, img, compression="piz", half=True)
    back = exr.read_rgb(path)
    np.testing.assert_array_equal(back, img.astype(np.float16).astype(np.float32))


def test_nan_inf_roundtrip(tmp_path):
    img = np.full((16, 16, 3), np.nan, dtype=np.float32)
    img[0, 0] = np.inf
    img[1, 1] = -np.inf
    img[2, 2] = 1.25
    path = str(tmp_path / "t.exr")
    exr.write_rgb(path, img, compression="zip", half=True)
    back = exr.read_rgb(path)
    assert np.isnan(back[5, 5]).all()
    assert np.isposinf(back[0, 0]).all()
    assert np.isneginf(back[1, 1]).all()
    assert back[2, 2, 0] == 1.25


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize(
    "name,lo,hi",
    [
        ("albedo", 0.0, 1.0),
        ("world-normal", -1.0, 1.0),
        ("view-normal", -1.0, 1.0),
        ("distance", 5.0, 10.0),
        ("path-tracer", 0.0, 1.0),
        ("raster", 0.0, 1.0),
    ],
)
def test_read_reference_piz_goldens(name, lo, hi):
    """Reference goldens are PIZ-compressed half RGB (reference:
    test/references/*.exr); decoded values must be finite and in range."""
    img = exr.read_rgb(f"{REF}/test/references/validate_{name}.exr")
    assert img.shape == (512, 512, 3)
    assert np.isfinite(img).all()
    assert img.min() >= lo - 1e-3
    assert img.max() <= hi + 1e-3


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_read_uncompressed_reference():
    img = exr.read(f"{REF}/data/brdf_integration.exr")
    assert set(img.keys()) == {"R", "G"}
    assert np.isfinite(img["R"].astype(np.float32)).all()
