"""Native C++ accelerator parity vs the pure-Python fallbacks."""

import numpy as np
import pytest

from tauray_tpu import native


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_huf_decode_matches_python():
    from tauray_tpu.io import exr
    rng = np.random.default_rng(3)
    # runs + long tail to exercise RLE and long codes
    data = np.concatenate([
        np.repeat(rng.integers(0, 1 << 16, 64), rng.integers(1, 40, 64)),
        rng.integers(0, 1 << 16, 4096),
        np.zeros(700, np.int64)]).astype(np.uint16)
    comp = exr._huf_encode(data)
    import struct
    him, hiM, tlen, nbits, _ = struct.unpack_from("<IIIII", comp, 0)
    hcode, _ = exr._huf_unpack_enc_table(comp[20:20 + tlen], him, hiM)
    got = native.huf_decode(comp[20 + tlen:], nbits, hcode, hiM,
                            data.size)
    dec = exr._huf_build_dec_table(hcode, him, hiM)
    ref = exr._huf_decode(comp[20 + tlen:], nbits, hcode, dec, hiM,
                          data.size)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got, data)


@needs_native
def test_huf_decode_reference_golden():
    """Reading a reference PIZ golden goes through the native decoder and
    must match pixel-for-pixel what the Python decoder produces."""
    import os
    from tauray_tpu.io import exr
    path = "/root/reference/test/references/validate_albedo.exr"
    if not os.path.exists(path):
        pytest.skip("no reference goldens")
    img_native = exr.read_rgb(path)
    os.environ["TAURAY_NATIVE"] = "0"
    native._tried, native._lib = False, None
    try:
        img_py = exr.read_rgb(path)
    finally:
        os.environ.pop("TAURAY_NATIVE")
        native._tried, native._lib = False, None
    np.testing.assert_array_equal(img_native, img_py)


@needs_native
def test_morton_order_matches_python():
    from tauray_tpu.ops.bvh import morton_3d
    rng = np.random.default_rng(5)
    n = 5000
    centroids = (rng.random((n, 3)) * 20 - 10).astype(np.float32)
    valid = rng.random(n) > 0.1
    got = native.morton_order(centroids, valid)

    sel = valid if valid.any() else np.ones(n, bool)
    lo = centroids[sel].min(axis=0)
    hi = centroids[sel].max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    grid = np.clip(((centroids - lo) / ext) * 1023.0,
                   0, 1023).astype(np.uint32)
    codes = morton_3d(grid).astype(np.uint64)
    ref = np.lexsort((np.arange(n),
                      codes + (~valid).astype(np.uint64) * (1 << 32)))
    np.testing.assert_array_equal(got, ref)
