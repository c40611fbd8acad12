import json
import os

import numpy as np
import pytest

REF_SCENE = "/root/reference/test/test.glb"


@pytest.mark.skipif(not os.path.exists(REF_SCENE), reason="no reference")
def test_gltf_loader_counts():
    from tauray_tpu.io.gltf import load_scene
    s = load_scene(REF_SCENE)
    st = s.stats()
    # (reference: test/test.glb contents)
    assert st["triangles"] == 81364
    assert st["instances"] == 8
    assert st["point_lights"] == 1
    assert st["directional_lights"] == 1
    assert st["cameras"] == 1
    assert st["sh_grids"] == 1
    cam = s.enabled_cameras()[0]
    np.testing.assert_allclose(cam.transform.get_global_position(),
                               [0, 0, 6.828], atol=1e-3)
    assert abs(cam.camera.fov - 45.0) < 1e-3


@pytest.mark.skipif(not os.path.exists(REF_SCENE), reason="no reference")
def test_scene_arrays_flatten():
    from tauray_tpu.io.gltf import load_scene
    from tauray_tpu.options import Options
    from tauray_tpu.scene.arrays import SceneArrays
    s = load_scene(REF_SCENE)
    sa = SceneArrays(s, Options())
    assert sa.num_triangles == 81364
    assert sa.padded_triangles % 256 == 0
    assert sa.point_count == 1 and sa.dir_count == 1
    assert sa.any_alpha_materials  # the logo plane is alpha-blended
    # spot light packed params
    assert sa.pl_spot_radius[0] >= 0  # it is a spotlight
    assert 0 < sa.pl_dir_cutoff[0] < 1
    # directional angular radius from TR_data (0.0997 rad)
    assert abs(sa.dl_dir_cutoff[0] - np.cos(0.09966865)) < 1e-4


def test_headless_output_formats(tmp_path):
    from tauray_tpu.app.headless import HeadlessOutput
    from tauray_tpu.options import Options
    from tauray_tpu.io import exr

    img = np.random.default_rng(0).random((1, 8, 8, 4)).astype(np.float32)
    for ftype in ("exr", "png", "bmp", "hdr", "raw"):
        opt = Options()
        opt.headless = str(tmp_path / f"t_{ftype}_")
        opt.filetype = ftype
        out = HeadlessOutput(opt, (8, 8))
        out.save_frame(img)
        out.finish()
        path = opt.headless + "." + ftype
        assert os.path.exists(path), ftype
    back = exr.read_rgb(str(tmp_path / "t_exr_.exr"))
    np.testing.assert_allclose(back, img[0, ..., :3].astype(np.float16),
                               atol=1e-3)
    raw = np.fromfile(str(tmp_path / "t_raw_.raw"), np.float32)
    np.testing.assert_array_equal(raw.reshape(8, 8, 4), img[0])


def test_hdr_roundtrip(tmp_path):
    from tauray_tpu.app.headless import write_hdr
    from tauray_tpu.scene.environment_map import load_hdr
    img = (np.random.default_rng(1).random((16, 16, 3)) * 4).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    back = load_hdr(p)
    # RGBE has ~1% mantissa precision
    np.testing.assert_allclose(back, img, rtol=0.02, atol=0.02)


def test_obj_loader(tmp_path):
    from tauray_tpu.io.assimp_like import load_obj
    obj = tmp_path / "tri.obj"
    obj.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
""")
    s = load_obj(str(obj))
    assert s.stats()["triangles"] == 1


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from tauray_tpu.options import Options
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    opt = Options()
    rr = PathTracerRenderer(opt)
    rr.accum_color = jnp.ones((16, 4))
    rr.samples_accumulated = 7
    rr.frame_counter = 3
    p = str(tmp_path / "ckpt.npz")
    rr.save_checkpoint(p)
    rr2 = PathTracerRenderer(opt)
    assert rr2.load_checkpoint(p)
    assert rr2.samples_accumulated == 7
    assert np.asarray(rr2.accum_color).shape == (16, 4)


def test_binary_ply_roundtrip(tmp_path):
    """Binary little-endian PLY loads like its ASCII twin (reference:
    assimp/tinyply fallback, src/assimp.cc)."""
    import struct
    import numpy as np
    from tauray_tpu.io.assimp_like import load_ply
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    faces = [[0, 1, 2], [0, 2, 3]]
    p = tmp_path / "quad.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\nproperty float x\nproperty float y\n"
                b"property float z\n")
        f.write(b"element face 2\n"
                b"property list uchar int vertex_indices\nend_header\n")
        f.write(verts.astype("<f4").tobytes())
        for fa in faces:
            f.write(struct.pack("<B3i", 3, *fa))
    s = load_ply(str(p))
    m = s.entities[0].model.groups[0].mesh
    assert m.positions.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    assert np.allclose(m.positions, verts)
