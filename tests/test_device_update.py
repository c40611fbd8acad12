"""On-device per-frame scene update vs the host numpy path
(reference: shader/skinning.comp + pre_transform.comp parity with the
scene_stage CPU-side math)."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference scene unavailable")


def _load():
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.scene import animation as anim
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--headless=x", "--filetype=none",
        f"{REFERENCE_DIR}/test/test.glb"])
    s = load_scenes(opt)
    anim.play(s, "", loop=True)
    return s, opt, anim


def test_device_update_matches_host():
    import jax.numpy as jnp
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.scene.device_update import (build_geom_static,
                                                host_frame_inputs,
                                                update_geometry)
    s, opt, anim = _load()
    sa = SceneArrays(s, opt)
    gs, has_skin = build_geom_static(sa)

    # advance the animation a few frames, compare world soups
    for frame, dt in ((1, 0.25), (2, 0.5)):
        anim.update(s, int(dt * 1e6), True)
        sa.update(keep_prev=True)     # host reference result
        models, normals, joints = host_frame_inputs(sa)
        g = update_geometry(gs, jnp.asarray(models), jnp.asarray(normals),
                            jnp.asarray(joints), has_skin)
        for name, dev, host in (
                ("tri_pos", g.tri_pos, sa.tri_pos),
                ("tri_normal", g.tri_normal, sa.tri_normal),
                ("tri_tangent", g.tri_tangent, sa.tri_tangent),
                ("tri_hard_normal", g.tri_hard_normal,
                 sa.tri_hard_normal)):
            d = np.abs(np.asarray(dev) - host)
            scale = np.abs(host).max() + 1.0
            assert d.max() / scale < 1e-4, (frame, name, d.max())


def test_tri_light_positions_follow_geometry():
    import jax.numpy as jnp
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.scene.device import to_device_scene
    from tauray_tpu.scene.device_update import (apply_frame_update,
                                                build_geom_static,
                                                host_frame_inputs,
                                                update_geometry)
    s, opt, anim = _load()
    sa = SceneArrays(s, opt)
    ds = to_device_scene(sa)
    gs, has_skin = build_geom_static(sa)
    anim.update(s, int(0.4 * 1e6), True)
    sa.update(keep_prev=True)
    models, normals, joints = host_frame_inputs(sa)
    g = update_geometry(gs, jnp.asarray(models), jnp.asarray(normals),
                        jnp.asarray(joints), has_skin)
    ds2 = apply_frame_update(ds, gs, g, None, sa)
    assert np.allclose(np.asarray(ds2.tl_pos), sa.tl_pos, atol=1e-4)
    # packed table rows must mirror the frame geometry
    from tauray_tpu.scene.device import TP_POS
    T = sa.tri_pos.shape[0]
    assert np.allclose(np.asarray(ds2.tri_packed[:, TP_POS:TP_POS + 9]),
                       sa.tri_pos.reshape(T, 9), atol=1e-4)
