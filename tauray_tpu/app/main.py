"""CLI entry + run loops (reference: src/main.cc, src/tauray.cc).

Flow mirrors the reference: parse options → create output context →
load scenes → run (replay / interactive / server)
(reference: src/main.cc:9-32)."""

from __future__ import annotations

import math
import sys
from typing import List, Optional

import numpy as np

from .. import options as opt_mod
from ..log import TR_ERR, TR_LOG, TR_TIME, TR_WARN, logger
from ..options import Options, parse_command_line_options
from ..scene import animation as anim
from ..scene.camera import get_camera_jitter_sequence
from ..scene.environment_map import EnvironmentMap
from ..scene.scene import Scene
from ..scene.transformable import Transformable
from ..tracing import TracingRecord
from .headless import HeadlessOutput

_FEATURES = ("albedo", "world-normal", "view-normal", "world-pos", "view-pos",
             "distance", "world-motion", "view-motion", "screen-motion",
             "instance-id")

_UP_AXIS_TRANSFORMS = {
    # column-vector matrices (reference: src/tauray.cc:179-196)
    "x": np.array([[0, 0, 1, 0], [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                  dtype=np.float32),
    "z": np.array([[0, 1, 0, 0], [0, 0, 1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                  dtype=np.float32),
}


def load_scenes(opt: Options) -> Scene:
    from ..io.gltf import load_scene
    s = Scene()
    for path in opt.scene_paths:
        load_scene(path, s)

    if opt.up_axis in _UP_AXIS_TRANSFORMS:
        s.apply_transform(_UP_AXIS_TRANSFORMS[opt.up_axis])

    if opt.envmap:
        e = s.add("envmap")
        e.environment_map = EnvironmentMap(opt.envmap)

    s.ambient = np.asarray(opt.ambient, dtype=np.float32)

    # camera selection (reference: src/tauray.cc:205-250)
    cams = [e for e in s.entities if e.camera is not None]
    enabled = []
    if opt.camera:
        for e in cams:
            if e.name in (opt.camera, opt.camera + "_Orientation"):
                enabled = [e]
                break
        if not enabled:
            raise RuntimeError(f"Failed to find a camera named {opt.camera}.")
    elif cams:
        enabled = [cams[0]]
    else:
        e = s.add("default_camera")
        e.camera = __import__(
            "tauray_tpu.scene.camera", fromlist=["Camera"]).Camera()
        e.camera.perspective(90, opt.width / opt.height, 0.1, 300.0)
        e.transform = Transformable(position=(0, 0, 2))
        enabled = [e]
        TR_WARN("Warning: no camera is defined in the scene, so a default "
                "camera setup is used.")
    for i, e in enumerate(cams if not enabled else s.entities):
        if e.camera is not None:
            e.camera_enabled = e in enabled
    set_camera_params(opt, s)

    if opt.animation_flag:
        anim.play(s, opt.animation, not opt.replay, opt.animation == "")
    return s


def set_camera_params(opt: Options, s: Scene):
    """(reference: src/tauray.cc:69-104 set_camera_params)"""
    for e in s.entities:
        if e.camera is None:
            continue
        c = e.camera
        if opt.force_projection != "off":
            if opt.force_projection == "orthographic":
                c.ortho(-1, 1, -1, 1, c.near, c.far)
            elif opt.force_projection == "equirectangular":
                c.equirectangular(360, 180)
        c.set_aspect(opt.aspect_ratio if opt.aspect_ratio > 0
                     else opt.width / float(opt.height))
        if opt.fov:
            c.set_fov(opt.fov)
        if opt.camera_clip_range.near > 0:
            c.set_near(opt.camera_clip_range.near)
        if opt.camera_clip_range.far > 0:
            c.set_far(opt.camera_clip_range.far)
        dof = opt.depth_of_field
        if dof.f_stop > 0:
            c.set_focus(dof.f_stop, dof.distance, dof.sensor_size,
                        dof.sides, dof.angle)


def create_renderer(opt: Options, s: Scene):
    r = opt.renderer
    if r in _FEATURES:
        from ..renderer.feature_renderer import FeatureRenderer
        return FeatureRenderer(opt, r)
    if r in ("path-tracer", "direct"):
        import jax
        n_dev = len(jax.devices())
        use_dist = n_dev > 1 or opt.fake_devices > 1
        if opt.mesh_shape:
            use_dist = True
        if use_dist and not opt.spatial_reprojection:
            from ..renderer.distributed import DistributedPathTracerRenderer
            return DistributedPathTracerRenderer(
                opt, direct_only=(r == "direct"))
        from ..renderer.rt_renderer import PathTracerRenderer
        return PathTracerRenderer(opt, direct_only=(r == "direct"))
    if r == "whitted":
        from ..renderer.rt_renderer import PathTracerRenderer
        return PathTracerRenderer(opt, direct_only=False)
    if r == "raster":
        from ..renderer.raster_renderer import RasterRenderer
        return RasterRenderer(opt)
    if r in ("restir", "restir-hybrid"):
        from ..renderer.restir_renderer import ReSTIRRenderer
        return ReSTIRRenderer(opt, hybrid=(r == "restir-hybrid"))
    if r in ("dshgi", "dshgi-client"):
        from ..renderer.dshgi_renderer import DSHGIRenderer
        return DSHGIRenderer(opt, remote=(r == "dshgi-client"))
    if r == "dshgi-server":
        from ..renderer.dshgi_renderer import DSHGIServer
        return DSHGIServer(opt)
    raise ValueError(f"Renderer {r} not implemented yet")


def generate_cameras(s: Scene, opt: Options) -> List:
    """Camera grid generation (reference: src/tauray.cc:680-727)."""
    grid = opt.camera_grid
    base = None
    for e in s.entities:
        if e.camera is not None and e.camera_enabled:
            base = e
            break
    if grid.w * grid.h <= 1:
        return [base]
    views = []
    roll = math.radians(opt.camera_grid_roll)
    cr, sr = math.cos(roll), math.sin(roll)
    total_w = (grid.w - 1) * grid.x
    total_h = (grid.h - 1) * grid.y
    base.camera_enabled = False
    for gy in range(grid.h):
        for gx in range(grid.w):
            x = gx * grid.x - total_w / 2
            y = gy * grid.y - total_h / 2
            lx = x * cr - y * sr
            ly = x * sr + y * cr
            e = s.add(f"grid_cam_{gx}_{gy}")
            cam_copy = __import__(
                "copy").deepcopy(base.camera)
            off = np.asarray(opt.camera_offset, np.float32) + \
                np.array([lx, ly, 0], np.float32)
            t = Transformable(position=off, parent=base.transform)
            # recenter on the zero-disparity plane
            d = opt.camera_recentering_distance
            if math.isfinite(d):
                cam_copy.set_pan(np.array([2 * lx / d, 2 * ly / d],
                                          np.float32) /
                                 cam_copy.get_projection_info()[2:4])
            e.camera = cam_copy
            e.transform = t
            e.camera_enabled = True
            e.camera_index = gy * grid.w + gx
            views.append(e)
    return views


def _finish_frame(img, pull: bool) -> np.ndarray:
    """Finish a device frame: full host readback when a file will be
    written, otherwise a 4-byte checksum pull that forces execution so
    frame timing stays honest without the tunnel-bound image transfer."""
    if isinstance(img, np.ndarray):
        return img
    import jax
    import jax.numpy as jnp
    if pull:
        return np.asarray(jax.device_get(img))
    np.asarray(jnp.sum(img))
    return img


def replay_viewer(opt: Options, s: Scene):
    """Offline/replay render loop (reference: src/tauray.cc:1017-1132)."""
    out = None
    if opt.headless:
        out = HeadlessOutput(opt, (opt.width, opt.height),
                             opt.camera_grid.w * opt.camera_grid.h)
        out.skip_nan_check = (opt.renderer in _FEATURES and
                              math.isnan(opt.default_value))

    generate_cameras(s, opt)
    if opt.taa.sequence_length > 0:
        seq = get_camera_jitter_sequence(
            opt.taa.sequence_length, (opt.width, opt.height))
        for e in s.entities:
            if e.camera is not None:
                e.camera.set_jitter_sequence(seq)

    tracing = TracingRecord(opt)
    frame_count = opt.frames if opt.frames else None
    is_animated = anim.is_playing(s)
    if not opt.frames and not is_animated:
        frame_count = 1

    # camera parameter logs (reference: src/tauray.cc:1029,1119-1128)
    from ..scene.camera import CameraLog
    camera_logs = []
    if opt.camera_log:
        for e in s.entities:
            if e.camera is not None and e.camera_enabled:
                camera_logs.append(CameraLog(e.transform, e.camera))

    from ..progress import ProgressTracker
    progress = ProgressTracker(frame_count or 1,
                               enabled=opt.progress and frame_count)

    rr = create_renderer(opt, s)
    rr.set_scene(s)
    if opt.checkpoint and hasattr(rr, "load_checkpoint"):
        if rr.load_checkpoint(opt.checkpoint):
            TR_LOG(f"Resumed accumulation from {opt.checkpoint} "
                   f"({rr.samples_accumulated} samples)")
    for _ in range(opt.warmup_frames):
        if not opt.skip_render:
            anim.update(s, 0, True)
            if hasattr(rr, "update_frame"):
                rr.update_frame()
            # renderers whose warmup only advances internal state (the
            # DSHGI SH probe blend) expose a cheap warmup_step — the
            # final image is identical, the raster draw is skipped
            if hasattr(rr, "warmup_step"):
                rr.warmup_step()
            else:
                rr.render_device()

    update_dt = round(1000000.0 / opt.framerate)
    i = 0
    while frame_count is None or i < frame_count:
        if not opt.frames and is_animated and not anim.is_playing(s):
            break
        dt = 0 if i == 0 else update_dt
        anim.update(s, dt, True)
        for clog in camera_logs:
            clog.frame(dt)
        if not opt.skip_render and i >= opt.skip_frames:
            tracing.begin_frame()
            if hasattr(rr, "update_frame") and i > 0:
                rr.update_frame()
            rr.reset_accumulation()
            # frames stay ON DEVICE unless a file is actually written:
            # the full-image host pull costs ~1.2 s at 1080p over the
            # dev tunnel, so readback never sits inside the frame loop
            # (reference analogue: headless.cc async readback threads)
            pull = out is not None and out.filetype != "none"
            try:
                img = rr.render_device()
                img = _finish_frame(img, pull)
            except Exception as e:  # renderer-rebuild-on-error loop
                # (reference: src/tauray.cc:991-1001 swapchain recovery +
                # tauray.cc:843-859 keep-alive on broken shader reload)
                TR_WARN(f"frame {i} failed ({type(e).__name__}: {e}); "
                        "rebuilding renderer and retrying once")
                rr = create_renderer(opt, s)
                rr.set_scene(s)
                img = _finish_frame(rr.render_device(), pull)
            tracing.end_frame(rr.get_timing())
            if opt.timing:
                tracing.print_last_trace()
            if out is not None:
                out.save_frame(img)
        progress.step()
        i += 1
    if out is not None:
        out.finish()
    if opt.checkpoint and hasattr(rr, "save_checkpoint"):
        rr.save_checkpoint(opt.checkpoint)
    if opt.camera_log:
        for i, clog in enumerate(camera_logs):
            name = opt.camera_log + (str(i) if len(camera_logs) != 1 else "")
            clog.write(name + ".json")
    tracing.finish()


def main(argv: Optional[List[str]] = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    try:
        opt = parse_command_line_options(argv)
    except (KeyError, ValueError) as e:
        TR_ERR(str(e))
        return 1
    if not opt.scene_paths and opt.renderer != "dshgi-server":
        print(opt_mod.help_text())
        return 1
    if getattr(opt, "stereo", 0.0) > 0.0:
        # stereo pair = a 2x1 camera grid at eye distance (the OpenXR
        # capability analogue for a display-less TPU host; reference:
        # src/openxr.cc per-eye cameras)
        opt.camera_grid.w = 2
        opt.camera_grid.h = 1
        opt.camera_grid.x = opt.stereo
        opt.camera_grid.y = 0.0
    if opt.timing_output:
        logger.timing.stream = open(opt.timing_output, "w")
    if opt.validation:
        # TPU analogue of the reference's Vulkan validation layers
        # (reference: context.hh:41 --validation; SURVEY.md §5.2): trap
        # NaNs at the op that produced them instead of in the output scan
        import jax
        jax.config.update("jax_debug_nans", True)

    # run-mode selection (reference: src/tauray.cc:1169-1187)
    if opt.display == "frame-client":
        from .frame_viewer import frame_client_viewer
        return frame_client_viewer(opt)

    s = load_scenes(opt)
    if opt.scene_stats:
        TR_LOG("Scene stats:", s.stats())

    if opt.display == "looking-glass":
        from ..stages.looking_glass import setup_lkg_cameras
        base = next((e for e in s.entities
                     if e.camera is not None and e.camera_enabled), None)
        if base is not None:
            setup_lkg_cameras(s, base, opt)

    if opt.headless or opt.replay or opt.renderer == "dshgi-server":
        replay_viewer(opt, s)
    else:
        from .interactive import interactive_viewer
        interactive_viewer(opt, s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
