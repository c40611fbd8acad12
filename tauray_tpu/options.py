"""Single-source-of-truth option registry.

The reference generates its options struct, CLI parser, config-file parser
and help text from one X-macro list (reference: src/options.hh:9-563,
src/options.cc). This module does the same from one declarative table, with
identical option names, defaults and value grammar so that tauray command
lines, config files and presets work unchanged:

  * ``--key=value`` / ``--key value`` / ``--flag`` on the CLI
  * ``key value`` lines in config files, ``#`` comments, recursive
    ``config <file>`` includes (reference: docs/MANUAL.md:250-267)
  * ``--preset=<name>`` loads ``data/presets/<name>.cfg``
  * struct-valued options use dotted keys (``restir.shift-mapping-type``)
    or comma lists (``camera-grid 5,9,0.1,0.1``)
"""

from __future__ import annotations

import math
import os
import shlex
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .log import TR_ERR, TR_WARN

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

NAN = float("nan")
INF = float("inf")


@dataclass
class Opt:
    kind: str  # int|float|bool|string|enum|vec3|setint|vecfloat|struct|flag_string
    default: Any
    help: str = ""
    short: Optional[str] = None
    choices: Optional[List[str]] = None  # for enum
    lo: Any = None
    hi: Any = None
    fields: Optional[Dict[str, "Opt"]] = None  # for struct


def _s(kind, default, help="", **kw):
    return Opt(kind=kind, default=default, help=help, **kw)


# Option names use underscores here; CLI/config accept dashes (both work).
# Mirrors reference src/options.hh TR_OPTIONS entry-for-entry.
OPTIONS: Dict[str, Opt] = {
    "width": _s("int", 1280, "Set viewport width.", short="w", lo=0),
    "height": _s("int", 720, "Set viewport height.", short="h", lo=0),
    "fullscreen": _s("bool", False, "Enable fullscreen mode.", short="f"),
    "vsync": _s("bool", False, "Enable vertical synchronization.", short="s"),
    "progress": _s("bool", False, "Add a progress bar, useful for long offline renders.", short="p"),
    "hdr": _s("bool", False, "Try to find an HDR swap chain."),
    "timing": _s("bool", False, "Print frame times.", short="t"),
    "devices": _s("setint", set(), "Specify used device indices, -1 uses the first compatible device."),
    "headless": _s("string", "", "Run without a window, capturing frames; saved as ${headless}<index>.exr."),
    "headful": _s("bool", False, "Headless-but-not mode (kept for CLI parity)."),
    "compression": _s("enum", "piz", "Compression algorithm for captured EXR frames.",
                      choices=["zip", "zips", "rle", "piz", "none"]),
    "distribution_strategy": _s("enum", "shuffled-strips", "Set the rendering distribution strategy",
                                choices=["duplicate", "scanline", "shuffled-strips"]),
    "workload": _s("vecfloat", [], "Specify initial workload ratios per device, default is even workload."),
    "format": _s("enum", "rgb16", "Data format for the pixels in captured frames.",
                 choices=["rgb16", "rgb32", "rgba16", "rgba32"]),
    "filetype": _s("enum", "exr", "Image format for the output image.",
                   choices=["exr", "png", "bmp", "hdr", "raw", "none"]),
    "skip_render": _s("bool", False, "Disable rendering and frame output when headless."),
    "camera_log": _s("string", "", "Writes the camera parameter log (JSON)."),
    "camera_grid": _s("struct", None, "Replaces the camera with a grid of cameras.", fields={
        "w": _s("int", 1, lo=1), "h": _s("int", 1, lo=1),
        "x": _s("float", 0.02, lo=0.0), "y": _s("float", 0.02, lo=0.0)}),
    "camera_clip_range": _s("struct", None, "Overrides camera clip range (negative = no override).", fields={
        "near": _s("float", -1.0), "far": _s("float", -1.0)}),
    "camera_grid_roll": _s("float", 0.0, "Rolls the camera grid along the z axis.", lo=-360.0, hi=360.0),
    "camera_offset": _s("vec3", [0.0, 0.0, 0.0], "Offsets the camera/grid, camera-local coordinates."),
    "camera_recentering_distance": _s("float", INF, "Distance to the zero disparity plane.", lo=1e-6),
    "replay": _s("bool", False, "Enable replay mode.", short="r"),
    "framerate": _s("float", 60.0, "Set framerate for the replay.", lo=0.0),
    "frames": _s("int", 0, "Forces the number of frames rendered in replay mode", lo=0),
    "skip_frames": _s("int", 0, "Skips rendering on the given number of frames.", lo=0),
    "warmup_frames": _s("int", 0, "Frames rendered before the first recorded frame.", lo=0),
    "envmap": _s("string", "", "Path to a lat-long .hdr environment map."),
    "animation": _s("flag_string", "", "Play the given animation (flag: first found animation)."),
    "camera": _s("string", "", "Uses the named camera in the scene file."),
    "tonemap": _s("enum", "filmic", "Sets the tonemapping operator.",
                  choices=["filmic", "gamma-correction", "linear", "reinhard", "reinhard-luminance"]),
    "exposure": _s("float", 1.0, "Exposure used in tonemapping.", lo=0.0),
    "gamma": _s("float", 2.2, "Gamma used in gamma-correction.", lo=0.0),
    "renderer": _s("enum", "path-tracer", "Selects the renderer to use.",
                   choices=["path-tracer", "direct", "raster", "dshgi", "dshgi-server",
                            "dshgi-client", "restir", "restir-hybrid", "whitted",
                            "albedo", "world-normal", "view-normal", "world-pos",
                            "view-pos", "distance", "world-motion", "view-motion",
                            "screen-motion", "instance-id"]),
    "min_ray_dist": _s("float", 0.0001, "Minimum distance a ray must travel.", lo=0.0),
    "max_ray_depth": _s("int", 8, "Maximum bounces/refractions per path.", lo=0),
    "samples_per_pixel": _s("int", 1, "Samples per pixel (or MSAA samples).", lo=1),
    "samples_per_pass": _s("int", 1, "Samples per pass for path tracing.", lo=1, hi=128),
    "shadow_terminator_fix": _s("bool", True, "Blender-2.90-compatible shadow terminator workaround."),
    "film": _s("enum", "point", "Film filter for path tracing.",
               choices=["point", "box", "blackman-harris"]),
    "film_radius": _s("float", 0.5, "Film sampling radius, in pixels.", lo=0.0),
    "russian_roulette": _s("float", 0.0, "Russian roulette delta (0 disables).", ),
    "indirect_clamping": _s("float", 0.0, "Limits indirect light sample brightness.", lo=0.0),
    "default_value": _s("float", NAN, "Feature-buffer value on ray miss. INF/NAN allowed."),
    "pcf": _s("int", 64, "PCF samples for raster shadow filtering.", lo=0, hi=64),
    "pcss": _s("int", 32, "PCSS blocker-search samples.", lo=0, hi=64),
    "pcss_minimum_radius": _s("float", 0.0, "Minimum soft-shadow radius.", lo=0.0),
    "shadow_map_cascades": _s("int", 4, "Shadow map cascade count.", lo=1),
    "shadow_map_resolution": _s("int", 2048, "Shadow map resolution.", lo=1),
    "shadow_map_bias": _s("float", 0.05, "Shadow map bias.", lo=0.0),
    "shadow_map_depth": _s("float", 100.0, "Directional shadow map depth range.", lo=0.0),
    "shadow_map_radius": _s("float", 10.0, "Directional shadow map XY range.", lo=0.0),
    "sample_shading": _s("bool", False, "Enable sample shading (supersampling-like)."),
    "samples_per_probe": _s("int", 512, "Samples per SH probe bake.", lo=1),
    "dshgi_temporal_ratio": _s("float", 0.01, "DDISH-GI exponential blend factor.", lo=0.0, hi=1.0),
    "alpha_to_transmittance": _s("bool", False, "Translate albedo alpha into transmittance."),
    "transmittance_to_alpha": _s("float", -1.0, "Translate transmittance into alpha.", lo=0.0, hi=1.0),
    "force_single_sided": _s("bool", False, "Make all non-transmissive materials single-sided."),
    "force_double_sided": _s("bool", False, "Make all materials double-sided."),
    "ambient": _s("vec3", [0.1, 0.1, 0.1], "Ambient lighting used in raster renderers."),
    "sh_order": _s("int", 2, "Spherical harmonics order for probe renderers.", lo=0, hi=4),
    "aspect_ratio": _s("float", 0.0, "Force a specific camera aspect ratio.", lo=0.0),
    "fov": _s("float", 0.0, "Override vertical field of view (degrees).", lo=0.0),
    "rng_seed": _s("int", 0, "Sets the RNG seed instead of using zero."),
    "tonemap_post_resolve": _s("bool", False, "Tonemap only after MSAA resolve."),
    "use_white_albedo_on_first_bounce": _s("bool", False, "Force white albedo on first bounce."),
    "hide_lights": _s("bool", False, "Hide area lights from view rays."),
    "use_probe_visibility": _s("bool", False, "Use visibility term in SH probes."),
    "use_z_pre_pass": _s("bool", True, "Use a Z pre-pass in rasterization."),
    "force_projection": _s("enum", "off", "Force a projection type on the primary camera.",
                           choices=["off", "perspective", "orthographic", "equirectangular"]),
    "up_axis": _s("enum", "y", "Rotates the given axis as the up axis.", choices=["x", "y", "z"]),
    "display": _s("enum", "window", "Sets the display type.",
                  choices=["headless", "window", "openxr", "looking-glass",
                           "frame-server", "frame-client"]),
    "port": _s("int", 3333, "Initial port number for server modes.", lo=0, hi=65535),
    "connect": _s("string", "localhost:3333", "Server address for client modes."),
    "throttle": _s("float", 0.0, "Framerate throttle.", lo=0.0),
    "validation": _s("bool", False, "Enable runtime validation (NaN checks, checkify)."),
    "fake_devices": _s("int", 0, "Multiply device count for multi-device debugging.", lo=0, hi=16),
    "sampler": _s("enum", "uniform-random", "Sampling method used in path tracing.",
                  choices=["uniform-random", "sobol-z2", "sobol-z3", "sobol-owen"]),
    "spatial_reprojection": _s("setint", set(), "Active viewport indices for lightfield rendering."),
    "temporal_reprojection": _s("float", 0.0, "Temporal reuse ratio (0 disables).", lo=0.0, hi=0.9999),
    "lkg_params": _s("struct", None, "Looking Glass rendering parameters.", fields={
        "viewports": _s("int", 48, lo=1), "midplane": _s("float", 2.0, lo=0.001),
        "depth": _s("float", 2.0, lo=0.001), "relative_dist": _s("float", 2.0, lo=0.001)}),
    "lkg_calibration": _s("struct", None, "Looking Glass calibration override.", fields={
        "display_index": _s("int", -1), "pitch": _s("float", 0.0), "slope": _s("float", 0.0),
        "center": _s("float", 0.0), "fringe": _s("float", 0.0), "viewCone": _s("float", 0.0),
        "invView": _s("int", 0), "verticalAngle": _s("float", 0.0), "DPI": _s("float", 0.0),
        "screenW": _s("int", 0), "screenH": _s("int", 0), "flipImageX": _s("int", 0),
        "flipImageY": _s("int", 0), "flipSubp": _s("int", 0)}),
    "taa": _s("struct", None, "Temporal antialiasing parameters.", fields={
        "sequence_length": _s("int", 0, lo=0), "edge_dilation": _s("bool", True),
        "anti_shimmer": _s("bool", False)}),
    "denoiser": _s("enum", "none", "Selects the denoiser to use.", choices=["none", "svgf", "bmfr"]),
    "svgf": _s("struct", None, "Parameters for the SVGF denoiser.", fields={
        "atrous_diffuse_iter": _s("int", 5, lo=1, hi=16), "atrous_spec_iter": _s("int", 5, lo=0, hi=16),
        "atrous_kernel_radius": _s("int", 2, lo=1, hi=16), "sigma_l": _s("float", 10.0, lo=0.001),
        "sigma_z": _s("float", 1.0, lo=0.001), "sigma_n": _s("float", 128.0, lo=0.0),
        "min_alpha_color": _s("float", 0.02, lo=0.001, hi=1.0),
        "min_alpha_moments": _s("float", 0.2, lo=0.001, hi=1.0)}),
    "accumulation": _s("bool", False, "Accumulate samples from multiple frames."),
    "tri_light_mode": _s("enum", "solid-angle", "Triangle area light sampling method.",
                         choices=["area", "solid-angle", "hybrid"]),
    "transparent_background": _s("bool", False, "Replace background with alpha transparency."),
    "sample_point_lights": _s("float", 1.0, "NEE sampling weight for point lights.", lo=0.0),
    "sample_directional_lights": _s("float", 1.0, "NEE sampling weight for directional lights.", lo=0.0),
    "sample_envmap": _s("float", 1.0, "NEE sampling weight for the environment map.", lo=0.0),
    "sample_emissive_triangles": _s("float", 1.0, "NEE sampling weight for triangle lights.", lo=0.0),
    "bounce_mode": _s("enum", "material", "Bounce direction sampling method.",
                      choices=["hemisphere", "cosine", "material"]),
    "multiple_importance_sampling": _s("enum", "power", "MIS heuristic for path tracing.",
                                       choices=["off", "balance", "power"]),
    "regularization": _s("float", 0.0, "Path space regularization gamma.", lo=0.0, hi=10.0),
    "depth_of_field": _s("struct", None, "Depth of field parameters.", fields={
        "f_stop": _s("float", 0.0, lo=0.0), "distance": _s("float", 1.0, lo=0.0),
        "sensor_size": _s("float", 0.036, lo=0.0), "sides": _s("int", 0, lo=0),
        "angle": _s("float", 0.0, lo=0.0, hi=360.0)}),
    "trace": _s("enum", "simple", "Performance trace output format.",
                choices=["simple", "trace-event-format"]),
    "scene_stats": _s("bool", False, "Show scene statistics."),
    "pre_transform_vertices": _s("bool", False, "Pre-calculate world-space vertices."),
    "as_strategy": _s("enum", "static-merged-dynamic-per-model",
                      "Acceleration structure grouping strategy.",
                      choices=["per-material", "per-model",
                               "static-merged-dynamic-per-model", "all-merged"]),
    "silent": _s("bool", False, "Disable general prints."),
    "timing_output": _s("string", "", "Timing data output file (default stdout)."),
    "restir": _s("struct", None, "Parameters for ReSTIR", fields={
        "max_confidence": _s("float", 16.0, lo=0.0), "temporal_reuse": _s("bool", True),
        "canonical_samples": _s("int", 1, lo=1), "spatial_samples": _s("int", 2, lo=0, hi=16),
        "passes": _s("int", 1, lo=0), "sample_spatial_disk": _s("bool", True),
        "shift_mapping_type": _s("enum", "reconnection-shift",
                                 choices=["reconnection-shift", "random-replay-shift",
                                          "hybrid-shift"]),
        "reconnection_scale": _s("float", 2.0, lo=0.0), "max_search_radius": _s("float", 32.0, lo=0.0),
        "min_search_radius": _s("float", 1.0, lo=0.0),
        "assume_unchanged_material": _s("bool", False),
        "assume_unchanged_acceleration_structures": _s("bool", False),
        "assume_unchanged_reconnection_radiance": _s("bool", False),
        "assume_unchanged_temporal_visibility": _s("bool", False)}),
    # TPU-build additions (not in the reference):
    "stereo": _s("float", 0.0,
                 "Render a stereo camera pair with the given eye distance "
                 "(meters) to side-by-side outputs — the file/stream "
                 "capability analogue of the reference's OpenXR stereo "
                 "path (reference: src/openxr.cc per-eye cameras). "
                 "Shorthand for --camera-grid=2,1,<dist>,0.", lo=0.0),
    "mesh_shape": _s("string", "", "Device mesh shape, e.g. '8' or '4,2'. Empty = all devices, 1D."),
    "checkpoint": _s("string", "", "Path for accumulation checkpoint save/resume."),
    "preset": _s("string", "", "Load a preset config from data/presets/<name>.cfg."),
    "config": _s("string", "", "Load options from a config file."),
}


class Struct:
    """Attribute bag for struct-valued options."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):
        return "Struct(%s)" % ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())

    def __eq__(self, other):
        return isinstance(other, Struct) and self.__dict__ == other.__dict__


class Options:
    """Parsed options; attribute access by underscore name."""

    def __init__(self):
        for name, spec in OPTIONS.items():
            if spec.kind == "struct":
                setattr(self, name, Struct(**{f: fs.default for f, fs in spec.fields.items()}))
            elif spec.kind == "setint":
                setattr(self, name, set(spec.default))
            elif spec.kind in ("vec3", "vecfloat"):
                setattr(self, name, list(spec.default))
            else:
                setattr(self, name, spec.default)
        self.scene_paths: List[str] = []
        self.animation_flag = False  # --animation given without value

    # ------------------------------------------------------------------
    def set(self, key: str, value: Optional[str]) -> None:
        """Set one option from its CLI/config-file string form."""
        key = key.replace("-", "_")
        if "." in key:
            base, _, sub = key.partition(".")
            spec = OPTIONS.get(base)
            if spec is None or spec.kind != "struct":
                raise KeyError(f"Unknown option '{base}'")
            sub = sub.replace("-", "_")
            fs = spec.fields.get(sub)
            if fs is None:
                raise KeyError(f"Unknown field '{sub}' of option '{base}'")
            setattr(getattr(self, base), sub, _parse_value(fs, value, f"{base}.{sub}"))
            return
        spec = OPTIONS.get(key)
        if spec is None:
            raise KeyError(f"Unknown option '{key}'")
        if spec.kind == "struct":
            # comma-separated positional field list, e.g. camera-grid 5,9,0.1,0.1
            vals = [v for v in (value or "").split(",") if v != ""]
            st = getattr(self, key)
            fnames = list(spec.fields.keys())
            if key == "taa" and len(vals) == 1:
                # `taa 8` shorthand used by presets: sequence length only
                st.sequence_length = int(vals[0])
                return
            for fname, v in zip(fnames, vals):
                setattr(st, fname, _parse_value(spec.fields[fname], v, f"{key}.{fname}"))
            return
        if spec.kind == "flag_string" and (value is None or value == ""):
            setattr(self, key, "")
            self.animation_flag = True
            return
        setattr(self, key, _parse_value(spec, value, key))
        if key == "animation" and value:
            self.animation_flag = True

    # ------------------------------------------------------------------
    def dump(self) -> str:
        """Config-file text for the current state (live CLI `dump`)."""
        lines = []
        for name, spec in OPTIONS.items():
            v = getattr(self, name)
            if spec.kind == "struct":
                for f, fs in spec.fields.items():
                    lines.append(f"{name.replace('_', '-')}.{f.replace('_', '-')} "
                                 f"{_format_value(getattr(v, f))}")
            else:
                lines.append(f"{name.replace('_', '-')} {_format_value(v)}")
        return "\n".join(lines)


def _parse_value(spec: Opt, value: Optional[str], name: str) -> Any:
    if spec.kind == "bool":
        if value is None:
            return True
        v = value.strip().lower()
        if v in ("on", "true", "1", "yes"):
            return True
        if v in ("off", "false", "0", "no"):
            return False
        raise ValueError(f"Invalid boolean for {name}: {value}")
    if value is None:
        if spec.kind == "setint":
            return set()
        if spec.kind == "vecfloat":
            return []
        if spec.kind == "string":
            return ""
        raise ValueError(f"Option {name} requires a value")
    v = value.strip()
    if spec.kind == "int":
        res = int(v)
    elif spec.kind == "float":
        res = float(v)
    elif spec.kind in ("string", "flag_string"):
        return v
    elif spec.kind == "enum":
        if v not in spec.choices:
            raise ValueError(f"Invalid value '{v}' for {name}; choices: {spec.choices}")
        return v
    elif spec.kind == "vec3":
        parts = [float(x) for x in v.split(",")]
        if len(parts) == 1:
            parts = parts * 3
        if len(parts) != 3:
            raise ValueError(f"{name} needs 1 or 3 comma-separated floats")
        return parts
    elif spec.kind == "vecfloat":
        return [float(x) for x in v.split(",") if x != ""]
    elif spec.kind == "setint":
        return set(int(x) for x in v.split(",") if x != "")
    else:
        raise ValueError(f"Bad option kind {spec.kind}")
    if res == spec.default:
        return res  # sentinel defaults (e.g. -1 = disabled) are always allowed
    if spec.lo is not None and not math.isnan(res) and res < spec.lo:
        raise ValueError(f"{name} = {res} below minimum {spec.lo}")
    if spec.hi is not None and not math.isnan(res) and res > spec.hi:
        raise ValueError(f"{name} = {res} above maximum {spec.hi}")
    return res


def _format_value(v: Any) -> str:
    if isinstance(v, bool):
        return "on" if v else "off"
    if isinstance(v, (set,)):
        return ",".join(str(x) for x in sorted(v))
    if isinstance(v, (list, tuple)):
        return ",".join(str(x) for x in v)
    return str(v)


def _short_opt_map() -> Dict[str, str]:
    return {spec.short: name for name, spec in OPTIONS.items() if spec.short}


def load_config_file(opt: Options, path: str, depth: int = 0) -> None:
    """`key value` config grammar with comments and recursive includes."""
    if depth > 16:
        raise RuntimeError("config include recursion too deep")
    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line and " " not in line.split("=", 1)[0]:
                key, _, value = line.partition("=")
            else:
                parts = line.split(None, 1)
                key = parts[0]
                value = parts[1] if len(parts) > 1 else None
            key = key.strip()
            value = value.strip() if isinstance(value, str) else value
            if key == "config":
                sub = value if os.path.isabs(value) else os.path.join(os.path.dirname(path), value)
                load_config_file(opt, sub, depth + 1)
            elif key == "preset":
                load_preset(opt, value)
            else:
                opt.set(key, value)


def load_preset(opt: Options, name: str) -> None:
    path = os.path.join(_DATA_DIR, "presets", name + ".cfg")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No such preset: {name}")
    load_config_file(opt, path)


def parse_command_line_options(argv: List[str]) -> Options:
    """Parse a tauray-compatible command line (positional args = scene files)."""
    opt = Options()
    shorts = _short_opt_map()
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == "--":
            opt.scene_paths.extend(argv[i + 1:])
            break
        if arg.startswith("--"):
            body = arg[2:]
            if "=" in body:
                key, _, value = body.partition("=")
            else:
                key, value = body, None
            kcanon = key.replace("-", "_").partition(".")[0]
            spec = OPTIONS.get(kcanon)
            needs_value = (
                spec is not None
                and spec.kind not in ("bool", "flag_string")
                and value is None
            ) or ("." in key and value is None)
            if needs_value:
                if i + 1 >= len(argv):
                    raise ValueError(f"Option --{key} requires a value")
                value = argv[i + 1]
                i += 1
            if kcanon == "config":
                load_config_file(opt, value)
            elif kcanon == "preset":
                load_preset(opt, value)
            else:
                opt.set(key, value)
        elif arg.startswith("-") and len(arg) > 1 and not arg[1].isdigit():
            for j, c in enumerate(arg[1:]):
                name = shorts.get(c)
                if name is None:
                    raise ValueError(f"Unknown short option -{c}")
                if OPTIONS[name].kind == "bool":
                    opt.set(name, None)
                else:
                    # value: rest of this arg, or the next argv entry
                    rest = arg[2 + j:]
                    if rest:
                        opt.set(name, rest)
                    else:
                        if i + 1 >= len(argv):
                            raise ValueError(f"Option -{c} requires a value")
                        opt.set(name, argv[i + 1])
                        i += 1
                    break
        else:
            opt.scene_paths.append(arg)
        i += 1
    if opt.silent:
        from .log import logger
        logger.general.enabled = False
    return opt


def parse_live_command(opt: Options, line: str) -> str:
    """Interactive-mode stdin command (reference: src/tauray.cc:833-863).

    Returns '' normally, 'quit' to exit, or help/dump text to print.
    """
    line = line.strip()
    if not line:
        return ""
    if line in ("quit", "exit"):
        return "quit"
    if line == "help":
        return help_text()
    if line == "dump":
        return opt.dump()
    try:
        parts = shlex.split(line)
        key = parts[0]
        value = parts[1] if len(parts) > 1 else None
        opt.set(key, value)
    except (KeyError, ValueError) as e:
        TR_ERR(str(e))
    return ""


def help_text() -> str:
    lines = ["Usage: tauray-tpu [options] scene.glb [scene2.glb ...]", "Options:"]
    for name, spec in OPTIONS.items():
        flag = "--" + name.replace("_", "-")
        if spec.short:
            flag += f", -{spec.short}"
        default = _format_value(spec.default) if spec.kind != "struct" else ""
        extra = f" (default: {default})" if default != "" else ""
        lines.append(f"  {flag:38s} {spec.help}{extra}")
    return "\n".join(lines)
