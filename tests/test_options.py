import math

import pytest

from tauray_tpu import options as opt_mod
from tauray_tpu.options import Options, parse_command_line_options


def test_defaults_match_reference():
    # Defaults per reference src/options.hh
    o = Options()
    assert o.width == 1280 and o.height == 720
    assert o.renderer == "path-tracer"
    assert o.max_ray_depth == 8
    assert o.samples_per_pixel == 1
    assert o.min_ray_dist == pytest.approx(0.0001)
    assert o.tonemap == "filmic"
    assert o.film == "point"
    assert math.isnan(o.default_value)
    assert o.distribution_strategy == "shuffled-strips"
    assert o.svgf.sigma_n == 128.0
    assert o.restir.shift_mapping_type == "reconnection-shift"


def test_cli_parsing():
    o = parse_command_line_options(
        ["--renderer=albedo", "--width", "512", "-h", "256", "--headless=out",
         "--restir.max-confidence=8", "scene.glb"]
    )
    assert o.renderer == "albedo"
    assert o.width == 512 and o.height == 256
    assert o.headless == "out"
    assert o.restir.max_confidence == 8.0
    assert o.scene_paths == ["scene.glb"]


def test_short_flags():
    o = parse_command_line_options(["-tp", "x.glb"])
    assert o.timing and o.progress


def test_struct_comma_form():
    o = Options()
    o.set("camera-grid", "5,9,0.1,0.2")
    assert o.camera_grid.w == 5 and o.camera_grid.h == 9
    assert o.camera_grid.x == pytest.approx(0.1)
    o.set("camera-clip-range", "0.01,100")
    assert o.camera_clip_range.near == pytest.approx(0.01)


def test_presets_load():
    for name in ["accumulation", "minimal", "quality", "reference", "direct",
                 "denoised", "restir-hybrid", "ddish-gi"]:
        o = Options()
        opt_mod.load_preset(o, name)
    o = Options()
    opt_mod.load_preset(o, "minimal")
    assert o.bounce_mode == "hemisphere"
    assert o.multiple_importance_sampling == "off"
    assert o.sample_envmap == 0.0
    o = Options()
    opt_mod.load_preset(o, "restir-hybrid")
    assert o.taa.sequence_length == 8
    assert o.shadow_map_cascades == 2  # key=value grammar in config files


def test_config_file(tmp_path):
    cfg = tmp_path / "a.cfg"
    sub = tmp_path / "b.cfg"
    sub.write_text("max-ray-depth 3\n")
    cfg.write_text("# comment\nrenderer direct\nconfig b.cfg\n")
    o = Options()
    opt_mod.load_config_file(o, str(cfg))
    assert o.renderer == "direct" and o.max_ray_depth == 3


def test_dump_reparse():
    o = Options()
    o.set("renderer", "restir")
    text = o.dump()
    o2 = Options()
    for line in text.splitlines():
        k, _, v = line.partition(" ")
        if k in ("animation",) and v == "":
            continue
        o2.set(k, v if v != "" else None)
    assert o2.renderer == "restir"


def test_validation_errors():
    o = Options()
    with pytest.raises(KeyError):
        o.set("no-such-option", "1")
    with pytest.raises(ValueError):
        o.set("renderer", "bogus")
    with pytest.raises(ValueError):
        o.set("samples-per-pixel", "0")
