"""Procedural benchmark scenes (`proc://<name>?key=val` scene paths).

The reference's headline benchmark scene is Crytek Sponza (+teapots), a
~262k-triangle colonnaded atrium (reference: README.md:5-7) that is not
shipped in-repo. `proc://sponza` builds a scene of the same class —
two-story colonnaded hall with arched galleries, fluted columns, hanging
cloth, and a teapot-stand-in array of spheres — so Sponza-scale tracing
and 1080p figures are reproducible without external assets:

    python -m tauray_tpu --headless=out "proc://sponza?tris=262144"

Deterministic (seeded), textured (generated checker/stripe atlases),
lit by a sun directional + two point lights, camera inside the hall.
"""

from __future__ import annotations

from typing import Dict, List, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..scene.camera import Camera
from ..scene.light import DirectionalLight, PointLight
from ..scene.material import Material
from ..scene.mesh import Mesh, Model
from ..scene.scene import Scene
from ..scene.transformable import Transformable


def _grid_mesh(nx: int, nz: int, fn) -> Tuple[np.ndarray, np.ndarray,
                                              np.ndarray]:
    """Tessellated parametric sheet: fn(u, v) -> (x, y, z)."""
    us, vs = np.meshgrid(np.linspace(0, 1, nx + 1),
                         np.linspace(0, 1, nz + 1), indexing="ij")
    pos = fn(us.reshape(-1), vs.reshape(-1)).astype(np.float32)
    uv = np.stack([us.reshape(-1), vs.reshape(-1)], -1).astype(np.float32)
    idx = []
    for i in range(nx):
        for j in range(nz):
            a = i * (nz + 1) + j
            b = a + (nz + 1)
            idx.append([a, a + 1, b])
            idx.append([b, a + 1, b + 1])
    return pos, uv, np.asarray(idx, np.int32)


def _mesh(pos, uv, idx) -> Mesh:
    return Mesh(positions=pos, indices=idx, uvs=uv)


def _cylinder(radius, height, nseg, nh, flutes=0.0):
    def fn(u, v):
        a = u * 2 * np.pi
        r = radius * (1.0 + flutes * np.cos(a * 12))
        return np.stack([r * np.cos(a), v * height, r * np.sin(a)], -1)
    return _mesh(*_grid_mesh(nseg, nh, fn))


def _sphere(radius, nseg, nh):
    def fn(u, v):
        a = u * 2 * np.pi
        b = (v - 0.5) * np.pi
        return np.stack([radius * np.cos(a) * np.cos(b),
                         radius * np.sin(b),
                         radius * np.sin(a) * np.cos(b)], -1)
    return _mesh(*_grid_mesh(nseg, nh, fn))


def _box(w, h, d, nu=1, nv=1):
    parts = []
    uvs = []
    idxs = []
    base = 0
    for axis, sign in ((0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)):
        dims = [w, h, d]
        t = [0, 1, 2]
        t.remove(axis)

        def fn(u, v, axis=axis, sign=sign, t=t, dims=dims):
            p = np.zeros((len(u), 3), np.float32)
            p[:, axis] = sign * dims[axis] / 2
            p[:, t[0]] = (u - 0.5) * dims[t[0]]
            p[:, t[1]] = (v - 0.5) * dims[t[1]] * sign
            return p
        pos, uv, idx = _grid_mesh(nu, nv, fn)
        parts.append(pos)
        uvs.append(uv)
        idxs.append(idx + base)
        base += len(pos)
    return _mesh(np.concatenate(parts), np.concatenate(uvs),
                 np.concatenate(idxs))


def _cloth(w, h, nu, nv, seed):
    rng = np.random.default_rng(seed)
    ph = rng.random(3) * 6.28

    def fn(u, v):
        x = (u - 0.5) * w
        y = -v * h
        z = (0.08 * np.sin(6.0 * u + ph[0]) * v +
             0.05 * np.sin(9.0 * v + ph[1]) +
             0.03 * np.sin(14.0 * u + ph[2]))
        return np.stack([x, y, z], -1)
    return _mesh(*_grid_mesh(nu, nv, fn))


def _checker_texture(c0, c1, n=64, stripes=False) -> np.ndarray:
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    if stripes:
        m = (xs // 8) % 2
    else:
        m = ((xs // 8) + (ys // 8)) % 2
    img = np.where(m[..., None] == 0, np.asarray(c0), np.asarray(c1))
    a = np.full((n, n, 1), 255)
    return np.concatenate([img, a], -1).astype(np.uint8)


def _leaf_texture(n=64) -> np.ndarray:
    """Foliage card: a few overlapping leaf shapes on a TRANSPARENT
    background (alpha 0 outside the leaves) — the alpha-cutout test
    texture (reference's Sponza foliage uses MASK-mode leaf cards)."""
    ys, xs = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    alpha = np.zeros((n, n), np.float32)
    green = np.zeros((n, n), np.float32)
    rng = np.random.default_rng(11)
    for _ in range(7):
        cx, cy = (rng.random(2) - 0.5) * 1.2
        ang = rng.random() * np.pi
        w, h = 0.18 + rng.random() * 0.12, 0.38 + rng.random() * 0.2
        xr = (xs - cx) * np.cos(ang) + (ys - cy) * np.sin(ang)
        yr = -(xs - cx) * np.sin(ang) + (ys - cy) * np.cos(ang)
        # leaf = teardrop: ellipse pinched at the tip
        r = (xr / (w * (1.0 - 0.5 * np.clip(yr / h, 0, 1)))) ** 2 \
            + (yr / h) ** 2
        inside = r < 1.0
        alpha = np.maximum(alpha, inside.astype(np.float32))
        green = np.where(inside, 0.45 + 0.4 * rng.random(), green)
    # central vein darkening
    img = np.stack([green * 80, 60 + green * 140, green * 50], -1)
    out = np.concatenate([img, alpha[..., None] * 255], -1)
    return np.clip(out, 0, 255).astype(np.uint8)


def build_sponza(scene: Scene, tris_target: int = 262144,
                 foliage: bool = False) -> Scene:
    """Colonnaded two-story atrium at Sponza's triangle scale.

    foliage=True adds MASK-mode (alpha-cutout) ivy curtains and potted
    bushes — the textured + alpha-tested regime the real Crytek Sponza
    exercises (VERDICT r4 ask #8)."""
    if not hasattr(scene, "textures"):
        scene.textures = []
        scene.texture_meta = []
    t0 = len(scene.textures)
    scene.textures.extend([
        _checker_texture((200, 180, 150), (150, 130, 110)),   # floor
        _checker_texture((180, 60, 40), (140, 160, 60), stripes=True),
        _checker_texture((90, 110, 160), (220, 210, 190)),    # cloth
        _leaf_texture(),                                      # foliage
    ])
    scene.texture_meta.extend([{}, {}, {}, {}])

    # triangle budget: scale tessellation to the target
    # (base densities measured at ~455k tris at s=1)
    s = max(np.sqrt(tris_target / 455000.0), 0.3)

    stone = Material(name="stone", albedo_tex=t0, roughness_factor=0.8,
                     metallic_factor=0.0)
    trim = Material(name="trim", albedo_tex=t0 + 1, roughness_factor=0.5,
                    metallic_factor=0.1)
    clothm = Material(name="cloth", albedo_tex=t0 + 2, roughness_factor=0.9,
                      metallic_factor=0.0, double_sided=True)
    metal = Material(name="teapot", albedo_factor=np.array(
        [0.9, 0.75, 0.4, 1.0], np.float32), roughness_factor=0.25,
        metallic_factor=1.0)

    HALL_L, HALL_W, HALL_H = 24.0, 10.0, 9.0

    def add(name, model, pos=(0, 0, 0), rot=None):
        e = scene.add(name)
        e.transform = Transformable(position=pos)
        if rot is not None:
            e.transform.orientation = rot
        e.model = model
        return e

    def model_of(mesh, mat):
        m = Model()
        m.add_vertex_group(mat, mesh)
        return m

    # shell: floor, ceiling, end walls, side walls w/ gallery openings
    shell = model_of(_box(HALL_L, 0.3, HALL_W,
                          int(96 * s), int(48 * s)), stone)
    add("floor", shell, (0, -0.15, 0))
    add("ceiling", model_of(_box(HALL_L, 0.3, HALL_W,
                                 int(64 * s), int(32 * s)), stone),
        (0, HALL_H, 0))
    for sx, name in ((-1, "wall_w"), (1, "wall_e")):
        add(name, model_of(_box(0.4, HALL_H, HALL_W,
                                int(24 * s), int(24 * s)), stone),
            (sx * HALL_L / 2, HALL_H / 2, 0))
    for sz, name in ((-1, "wall_n"), (1, "wall_s")):
        add(name, model_of(_box(HALL_L, HALL_H, 0.4,
                                int(96 * s), int(32 * s)), stone),
            (0, HALL_H / 2, sz * HALL_W / 2))

    # two stories of fluted columns along both sides (instanced: ONE
    # column mesh, many entities — the instancing test case)
    column = model_of(_cylinder(0.35, 3.6, int(48 * s) + 8,
                                int(24 * s) + 4, flutes=0.06), stone)
    capital = model_of(_box(1.0, 0.35, 1.0, int(8 * s) + 2,
                            int(8 * s) + 2), trim)
    n_cols = 10
    for i in range(n_cols):
        x = -HALL_L / 2 + 1.8 + i * (HALL_L - 3.6) / (n_cols - 1)
        for sz in (-1, 1):
            z = sz * (HALL_W / 2 - 1.6)
            for story, y in ((0, 0.0), (1, 4.4)):
                add(f"col_{i}_{sz}_{story}", column, (x, y, z))
                add(f"cap_{i}_{sz}_{story}", capital, (x, y + 3.7, z))

    # gallery slabs above the colonnades
    for sz in (-1, 1):
        add(f"gallery_{sz}", model_of(
            _box(HALL_L - 2.0, 0.25, 2.6, int(64 * s), int(16 * s)), trim),
            (0, 4.15, sz * (HALL_W / 2 - 1.45)))

    # hanging cloth banners (the Sponza curtains)
    for i in range(6):
        x = -HALL_L / 2 + 3.5 + i * (HALL_L - 7.0) / 5
        sz = -1 if i % 2 == 0 else 1
        add(f"cloth_{i}", model_of(
            _cloth(2.2, 3.0, int(48 * s) + 8, int(64 * s) + 8, seed=i),
            clothm), (x, 7.2, sz * (HALL_W / 2 - 2.6)))

    # teapot stand-ins: a cluster of glossy spheres on the floor
    sph = model_of(_sphere(0.5, int(64 * s) + 8, int(32 * s) + 4), metal)
    rng = np.random.default_rng(7)
    for i in range(8):
        x, z = (rng.random(2) - 0.5) * np.array([HALL_L - 8, HALL_W - 5])
        add(f"teapot_{i}", sph, (float(x), 0.5, float(z)))

    if foliage:
        leafm = Material(name="leaf", albedo_tex=t0 + 3,
                         roughness_factor=0.9, metallic_factor=0.0,
                         alpha_cutoff=0.5, double_sided=True)

        def _card_cloud(n_cards, extent, seed):
            """n_cards randomly-placed/oriented leaf quads baked into one
            mesh (keeps entity count low; the alpha MASK does the shaping)."""
            rng_ = np.random.default_rng(seed)
            pos_l, uv_l, idx_l = [], [], []
            for ci in range(n_cards):
                c = (rng_.random(3) - 0.5) * np.asarray(extent)
                # random orientation basis
                a = rng_.standard_normal(3)
                a /= np.linalg.norm(a)
                b = np.cross(a, rng_.standard_normal(3))
                b /= np.linalg.norm(b)
                sz = 0.25 + rng_.random() * 0.2
                corners = np.stack([c - a * sz - b * sz, c + a * sz - b * sz,
                                    c - a * sz + b * sz, c + a * sz + b * sz])
                base = 4 * ci
                pos_l.append(corners.astype(np.float32))
                uv_l.append(np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]],
                                       np.float32))
                idx_l.append(np.asarray([[base, base + 1, base + 2],
                                         [base + 2, base + 1, base + 3]],
                                        np.int32))
            return _mesh(np.concatenate(pos_l), np.concatenate(uv_l),
                         np.concatenate(idx_l))

        # ivy curtains draped over the gallery rails (thin card volumes)
        n_ivy = max(int(220 * s * s), 40)
        for i, sz_ in enumerate((-1, 1)):
            ivy = model_of(_card_cloud(n_ivy, (HALL_L - 3.0, 1.8, 0.5),
                                       seed=100 + i), leafm)
            add(f"ivy_{i}", ivy, (0, 3.6, sz_ * (HALL_W / 2 - 2.8)))
        # potted bushes along the center line
        n_bush = max(int(140 * s * s), 30)
        pot = model_of(_cylinder(0.45, 0.5, int(24 * s) + 6, 2), trim)
        for i in range(4):
            x = -HALL_L / 2 + 4.0 + i * (HALL_L - 8.0) / 3
            bush = model_of(_card_cloud(n_bush, (1.4, 1.0, 1.4),
                                        seed=200 + i), leafm)
            add(f"pot_{i}", pot, (x, 0.0, 0.0))
            add(f"bush_{i}", bush, (x, 1.1, 0.0))

    # lights: sun through the atrium + two fill points
    sun = scene.add("sun")
    sun.transform = Transformable()
    sun.light = DirectionalLight((4.0, 3.8, 3.4), 1.0)
    sun.light.direction = np.asarray([0.35, -1.0, 0.25], np.float32)
    for i, (x, z) in enumerate(((-6.0, 0.0), (6.0, 0.0))):
        pe = scene.add(f"fill_{i}")
        pe.transform = Transformable(position=(x, 5.0, z))
        pe.light = PointLight((40.0, 36.0, 30.0), radius=0.2)

    cam = scene.add("camera")
    cam.transform = Transformable(position=(-HALL_L / 2 + 2.0, 1.8, 0.0))
    cam.camera = Camera()
    cam.camera.perspective(75, 16.0 / 9.0, 0.1, 100.0)
    # look down the hall (+x)
    cam.transform.orientation = _look_rotation(
        np.asarray([1.0, -0.05, 0.02]))
    cam.camera_enabled = True
    return scene


def _look_rotation(forward):
    """Quaternion turning -z to `forward` (scene camera convention)."""
    f = forward / np.linalg.norm(forward)
    z = np.asarray([0.0, 0.0, -1.0])
    axis = np.cross(z, f)
    n = np.linalg.norm(axis)
    if n < 1e-8:
        return np.asarray([0.0, 0, 0, 1.0], np.float32)
    axis /= n
    ang = float(np.arccos(np.clip(np.dot(z, f), -1, 1)))
    s = np.sin(ang / 2)
    return np.asarray([axis[0] * s, axis[1] * s, axis[2] * s,
                       np.cos(ang / 2)], np.float32)


def load_procedural(path: str, scene: Scene) -> Scene:
    u = urlparse(path)
    name = (u.netloc or u.path).strip("/")
    q: Dict[str, List[str]] = parse_qs(u.query)
    if name == "sponza":
        tris = int(q.get("tris", ["262144"])[0])
        foliage = q.get("foliage", ["0"])[0] not in ("0", "false")
        return build_sponza(scene, tris, foliage=foliage)
    raise ValueError(f"unknown procedural scene: {name}")
