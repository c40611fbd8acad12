"""Object-space instancing (TLAS) tests — reference:
src/acceleration_structure.hh:90-112 (TLAS instance transforms over
shared BLASes), src/scene_stage.hh:20-26 (--as-strategy grouping).

The VERDICT round-2 'done' criterion: 100 instances of one mesh use ~1
mesh of cluster storage, and a moving instance re-uploads only its
transform."""

import numpy as np
import pytest

from tauray_tpu.ops.cluster import (CLUSTER, build_cluster_tracer,
                                    build_instanced_tracer,
                                    refit_instanced_tracer)


def _mesh(n_tris, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    v0 = (rng.random((n_tris, 3)).astype(np.float32) - 0.5) * scale
    return np.stack([v0, v0 + rng.random((n_tris, 3)) * 0.2 * scale,
                     v0 + rng.random((n_tris, 3)) * 0.2 * scale], axis=1)


def _transforms(n, seed=1, spread=20.0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        ang = rng.random() * 2 * np.pi
        c, s = np.cos(ang), np.sin(ang)
        m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                             np.float32) * (0.5 + rng.random())
        m[:3, 3] = (rng.random(3) - 0.5) * spread
        out.append(m)
    return np.stack(out)


def _bake_world(mesh_tris, models):
    parts = []
    inst = []
    for i, m in enumerate(models):
        p = mesh_tris @ m[:3, :3].T + m[:3, 3]
        parts.append(p.astype(np.float32))
        inst.append(np.full(len(mesh_tris), i, np.int32))
    return np.concatenate(parts), np.concatenate(inst)


def _rand_rays(n, seed=3, spread=22.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)).astype(np.float32) - 0.5) * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_instanced_storage_and_hits():
    """100 instances of one 600-tri mesh: cluster storage stays at ONE
    mesh's clusters, and hits agree with the world-baked tracer."""
    import jax.numpy as jnp
    mesh = _mesh(600)
    n_inst = 100
    models = _transforms(n_inst)
    world, tri_inst = _bake_world(mesh, models)

    ref, _ = build_cluster_tracer(world, tri_inst)
    tracer, _ = build_instanced_tracer(
        [mesh], np.zeros(n_inst, np.int64), models,
        np.ones(n_inst, bool),
        np.arange(n_inst, dtype=np.int64) * len(mesh))

    # storage: one mesh's clusters, not 100x
    mesh_clusters = -(-len(mesh) // CLUSTER)
    assert tracer.v0.shape[0] == mesh_clusters
    assert ref.v0.shape[0] >= mesh_clusters * n_inst * 0.9

    o, d = _rand_rays(512)
    h_ref = ref.trace(jnp.asarray(o), jnp.asarray(d),
                      jnp.zeros(len(o)), jnp.full(len(o), 1e9))
    h_ins = tracer.trace(jnp.asarray(o), jnp.asarray(d),
                         jnp.zeros(len(o)), jnp.full(len(o), 1e9))
    hit_ref = np.asarray(h_ref.tri_id)
    hit_ins = np.asarray(h_ins.tri_id)
    # same hit/miss classification and matching world tri ids + t
    agree = (hit_ref == hit_ins)
    # near-tangent edge cases may flip under the transform's rounding;
    # demand near-total agreement and identical t where agreeing
    assert agree.mean() > 0.99, f"hit agreement {agree.mean()}"
    np.testing.assert_allclose(np.asarray(h_ref.t)[agree],
                               np.asarray(h_ins.t)[agree],
                               rtol=2e-4, atol=2e-4)
    # barycentrics agree too (affine invariance of u, v)
    m = agree & (hit_ref >= 0)
    np.testing.assert_allclose(np.asarray(h_ref.u)[m],
                               np.asarray(h_ins.u)[m], atol=2e-3)


def test_moving_instance_transform_only_refit():
    """Refit after moving one instance touches only transforms: the
    triangle arrays are the SAME buffers, and hits track the motion."""
    import jax.numpy as jnp
    mesh = _mesh(300, seed=5)
    models = _transforms(10, seed=6, spread=10.0)
    tracer, _ = build_instanced_tracer(
        [mesh], np.zeros(10, np.int64), models, np.ones(10, bool),
        np.arange(10, dtype=np.int64) * len(mesh))
    v0_before = tracer.v0
    tris9_before = tracer.tris9

    moved = models.copy()
    moved[3, :3, 3] += np.array([100.0, 0, 0])
    tracer2 = refit_instanced_tracer(tracer, moved)
    # geometry buffers untouched (same objects — no re-upload)
    assert tracer2.v0 is v0_before
    assert tracer2.tris9 is tris9_before

    # a ray at instance 3's old position misses; at the new position hits
    world_old, ti = _bake_world(mesh, models)
    center_old = world_old[ti == 3].reshape(-1, 3).mean(axis=0)
    o = center_old + np.array([0, 0, 30], np.float32)
    d = np.array([0, 0, -1.0], np.float32)
    h_old = tracer.trace(jnp.asarray(o[None]), jnp.asarray(d[None]),
                         jnp.zeros(1), jnp.full(1, 1e9))
    h_new = tracer2.trace(jnp.asarray(o[None] +
                                      np.array([100.0, 0, 0])),
                          jnp.asarray(d[None]),
                          jnp.zeros(1), jnp.full(1, 1e9))
    t3 = np.asarray(tracer.to_orig)
    # the same world triangle range is hit before and after the move
    assert int(h_old.tri_id[0]) // len(mesh) == 3 or \
        int(h_old.tri_id[0]) < 0
    if int(h_old.tri_id[0]) >= 0:
        assert int(h_new.tri_id[0]) >= 0
        np.testing.assert_allclose(float(h_old.t[0]), float(h_new.t[0]),
                                   rtol=1e-4)


def test_alpha_instances_flagged():
    """Alpha-capable instances sort to the tail; trace_flagged marks
    their hits arithmetically."""
    import jax.numpy as jnp
    mesh = _mesh(200, seed=9)
    models = _transforms(4, seed=10, spread=30.0)
    opaque = np.array([True, False, True, False])
    tracer, _ = build_instanced_tracer(
        [mesh], np.zeros(4, np.int64), models, opaque,
        np.arange(4, dtype=np.int64) * len(mesh))
    o, d = _rand_rays(1024, seed=11, spread=34.0)
    hit, flag = tracer.trace_flagged(
        jnp.asarray(o), jnp.asarray(d), jnp.zeros(len(o)),
        jnp.full(len(o), 1e9))
    tid = np.asarray(hit.tri_id)
    fl = np.asarray(flag)
    hits = tid >= 0
    if hits.any():
        inst_of_hit = tid[hits] // len(mesh)
        np.testing.assert_array_equal(fl[hits], ~opaque[inst_of_hit])
