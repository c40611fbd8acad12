"""--as-strategy BLAS-grouping semantics (reference:
src/scene_stage.hh:20-26, src/acceleration_structure.hh:12-122).

TPU formulation: clusters never span group boundaries, so a moving
group dirties only its own clusters — the static scene's cluster AABBs
stay bit-identical across frames (the analogue of the reference's
per-group BLAS update-vs-rebuild)."""

import numpy as np

from tauray_tpu.ops.cluster import CLUSTER, build_cluster_tracer, \
    refit_cluster_tracer


def _scene(n_static=300, n_dyn=40, seed=0):
    rng = np.random.default_rng(seed)
    tris = []
    inst = []
    for i, (count, off) in enumerate([(n_static, 0.0), (n_dyn, 5.0)]):
        base = rng.random((count, 3)) * 2 + np.array([off, 0, 0])
        tri = base[:, None, :] + rng.random((count, 3, 3)) * 0.1
        tris.append(tri.astype(np.float32))
        inst.append(np.full(count, i, np.int32))
    return np.concatenate(tris), np.concatenate(inst)


def test_groups_never_span_instances():
    tri_pos, tri_inst = _scene()
    tracer, perm = build_cluster_tracer(
        tri_pos, tri_inst, strategy="per-model")
    C = tracer.n_clusters
    inst_of = np.asarray(tri_inst)[perm].reshape(C, CLUSTER)
    valid = np.asarray(tracer.tri_valid)
    for c in range(C):
        ids = np.unique(inst_of[c][valid[c]])
        assert len(ids) <= 1, f"cluster {c} spans instances {ids}"


def test_static_clusters_stable_when_dynamic_moves():
    tri_pos, tri_inst = _scene()
    dyn = np.array([False, True])
    tracer, perm = build_cluster_tracer(
        tri_pos, tri_inst, strategy="static-merged-dynamic-per-model",
        inst_dynamic=dyn)
    cmin0 = np.asarray(tracer.cmin).copy()

    # move only the dynamic instance
    moved = tri_pos.copy()
    moved[tri_inst == 1] += np.array([0, 3.0, 0], np.float32)
    tracer2 = refit_cluster_tracer(tracer, moved, perm)
    cmin1 = np.asarray(tracer2.cmin)

    C = tracer.n_clusters
    inst_of = np.asarray(tri_inst)[perm].reshape(C, CLUSTER)
    valid = np.asarray(tracer.tri_valid)
    static_cluster = np.array(
        [np.all(inst_of[c][valid[c]] == 0) if valid[c].any() else True
         for c in range(C)])
    assert static_cluster.any() and (~static_cluster).any()
    assert np.array_equal(cmin0[static_cluster], cmin1[static_cluster])
    assert not np.array_equal(cmin0[~static_cluster],
                              cmin1[~static_cluster])


def test_per_material_vs_per_model_grouping():
    """Two materials (= two instances) of ONE entity: per-material puts
    them in different clusters, per-model merges them into one group
    (reference: src/scene_stage.cc:881-895 — PER_MATERIAL one group per
    (mesh, material) instance, PER_MODEL merges same-object ones)."""
    rng = np.random.default_rng(2)
    n = 100
    # interleaved in space so a merged group would mix the instances
    base = rng.random((2 * n, 3)).astype(np.float32)
    tri_pos = (base[:, None, :] +
               rng.random((2 * n, 3, 3)).astype(np.float32) * 0.05)
    tri_inst = np.zeros(2 * n, np.int32)
    tri_inst[n:] = 1                      # two instances (materials)
    inst_entity = np.array([7, 7])        # ...of the SAME entity

    tracer_mat, perm_mat = build_cluster_tracer(
        tri_pos, tri_inst, strategy="per-material",
        inst_entity=inst_entity)
    C = tracer_mat.n_clusters
    inst_of = tri_inst[perm_mat].reshape(C, CLUSTER)
    valid = np.asarray(tracer_mat.tri_valid)
    for c in range(C):
        ids = np.unique(inst_of[c][valid[c]])
        assert len(ids) <= 1, f"per-material cluster {c} mixes {ids}"

    tracer_mod, perm_mod = build_cluster_tracer(
        tri_pos, tri_inst, strategy="per-model", inst_entity=inst_entity)
    Cm = tracer_mod.n_clusters
    inst_of_m = tri_inst[perm_mod].reshape(Cm, CLUSTER)
    valid_m = np.asarray(tracer_mod.tri_valid)
    mixed = any(
        len(np.unique(inst_of_m[c][valid_m[c]])) > 1 for c in range(Cm))
    assert mixed, "per-model should merge same-entity materials"


def test_all_strategies_trace_identically():
    import jax.numpy as jnp
    tri_pos, tri_inst = _scene()
    rng = np.random.default_rng(1)
    o = jnp.asarray((rng.random((256, 3)) * 8 - 1).astype(np.float32))
    d = rng.standard_normal((256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    tmin = jnp.zeros(256)
    tmax = jnp.full(256, 3e38)
    results = []
    for strat in ("all-merged-static", "per-model",
                  "static-merged-dynamic-per-model"):
        tracer, _ = build_cluster_tracer(
            tri_pos, tri_inst, strategy=strat,
            inst_dynamic=np.array([False, True]))
        h = tracer.trace(o, d, tmin, tmax)
        results.append((np.asarray(h.t), np.asarray(h.tri_id)))
    for t, tid in results[1:]:
        assert np.allclose(t, results[0][0], rtol=1e-5, atol=1e-6)
        assert np.array_equal(tid, results[0][1])
