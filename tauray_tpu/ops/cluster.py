"""Tile-culled two-level intersector — the TPU-native acceleration
structure.

Per-lane BVH traversal (divergent control flow + per-ray gathers) does not
map onto a TPU's SIMD/SIMT-free execution model, so instead of the
reference's BLAS/TLAS + RT cores (reference: src/acceleration_structure.hh)
this uses a structure whose traversal is dense vector math:

  * triangles are Morton-sorted and grouped into fixed-size *clusters*
    (leaf AABBs of an implicit LBVH — same ordering as ops/bvh.py);
  * rays are processed in *tiles*; a tile visits only clusters whose AABB
    at least one of its rays hits:
      phase 1: dense (rays × clusters) slab tests on the VPU, OR-reduced
               per tile — regular, gather-free;
      phase 2: for each tile, the compacted list of active clusters is
               walked with a scalar-bounded `fori_loop`; each step is a
               dense (TILE × CLUSTER) Möller–Trumbore block — exactly the
               batched-small-matmul shape the VPU/MXU digests;
  * compaction is one `argsort` over booleans per tile (XLA sort, not
    per-lane gathers); the only gathers are *tile-uniform* cluster block
    fetches, which lower to dynamic slices.

Camera rays are coherent, so tiles activate a small fraction of clusters;
bounce rays will be sorted by direction/origin in a later pass (wavefront
ray sorting) to restore coherence.

Cluster AABB refit after animation is a single reshape+min/max, which also
serves as the reference's BLAS "update" path
(reference: src/acceleration_structure.hh dynamic update vs rebuild).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import morton_3d
from .intersect import RAY_MAX_DIST, Hit

import os as _os

CLUSTER = int(_os.environ.get("TAURAY_CLUSTER", "128"))  # tris per cluster
TILE = 128          # rays per tile
TILE_CHUNK = int(_os.environ.get("TAURAY_TILE_CHUNK", "64"))


@jax.tree_util.register_pytree_node_class
class ClusterTracer:
    def __init__(self, v0, e1, e2, tri_valid, to_orig, cmin, cmax,
                 n_clusters: int, tris9=None, tvalid_f=None, opaque=None,
                 tris_flat=None, alpha_base: Optional[int] = None,
                 tris12=None, slot_ids: bool = False):
        # (C, CLUSTER, 3) triangle blocks in cluster-major layout
        self.v0 = v0
        self.e1 = e1
        self.e2 = e2
        self.tri_valid = tri_valid   # (C, CLUSTER) bool
        self.to_orig = to_orig       # (C*CLUSTER,) i32
        self.cmin = cmin             # (C, 3)
        self.cmax = cmax             # (C, 3)
        self.n_clusters = n_clusters
        # pallas-kernel layouts: (C, 9, 1, CLUSTER) components-in-lanes
        self.tris9 = tris9
        self.tvalid_f = tvalid_f
        # (C,) i32: 1 when every valid triangle in the cluster is opaque
        # (no alpha-capable material) — lets any-hit shadow traversal
        # terminate on the first opaque hit
        self.opaque = opaque
        # (C*CLUSTER, 9) [v0|e1|e2] rows for the barycentric post-pass
        self.tris_flat = tris_flat
        # (C, 12, 1, CLUSTER) Baldwin-Weber rows [n | n.v0 | r1 | r1.v0 |
        # r2 | r2.v0] for the VMEM-resident kernel (~27 VPU ops/test vs
        # Möller-Trumbore's ~40; measured 43 -> 54 G tests/s,
        # scripts/kernel_lab5.py)
        self.tris12 = tris12
        # first slot index of the alpha-capable triangle range:
        # build_cluster_tracer segregates alpha-capable triangles into the
        # TAIL clusters, so "might be transparent" is the arithmetic test
        # slot_id >= alpha_base — no per-hit material gather needed
        self.alpha_base = (n_clusters * CLUSTER if alpha_base is None
                           else alpha_base)
        # slot_ids=True: trace() returns raw SLOT ids (no to_orig remap
        # gather, ~7.5 ms/wave saved) — for callers whose scene tables
        # are permuted into slot order (renderer/rt_renderer.py)
        self.slot_ids = slot_ids

    def tree_flatten(self):
        return ((self.v0, self.e1, self.e2, self.tri_valid, self.to_orig,
                 self.cmin, self.cmax, self.tris9, self.tvalid_f,
                 self.opaque, self.tris_flat, self.tris12),
                (self.n_clusters, self.alpha_base, self.slot_ids))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:7], aux[0], *children[7:11],
                   alpha_base=aux[1], tris12=children[11],
                   slot_ids=aux[2] if len(aux) > 2 else False)

    def with_pallas_layout(self):
        C = self.n_clusters
        comps = jnp.concatenate([
            jnp.swapaxes(self.v0, 1, 2),     # (C, 3, CLUSTER)
            jnp.swapaxes(self.e1, 1, 2),
            jnp.swapaxes(self.e2, 1, 2)], axis=1)      # (C, 9, CLUSTER)
        tris9 = comps[:, :, None, :]                   # (C, 9, 1, CLUSTER)
        tvalid_f = self.tri_valid.astype(jnp.float32)[:, None, :]
        # (C*CLUSTER, 9) row table for the barycentric post-pass: one
        # row gather per ray instead of three two-level gathers
        tris_flat = jnp.concatenate(
            [self.v0, self.e1, self.e2], axis=-1).reshape(-1, 9)
        # Baldwin-Weber rows: n = e1 x e2; r1/r2 = rows of [e1 e2 n]^-1
        # (r1 = (e2 x n)/|n|^2, r2 = (n x e1)/|n|^2), so a hit point p
        # gives u = r1.p - r1.v0, v = r2.p - r2.v0 and the plane test is
        # t = (n.v0 - n.o)/(n.d). Degenerate triangles get n = r = 0 and
        # mask out via den == 0.
        n = jnp.cross(self.e1, self.e2)
        det = jnp.sum(n * n, axis=-1, keepdims=True)
        inv_det = jnp.where(det > 0, 1.0 / jnp.where(det == 0, 1.0, det),
                            0.0)
        r1 = jnp.cross(self.e2, n) * inv_det
        r2 = jnp.cross(n, self.e1) * inv_det

        def dotv0(x):
            return jnp.sum(x * self.v0, axis=-1, keepdims=True)
        bw = jnp.concatenate([n, dotv0(n), r1, dotv0(r1), r2, dotv0(r2)],
                             axis=-1)                  # (C, CLUSTER, 12)
        tris12 = jnp.swapaxes(bw, 1, 2)[:, :, None, :]
        return ClusterTracer(self.v0, self.e1, self.e2, self.tri_valid,
                             self.to_orig, self.cmin, self.cmax,
                             self.n_clusters, tris9, tvalid_f, self.opaque,
                             tris_flat, alpha_base=self.alpha_base,
                             tris12=tris12, slot_ids=self.slot_ids)

    # ------------------------------------------------------------------
    def trace(self, origins, dirs, t_min, t_max, any_hit: bool = False,
              sort_rays: Optional[bool] = None,
              need_uv: bool = True) -> Hit:
        return self.trace_flagged(origins, dirs, t_min, t_max,
                                  any_hit=any_hit, sort_rays=sort_rays,
                                  need_uv=need_uv)[0]

    def trace_flagged(self, origins, dirs, t_min, t_max,
                      any_hit: bool = False,
                      sort_rays: Optional[bool] = None,
                      need_uv: bool = True
                      ) -> Tuple[Hit, jnp.ndarray]:
        """Like trace(), and additionally returns (R,) bool marking hits
        on alpha-capable (stochastic-transparency) triangles. The flag is
        slot_id >= alpha_base — pure arithmetic, zero gathers — because
        build_cluster_tracer packs alpha-capable triangles into the tail
        clusters.

        sort_rays: reorder rays by their ACTIVE-SET signature (first two
        phase-1 clusters; dead rays last) before tiling — the TPU
        analogue of GPU wavefront ray sorting. Default: off on the
        pallas path for camera-coherent callers (pixel-block order is
        already near-minimal: 2.2 activations/tile); the path tracer
        turns it on explicitly for bounce and shadow waves where it
        cuts tile unions 3-5x (scripts/sortsig_lab.py). On for the XLA
        fallback, whose lockstep fori loop pays for the whole per-chunk
        max cluster count."""
        if sort_rays is None:
            sort_rays = self.tris9 is None
        o = jnp.asarray(origins, jnp.float32)
        d = jnp.asarray(dirs, jnp.float32)
        R = o.shape[0]
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
        # pallas kernel processes G=8 tiles per grid step; the XLA
        # fallback chunks by TILE_CHUNK tiles
        pad = (-R) % (TILE * max(TILE_CHUNK, 8))
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            t_min = jnp.concatenate([t_min, jnp.ones(pad, jnp.float32)])
            t_max = jnp.concatenate([t_max, jnp.zeros(pad, jnp.float32)])
        use_pallas = self.tris9 is not None
        if use_pallas:
            tracefn = partial(_trace_padded_pallas, need_uv=need_uv)
        else:
            tracefn = _trace_padded
        if sort_rays:
            # packed permutation: TPU gathers/scatters are row-latency
            # bound and width-free to ~128 cols (scripts/gather_lab.py),
            # so the wave permutes as ONE (R, 8) gather in and ONE
            # (R, 2|4) scatter out instead of 8 narrow gathers.
            # SIGNATURE key: rays grouped by their first phase-1 active
            # clusters (+ dead rays last) — measured 3-5x fewer
            # tile-union activations than direction-corridor keys on
            # bounce/shadow waves (scripts/sortsig_lab.py, sigkey_lab2.py)
            perm = _sig_sort_perm(self, o, d, t_min, t_max)
            pack = jnp.concatenate(
                [o, d, t_min[:, None], t_max[:, None]], axis=1)[perm]
            if use_pallas:
                hit = tracefn(self, pack[:, 0:3], pack[:, 3:6],
                              pack[:, 6], pack[:, 7], any_hit,
                              rays8=pack)
            else:
                hit = tracefn(self, pack[:, 0:3], pack[:, 3:6],
                              pack[:, 6], pack[:, 7], any_hit)
            # un-permute via INVERSE-PERM GATHER of ONE INT32 matrix:
            # (a) gather, not scatter — the (R, 4) scatter measured
            # ~42 ms/wave vs ~16 ms for argsort(perm)+gather; (b) int32,
            # not float — tri ids bitcast through float are denormal/NaN
            # bit patterns that the TPU's f32 scatter/gather relayouts
            # flush/canonicalize (measured: miss -1 became a canonical
            # NaN, id 8 flushed to 0; the ADVICE-r3 hazard, now real)
            cols = [jax.lax.bitcast_convert_type(hit.t, jnp.int32),
                    hit.tri_id]
            if need_uv:
                cols += [jax.lax.bitcast_convert_type(hit.u, jnp.int32),
                         jax.lax.bitcast_convert_type(hit.v, jnp.int32)]
            inv = jnp.argsort(perm)
            back = jnp.stack(cols, axis=1)[inv]
            z = jnp.zeros(o.shape[0], jnp.float32)

            def asf(col):
                return jax.lax.bitcast_convert_type(col, jnp.float32)
            hit = Hit(asf(back[:, 0]), back[:, 1],
                      asf(back[:, 2]) if need_uv else z,
                      asf(back[:, 3]) if need_uv else z)
        else:
            hit = tracefn(self, o, d, t_min, t_max, any_hit)
        t, tid, u, v = (x[:R] for x in hit)
        alpha_flag = tid >= self.alpha_base
        if not self.slot_ids:
            tid = jnp.where(tid >= 0, self.to_orig[jnp.maximum(tid, 0)],
                            -1)
        return Hit(t, tid, u, v), alpha_flag


def wave_activation_stats(tracer: ClusterTracer, o, d, t_min, t_max,
                          sort: bool) -> dict:
    """Phase-1 activation statistics for one wave under the PRODUCTION
    traversal configuration (same padding, same signature sort, same
    per-tile counts the kernel walks). Returns python floats:
    triangle tests per LANE ray and per LIVE ray, steps/tile, live
    fraction. This is the VERDICT-r3 "tests_per_ray" diagnostic —
    bench.py reports it per wave type."""
    from .pallas_trace import KBV, TILE as PT, vm_fits
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    R0 = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R0,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R0,))
    pad = (-R0) % (TILE * max(TILE_CHUNK, 8))
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_min = jnp.concatenate([t_min, jnp.ones(pad, jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad, jnp.float32)])
    C = tracer.n_clusters
    kbv = KBV if vm_fits(C) else KB
    n_tiles = o.shape[0] // PT

    @partial(jax.jit, static_argnames=("do_sort",))
    def _stats(tracer, o, d, t_min, t_max, do_sort):
        if do_sort:
            key = _sig_sort_key(tracer, o, d, t_min, t_max)
            perm = jnp.argsort(key)
            o, d, t_min, t_max = (x[perm] for x in (o, d, t_min, t_max))
        R = o.shape[0]
        n_blocks = R // TILE
        sub = TILE // PT
        ro = o.reshape(n_blocks, TILE, 3)
        rd = d.reshape(n_blocks, TILE, 3)
        inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                          1.0 / jnp.where(rd == 0, 1.0, rd))
        tn, tf = _slab_t_soa(
            ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
            inv_d[:, None, :, 0], inv_d[:, None, :, 1],
            inv_d[:, None, :, 2], tracer.cmin, tracer.cmax)
        tn = jnp.maximum(tn, t_min.reshape(n_blocks, TILE)[:, None, :])
        act = (tf >= tn) & (tn <= t_max.reshape(n_blocks, TILE)[:, None, :])
        tile_act = jnp.any(
            act.reshape(n_blocks, C, sub, PT), axis=3)  # (n_blocks, C, sub)
        counts = jnp.sum(tile_act, axis=1).reshape(-1).astype(jnp.int32)
        steps = (counts + kbv - 1) // kbv
        per_ray_need = jnp.sum(act, axis=1)             # (n_blocks, TILE)
        live = jnp.sum(t_max > 0)
        return (jnp.sum(steps), jnp.sum(counts), live,
                jnp.sum(per_ray_need))

    stats = jax.device_get(_stats(tracer, o, d, t_min, t_max, sort))
    steps_sum, counts_sum, live_n, need_sum = (float(x) for x in stats)
    tests = steps_sum * kbv * CLUSTER * PT
    return dict(
        rays=float(R0), live=live_n,
        tests_per_lane=tests / max(R0, 1),
        tests_per_live=tests / max(live_n, 1),
        clusters_per_tile=counts_sum / max(n_tiles, 1),
        steps_per_tile=steps_sum / max(n_tiles, 1),
        need_per_ray=need_sum / max(live_n, 1))


def _median_order(centroids, ids) -> np.ndarray:
    """Recursive median split on the widest centroid axis, cut at
    CLUSTER multiples so leaves stay full; iterative stack to avoid
    Python recursion limits on large scenes."""
    out = []
    stack = [np.asarray(ids)]
    while stack:
        cur = stack.pop()
        if len(cur) <= CLUSTER:
            out.append(cur)
            continue
        c = centroids[cur]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        k = len(cur) // 2
        k = max(CLUSTER * max(round(k / CLUSTER), 1), CLUSTER)
        k = min(k, len(cur) - 1)
        part = np.argpartition(c[:, ax], k)
        stack.append(cur[part[k:]])
        stack.append(cur[part[:k]])
    return np.concatenate(out)


def _sah_order(tri_pos, ids) -> np.ndarray:
    """Top-down splits like _median_order, but axis AND cut chosen by
    surface-area cost over CLUSTER-aligned cuts: cost(k) = SA(prefix
    AABB)*k + SA(suffix AABB)*(n-k) on the coordinate-sorted list.
    Measured vs median split on test.glb waves: 35% fewer per-tile
    cluster activations on camera waves, 12% on bounce waves
    (scripts/cluster_lab.py)."""
    centroids = tri_pos.mean(axis=1)
    tlo = tri_pos.min(axis=1)
    thi = tri_pos.max(axis=1)
    out = []
    stack = [np.asarray(ids)]
    while stack:
        cur = stack.pop()
        n = len(cur)
        if n <= CLUSTER:
            out.append(cur)
            continue
        best = None
        for ax in range(3):
            o = cur[np.argsort(centroids[cur, ax], kind="stable")]
            lo = tlo[o]
            hi = thi[o]
            pre_lo = np.minimum.accumulate(lo)
            pre_hi = np.maximum.accumulate(hi)
            suf_lo = np.minimum.accumulate(lo[::-1])[::-1]
            suf_hi = np.maximum.accumulate(hi[::-1])[::-1]

            def sa(lo_, hi_):
                dd = np.maximum(hi_ - lo_, 0)
                return dd[:, 0] * dd[:, 1] + dd[:, 1] * dd[:, 2] + \
                    dd[:, 2] * dd[:, 0]
            ks = np.arange(CLUSTER, n, CLUSTER)
            if not len(ks):
                ks = np.array([n // 2])
            cost = sa(pre_lo[ks - 1], pre_hi[ks - 1]) * ks + \
                sa(suf_lo[ks], suf_hi[ks]) * (n - ks)
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (cost[j], o, int(ks[j]))
        _, o, k = best
        stack.append(o[k:])
        stack.append(o[:k])
    return np.concatenate(out)


def tri_opacity(tri_instance, inst_has_alpha) -> np.ndarray:
    """(T,) bool — triangle's instance has no alpha-capable material."""
    inst = np.maximum(np.asarray(tri_instance), 0)
    return ~np.asarray(inst_has_alpha)[inst]


def build_cluster_tracer(tri_pos, tri_instance, tri_opaque=None,
                         strategy: str = "all-merged-static",
                         inst_dynamic=None, inst_entity=None
                         ) -> Tuple[ClusterTracer, np.ndarray]:
    """Host-side build: morton sort + clustering. Returns (tracer, perm).

    tri_opaque: optional (T,) bool — triangle has no alpha-capable
    material. Folded into a per-cluster flag for any-hit early exit.

    strategy mirrors the reference's --as-strategy BLAS grouping
    (reference: src/scene_stage.hh:20-26, scene_stage.cc:881-935 —
    the unit iterated there is a (mesh, material) pair, which is
    exactly one SceneArrays instance here): clusters never span group
    boundaries, so a moving group only dirties its own clusters and
    static clusters keep bit-identical AABBs across frames:
      * "all-merged-static"  — one global morton order (group = scene)
      * "per-material" — one group per instance (= per (model,
        material), reference PER_MATERIAL)
      * "per-model" — instances of the same ENTITY merge into one
        group (reference PER_MODEL hash-combines consecutive
        same-object instances); inst_entity: (I,) entity per instance
      * "static-merged-dynamic-per-model" — static instances share one
        group, each dynamic (animated/skinned) ENTITY gets its own;
        inst_dynamic: (I,) bool marks the dynamic instances."""
    tri_pos = np.asarray(tri_pos)
    tri_instance = np.asarray(tri_instance)
    valid = tri_instance >= 0
    T = tri_pos.shape[0]
    centroids = tri_pos.mean(axis=1)
    sel = valid if valid.any() else np.ones(T, bool)
    lo = centroids[sel].min(axis=0)
    hi = centroids[sel].max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)

    # group id per triangle (invalid -> last group so they sort to the end)
    inst = np.maximum(tri_instance, 0)
    ent = (np.asarray(inst_entity) if inst_entity is not None
           else np.arange(int(inst.max()) + 1 if len(inst) else 1))
    if strategy == "per-material":
        group = inst
    elif strategy == "per-model":
        group = ent[inst]
    elif strategy == "static-merged-dynamic-per-model" and \
            inst_dynamic is not None and np.asarray(inst_dynamic).any():
        dyn = np.asarray(inst_dynamic, bool)
        group = np.where(dyn[inst], ent[inst] + 1, 0)
    else:
        group = np.zeros(T, np.int64)

    # alpha-capable triangles are segregated into the TAIL clusters
    # (alpha is the MAJOR sort key): "might this hit be transparent"
    # then becomes the arithmetic test slot_id >= alpha_base — the
    # full-width per-hit material gather disappears from every trace
    if tri_opaque is not None:
        tri_alpha = (~np.asarray(tri_opaque, bool)) & valid
    else:
        tri_alpha = np.zeros(T, bool)
    any_alpha = bool(tri_alpha.any())

    builder = _os.environ.get("TAURAY_CLUSTER_BUILDER", "sah")
    order = None
    if builder in ("median", "sah"):
        # top-down recursive splits cut at CLUSTER multiples so leaves
        # stay full. "sah" (default) picks axis+cut by surface-area
        # cost (_sah_order); "median" splits the widest centroid axis
        # at the middle. Both beat Morton-run clusters (elongated,
        # overlapping leaf AABBs); SAH activates ~35%/12% fewer
        # clusters per tile than median on camera/bounce waves
        # (scripts/cluster_lab.py, trace_lab2.py).
        parts = []
        for a_val in (False, True):
            sel = valid & (tri_alpha == a_val)
            for g in np.unique(group[sel]) if sel.any() else []:
                ids = np.flatnonzero(sel & (group == g))
                if len(ids):
                    parts.append(_sah_order(tri_pos, ids)
                                 if builder == "sah"
                                 else _median_order(centroids, ids))
        if parts:
            inval = np.flatnonzero(~valid)
            order = np.concatenate(parts + ([inval] if len(inval) else []))
    if order is None and (group == group[0]).all() and not any_alpha:
        from ..native import morton_order as _native_morton
        order = _native_morton(centroids, valid)
    if order is None:
        grid = np.clip(((centroids - lo) / ext) * 1023.0,
                       0, 1023).astype(np.uint32)
        codes = morton_3d(grid).astype(np.uint64)
        gkey = np.asarray(group, np.uint64) * (np.uint64(1) << 34) + \
            tri_alpha.astype(np.uint64) * (np.uint64(1) << 49) + \
            (~valid).astype(np.uint64) * (np.uint64(1) << 50)
        order = np.lexsort((np.arange(T), codes + gkey))

    # cluster-align each (alpha, group) segment so clusters never span
    # segment boundaries
    seg = np.asarray(group) * 2 + tri_alpha
    gsorted = seg[order]
    vsorted = valid[order]
    n_valid = int(valid.sum())
    if n_valid and (strategy != "all-merged-static" or any_alpha):
        pieces = []
        vmask = []
        gs = gsorted[:n_valid]
        bounds = np.flatnonzero(np.diff(gs)) + 1
        start = 0
        for end in list(bounds) + [n_valid]:
            seg = order[start:end]
            pad = (-len(seg)) % CLUSTER
            pieces.append(seg)
            vmask.append(np.ones(len(seg), bool))
            if pad:
                pieces.append(np.full(pad, seg[-1], np.int32))
                vmask.append(np.zeros(pad, bool))
            start = end
        perm = np.concatenate(pieces).astype(np.int32)
        valid_perm = np.concatenate(vmask)
        C = len(perm) // CLUSTER
        total = C * CLUSTER
    else:
        C = max((n_valid + CLUSTER - 1) // CLUSTER, 1)
        total = C * CLUSTER
        perm = np.full(total, order[0] if T else 0, dtype=np.int32)
        n_copy = min(T, total)
        perm[:n_copy] = order[:n_copy]
        valid_perm = np.zeros(total, dtype=bool)
        valid_perm[:n_valid] = True

    pos = tri_pos[perm]                                 # (C*K, 3, 3)
    if tri_opaque is not None:
        op = np.asarray(tri_opaque, bool)[perm] | ~valid_perm
    else:
        op = np.ones(total, bool)
    cluster_opaque = op.reshape(C, CLUSTER).all(axis=1).astype(np.int32)
    slot_alpha = tri_alpha[perm] & valid_perm
    if slot_alpha.any():
        alpha_base = int(np.flatnonzero(slot_alpha)[0]) // CLUSTER * CLUSTER
    else:
        alpha_base = total
    tracer = ClusterTracer(
        v0=jnp.asarray(pos[:, 0].reshape(C, CLUSTER, 3)),
        e1=jnp.asarray((pos[:, 1] - pos[:, 0]).reshape(C, CLUSTER, 3)),
        e2=jnp.asarray((pos[:, 2] - pos[:, 0]).reshape(C, CLUSTER, 3)),
        tri_valid=jnp.asarray(valid_perm.reshape(C, CLUSTER)),
        to_orig=jnp.asarray(perm),
        cmin=None, cmax=None, n_clusters=C,
        opaque=jnp.asarray(cluster_opaque), alpha_base=alpha_base)
    tracer = refit_cluster_tracer(tracer, tri_pos, perm)
    if _use_pallas():
        tracer = tracer.with_pallas_layout()
    return tracer, perm


def _use_pallas() -> bool:
    """Pallas phase-2 kernel: default on real TPUs, override with
    TAURAY_PALLAS=0/1 (interpret mode for CPU via
    TAURAY_PALLAS_INTERPRET=1)."""
    env = _os.environ.get("TAURAY_PALLAS")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def refit_cluster_tracer(tracer: ClusterTracer, tri_pos, perm
                         ) -> ClusterTracer:
    """Per-frame refit: recompute triangle blocks + cluster AABBs."""
    C = tracer.n_clusters
    pos = jnp.asarray(tri_pos)[perm]
    v0 = pos[:, 0].reshape(C, CLUSTER, 3)
    e1 = (pos[:, 1] - pos[:, 0]).reshape(C, CLUSTER, 3)
    e2 = (pos[:, 2] - pos[:, 0]).reshape(C, CLUSTER, 3)
    corners = pos.reshape(C, CLUSTER, 3, 3)
    valid = tracer.tri_valid[..., None, None]
    big = jnp.float32(3e38)
    cmin = jnp.where(valid, corners, big).min(axis=(1, 2))
    cmax = jnp.where(valid, corners, -big).max(axis=(1, 2))
    out = ClusterTracer(v0, e1, e2, tracer.tri_valid, tracer.to_orig,
                        cmin, cmax, C, opaque=tracer.opaque,
                        alpha_base=tracer.alpha_base,
                        slot_ids=tracer.slot_ids)
    if tracer.tris9 is not None:
        out = out.with_pallas_layout()
    return out


def _morton10_jnp(x):
    """10-bit-per-axis Morton code, jnp (same bit spreading as
    ops/bvh.morton_3d)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x ^ (x << 16)) & jnp.uint32(0xFF0000FF)
    x = (x ^ (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x ^ (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x ^ (x << 2)) & jnp.uint32(0x09249249)
    return x[..., 0] + 2 * x[..., 1] + 4 * x[..., 2]


def _morton2_jnp(x, y):
    """2D Morton interleave of two 10-bit uint32 grids -> 20 bits."""
    def part(v):
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x00FF00FF)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x33333333)
        v = (v | (v << jnp.uint32(1))) & jnp.uint32(0x55555555)
        return v
    return part(x) | (part(y) << jnp.uint32(1))


def _ray_sort_key(o, d, scene_min, scene_max):
    """Coherence key: CORRIDOR grouping. For near-parallel rays the
    activated cluster set depends on the ray's 2D offset PERPENDICULAR
    to its direction, not on the position along it — so the key is
    coarse direction (4 bits on each non-dominant axis + dominant
    axis/sign) major, then a 2D Morton of the origin projected onto the
    plane perpendicular to the dominant direction axis. Measured on 1M
    bounce waves (scripts/sortkey_lab.py): 28.8 active clusters per
    32-ray tile vs 56.2 for the previous direction-major/origin-Morton
    key (per-ray need: ~7.5)."""
    ax = jnp.argmax(jnp.abs(d), axis=1).astype(jnp.uint32)
    d1 = jnp.where(ax == 0, d[:, 1], d[:, 0])
    d2 = jnp.where(ax == 2, d[:, 1], d[:, 2])
    da = jnp.where(ax == 0, d[:, 0], jnp.where(ax == 1, d[:, 1],
                                               d[:, 2]))

    def q4(x):
        return jnp.clip((x * 0.5 + 0.5) * 15.0, 0, 15).astype(jnp.uint32)
    dk = (q4(d1) << jnp.uint32(4)) | q4(d2)
    dk = dk | (ax << jnp.uint32(8)) | \
        ((da < 0).astype(jnp.uint32) << jnp.uint32(10))
    ext = jnp.maximum(scene_max - scene_min, 1e-6)
    g = jnp.clip((o - scene_min) / ext * 1023.0, 0, 1023).astype(jnp.uint32)
    p1 = jnp.where(ax == 0, g[:, 1], g[:, 0])
    p2 = jnp.where(ax == 2, g[:, 1], g[:, 2])
    pa = jnp.where(ax == 0, g[:, 0], jnp.where(ax == 1, g[:, 1],
                                               g[:, 2]))
    # 32-bit key (TPU sorts are 32-bit): 11 direction bits | 20 bits of
    # perpendicular-plane Morton | 1 along-axis bit
    return (dk << jnp.uint32(21)) | (_morton2_jnp(p1, p2) <<
                                     jnp.uint32(1)) | (pa >> jnp.uint32(9))


# clusters per signature supercluster: 1 = exact cluster-level key.
# Swept on TPU (round 4): 1 -> 10.1 Mrays/s, 2 -> 9.19, 4 -> 9.92,
# 8 -> 9.02 — the coarser keys save sig-pass time but lose more in the
# traversal kernel (tile unions grow), so exact stays the default.
SIG_SC = int(_os.environ.get("TAURAY_SIG_SC", "1"))


def _sig_sort_key(tracer, o, d, t_min, t_max):
    """ACTIVE-SET signature key: per-ray (first, second) phase-1 active
    SUPERCLUSTER ids packed into one uint32, dead rays (t_max<=0) last.

    Rationale: per-ray need is only 2-3 clusters while 32-ray tile
    unions run 21-36 under pixel order (scripts/wave_stats.py) — the
    sort key that minimizes the union is the active set itself. The key
    is computed against SUPERCLUSTER AABBs (SIG_SC=8 consecutive SAH
    clusters, i.e. a subtree of the same top-down build): the slab pass
    shrinks 8x while grouping quality holds — rays sharing their first
    two supercluster hits share most of their cluster sets too
    (measured: tile unions 7.6->8.2 on bounce waves, kernel time flat,
    sig-pass device time 26 ms -> ~4 ms/frame). Measured tile unions on
    real bounce/shadow waves: 21-36 unsorted, 9-16 corridor-sorted,
    7.5-10 with the cluster-level key (scripts/sortsig_lab.py)."""
    C = tracer.n_clusters
    R = o.shape[0]
    nb = R // TILE
    ro = o.reshape(nb, TILE, 3)
    rd = d.reshape(nb, TILE, 3)
    rtmin = t_min.reshape(nb, TILE)
    rtmax = t_max.reshape(nb, TILE)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    # supercluster AABBs: unions of SIG_SC consecutive SAH clusters
    # (contiguous runs of the top-down order are subtrees). Built on the
    # fly from cmin/cmax — a (C,3)->(S,3) reduce XLA fuses for free.
    S = -(-C // SIG_SC)
    pad = S * SIG_SC - C
    big = jnp.float32(3e38)
    scmin = jnp.concatenate(
        [tracer.cmin, jnp.full((pad, 3), big)]).reshape(
            S, SIG_SC, 3).min(axis=1)
    scmax = jnp.concatenate(
        [tracer.cmax, jnp.full((pad, 3), -big)]).reshape(
            S, SIG_SC, 3).max(axis=1)
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        scmin, scmax)
    tn = jnp.maximum(tn, rtmin[:, None, :])
    act = (tf >= tn) & (tn <= rtmax[:, None, :])       # (nb, S, TILE)
    cid = jnp.arange(S, dtype=jnp.int32)[None, :, None]
    # Residue-class split: the key packs the smallest active cluster of
    # each residue class (independent mins -> XLA fuses them into ONE
    # pass over the slab test; a true "first k actives" would need k
    # dependent passes). Small scenes (S <= 1023) pack THREE 10-bit
    # class mins — measured tile unions 9.4 -> smaller than the
    # round-3 two-class 16-bit key at identical cost; larger scenes
    # fall back to two 16-bit class mins.
    if S <= 1023:
        big = jnp.int32(1023)
        mod = cid % 3
        mins = [jnp.min(jnp.where(act & (mod == r), jnp.minimum(cid, big),
                                  big), axis=1).astype(jnp.uint32)
                for r in range(3)]
        k = (mins[0] << jnp.uint32(20)) | (mins[1] << jnp.uint32(10)) | \
            mins[2]
    else:
        big = jnp.int32(65535)
        even = (cid & 1) == 0
        e0 = jnp.min(jnp.where(act & even, jnp.minimum(cid, big), big),
                     axis=1)                           # (nb, TILE)
        e1 = jnp.min(jnp.where(act & ~even, jnp.minimum(cid, big), big),
                     axis=1)
        k = (e0.astype(jnp.uint32) << jnp.uint32(16)) | \
            e1.astype(jnp.uint32)
    k = k.reshape(-1)
    return jnp.where(t_max <= 0, jnp.uint32(0xFFFFFFFF), k)


def _sig_sort_perm(tracer, o, d, t_min, t_max):
    """Ray permutation for the signature sort.

    Default: one argsort of the packed 32-bit class-min key
    (_sig_sort_key). TAURAY_SIG_LEX=1 enables a 64-bit LEXICOGRAPHIC
    key for large scenes via two stable argsorts — (min class0 | min
    class1) major, (min class2 | min class3) minor. It cuts
    Sponza-class bounce-wave tile unions ~25% (41->32, 57->44 vs a
    per-ray need of ~6; scripts/sigkey_lab2.py, visited_lab2.py) but
    costs an extra 2M-row argsort + class-min pass per wave, which
    MEASURED NET-NEGATIVE on the full frame (2594 -> 2846 ms), so it
    stays opt-in until the second sort pass gets cheaper."""
    C = tracer.n_clusters
    S = -(-C // SIG_SC)
    if S <= 1023 or _os.environ.get("TAURAY_SIG_LEX") != "1":
        return jnp.argsort(_sig_sort_key(tracer, o, d, t_min, t_max))
    R = o.shape[0]
    nb = R // TILE
    ro = o.reshape(nb, TILE, 3)
    rd = d.reshape(nb, TILE, 3)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tracer.cmin, tracer.cmax)
    tn = jnp.maximum(tn, t_min.reshape(nb, TILE)[:, None, :])
    act = (tf >= tn) & (tn <= t_max.reshape(nb, TILE)[:, None, :])
    cid = jnp.arange(C, dtype=jnp.int32)[None, :, None]
    big = jnp.int32(65535)
    mins = [jnp.min(jnp.where(act & (cid % 4 == r),
                              jnp.minimum(cid, big), big),
                    axis=1).astype(jnp.uint32).reshape(-1)
            for r in range(4)]
    dead = t_max <= 0
    major = (mins[0] << jnp.uint32(16)) | mins[1]
    minor = (mins[2] << jnp.uint32(16)) | mins[3]
    major = jnp.where(dead, jnp.uint32(0xFFFFFFFF), major)
    minor = jnp.where(dead, jnp.uint32(0xFFFFFFFF), minor)
    p1 = jnp.argsort(minor, stable=True)
    return p1[jnp.argsort(major[p1], stable=True)]


def _slab_hit_soa(ox, oy, oz, ix, iy, iz, t_min, t_max, bmin, bmax):
    """SoA slab test: o*/i* are (G, 1, TILE); bmin/bmax (C, 3) broadcast to
    (G, C, 1). Returns (G, C, TILE) bool. Component-separated layout keeps
    the 128-wide ray dimension in vector lanes (a packed (..., 3) layout
    wastes 125/128 lanes on TPU)."""
    res_tn = None
    res_tf = None
    for oc, ic, k in ((ox, ix, 0), (oy, iy, 1), (oz, iz, 2)):
        t0 = (bmin[None, :, k, None] - oc) * ic
        t1 = (bmax[None, :, k, None] - oc) * ic
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        res_tn = tn if res_tn is None else jnp.maximum(res_tn, tn)
        res_tf = tf if res_tf is None else jnp.minimum(res_tf, tf)
    return (res_tf >= jnp.maximum(res_tn, t_min)) & (res_tn <= t_max)


def _slab_t_soa(ox, oy, oz, ix, iy, iz, bmin, bmax):
    """Slab test returning (t_near, t_far), each (G, C, TILE); same SoA
    layout rationale as _slab_hit_soa."""
    res_tn = None
    res_tf = None
    for oc, ic, k in ((ox, ix, 0), (oy, iy, 1), (oz, iz, 2)):
        t0 = (bmin[None, :, k, None] - oc) * ic
        t1 = (bmax[None, :, k, None] - oc) * ic
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        res_tn = tn if res_tn is None else jnp.maximum(res_tn, tn)
        res_tf = tf if res_tf is None else jnp.minimum(res_tf, tf)
    return res_tn, res_tf


def _mt_block(o, d, t_min, t_max, v0, e1, e2):
    """Möller–Trumbore, SoA-component form.

    o/d: (G, TILE, 3) rays; v0/e1/e2: (G, K, 3) triangles.
    Returns (t, u, v, hit) as (G, K, TILE) — ray dim stays in lanes."""
    def rc(x, k):   # ray component -> (G, 1, TILE)
        return x[:, None, :, k]

    def tc(x, k):   # tri component -> (G, K, 1)
        return x[:, :, k, None]

    dx, dy, dz = (rc(d, 0), rc(d, 1), rc(d, 2))
    ox, oy, oz = (rc(o, 0), rc(o, 1), rc(o, 2))
    e1x, e1y, e1z = (tc(e1, 0), tc(e1, 1), tc(e1, 2))
    e2x, e2y, e2z = (tc(e2, 0), tc(e2, 1), tc(e2, 2))
    v0x, v0y, v0z = (tc(v0, 0), tc(v0, 1), tc(v0, 2))

    # h = cross(d, e2)
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    # q = cross(s, e1)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    tmin_b = t_min[:, None, :]
    tmax_b = t_max[:, None, :]
    hit = (a != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
        (t >= tmin_b) & (t < tmax_b)
    return t, u, v, hit  # all (G, K, TILE)


KB = int(_os.environ.get("TAURAY_KB", "4"))  # clusters/iteration


@partial(jax.jit, static_argnames=("any_hit",))
def _trace_padded(tracer: ClusterTracer, o, d, t_min, t_max,
                  any_hit: bool = False) -> Hit:
    R = o.shape[0]
    C = tracer.n_clusters
    n_tiles = R // TILE
    n_chunks = max(R // (TILE * TILE_CHUNK), 1)

    ro = o.reshape(n_tiles, TILE, 3)
    rd = d.reshape(n_tiles, TILE, 3)
    rtmin = t_min.reshape(n_tiles, TILE)
    rtmax = t_max.reshape(n_tiles, TILE)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))

    # ---- phase 1 (global): per-tile active-cluster lists ----------------
    hit_c = _slab_hit_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        rtmin[:, None, :], rtmax[:, None, :],
        tracer.cmin, tracer.cmax)                        # (n_tiles, C, TILE)
    active = jnp.any(hit_c, axis=2)                      # (n_tiles, C)
    counts = active.sum(axis=1)                          # (n_tiles,)
    order = jnp.argsort(~active, axis=1, stable=True)    # active first

    # ---- sort tiles by activity: each chunk gets a near-uniform trip
    # count, so the per-chunk fori bound (= chunk max) tracks the mean
    # instead of the global max ------------------------------------------
    tile_order = jnp.argsort(counts)
    ro = ro[tile_order]
    rd = rd[tile_order]
    rtmin = rtmin[tile_order]
    rtmax = rtmax[tile_order]
    order = order[tile_order]
    counts_s = counts[tile_order]

    def chunk_fn(args):
        cro, crd, ctmin, ctmax, corder, ccounts = args
        G = cro.shape[0]
        steps = (ccounts.max() + KB - 1) // KB
        best_t = jnp.minimum(ctmax, RAY_MAX_DIST)
        best = (best_t,
                jnp.full((G, TILE), -1, jnp.int32),
                jnp.zeros((G, TILE), jnp.float32),
                jnp.zeros((G, TILE), jnp.float32))

        def body(k, best):
            best_t, best_id, best_u, best_v = best
            slots = k * KB + jnp.arange(KB)              # (KB,)
            cid = jnp.take_along_axis(
                corder, jnp.broadcast_to(slots[None, :], (G, KB)),
                axis=1)                                   # (G, KB)
            slot_ok = slots[None, :] < ccounts[:, None]   # (G, KB)
            v0 = tracer.v0[cid].reshape(G, KB * CLUSTER, 3)
            e1 = tracer.e1[cid].reshape(G, KB * CLUSTER, 3)
            e2 = tracer.e2[cid].reshape(G, KB * CLUSTER, 3)
            tvalid = (tracer.tri_valid[cid] &
                      slot_ok[..., None]).reshape(G, KB * CLUSTER)
            t, u, v, hit = _mt_block(cro, crd, ctmin, best_t, v0, e1, e2)
            hit = hit & tvalid[:, :, None]
            t = jnp.where(hit, t, RAY_MAX_DIST)
            arg = jnp.argmin(t, axis=1)                   # (G, TILE)
            onehot = (jnp.arange(KB * CLUSTER)[None, :, None] ==
                      arg[:, None, :])
            cand_t = jnp.min(t, axis=1)
            closer = cand_t < best_t
            tri_local = arg % CLUSTER
            kb_idx = arg // CLUSTER
            tri_global = jnp.take_along_axis(cid, kb_idx, axis=1) *                 CLUSTER + tri_local
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, tri_global, best_id)
            sel_u = jnp.sum(jnp.where(onehot, u, 0.0), axis=1)
            sel_v = jnp.sum(jnp.where(onehot, v, 0.0), axis=1)
            best_u = jnp.where(closer, sel_u, best_u)
            best_v = jnp.where(closer, sel_v, best_v)
            return (best_t, best_id, best_u, best_v)

        best = jax.lax.fori_loop(0, steps, body, best)
        best_t, best_id, best_u, best_v = best
        miss = best_id < 0
        best_t = jnp.where(miss, RAY_MAX_DIST, best_t)
        return best_t, best_id, best_u, best_v

    G_all = n_tiles
    if n_tiles <= TILE_CHUNK:
        t, tid, u, v = chunk_fn((ro, rd, rtmin, rtmax, order, counts_s))
    else:
        nc = n_tiles // TILE_CHUNK
        t, tid, u, v = jax.lax.map(chunk_fn, (
            ro.reshape(nc, TILE_CHUNK, TILE, 3),
            rd.reshape(nc, TILE_CHUNK, TILE, 3),
            rtmin.reshape(nc, TILE_CHUNK, TILE),
            rtmax.reshape(nc, TILE_CHUNK, TILE),
            order.reshape(nc, TILE_CHUNK, -1),
            counts_s.reshape(nc, TILE_CHUNK)))
        t = t.reshape(n_tiles, TILE)
        tid = tid.reshape(n_tiles, TILE)
        u = u.reshape(n_tiles, TILE)
        v = v.reshape(n_tiles, TILE)

    # undo the tile sort
    inv_tiles = jnp.zeros_like(tile_order).at[tile_order].set(
        jnp.arange(n_tiles, dtype=tile_order.dtype))
    t = t[inv_tiles].reshape(-1)
    tid = tid[inv_tiles].reshape(-1)
    u = u[inv_tiles].reshape(-1)
    v = v[inv_tiles].reshape(-1)
    return Hit(t, tid, u, v)


_PALLAS_INTERPRET = _os.environ.get("TAURAY_PALLAS_INTERPRET", "0") == "1"


@partial(jax.jit, static_argnames=("any_hit", "need_uv"))
def _trace_padded_pallas(tracer: ClusterTracer, o, d, t_min, t_max,
                         any_hit: bool = False, need_uv: bool = True,
                         rays8=None) -> Hit:
    """Phase 1 (slab cull + front-to-back key sort) in XLA, phase 2 in
    the Pallas kernel (ops/pallas_trace.py). rays8: optional packed
    (R, 8) [o|d|tmin|tmax] rows (the sorted-trace path already owns one
    from its permutation gather); passed through to the v3 kernel to
    avoid a 35 ms/frame split+re-concat relayout."""
    from .pallas_trace import (KB as PKB, TILE as PT, vm_fits,
                               pallas_trace_tiles, pallas_trace_tiles_vm2,
                               pallas_trace_tiles_vm3)
    R = o.shape[0]
    C = tracer.n_clusters
    # slab tests run on 128-ray blocks (full VPU lanes), then reduce to
    # PT-ray kernel tiles (PT divides 128)
    n_blocks = R // TILE
    sub = TILE // PT
    n_tiles = R // PT
    ro = o.reshape(n_blocks, TILE, 3)
    rd = d.reshape(n_blocks, TILE, 3)
    rtmin = t_min.reshape(n_blocks, TILE)
    rtmax = t_max.reshape(n_blocks, TILE)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tracer.cmin, tracer.cmax)                     # (n_blocks, C, TILE)
    tn = jnp.maximum(tn, rtmin[:, None, :])
    active_rc = (tf >= tn) & (tn <= rtmax[:, None, :])
    inf = jnp.float32(jnp.inf)
    # 1024-multiple: flat HBM i32 arrays are (1024)-tiled, so the
    # kernel's per-tile DMA slices must be 1024-aligned.
    cpad = 1024 * (-(-(C + PKB) // 1024))
    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1
    cid = jnp.arange(C, dtype=jnp.int32)[None, :]
    # VMEM kernel choice (TAURAY_VM_KERNEL=v2|v3 overrides): v3 streams
    # (tile, step) pairs with NO in-kernel early exit and takes the
    # cheap bool phase-1 (id-only keys, no f32 entry-distance reduce).
    # Round 4 guarded v3 off for C > 1024 after a Sponza regression;
    # round 5 traced that regression to the 65536-pixel dispatch
    # chunking (since removed) — re-measured on equal footing, v3 >= v2
    # on Sponza too (2594 vs 2615 ms/frame), and the front-to-back exit
    # saves only 9-21% of steps there (scripts/visited_lab2.py), less
    # than its f32 key-reduce costs. v3 is now the default wherever the
    # table fits VMEM.
    vm_kern = _os.environ.get("TAURAY_VM_KERNEL", "") or "v3"
    if vm_fits(C) and vm_kern == "v3":
        # v3 streamed kernel has NO in-kernel early exit, so front-to-
        # back entry distances are vestigial — the key is just the
        # cluster id (sentinel when inactive) and the per-ray reduction
        # is a bool any() instead of a f32 min() (35 ms/frame of
        # reduce_min drops to a cheap i8 reduce).
        tile_act = jnp.any(
            active_rc.reshape(n_blocks, C, sub, PT), axis=3)
        tile_act = jnp.transpose(tile_act, (0, 2, 1)).reshape(n_tiles, C)
        counts = jnp.sum(tile_act, axis=1).astype(jnp.int32)
        key = jnp.where(tile_act, cid, jnp.int32(0x7FFFFFFF))
    else:
        # per-(kernel tile, cluster) minimum entry distance over the
        # tile's rays: reduce each PT-lane sub-block, then flatten
        # (block, sub) into the kernel tile axis. ONE i32 key per
        # (tile, cluster): entry-t bits (a lower bound after truncating
        # the id bits off the mantissa; t >= 0 so the bit pattern is
        # order-preserving) | cluster id — a single jnp.sort row-sorts
        # the active clusters front-to-back for the early-exit kernel.
        tile_tnear = jnp.min(
            jnp.where(active_rc, tn, inf).reshape(n_blocks, C, sub, PT),
            axis=3)                                   # (n_blocks, C, sub)
        tile_tnear = jnp.transpose(
            tile_tnear, (0, 2, 1)).reshape(n_tiles, C)
        counts = jnp.sum(tile_tnear < inf, axis=1).astype(jnp.int32)
        tn_bits = jax.lax.bitcast_convert_type(tile_tnear, jnp.int32)
        key = (tn_bits & ~idmask) | cid
        key = jnp.where(jnp.isfinite(tile_tnear), key,
                        jnp.int32(0x7FFFFFFF))
    # sort only the real C-column prefix (sort cost scales with row
    # width; C=636 in a 1024 row wasted ~35%), then pad the sorted rows
    # to the kernel's 1024-aligned cpad with the same sentinel
    sort_w = 128 * (-(-(C + PKB + 1) // 128))
    if sort_w < cpad:
        key = jnp.pad(key, ((0, 0), (0, sort_w - C)),
                      constant_values=0x7FFFFFFF)
        keys = jnp.sort(key, axis=1)
        keys = jnp.pad(keys, ((0, 0), (0, cpad - sort_w)),
                       constant_values=0x7FFFFFFF)
    else:
        key = jnp.pad(key, ((0, 0), (0, cpad - C)),
                      constant_values=0x7FFFFFFF)
        keys = jnp.sort(key, axis=1)

    # whole-table-in-VMEM kernel when the packed triangles fit (~13.5 MB
    # budget, Sponza-class scenes included; Baldwin-Weber rows);
    # DMA-streaming Möller-Trumbore kernel above that
    # (scripts/kernel_lab3.py / kernel_lab4.py / kernel_lab5.py).
    # v3 (streamed tile*step iteration, no in-kernel early exit) beats
    # the exit-carrying v1 on sorted AND unsorted waves
    # (scripts/kernel_lab7.py); without an exit any-hit == closest-hit,
    # so the opacity table is unused on this path.
    if vm_fits(C) and vm_kern == "v3":
        if rays8 is None:
            rays8 = jnp.concatenate(
                [o, d, t_min[:, None], t_max[:, None]], axis=1)
        t, tid = pallas_trace_tiles_vm3(
            counts, keys, rays8.reshape(n_tiles, PT, 8), tracer.tris12,
            C, cpad, idmask, interpret=_PALLAS_INTERPRET,
            mxu=_os.environ.get("TAURAY_MXU", "0") == "1")
    else:
        o3 = o.reshape(n_tiles, PT, 3)
        d3 = d.reshape(n_tiles, PT, 3)
        mm2 = jnp.stack([t_min, t_max], axis=-1).reshape(n_tiles, PT, 2)
        if any_hit and tracer.opaque is not None:
            opad = 1024 * (-(-C // 1024))
            opaque = jnp.pad(tracer.opaque.astype(jnp.int32),
                             (0, opad - C))
        else:
            opaque = jnp.ones(1024, jnp.int32)
        if vm_fits(C):
            t, tid = pallas_trace_tiles_vm2(
                counts, keys, o3, d3, mm2, tracer.tris12, opaque, C,
                cpad, idmask, any_hit=any_hit,
                interpret=_PALLAS_INTERPRET)
        else:
            t, tid = pallas_trace_tiles(
                counts, keys, o3, d3, mm2, tracer.tris9, opaque, C, cpad,
                idmask, any_hit=any_hit, interpret=_PALLAS_INTERPRET)
    # barycentrics post-pass: recompute u,v for the single best triangle
    # (one row gather from the packed [v0|e1|e2] table). Skipped with
    # need_uv=False — shading/alpha recompute barycentrics from rows they
    # gather anyway (ops/shading.bary_from_row), saving ~15ns/ray of
    # latency-bound gathers per wave.
    miss = tid < 0
    t = jnp.where(miss, RAY_MAX_DIST, t)
    if not need_uv:
        z = jnp.zeros_like(t)
        return Hit(t, tid, z, z)
    safe = jnp.maximum(tid, 0)
    row = tracer.tris_flat[safe]
    v0 = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = o - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    return Hit(t, tid, u, v)


# ---------------------------------------------------------------------------
# Object-space instancing — the TPU-native TLAS
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class InstancedClusterTracer:
    """Two-level tracer with SHARED object-space geometry (reference:
    src/acceleration_structure.hh:90-112 — the TLAS holds per-instance
    transforms over shared BLASes; src/scene_stage.hh:20-26 blas
    grouping). Selected by --as-strategy=per-model / per-material when
    meshes are shared between instances.

    * geometry: ONE set of median-split 128-tri clusters per UNIQUE
      mesh, in OBJECT space — N instances of a mesh cost one copy;
    * cluster-INSTANCES: entry k pairs (object cluster `k_cluster[k]`,
      instance `k_inst[k]`) and carries a world-space AABB (the
      transformed object AABB — phase 1 is unchanged, running over K
      cluster-instances);
    * traversal transforms each ray into instance space with the
      instance's inverse transform, direction left UNNORMALIZED so the
      hit parameter t stays in world units (no re-scaling);
    * refit after movement = new inverse transforms + re-transformed
      AABBs; triangle data is untouched (a moving instance re-uploads
      only its transform);
    * alpha-capable INSTANCES sort to the tail cluster-instances, so
      the `slot >= alpha_base` transparency flag stays arithmetic.
    """

    def __init__(self, v0, e1, e2, tri_valid, to_orig, cmin, cmax,
                 n_clusters: int, k_cluster=None, k_inst=None, inv=None,
                 obj_min=None, obj_max=None, tris9=None, opaque=None,
                 tris_flat=None, alpha_base: Optional[int] = None):
        # object-space blocks, (Cu, CLUSTER, 3)
        self.v0 = v0
        self.e1 = e1
        self.e2 = e2
        self.tri_valid = tri_valid       # (Cu, CLUSTER)
        self.to_orig = to_orig           # (K*CLUSTER,)
        self.cmin = cmin                 # (K, 3) WORLD per cluster-instance
        self.cmax = cmax
        self.n_clusters = n_clusters     # K (cluster-instances)
        self.k_cluster = k_cluster       # (K,) i32 -> object cluster
        self.k_inst = k_inst             # (K,) i32 -> instance
        self.inv = inv                   # (I, 3, 4) world->object
        self.obj_min = obj_min           # (Cu, 3) object AABBs (for refit)
        self.obj_max = obj_max
        self.tris9 = tris9               # (Cu, 9, 1, CLUSTER) pallas layout
        self.opaque = opaque             # (K,) i32
        self.tris_flat = tris_flat       # (Cu*CLUSTER, 9) object rows
        self.alpha_base = (0 if alpha_base is None else alpha_base)

    def tree_flatten(self):
        return ((self.v0, self.e1, self.e2, self.tri_valid, self.to_orig,
                 self.cmin, self.cmax, self.k_cluster, self.k_inst,
                 self.inv, self.obj_min, self.obj_max, self.tris9,
                 self.opaque, self.tris_flat),
                (self.n_clusters, self.alpha_base))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[2], ch[3], ch[4], ch[5], ch[6], aux[0],
                   k_cluster=ch[7], k_inst=ch[8], inv=ch[9], obj_min=ch[10],
                   obj_max=ch[11], tris9=ch[12], opaque=ch[13],
                   tris_flat=ch[14], alpha_base=aux[1])

    # same trace API as ClusterTracer ----------------------------------
    def trace(self, origins, dirs, t_min, t_max, any_hit: bool = False,
              sort_rays: Optional[bool] = None, need_uv: bool = True) -> Hit:
        return self.trace_flagged(origins, dirs, t_min, t_max,
                                  any_hit=any_hit, sort_rays=sort_rays,
                                  need_uv=need_uv)[0]

    def trace_flagged(self, origins, dirs, t_min, t_max,
                      any_hit: bool = False,
                      sort_rays: Optional[bool] = None,
                      need_uv: bool = True) -> Tuple[Hit, jnp.ndarray]:
        o = jnp.asarray(origins, jnp.float32)
        d = jnp.asarray(dirs, jnp.float32)
        R = o.shape[0]
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
        pad = (-R) % (TILE * max(TILE_CHUNK, 8))
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            t_min = jnp.concatenate([t_min, jnp.ones(pad, jnp.float32)])
            t_max = jnp.concatenate([t_max, jnp.zeros(pad, jnp.float32)])
        if self.tris9 is not None:
            hit = _trace_padded_pallas_inst(self, o, d, t_min, t_max,
                                            any_hit, need_uv)
        else:
            hit = _trace_padded_inst(self, o, d, t_min, t_max, any_hit)
        t, tid, u, v = (x[:R] for x in hit)
        alpha_flag = tid >= self.alpha_base
        tid = jnp.where(tid >= 0, self.to_orig[jnp.maximum(tid, 0)], -1)
        return Hit(t, tid, u, v), alpha_flag


def build_instanced_tracer(mesh_tris, mesh_of_inst, inst_model,
                           inst_opaque, tri_starts,
                           use_pallas: Optional[bool] = None):
    """Build the instanced tracer.

    mesh_tris: list of (Tm, 3, 3) OBJECT-space triangle arrays, one per
    unique mesh; mesh_of_inst: (I,) mesh index per instance;
    inst_model: (I, 4, 4) object->world transforms; inst_opaque: (I,)
    bool (False = alpha-capable material); tri_starts: (I,) world-soup
    triangle offset per instance (to_orig mapping).
    Returns (tracer, None)."""
    # per-mesh object-space clusters (SAH split, see build_cluster_tracer)
    mesh_builds = []
    for tris in mesh_tris:
        tris = np.asarray(tris, np.float32)
        T = tris.shape[0]
        order = _sah_order(tris, np.arange(T))
        C = max((T + CLUSTER - 1) // CLUSTER, 1)
        total = C * CLUSTER
        perm = np.full(total, order[0] if T else 0, np.int64)
        perm[:min(T, total)] = order[:total]
        vmask = np.zeros(total, bool)
        vmask[:T] = True
        pos = tris[perm]
        corners = pos.reshape(C, CLUSTER, 3, 3)
        vm = vmask.reshape(C, CLUSTER)[..., None, None]
        big = 3e38
        omin = np.where(vm, corners, big).min(axis=(1, 2))
        omax = np.where(vm, corners, -big).max(axis=(1, 2))
        mesh_builds.append(dict(
            v0=pos[:, 0].reshape(C, CLUSTER, 3),
            e1=(pos[:, 1] - pos[:, 0]).reshape(C, CLUSTER, 3),
            e2=(pos[:, 2] - pos[:, 0]).reshape(C, CLUSTER, 3),
            valid=vmask.reshape(C, CLUSTER), perm=perm, C=C))

    cluster_base = np.cumsum([0] + [b["C"] for b in mesh_builds])
    v0 = np.concatenate([b["v0"] for b in mesh_builds])
    e1 = np.concatenate([b["e1"] for b in mesh_builds])
    e2 = np.concatenate([b["e2"] for b in mesh_builds])
    tri_valid = np.concatenate([b["valid"] for b in mesh_builds])

    # cluster-instance list: alpha-capable instances LAST
    mesh_of_inst = np.asarray(mesh_of_inst)
    inst_opaque = np.asarray(inst_opaque, bool)
    order_i = np.argsort(~inst_opaque, kind="stable")
    k_cluster, k_inst, to_orig, opaque = [], [], [], []
    alpha_base = None
    for i in order_i:
        mi = mesh_of_inst[i]
        b = mesh_builds[mi]
        if not inst_opaque[i] and alpha_base is None:
            alpha_base = len(k_cluster) * CLUSTER
        for c in range(b["C"]):
            k_cluster.append(cluster_base[mi] + c)
            k_inst.append(i)
            opaque.append(1 if inst_opaque[i] else 0)
            sl = b["perm"][c * CLUSTER:(c + 1) * CLUSTER]
            to_orig.append(tri_starts[i] + sl)
    if alpha_base is None:
        alpha_base = len(k_cluster) * CLUSTER
    k_cluster = np.asarray(k_cluster, np.int32)
    k_inst = np.asarray(k_inst, np.int32)
    to_orig = np.concatenate(to_orig).astype(np.int32)

    tracer = InstancedClusterTracer(
        v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        tri_valid=jnp.asarray(tri_valid), to_orig=jnp.asarray(to_orig),
        cmin=None, cmax=None, n_clusters=len(k_cluster),
        k_cluster=jnp.asarray(k_cluster), k_inst=jnp.asarray(k_inst),
        inv=None, obj_min=None, obj_max=None,
        opaque=jnp.asarray(np.asarray(opaque, np.int32)),
        alpha_base=int(alpha_base))
    # object AABBs (static) + pallas layout
    corners_min = jnp.minimum(jnp.minimum(
        tracer.v0, tracer.v0 + tracer.e1), tracer.v0 + tracer.e2)
    corners_max = jnp.maximum(jnp.maximum(
        tracer.v0, tracer.v0 + tracer.e1), tracer.v0 + tracer.e2)
    valid = tracer.tri_valid[..., None]
    big = jnp.float32(3e38)
    tracer.obj_min = jnp.where(valid, corners_min, big).min(axis=1)
    tracer.obj_max = jnp.where(valid, corners_max, -big).max(axis=1)
    if use_pallas if use_pallas is not None else _use_pallas():
        comps = jnp.concatenate([
            jnp.swapaxes(tracer.v0, 1, 2), jnp.swapaxes(tracer.e1, 1, 2),
            jnp.swapaxes(tracer.e2, 1, 2)], axis=1)
        tracer.tris9 = comps[:, :, None, :]
        tracer.tris_flat = jnp.concatenate(
            [tracer.v0, tracer.e1, tracer.e2], axis=-1).reshape(-1, 9)
    tracer = refit_instanced_tracer(tracer, inst_model)
    return tracer, None


def refit_instanced_tracer(tracer: InstancedClusterTracer, inst_model
                           ) -> InstancedClusterTracer:
    """Per-frame refit: ONLY transforms move (reference:
    acceleration_structure TLAS update) — inverse matrices + world AABBs
    from the static object AABBs. O(instances + cluster-instances)."""
    model = jnp.asarray(inst_model, jnp.float32)      # (I, 4, 4)
    inv4 = jnp.linalg.inv(model)
    inv = inv4[:, :3, :]                              # (I, 3, 4)
    # world AABB of each cluster-instance: transform the 8 object
    # corners of its object AABB
    omin = tracer.obj_min[tracer.k_cluster]           # (K, 3)
    omax = tracer.obj_max[tracer.k_cluster]
    M = model[tracer.k_inst]                          # (K, 4, 4)
    corners = jnp.stack([
        jnp.stack([jnp.where(m & 1, omax[:, 0], omin[:, 0]),
                   jnp.where(m & 2, omax[:, 1], omin[:, 1]),
                   jnp.where(m & 4, omax[:, 2], omin[:, 2])], axis=-1)
        for m in range(8)], axis=1)                   # (K, 8, 3)
    wc = jnp.einsum("kij,kcj->kci", M[:, :3, :3], corners) + \
        M[:, None, :3, 3]
    out = InstancedClusterTracer(
        tracer.v0, tracer.e1, tracer.e2, tracer.tri_valid, tracer.to_orig,
        wc.min(axis=1), wc.max(axis=1), tracer.n_clusters,
        k_cluster=tracer.k_cluster, k_inst=tracer.k_inst, inv=inv,
        obj_min=tracer.obj_min, obj_max=tracer.obj_max,
        tris9=tracer.tris9, opaque=tracer.opaque,
        tris_flat=tracer.tris_flat, alpha_base=tracer.alpha_base)
    return out


@partial(jax.jit, static_argnames=("any_hit",))
def _trace_padded_inst(tracer: InstancedClusterTracer, o, d, t_min, t_max,
                       any_hit: bool = False) -> Hit:
    """XLA fallback traversal with per-cluster-instance ray transforms."""
    R = o.shape[0]
    n_tiles = R // TILE

    ro = o.reshape(n_tiles, TILE, 3)
    rd = d.reshape(n_tiles, TILE, 3)
    rtmin = t_min.reshape(n_tiles, TILE)
    rtmax = t_max.reshape(n_tiles, TILE)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))

    hit_c = _slab_hit_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        rtmin[:, None, :], rtmax[:, None, :],
        tracer.cmin, tracer.cmax)
    active = jnp.any(hit_c, axis=2)
    counts = active.sum(axis=1)
    order = jnp.argsort(~active, axis=1, stable=True)

    tile_order = jnp.argsort(counts)
    ro = ro[tile_order]
    rd = rd[tile_order]
    rtmin = rtmin[tile_order]
    rtmax = rtmax[tile_order]
    order = order[tile_order]
    counts_s = counts[tile_order]

    def chunk_fn(args):
        cro, crd, ctmin, ctmax, corder, ccounts = args
        G = cro.shape[0]
        steps = (ccounts.max() + KB - 1) // KB
        best_t = jnp.minimum(ctmax, RAY_MAX_DIST)
        best = (best_t,
                jnp.full((G, TILE), -1, jnp.int32),
                jnp.zeros((G, TILE), jnp.float32),
                jnp.zeros((G, TILE), jnp.float32))

        def body(k, best):
            best_t, best_id, best_u, best_v = best
            slots = k * KB + jnp.arange(KB)
            kid = jnp.take_along_axis(
                corder, jnp.broadcast_to(slots[None, :], (G, KB)), axis=1)
            slot_ok = slots[None, :] < ccounts[:, None]
            cid = tracer.k_cluster[kid]                    # (G, KB)
            iid = tracer.k_inst[kid]
            v0 = tracer.v0[cid].reshape(G, KB * CLUSTER, 3)
            e1 = tracer.e1[cid].reshape(G, KB * CLUSTER, 3)
            e2 = tracer.e2[cid].reshape(G, KB * CLUSTER, 3)
            tvalid = (tracer.tri_valid[cid] &
                      slot_ok[..., None]).reshape(G, KB * CLUSTER)
            inv = tracer.inv[iid]                          # (G, KB, 3, 4)
            # rays into instance space, per (tile, block): direction
            # unnormalized so t stays world
            ob = jnp.einsum("gkij,gtj->gkti", inv[..., :3], cro) + \
                inv[..., None, :, 3]                       # (G, KB, TILE, 3)
            db = jnp.einsum("gkij,gtj->gkti", inv[..., :3], crd)
            t, u, v, hit = _mt_block_inst(ob, db, ctmin, best_t, v0, e1, e2)
            hit = hit & tvalid[:, :, None]
            t = jnp.where(hit, t, RAY_MAX_DIST)
            arg = jnp.argmin(t, axis=1)
            onehot = (jnp.arange(KB * CLUSTER)[None, :, None] ==
                      arg[:, None, :])
            cand_t = jnp.min(t, axis=1)
            closer = cand_t < best_t
            tri_local = arg % CLUSTER
            kb_idx = arg // CLUSTER
            tri_global = jnp.take_along_axis(kid, kb_idx, axis=1) * \
                CLUSTER + tri_local
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, tri_global, best_id)
            sel_u = jnp.sum(jnp.where(onehot, u, 0.0), axis=1)
            sel_v = jnp.sum(jnp.where(onehot, v, 0.0), axis=1)
            best_u = jnp.where(closer, sel_u, best_u)
            best_v = jnp.where(closer, sel_v, best_v)
            return (best_t, best_id, best_u, best_v)

        best = jax.lax.fori_loop(0, steps, body, best)
        best_t, best_id, best_u, best_v = best
        miss = best_id < 0
        best_t = jnp.where(miss, RAY_MAX_DIST, best_t)
        return best_t, best_id, best_u, best_v

    n_chunks = max(n_tiles // TILE_CHUNK, 1)
    if n_tiles <= TILE_CHUNK:
        t, tid, u, v = chunk_fn((ro, rd, rtmin, rtmax, order, counts_s))
    else:
        nc = n_tiles // TILE_CHUNK
        t, tid, u, v = jax.lax.map(chunk_fn, (
            ro.reshape(nc, TILE_CHUNK, TILE, 3),
            rd.reshape(nc, TILE_CHUNK, TILE, 3),
            rtmin.reshape(nc, TILE_CHUNK, TILE),
            rtmax.reshape(nc, TILE_CHUNK, TILE),
            order.reshape(nc, TILE_CHUNK, -1),
            counts_s.reshape(nc, TILE_CHUNK)))
        t = t.reshape(n_tiles, TILE)
        tid = tid.reshape(n_tiles, TILE)
        u = u.reshape(n_tiles, TILE)
        v = v.reshape(n_tiles, TILE)

    inv_tiles = jnp.zeros_like(tile_order).at[tile_order].set(
        jnp.arange(n_tiles, dtype=tile_order.dtype))
    t = t[inv_tiles].reshape(-1)
    tid = tid[inv_tiles].reshape(-1)
    u = u[inv_tiles].reshape(-1)
    v = v[inv_tiles].reshape(-1)
    return Hit(t, tid, u, v)


def _mt_block_inst(ob, db, t_min, t_max, v0, e1, e2):
    """Möller–Trumbore with PER-BLOCK rays: ob/db (G, KB, TILE, 3)
    instance-space rays; v0/e1/e2 (G, KB*CLUSTER, 3).
    Returns (t, u, v, hit) as (G, KB*CLUSTER, TILE)."""
    G, KBn, T, _ = ob.shape
    K = v0.shape[1]
    C = K // KBn

    def rc(x, k):   # (G, KB, 1, TILE) broadcast over the block's tris
        return x[:, :, None, :, k]

    def tc(x, k):   # (G, KB, CLUSTER, 1)
        return x.reshape(G, KBn, C, 3)[:, :, :, k, None]

    dx, dy, dz = (rc(db, 0), rc(db, 1), rc(db, 2))
    ox, oy, oz = (rc(ob, 0), rc(ob, 1), rc(ob, 2))
    e1x, e1y, e1z = (tc(e1, 0), tc(e1, 1), tc(e1, 2))
    e2x, e2y, e2z = (tc(e2, 0), tc(e2, 1), tc(e2, 2))
    v0x, v0y, v0z = (tc(v0, 0), tc(v0, 1), tc(v0, 2))

    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    tmin_b = t_min[:, None, None, :]
    tmax_b = t_max[:, None, None, :]
    hit = (a != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
        (t >= tmin_b) & (t < tmax_b)
    return (t.reshape(G, K, T), u.reshape(G, K, T), v.reshape(G, K, T),
            hit.reshape(G, K, T))


@partial(jax.jit, static_argnames=("any_hit", "need_uv"))
def _trace_padded_pallas_inst(tracer: InstancedClusterTracer, o, d, t_min,
                              t_max, any_hit: bool = False,
                              need_uv: bool = True) -> Hit:
    """Pallas phase 2 with per-block ray transforms; phase 1 identical
    to the world-space path (world AABBs per cluster-instance)."""
    from .pallas_trace import (KB as PKB, TILE as PT,
                               pallas_trace_tiles_inst)
    R = o.shape[0]
    C = tracer.n_clusters
    n_blocks = R // TILE
    sub = TILE // PT
    n_tiles = R // PT
    ro = o.reshape(n_blocks, TILE, 3)
    rd = d.reshape(n_blocks, TILE, 3)
    rtmin = t_min.reshape(n_blocks, TILE)
    rtmax = t_max.reshape(n_blocks, TILE)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tracer.cmin, tracer.cmax)
    tn = jnp.maximum(tn, rtmin[:, None, :])
    active_rc = (tf >= tn) & (tn <= rtmax[:, None, :])
    inf = jnp.float32(jnp.inf)
    tile_tnear = jnp.min(
        jnp.where(active_rc, tn, inf).reshape(n_blocks, C, sub, PT),
        axis=3)
    tile_tnear = jnp.transpose(tile_tnear, (0, 2, 1)).reshape(n_tiles, C)
    counts = jnp.sum(tile_tnear < inf, axis=1).astype(jnp.int32)
    cpad = 1024 * (-(-(C + PKB) // 1024))
    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1
    tn_bits = jax.lax.bitcast_convert_type(tile_tnear, jnp.int32)
    cid = jnp.arange(C, dtype=jnp.int32)[None, :]
    key = (tn_bits & ~idmask) | cid
    key = jnp.where(jnp.isfinite(tile_tnear), key, jnp.int32(0x7FFFFFFF))
    key = jnp.pad(key, ((0, 0), (0, cpad - C)),
                  constant_values=0x7FFFFFFF)
    keys = jnp.sort(key, axis=1)

    if any_hit and tracer.opaque is not None:
        opad = 1024 * (-(-C // 1024))
        opaque = jnp.pad(tracer.opaque.astype(jnp.int32), (0, opad - C))
    else:
        opaque = jnp.ones(1024, jnp.int32)

    o3 = o.reshape(n_tiles, PT, 3)
    d3 = d.reshape(n_tiles, PT, 3)
    mm2 = jnp.stack([t_min, t_max], axis=-1).reshape(n_tiles, PT, 2)
    Kpad = 1024 * (-(-C // 1024))
    k_cluster = jnp.pad(tracer.k_cluster, (0, Kpad - C))
    k_inst = jnp.pad(tracer.k_inst, (0, Kpad - C))
    inv_flat = tracer.inv.reshape(-1, 12)
    Ipad = -(-inv_flat.shape[0] // 8) * 8
    inv_flat = jnp.pad(inv_flat, ((0, Ipad - inv_flat.shape[0]), (0, 0)))
    t, tid = pallas_trace_tiles_inst(
        counts, keys, o3, d3, mm2, tracer.tris9, opaque, k_cluster,
        k_inst, inv_flat.reshape(-1), C, cpad, idmask, any_hit=any_hit,
        interpret=_PALLAS_INTERPRET)
    miss = tid < 0
    t = jnp.where(miss, RAY_MAX_DIST, t)
    if not need_uv:
        z = jnp.zeros_like(t)
        return Hit(t, tid, z, z)
    # barycentric post-pass in OBJECT space (barycentrics are
    # affine-invariant): transform the ray per hit instance
    safe = jnp.maximum(tid, 0)
    kidx = safe // CLUSTER
    cu = tracer.k_cluster[kidx]
    iid = tracer.k_inst[kidx]
    row = tracer.tris_flat[cu * CLUSTER + safe % CLUSTER]
    inv = tracer.inv[iid]                              # (R, 3, 4)
    oo = jnp.einsum("rij,rj->ri", inv[:, :, :3], o) + inv[:, :, 3]
    dd = jnp.einsum("rij,rj->ri", inv[:, :, :3], d)
    v0 = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    h = jnp.cross(dd, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = oo - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(dd * q, axis=-1)
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    return Hit(t, tid, u, v)


def build_instanced_from_arrays(arrays, use_pallas: Optional[bool] = None):
    """Instanced build from SceneArrays: dedupes instances that share a
    mesh (identified by the mesh's array objects). Returns None when the
    scene has no sharing to exploit or has skinned instances (their
    object geometry deforms per frame; they keep world-baked clusters).
    """
    insts = arrays.instances
    if not insts or any(arrays._skinned):
        return None
    mesh_ids = {}
    mesh_of_inst = []
    for ig in insts:
        key = (id(ig.positions), id(ig.indices))
        if key not in mesh_ids:
            mesh_ids[key] = (len(mesh_ids), ig)
        mesh_of_inst.append(mesh_ids[key][0])
    if len(mesh_ids) == len(insts) and \
            _os.environ.get("TAURAY_FORCE_INSTANCING") != "1":
        return None
    tri_inst = np.asarray(arrays.tri_instance)
    obj = np.asarray(arrays.obj_pos)
    mesh_tris = [None] * len(mesh_ids)
    tri_starts = np.zeros(len(insts), np.int64)
    for i in range(len(insts)):
        idx = np.flatnonzero(tri_inst == i)
        tri_starts[i] = idx[0] if len(idx) else 0
        mi = mesh_of_inst[i]
        if mesh_tris[mi] is None:
            mesh_tris[mi] = obj[idx]
    return build_instanced_tracer(
        mesh_tris, mesh_of_inst, arrays.inst_model,
        ~np.asarray(arrays.inst_has_alpha), tri_starts,
        use_pallas=use_pallas)[0]
