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
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import morton_3d
from .intersect import RAY_MAX_DIST, Hit

CLUSTER = 128       # triangles per cluster
TILE = 128          # rays per tile
TILE_CHUNK = 64     # tiles processed together (bounds temp memory)


@jax.tree_util.register_pytree_node_class
class ClusterTracer:
    def __init__(self, v0, e1, e2, tri_valid, to_orig, cmin, cmax,
                 n_clusters: int):
        # (C, CLUSTER, 3) triangle blocks in cluster-major layout
        self.v0 = v0
        self.e1 = e1
        self.e2 = e2
        self.tri_valid = tri_valid   # (C, CLUSTER) bool
        self.to_orig = to_orig       # (C*CLUSTER,) i32
        self.cmin = cmin             # (C, 3)
        self.cmax = cmax             # (C, 3)
        self.n_clusters = n_clusters

    def tree_flatten(self):
        return ((self.v0, self.e1, self.e2, self.tri_valid, self.to_orig,
                 self.cmin, self.cmax), (self.n_clusters,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # ------------------------------------------------------------------
    def trace(self, origins, dirs, t_min, t_max, any_hit: bool = False) -> Hit:
        o = jnp.asarray(origins, jnp.float32)
        d = jnp.asarray(dirs, jnp.float32)
        R = o.shape[0]
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
        pad = (-R) % (TILE * TILE_CHUNK)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            t_min = jnp.concatenate([t_min, jnp.ones(pad, jnp.float32)])
            t_max = jnp.concatenate([t_max, jnp.zeros(pad, jnp.float32)])
        hit = _trace_padded(self, o, d, t_min, t_max)
        t, tid, u, v = (x[:R] for x in hit)
        tid = jnp.where(tid >= 0, self.to_orig[jnp.maximum(tid, 0)], -1)
        return Hit(t, tid, u, v)


def build_cluster_tracer(tri_pos, tri_instance) -> Tuple[ClusterTracer,
                                                         np.ndarray]:
    """Host-side build: morton sort + clustering. Returns (tracer, perm)."""
    tri_pos = np.asarray(tri_pos)
    valid = np.asarray(tri_instance) >= 0
    T = tri_pos.shape[0]
    centroids = tri_pos.mean(axis=1)
    sel = valid if valid.any() else np.ones(T, bool)
    lo = centroids[sel].min(axis=0)
    hi = centroids[sel].max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    grid = np.clip(((centroids - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
    codes = morton_3d(grid).astype(np.uint64)
    order = np.lexsort((np.arange(T),
                        codes + (~valid).astype(np.uint64) * (1 << 32)))
    n_valid = int(valid.sum())
    C = max((n_valid + CLUSTER - 1) // CLUSTER, 1)
    total = C * CLUSTER
    perm = np.full(total, order[0] if T else 0, dtype=np.int32)
    n_copy = min(T, total)
    perm[:n_copy] = order[:n_copy]
    valid_perm = np.zeros(total, dtype=bool)
    valid_perm[:n_valid] = True

    pos = tri_pos[perm]                                 # (C*K, 3, 3)
    tracer = ClusterTracer(
        v0=jnp.asarray(pos[:, 0].reshape(C, CLUSTER, 3)),
        e1=jnp.asarray((pos[:, 1] - pos[:, 0]).reshape(C, CLUSTER, 3)),
        e2=jnp.asarray((pos[:, 2] - pos[:, 0]).reshape(C, CLUSTER, 3)),
        tri_valid=jnp.asarray(valid_perm.reshape(C, CLUSTER)),
        to_orig=jnp.asarray(perm),
        cmin=None, cmax=None, n_clusters=C)
    tracer = refit_cluster_tracer(tracer, tri_pos, perm)
    return tracer, perm


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
    return ClusterTracer(v0, e1, e2, tracer.tri_valid, tracer.to_orig,
                         cmin, cmax, C)


def _slab_hit(o, inv_d, t_min, t_max, bmin, bmax):
    """o/inv_d: (..., 1, 3); bmin/bmax: (C, 3) → (..., C) bool."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    return (tf >= jnp.maximum(tn, t_min)) & (tn <= t_max)


def _mt_block(o, d, t_min, t_max, v0, e1, e2):
    """(G, TILE, 3) rays × (G, K, 3) tris → (G, TILE, K) t/u/v/hit."""
    h = jnp.cross(d[:, :, None, :], e2[:, None, :, :])
    a = jnp.sum(e1[:, None, :, :] * h, axis=-1)
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = o[:, :, None, :] - v0[:, None, :, :]
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1[:, None, :, :])
    v = f * jnp.sum(d[:, :, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[:, None, :, :] * q, axis=-1)
    hit = (a != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
        (t >= t_min[:, :, None]) & (t < t_max[:, :, None])
    return t, u, v, hit


@jax.jit
def _trace_padded(tracer: ClusterTracer, o, d, t_min, t_max) -> Hit:
    R = o.shape[0]
    C = tracer.n_clusters
    n_chunks = R // (TILE * TILE_CHUNK)

    def chunk_fn(args, G=TILE_CHUNK):
        co, cd, ctmin, ctmax = args
        ro = co.reshape(G, TILE, 3)
        rd = cd.reshape(G, TILE, 3)
        rtmin = ctmin.reshape(G, TILE)
        rtmax = ctmax.reshape(G, TILE)
        inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                          1.0 / jnp.where(rd == 0, 1.0, rd))
        # phase 1: (G, TILE, C) slab tests -> (G, C) tile activity
        hit_c = _slab_hit(ro[:, :, None, :], inv_d[:, :, None, :],
                          rtmin[:, :, None], rtmax[:, :, None],
                          tracer.cmin, tracer.cmax)      # (G, TILE, C)
        active = jnp.any(hit_c, axis=1)                   # (G, C)
        counts = active.sum(axis=1)                       # (G,)
        # hit clusters first, ascending cluster index
        order = jnp.argsort(~active, axis=1, stable=True) # (G, C)
        max_count = counts.max()

        best_t = jnp.minimum(rtmax, RAY_MAX_DIST)
        best = (best_t,
                jnp.full((G, TILE), -1, jnp.int32),
                jnp.zeros((G, TILE), jnp.float32),
                jnp.zeros((G, TILE), jnp.float32))

        def body(k, best):
            best_t, best_id, best_u, best_v = best
            cid = order[:, k]                             # (G,)
            valid_tile = k < counts                       # (G,)
            v0 = tracer.v0[cid]                           # (G, K, 3)
            e1 = tracer.e1[cid]
            e2 = tracer.e2[cid]
            tvalid = tracer.tri_valid[cid]                # (G, K)
            t, u, v, hit = _mt_block(ro, rd, rtmin, best_t, v0, e1, e2)
            hit = hit & tvalid[:, None, :] & valid_tile[:, None, None]
            t = jnp.where(hit, t, RAY_MAX_DIST)
            arg = jnp.argmin(t, axis=2)                   # (G, TILE)
            g_idx = jnp.arange(G)[:, None]
            r_idx = jnp.arange(TILE)[None, :]
            cand_t = t[g_idx, r_idx, arg]
            closer = cand_t < best_t
            tri_global = cid[:, None] * CLUSTER + arg
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, tri_global, best_id)
            best_u = jnp.where(closer, u[g_idx, r_idx, arg], best_u)
            best_v = jnp.where(closer, v[g_idx, r_idx, arg], best_v)
            return (best_t, best_id, best_u, best_v)

        best = jax.lax.fori_loop(0, max_count, body, best)
        best_t, best_id, best_u, best_v = best
        miss = best_id < 0
        best_t = jnp.where(miss, RAY_MAX_DIST, best_t)
        return (best_t.reshape(-1), best_id.reshape(-1),
                best_u.reshape(-1), best_v.reshape(-1))

    # One flat wave when the intermediates fit comfortably (shallower
    # program: faster compile, no serial chunk loop); otherwise bound
    # temp memory with lax.map over chunks.
    if R <= 64 * 1024:
        t, tid, u, v = chunk_fn((o, d, t_min, t_max), G=R // TILE)
        return Hit(t, tid, u, v)
    rsh = TILE * TILE_CHUNK
    t, tid, u, v = jax.lax.map(
        chunk_fn, (o.reshape(n_chunks, rsh, 3), d.reshape(n_chunks, rsh, 3),
                   t_min.reshape(n_chunks, rsh), t_max.reshape(n_chunks, rsh)))
    return Hit(t.reshape(-1), tid.reshape(-1), u.reshape(-1), v.reshape(-1))
