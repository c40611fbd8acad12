"""TPU-native acceleration structure.

Replaces the reference's driver-built BLAS/TLAS
(reference: src/acceleration_structure.hh:12-122) with a structure chosen
for data-parallel build/refit and lockstep traversal:

  * triangles are sorted by the Morton code of their centroid (the LBVH
    ordering; reference's GPU radix sort analogue is `jnp.argsort`),
  * leaves are fixed-size chunks of `leaf_size` consecutive triangles,
  * internal nodes form a complete binary tree in implicit heap layout
    (children of node i are 2i+1 / 2i+2), so the build IS the refit:
    one vectorized bottom-up AABB reduction per frame — the analogue of
    the reference's BLAS update-vs-rebuild distinction collapses into a
    single O(T) refit (update) plus an occasional re-sort (rebuild).

Traversal runs all rays in lockstep with per-ray stacks inside
`lax.while_loop`; every iteration either descends, tests one leaf
(`leaf_size` triangles, masked), or pops. All shapes static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import RAY_MAX_DIST, Hit, TriangleSoup


def morton_3d(x: np.ndarray) -> np.ndarray:
    """30-bit Morton code from (N, 3) integer grid coords in [0, 1024)
    (reference: shader/math.glsl morton_3d)."""
    x = x.astype(np.uint32) & 0x3FF
    x = (x ^ (x << 16)) & 0xFF0000FF
    x = (x ^ (x << 8)) & 0x0300F00F
    x = (x ^ (x << 4)) & 0x030C30C3
    x = (x ^ (x << 2)) & 0x09249249
    return x[:, 0] + 2 * x[:, 1] + 4 * x[:, 2]


class BVH(NamedTuple):
    """Implicit-heap BVH. `n_internal` = L-1 internal nodes, then L leaves."""
    node_min: jnp.ndarray     # (2L-1, 3)
    node_max: jnp.ndarray     # (2L-1, 3)
    perm: jnp.ndarray         # (L*K,) i32 -> original padded-triangle index
    leaf_size: int
    n_leaves: int

    @property
    def n_internal(self) -> int:
        return self.n_leaves - 1


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def build_bvh(tri_pos: np.ndarray, valid_mask: np.ndarray,
              leaf_size: int = 4) -> Tuple[BVH, np.ndarray]:
    """Host-side build: morton sort + leaf chunking + bottom-up AABBs.

    tri_pos: (T, 3, 3) world corners (padding triangles degenerate).
    valid_mask: (T,) bool — False entries never hit.
    Returns (bvh, perm) where perm reorders triangle arrays into leaf order
    (padded with T-index repeats; mask those via valid_mask gather).
    """
    T = tri_pos.shape[0]
    centroids = tri_pos.mean(axis=1)
    lo = centroids[valid_mask].min(axis=0) if valid_mask.any() else np.zeros(3)
    hi = centroids[valid_mask].max(axis=0) if valid_mask.any() else np.ones(3)
    ext = np.maximum(hi - lo, 1e-12)
    grid = np.clip(((centroids - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
    codes = morton_3d(grid).astype(np.uint64)
    # sort valid triangles by morton code; invalid go last
    order = np.lexsort((np.arange(T),
                        codes + (~valid_mask).astype(np.uint64) * (1 << 32)))
    n_valid = int(valid_mask.sum())
    L = max(_next_pow2((n_valid + leaf_size - 1) // leaf_size), 1)
    total = L * leaf_size
    perm = np.full(total, order[0] if T else 0, dtype=np.int32)
    n_copy = min(T, total)
    perm[:n_copy] = order[:n_copy]
    # entries past n_valid are fillers; valid_perm masks them out
    valid_perm = np.zeros(total, dtype=bool)
    valid_perm[:n_valid] = True
    bvh = BVH(node_min=None, node_max=None, perm=jnp.asarray(perm),
              leaf_size=leaf_size, n_leaves=L)
    return bvh, perm, valid_perm


@partial(jax.jit, static_argnames=("leaf_size", "n_leaves"))
def refit_bvh(tri_pos_perm, tri_valid_perm, leaf_size: int, n_leaves: int):
    """Vectorized bottom-up AABB computation. Runs on device every frame.

    tri_pos_perm: (L*K, 3, 3) triangle corners in leaf order;
    tri_valid_perm: (L*K,) bool.
    Returns (node_min, node_max) of shape (2L-1, 3)."""
    L, K = n_leaves, leaf_size
    corners = tri_pos_perm.reshape(L, K, 3, 3)
    valid = tri_valid_perm.reshape(L, K, 1, 1)
    big = jnp.float32(3e38)
    cmin = jnp.where(valid, corners, big).min(axis=(1, 2))   # (L, 3)
    cmax = jnp.where(valid, corners, -big).max(axis=(1, 2))
    mins = [cmin]
    maxs = [cmax]
    while mins[0].shape[0] > 1:
        m = mins[0].reshape(-1, 2, 3)
        M = maxs[0].reshape(-1, 2, 3)
        mins.insert(0, m.min(axis=1))
        maxs.insert(0, M.max(axis=1))
    node_min = jnp.concatenate(mins[:-1] + [cmin], axis=0) if L > 1 else cmin
    node_max = jnp.concatenate(maxs[:-1] + [cmax], axis=0) if L > 1 else cmax
    return node_min, node_max


def _level_concat_order(L):
    # refit produces levels root..leaves; implicit heap layout is exactly
    # that: level l occupies [2^l - 1, 2^(l+1) - 1). Concatenating levels
    # top-down yields heap order directly.
    return None


def make_bvh(tri_pos, valid_mask, leaf_size: int = 4):
    """build + first refit; returns (BVH with AABBs, perm, valid_perm)."""
    bvh, perm, valid_perm = build_bvh(np.asarray(tri_pos),
                                      np.asarray(valid_mask), leaf_size)
    pos_perm = jnp.asarray(np.asarray(tri_pos)[perm])
    node_min, node_max = refit_bvh(pos_perm, jnp.asarray(valid_perm),
                                   leaf_size, bvh.n_leaves)
    return bvh._replace(node_min=node_min, node_max=node_max), perm, valid_perm


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def _slab_test(o, inv_d, t_min, t_max, bmin, bmax):
    """Ray/AABB slab test. Returns (hit, t_near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tf >= jnp.maximum(tn, t_min)) & (tn <= t_max)
    return hit, tn


def _mt_leaf(o, d, t_min, t_max, v0, e1, e2):
    """Möller–Trumbore for (R, K) gathered triangles."""
    h = jnp.cross(d[:, None, :], e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = o[:, None, :] - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    hit = (a != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
        (t >= t_min[:, None]) & (t < t_max[:, None])
    return t, u, v, hit


STACK_DEPTH = 32


@partial(jax.jit, static_argnames=("leaf_size", "n_leaves", "any_hit"))
def _traverse(o, d, t_min, t_max, node_min, node_max, soup_v0, soup_e1,
              soup_e2, tri_valid, leaf_size: int, n_leaves: int,
              any_hit: bool = False):
    R = o.shape[0]
    L = n_leaves
    n_internal = L - 1
    inv_d = jnp.where(d == 0, jnp.float32(3e38),
                      1.0 / jnp.where(d == 0, 1.0, d))

    def cond(state):
        (_, _, _, _, _, _, _, done) = state
        return ~jnp.all(done)

    def body(state):
        node, sp, stack, best_t, best_id, best_u, best_v, done = state
        is_leaf = node >= n_internal

        # --- leaf: intersect K triangles -------------------------------
        leaf_id = jnp.maximum(node - n_internal, 0)
        base = leaf_id * leaf_size
        tri_idx = base[:, None] + jnp.arange(leaf_size)[None, :]  # (R, K)
        lv0 = soup_v0[tri_idx]
        le1 = soup_e1[tri_idx]
        le2 = soup_e2[tri_idx]
        t, u, v, hit = _mt_leaf(o, d, t_min, jnp.minimum(t_max, best_t),
                                lv0, le1, le2)
        hit = hit & tri_valid[tri_idx] & is_leaf[:, None] & ~done[:, None]
        t = jnp.where(hit, t, RAY_MAX_DIST)
        arg = jnp.argmin(t, axis=1)
        rows = jnp.arange(R)
        cand_t = t[rows, arg]
        closer = cand_t < best_t
        best_t = jnp.where(closer, cand_t, best_t)
        best_id = jnp.where(closer, tri_idx[rows, arg], best_id)
        best_u = jnp.where(closer, u[rows, arg], best_u)
        best_v = jnp.where(closer, v[rows, arg], best_v)

        # --- internal: test children ----------------------------------
        left = 2 * node + 1
        right = 2 * node + 2
        lc = jnp.where(is_leaf, 0, left)
        rc = jnp.where(is_leaf, 0, right)
        hit_l, tn_l = _slab_test(o, inv_d, t_min, jnp.minimum(t_max, best_t),
                                 node_min[lc], node_max[lc])
        hit_r, tn_r = _slab_test(o, inv_d, t_min, jnp.minimum(t_max, best_t),
                                 node_min[rc], node_max[rc])
        hit_l = hit_l & ~is_leaf
        hit_r = hit_r & ~is_leaf
        both = hit_l & hit_r
        near_is_left = tn_l <= tn_r
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        one = hit_l ^ hit_r
        onechild = jnp.where(hit_l, left, right)

        # push far child when both children hit
        do_push = both & ~done
        stack = jnp.where(
            do_push[:, None] &
            (jnp.arange(STACK_DEPTH)[None, :] == sp[:, None]),
            far[:, None], stack)
        sp_new = jnp.where(do_push, sp + 1, sp)

        descend = (both | one) & ~is_leaf
        next_node = jnp.where(both, near, onechild)

        # pop when: leaf processed, or internal with no child hit
        need_pop = (~descend | is_leaf) & ~done
        can_pop = sp_new > 0
        popped = stack[rows, jnp.maximum(sp_new - 1, 0)]
        node = jnp.where(~need_pop, jnp.where(is_leaf, node, next_node),
                         jnp.where(can_pop, popped, node))
        sp_final = jnp.where(need_pop & can_pop, sp_new - 1, sp_new)
        done = done | (need_pop & ~can_pop)
        node = jnp.where(done, 0, node)  # freeze finished rays at the root

        # early-exit for shadow rays
        if any_hit:
            done = done | (best_id >= 0)
        return (node, sp_final, stack, best_t, best_id, best_u, best_v, done)

    root_hit, _ = _slab_test(o, inv_d, t_min, t_max, node_min[0], node_max[0])
    state = (
        jnp.zeros(R, jnp.int32),
        jnp.zeros(R, jnp.int32),
        jnp.zeros((R, STACK_DEPTH), jnp.int32),
        jnp.full(R, RAY_MAX_DIST, jnp.float32),
        jnp.full(R, -1, jnp.int32),
        jnp.zeros(R, jnp.float32),
        jnp.zeros(R, jnp.float32),
        ~root_hit if L > 1 else jnp.zeros(R, bool),
    )
    node, sp, stack, best_t, best_id, best_u, best_v, done = \
        jax.lax.while_loop(cond, body, state)
    return Hit(best_t, best_id, best_u, best_v)


@jax.tree_util.register_pytree_node_class
class DeviceBVH:
    """BVH + leaf-ordered triangle soup, ready for traversal.

    Registered as a pytree with `leaf_size`/`n_leaves` as static aux data
    so it can be passed through jit boundaries."""

    def __init__(self, node_min, node_max, v0, e1, e2, tri_valid, to_orig,
                 leaf_size: int, n_leaves: int):
        self.node_min = node_min
        self.node_max = node_max
        self.v0 = v0              # (L*K, 3) leaf-ordered
        self.e1 = e1
        self.e2 = e2
        self.tri_valid = tri_valid  # (L*K,) bool
        self.to_orig = to_orig    # (L*K,) i32 -> original tri index
        self.leaf_size = leaf_size
        self.n_leaves = n_leaves

    def tree_flatten(self):
        return ((self.node_min, self.node_max, self.v0, self.e1, self.e2,
                 self.tri_valid, self.to_orig),
                (self.leaf_size, self.n_leaves))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def _replace(self, **kw):
        fields = dict(node_min=self.node_min, node_max=self.node_max,
                      v0=self.v0, e1=self.e1, e2=self.e2,
                      tri_valid=self.tri_valid, to_orig=self.to_orig,
                      leaf_size=self.leaf_size, n_leaves=self.n_leaves)
        fields.update(kw)
        return DeviceBVH(**fields)

    def trace(self, origins, dirs, t_min, t_max, any_hit: bool = False) -> Hit:
        o = jnp.asarray(origins, jnp.float32)
        d = jnp.asarray(dirs, jnp.float32)
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o.shape[:1])
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
        hit = _traverse(o, d, t_min, t_max, self.node_min, self.node_max,
                        self.v0, self.e1, self.e2, self.tri_valid,
                        self.leaf_size, self.n_leaves, any_hit)
        tri_id = jnp.where(hit.tri_id >= 0, self.to_orig[jnp.maximum(hit.tri_id, 0)], -1)
        return Hit(hit.t, tri_id, hit.u, hit.v)


def build_device_bvh(tri_pos, tri_instance, leaf_size: int = 4) -> DeviceBVH:
    """tri_pos: (T, 3, 3); tri_instance: (T,) with -1 for padding."""
    tri_pos = np.asarray(tri_pos)
    valid = np.asarray(tri_instance) >= 0
    bvh, perm, valid_perm = make_bvh(tri_pos, valid, leaf_size)
    pos_perm = tri_pos[perm]
    return DeviceBVH(
        node_min=bvh.node_min,
        node_max=bvh.node_max,
        v0=jnp.asarray(pos_perm[:, 0]),
        e1=jnp.asarray(pos_perm[:, 1] - pos_perm[:, 0]),
        e2=jnp.asarray(pos_perm[:, 2] - pos_perm[:, 0]),
        tri_valid=jnp.asarray(valid_perm),
        to_orig=jnp.asarray(perm, dtype=jnp.int32),
        leaf_size=leaf_size,
        n_leaves=bvh.n_leaves)


def refit_device_bvh(dbvh: DeviceBVH, tri_pos, perm) -> DeviceBVH:
    """Per-frame refit after animation/skinning moved vertices."""
    pos_perm = jnp.asarray(tri_pos)[perm]
    node_min, node_max = refit_bvh(pos_perm, dbvh.tri_valid,
                                   dbvh.leaf_size, dbvh.n_leaves)
    return dbvh._replace(
        node_min=node_min, node_max=node_max,
        v0=pos_perm[:, 0],
        e1=pos_perm[:, 1] - pos_perm[:, 0],
        e2=pos_perm[:, 2] - pos_perm[:, 0])
