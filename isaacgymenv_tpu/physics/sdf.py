"""Static signed-distance-field mesh collision.

The TPU-native equivalent of PhysX's SDF mesh colliders, which the
reference's Factory tasks enable for tight-tolerance assembly
(ref: tasks/factory/factory_base.py:483 `print_sdf_warning`,
assets/factory/yaml/*.yaml `sdf_resolution`).  Host side, a triangle mesh
is voxelized once into a signed-distance grid (`mesh_sdf_grid`); sim side,
contact spheres of other actors query the grid with trilinear
interpolation (`sdf_query`) — a pure gather+lerp op that maps cleanly onto
the TPU VPU, with the contact force law shared with the primitive-pair
path (contact.sdf_contact_forces).

Grids are body-attached: the SDF moves rigidly with its owner body, so
both fixed sockets and free nuts/plates are supported.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["load_obj", "mesh_sdf_grid", "sdf_query"]


# ---------------------------------------------------------------- host side


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal Wavefront OBJ loader: vertices + triangulated faces.

    Handles `f v`, `f v/vt`, `f v//vn`, `f v/vt/vn` forms and fans quads /
    n-gons into triangles.  Ignores materials/normals/uv.
    """
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if not verts or not faces:
        raise ValueError(f"{path}: no geometry")
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def _point_triangle_distance(p: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Unsigned distances points->per-point candidate triangles.
    p: (P, 3); tri: (P, K, 3, 3).  Returns (P, K).  Vectorized
    region-clamped closest point (Eberly)."""
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]  # (P, K, 3)
    ab = b - a
    ac = c - a
    pp = p[:, None, :]
    ap = pp - a

    d1 = np.einsum("pkx,pkx->pk", ab, ap)
    d2 = np.einsum("pkx,pkx->pk", ac, ap)
    bp = pp - b
    d3 = np.einsum("pkx,pkx->pk", ab, bp)
    d4 = np.einsum("pkx,pkx->pk", ac, bp)
    cp = pp - c
    d5 = np.einsum("pkx,pkx->pk", ab, cp)
    d6 = np.einsum("pkx,pkx->pk", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.maximum(va + vb + vc, 1e-30)
    v = np.clip(vb / denom, 0.0, 1.0)
    w = np.clip(vc / denom, 0.0, 1.0)

    # interior barycentric projection
    closest = a + v[..., None] * ab + w[..., None] * ac

    # vertex/edge regions override the (clipped) interior projection
    t_ab = np.clip(d1 / np.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    on_ab = a + t_ab[..., None] * ab
    t_ac = np.clip(d2 / np.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    on_ac = a + t_ac[..., None] * ac
    t_bc = np.clip((d4 - d3) / np.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)
    on_bc = b + t_bc[..., None] * (c - b)

    closest = np.where(((d1 <= 0) & (d2 <= 0))[..., None], a, closest)
    closest = np.where(((d3 >= 0) & (d4 <= d3))[..., None], b, closest)
    closest = np.where(((d6 >= 0) & (d5 <= d6))[..., None], c, closest)
    edge_ab = (d1 >= 0) & (d3 <= 0) & (vc <= 0)
    closest = np.where(edge_ab[..., None], on_ab, closest)
    edge_ac = (d2 >= 0) & (d6 <= 0) & (vb <= 0)
    closest = np.where(edge_ac[..., None], on_ac, closest)
    edge_bc = ((d4 - d3) >= 0) & ((d5 - d6) >= 0) & (va <= 0)
    closest = np.where(edge_bc[..., None], on_bc, closest)

    return np.linalg.norm(pp - closest, axis=-1)


def mesh_sdf_grid(
    verts: np.ndarray,
    faces: np.ndarray,
    res: int = 48,
    pad: float = 0.2,
    chunk: int = 2048,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Voxelize a (watertight) triangle mesh into a signed-distance grid.

    Unsigned distance = exact point-triangle distance; sign = parity of
    +z ray crossings (inside = odd = negative).  Returns
    (dist (D, H, W) float32 indexed [ix, iy, iz], origin (3,), spacing).
    """
    verts = np.asarray(verts, np.float64)
    tri = verts[np.asarray(faces, np.int64)]  # (F, 3, 3)
    lo = verts.min(0)
    hi = verts.max(0)
    extent = hi - lo
    spacing = float(extent.max() * (1.0 + 2.0 * pad) / (res - 1))
    origin = lo - pad * extent.max()
    dims = np.maximum(np.ceil((extent + 2.0 * pad * extent.max()) / spacing), 2).astype(int) + 1

    xs = origin[0] + spacing * np.arange(dims[0])
    ys = origin[1] + spacing * np.arange(dims[1])
    zs = origin[2] + spacing * np.arange(dims[2])
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    # nearest-triangle prefilter: exact distance only to the K triangles
    # with closest centroids (KDTree); exact near the surface where contact
    # forces live, conservative in the far field
    from scipy.spatial import cKDTree

    centroids = tri.mean(axis=1)
    k = min(len(tri), 32)
    tree = cKDTree(centroids)
    dist = np.empty(len(pts), np.float64)
    for s in range(0, len(pts), chunk):
        p = pts[s : s + chunk]
        _, idx = tree.query(p, k=k)
        dist[s : s + chunk] = _point_triangle_distance(p, tri[idx]).min(1)

    # sign: count +z ray crossings per (x, y) column.  Ray columns are
    # jittered by a sub-voxel offset so shared triangle edges in the xy
    # projection can't double-count a crossing (parity stays exact).
    jit_x = 0.377e-3 * spacing
    jit_y = 0.611e-3 * spacing
    crossings = np.zeros((dims[0], dims[1], dims[2]), np.int64)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    for t in range(len(tri)):
        ax, ay = a[t, 0], a[t, 1]
        bx, by = b[t, 0], b[t, 1]
        cx, cy = c[t, 0], c[t, 1]
        i0 = max(0, int(np.ceil((min(ax, bx, cx) - origin[0]) / spacing)))
        i1 = min(dims[0] - 1, int(np.floor((max(ax, bx, cx) - origin[0]) / spacing)))
        j0 = max(0, int(np.ceil((min(ay, by, cy) - origin[1]) / spacing)))
        j1 = min(dims[1] - 1, int(np.floor((max(ay, by, cy) - origin[1]) / spacing)))
        if i1 < i0 or j1 < j0:
            continue
        px = xs[i0 : i1 + 1][:, None] + jit_x
        py = ys[j0 : j1 + 1][None, :] + jit_y
        # barycentric point-in-triangle in the xy projection
        det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if abs(det) < 1e-18:
            continue
        l1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / det
        l2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
        if not inside.any():
            continue
        zstar = l1 * a[t, 2] + l2 * b[t, 2] + l3 * c[t, 2]
        ii, jj = np.nonzero(inside)
        crossings[i0 + ii, j0 + jj, :] += (
            zs[None, :] < zstar[ii, jj][:, None]
        ).astype(np.int64)

    inside_mask = (crossings % 2 == 1).reshape(-1)
    dist[inside_mask] *= -1.0
    return dist.reshape(dims).astype(np.float32), origin.astype(np.float64), spacing


# ----------------------------------------------------------------- sim side


def sdf_query(
    dist: jnp.ndarray,      # (D, H, W) grid
    origin: jnp.ndarray,    # (3,)
    spacing,                # scalar
    pts: jnp.ndarray,       # (..., 3) query points in grid/body frame
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear signed distance + finite-difference gradient at pts.

    Points outside the grid get the clamped boundary value plus the
    out-of-grid Euclidean offset (a conservative positive far field).
    Returns (d (...,), grad (..., 3) in the grid frame, unnormalized).
    """
    D, H, W = dist.shape
    dims = jnp.array([D - 1, H - 1, W - 1], jnp.float32)

    def sample(p):  # (..., 3) -> (...,)
        u = (p - origin) / spacing
        uc = jnp.clip(u, 0.0, dims)
        i0 = jnp.clip(jnp.floor(uc).astype(jnp.int32), 0, jnp.array([D - 2, H - 2, W - 2]))
        f = uc - i0
        x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

        def g(dx, dy, dz):
            return dist[x0 + dx, y0 + dy, z0 + dz]

        c00 = g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx
        c10 = g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx
        c01 = g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx
        c11 = g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx
        c0 = c00 * (1 - fy) + c10 * fy
        c1 = c01 * (1 - fy) + c11 * fy
        d = c0 * (1 - fz) + c1 * fz
        # out-of-grid far-field: add the clamp distance
        out = jnp.linalg.norm((u - uc), axis=-1) * spacing
        return d + out

    d = sample(pts)
    e = 0.5 * spacing
    ex = jnp.array([e, 0.0, 0.0])
    ey = jnp.array([0.0, e, 0.0])
    ez = jnp.array([0.0, 0.0, e])
    grad = jnp.stack(
        [
            sample(pts + ex) - sample(pts - ex),
            sample(pts + ey) - sample(pts - ey),
            sample(pts + ez) - sample(pts - ez),
        ],
        axis=-1,
    ) / (2.0 * e)
    return d, grad
