"""Neural SDF with positional encoding + per-vertex deformation.

Parity with the reference's NerfWithPositionEncoding / DMTetGeometry
(/root/reference/src/dmtet/geometry/dmtet_geometry.py:289-409): sin/cos
positional encoding with frequencies 2^i, a 3-hidden-layer ReLU MLP
(hidden 512), a trainable per-vertex `deform` bounded through tanh, and
the voxel-constraint hinge `mesh_template_loss` (dmtet_geometry.py:
367-380).  Implemented in flax.linen.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PositionalEncoding(nn.Module):
    freq_num: int = 1
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(self.freq_num):
            f = 2.0**i
            feats.append(jnp.sin(f * jnp.pi * x / self.scale))
            feats.append(jnp.cos(f * jnp.pi * x / self.scale))
        return jnp.concatenate(feats, axis=-1)


class SDFNet(nn.Module):
    freq_num: int = 1
    scale: float = 1.0
    layer_num: int = 3
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x):
        x = PositionalEncoding(self.freq_num, self.scale)(x)
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        for _ in range(self.layer_num):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(1)(x)[..., 0]


class SDFGeometry:
    """SDF-MLP + deform geometry over a background grid."""

    def __init__(self, grid_verts: np.ndarray, grid_res: int, scale: float = 1.0,
                 freq_num: int = 1, hidden_dim: int = 512, layer_num: int = 3):
        # CPU-committed: host-side detached passes read these; accelerator
        # jits capture them as constants
        # numpy -> CPU directly (jnp.asarray would hop via the default
        # TPU device; see geometry/dmtet.py MarchingTets.__init__)
        self.verts = jax.device_put(
            np.asarray(grid_verts), jax.devices("cpu")[0]
        )
        self.grid_res = grid_res
        self.scale = scale
        self.net = SDFNet(freq_num, scale, layer_num, hidden_dim)
        self.deform_bound = scale * 1.8 / (grid_res * 2)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        mlp = self.net.init(k1, self.verts[:2])
        return {"mlp": mlp, "deform": jnp.zeros_like(self.verts)}

    def deformed_verts(self, params):
        return self.verts + self.deform_bound * jnp.tanh(params["deform"])

    def sdf(self, params):
        v = self.deformed_verts(params)
        return self.net.apply(params["mlp"], v / self.scale)

    def sdf_at(self, params, points):
        return self.net.apply(params["mlp"], points)

    def pretrain_regression(self, params, points, sdf_vals, **kw):
        """Direct SDF regression on the MLP (train_sdfnerf parity)."""
        params = dict(params)
        params["mlp"] = train_sdf_regression(
            self.net, params["mlp"], np.asarray(points) / self.scale,
            sdf_vals, **kw
        )
        return params

    def mesh_template_loss(self, params, query_points, signed_distance,
                           margin: float = 0.0):
        """Hinge on sign agreement with a coarse voxel constraint
        (dmtet_geometry.py:367-380): inside points (sd > margin) whose
        predicted sdf <= margin contribute -sdf; outside points
        (sd < -margin) whose predicted sdf >= margin contribute +sdf."""
        pred = self.sdf_at(params, query_points)
        inside = signed_distance > margin
        outside = signed_distance < -margin
        pen_in = jnp.where(inside & (pred <= margin), -pred, 0.0)
        pen_out = jnp.where(outside & (pred >= margin), pred, 0.0)
        return (jnp.sum(pen_in) + jnp.sum(pen_out)) / self.grid_res**3 * 1000.0


def train_sdf_regression(net, params, points, sdf_vals, iters: int = 1000,
                         lr: float = 1e-4, batch: int = 8192, seed: int = 0):
    """Direct SDF-regression pretraining of one MLP (parity:
    train_sdfnerf, /root/reference/src/dmtet/geometry/sdf.py:25-73 —
    MSE on sampled signed distances, Adam).  Returns updated params."""
    import optax

    pts = jnp.asarray(points)
    sd = jnp.asarray(sdf_vals)
    n = pts.shape[0]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (min(batch, n),), 0, n)
        p, s = pts[idx], sd[idx]

        def loss_fn(q):
            return jnp.mean((net.apply(q, p) - s) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, _ = step(params, opt_state, sub)
    return params


def voxelize_occupancy(signed_distance: np.ndarray, voxel_num: int):
    """Occupied-voxel integer coords from an inside-positive SDF sampled on
    a voxel_num^3 lattice in [-0.5, 0.5]^3."""
    occ = signed_distance.reshape(voxel_num, voxel_num, voxel_num) > 0
    return np.argwhere(occ)


def voxel_boundary_faces(coords: np.ndarray, resolution: int):
    """Boundary quad-faces (as triangles) of an occupied voxel set, keeping
    only faces adjacent to the *outside* connected region (interior
    cavities excluded) — a vectorized replacement for the reference's
    numba flood fill (geometry_train.py:68-113).

    Returns (verts (V, 3) float lattice coords, tris (F, 3) int)."""
    from scipy import ndimage

    res = resolution + 2
    occ = np.zeros((res, res, res), bool)
    occ[tuple((coords + 1).T)] = True
    free = ~occ
    outside = np.zeros_like(free)
    outside[0, 0, 0] = True
    outside = ndimage.binary_propagation(outside, mask=free)

    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]])
    # local quad corner offsets for the face in each direction
    face_corners = {
        (1, 0, 0): [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
        (-1, 0, 0): [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
        (0, 1, 0): [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],
        (0, -1, 0): [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
        (0, 0, 1): [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
        (0, 0, -1): [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
    }
    vid = {}
    verts = []
    tris = []
    cells = coords + 1
    for d in dirs:
        nb = cells + d
        exposed = outside[tuple(nb.T)]
        for c in cells[exposed]:
            quad = []
            for off in face_corners[tuple(d)]:
                v = tuple(c + np.asarray(off))
                if v not in vid:
                    vid[v] = len(verts)
                    verts.append(np.asarray(v) - 1)
                quad.append(vid[v])
            tris.append([quad[0], quad[1], quad[2]])
            tris.append([quad[0], quad[2], quad[3]])
    return np.asarray(verts, np.float64), np.asarray(tris, np.int64)
