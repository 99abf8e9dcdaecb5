"""Graphics math and image utilities (JAX / numpy).

Functional counterpart of the reference's grab-bag util module
(/root/reference/src/dmtet/render/util.py:20-465): vector helpers, sRGB
transfer, tonemapping, camera matrices, image scaling, cubemap/latlong
direction maps, and PNG/HDR-ish IO via imageio on the host.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Vector helpers
# ---------------------------------------------------------------------------


def dot(x, y, keepdim: bool = True):
    s = jnp.sum(x * y, axis=-1)
    return s[..., None] if keepdim else s


def reflect(x, n):
    return 2.0 * dot(x, n) * n - x


def length(x, eps: float = 1e-20):
    return jnp.sqrt(jnp.clip(dot(x, x), eps, None))


def safe_normalize(x, eps: float = 1e-20):
    return x / length(x, eps)


def lerp(a, b, t):
    return a + t * (b - a)


def cross(a, b):
    return jnp.cross(a, b)


# ---------------------------------------------------------------------------
# sRGB / tonemap
# ---------------------------------------------------------------------------


def srgb_to_rgb(f):
    return jnp.where(f <= 0.04045, f / 12.92, ((jnp.clip(f, 0.04045) + 0.055) / 1.055) ** 2.4)


def rgb_to_srgb(f):
    return jnp.where(
        f <= 0.0031308, f * 12.92, 1.055 * (jnp.clip(f, 0.0031308) ** (1.0 / 2.4)) - 0.055
    )


def tonemap_srgb(f):
    """Clamp + sRGB transfer on the color channels, used before the image
    loss (reference util.py `rgb_to_srgb` composition in loss.py:16-24)."""
    return rgb_to_srgb(jnp.clip(f, 0.0, 1.0))


# ---------------------------------------------------------------------------
# Camera matrices (numpy, host-side; OpenGL conventions like the reference)
# ---------------------------------------------------------------------------


def perspective(fovy: float = 0.7854, aspect: float = 1.0, n: float = 0.1, f: float = 1000.0):
    y = np.tan(fovy / 2)
    return np.array(
        [
            [1 / (y * aspect), 0, 0, 0],
            [0, 1 / -y, 0, 0],
            [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
            [0, 0, -1, 0],
        ],
        dtype=np.float32,
    )


def translate(x: float, y: float, z: float):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (x, y, z)
    return m


def rotate_x(a: float):
    s, c = np.sin(a), np.cos(a)
    return np.array(
        [[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def rotate_y(a: float):
    s, c = np.sin(a), np.cos(a)
    return np.array(
        [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def lookat(eye, at, up):
    eye, at, up = (np.asarray(v, np.float32) for v in (eye, at, up))
    f = at - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3], m[1, :3], m[2, :3] = r, u, -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def random_camera(rng: np.random.Generator, radius: float = 3.0, fovy: float = 0.7854):
    """Random orbit camera -> (mvp (4,4), campos (3,)) as in nvdiffrec's
    dataset samplers: uniform direction on the sphere, lookat origin."""
    v = rng.normal(size=3)
    v /= np.linalg.norm(v)
    eye = v * radius
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(v, up)) > 0.98:
        up = np.array([1.0, 0.0, 0.0])
    mv = lookat(eye, np.zeros(3), up)
    mvp = perspective(fovy) @ mv
    return mvp.astype(np.float32), eye.astype(np.float32)


def xfm_points(points, mtx):
    """points (..., 3), mtx (4, 4) -> homogeneous clip coords (..., 4)
    (replaces renderutils xfm_points, ops.py:462-477)."""
    p = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return p @ mtx.T


def xfm_vectors(vectors, mtx):
    """Rotate direction vectors by the upper 3x3 of mtx."""
    return vectors @ mtx[:3, :3].T


# ---------------------------------------------------------------------------
# Image scaling
# ---------------------------------------------------------------------------


def avg_pool_nhwc(x, size: int):
    """(N, H, W, C) average pool by integer factor."""
    if size == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // size, size, w // size, size, c)
    return jnp.mean(x, axis=(2, 4))


def scale_img_nhwc(x, size, method: str = "nearest"):
    """(N, H, W, C) resize to size=(H', W')."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method=method)


# ---------------------------------------------------------------------------
# Cubemap directions
# ---------------------------------------------------------------------------


def cube_to_dir(face: int, x, y):
    """Texel coords in [-1, 1] on face -> unnormalized direction, matching
    the standard (+x, -x, +y, -y, +z, -z) cubemap layout the reference's
    cubemap kernels implement (c_src/cubemap.cu)."""
    if face == 0:
        return jnp.stack([jnp.ones_like(x), -y, -x], -1)
    if face == 1:
        return jnp.stack([-jnp.ones_like(x), -y, x], -1)
    if face == 2:
        return jnp.stack([x, jnp.ones_like(x), y], -1)
    if face == 3:
        return jnp.stack([x, -jnp.ones_like(x), -y], -1)
    if face == 4:
        return jnp.stack([x, -y, jnp.ones_like(x)], -1)
    return jnp.stack([-x, -y, -jnp.ones_like(x)], -1)


def _cube_to_dir_np(face: int, x, y):
    """Pure-numpy cube_to_dir (stays concrete even when first invoked
    inside a jit trace — the operator builders are lru-cached and may be
    populated lazily from within a traced light.shade)."""
    o = np.ones_like(x)
    if face == 0:
        return np.stack([o, -y, -x], -1)
    if face == 1:
        return np.stack([-o, -y, x], -1)
    if face == 2:
        return np.stack([x, o, y], -1)
    if face == 3:
        return np.stack([x, -o, -y], -1)
    if face == 4:
        return np.stack([x, -y, o], -1)
    return np.stack([-x, -y, -o], -1)


def cubemap_directions(res: int):
    """-> dirs (6, res, res, 3) unit, solid angles (6, res, res)."""
    g = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    gy, gx = np.meshgrid(g, g, indexing="ij")
    dirs, weights = [], []
    # solid angle of a texel: d(omega) = 4 / (x^2+y^2+1)^(3/2) * (2/res)^2
    w = 4.0 / (gx**2 + gy**2 + 1.0) ** 1.5 * (2.0 / res) ** 2
    for f in range(6):
        d = _cube_to_dir_np(f, gx, gy)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        dirs.append(d)
        weights.append(w)
    return np.stack(dirs).astype(np.float32), np.stack(weights).astype(np.float32)


def sample_cubemap(cubemap, dirs):
    """Bilinear-free nearest+face-local bilinear cubemap fetch.

    cubemap (6, R, R, C), dirs (..., 3) -> (..., C).  Face selection is by
    dominant axis; within the face we sample bilinearly with edge clamp.
    Seam texels therefore clamp instead of wrapping onto the neighbor face
    (small, documented divergence from dr.texture's cube boundary mode —
    exact at every non-seam texel)."""
    R = cubemap.shape[1]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face ids matching cube_to_dir
    face = jnp.where(
        (ax >= ay) & (ax >= az),
        jnp.where(x > 0, 0, 1),
        jnp.where(ay >= az, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )
    ma = jnp.maximum(jnp.maximum(ax, ay), az)
    ma = jnp.maximum(ma, 1e-20)

    # face-local (u, v) in [-1, 1]; inverse of cube_to_dir per face
    xs, ys, zs = x / ma, y / ma, z / ma
    u = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-zs, zs, xs, xs, xs, -xs],
    )
    v = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-ys, -ys, zs, -zs, -ys, -ys],
    )

    fu = (u * 0.5 + 0.5) * R - 0.5
    fv = (v * 0.5 + 0.5) * R - 0.5
    i0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, R - 1)
    j0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, R - 1)
    i1 = jnp.clip(i0 + 1, 0, R - 1)
    j1 = jnp.clip(j0 + 1, 0, R - 1)
    wu = jnp.clip(fu - i0, 0.0, 1.0)[..., None]
    wv = jnp.clip(fv - j0, 0.0, 1.0)[..., None]

    def fetch(jj, ii):
        return cubemap[face, jj, ii]

    c00, c01 = fetch(j0, i0), fetch(j0, i1)
    c10, c11 = fetch(j1, i0), fetch(j1, i1)
    return (
        (1 - wv) * ((1 - wu) * c00 + wu * c01) + wv * ((1 - wu) * c10 + wu * c11)
    )


def latlong_to_cubemap(latlong, res: int):
    """(H, W, C) equirectangular -> (6, res, res, C)."""
    dirs, _ = cubemap_directions(res)
    d = jnp.asarray(dirs.reshape(-1, 3))
    H, W, C = latlong.shape
    theta = jnp.arccos(jnp.clip(d[:, 1], -1, 1))  # [0, pi]
    phi = jnp.arctan2(d[:, 0], -d[:, 2])  # [-pi, pi]
    fu = (phi / (2 * math.pi) + 0.5) * W - 0.5
    fv = theta / math.pi * H - 0.5
    i0 = jnp.mod(jnp.floor(fu).astype(jnp.int32), W)
    i1 = jnp.mod(i0 + 1, W)
    j0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, H - 1)
    j1 = jnp.clip(j0 + 1, 0, H - 1)
    wu = (fu - jnp.floor(fu))[:, None]
    wv = jnp.clip(fv - j0, 0.0, 1.0)[:, None]
    ll = jnp.asarray(latlong)
    out = (1 - wv) * ((1 - wu) * ll[j0, i0] + wu * ll[j0, i1]) + wv * (
        (1 - wu) * ll[j1, i0] + wu * ll[j1, i1]
    )
    return out.reshape(6, res, res, C)


def cubemap_to_latlong(cubemap, size):
    """(6, R, R, C) -> (H, W, C) equirectangular."""
    H, W = size
    v = (np.arange(H) + 0.5) / H
    u = (np.arange(W) + 0.5) / W
    theta = v * math.pi
    phi = (u - 0.5) * 2 * math.pi
    st, ct = np.sin(theta), np.cos(theta)
    d = np.stack(
        np.broadcast_arrays(
            np.sin(phi)[None, :] * st[:, None],
            np.broadcast_to(ct[:, None], (H, W)),
            -np.cos(phi)[None, :] * st[:, None],
        ),
        axis=-1,
    )
    return sample_cubemap(jnp.asarray(cubemap), jnp.asarray(d, jnp.float32))


# ---------------------------------------------------------------------------
# Host image IO
# ---------------------------------------------------------------------------


def save_image(path: str, img: np.ndarray):
    """HWC float [0,1] -> 8-bit PNG (or raw float for .npy)."""
    import imageio.v2 as imageio

    if path.endswith(".npy"):
        np.save(path, np.asarray(img, np.float32))
        return
    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    imageio.imwrite(path, arr)


def load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    arr = np.asarray(imageio.imread(path))
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    return arr.astype(np.float32)
