"""Joint image + audio inverse rendering: one SDF shaped by both a
differentiable PBR image loss and the modal-eigenvalue audio loss.

TPU-native counterpart of the reference's largest subsystem, the
image+audio DMTetGeometry (/root/reference/src/dmtet/geometry/dmtet.py:
314-514) on top of the nvdiffrec render stack:

  * front/back split SDF MLPs by a z threshold (dmtet.py:341-399) — the
    back (unseen) side is constrained mostly by sound, the front by
    images;
  * marching tets emits BOTH the render surface (UV-atlased triangles,
    map_uv at dmtet.py:102-131) and the FEM tet mesh from the same
    differentiable vertex array, so image and eigenvalue gradients meet
    in the same SDF/deform parameters;
  * tick = image MSE (alpha + masked color) + SDF edge regularizer +
    albedo-smoothness + visibility + light white-balance regularizers +
    relative eigenvalue MSE (dmtet.py:472-514);
  * rendering uses the JAX rasterizer/light/MLP-texture; the eigensolve
    stays detached (host ARPACK / warm LOBPCG) with the Rayleigh
    correction supplying exact first-order eigenvalue gradients.

Static-shape discipline: per iteration the host compacts the marched
mesh into bucket-padded tet + triangle buffers; jitted loss programs are
cached per bucket signature.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..fem import assembly
from ..fem.material import Material, MatSet, lame_params
from ..render.light import EnvironmentLight
from ..render.mlptexture import MLPTexture3D
from ..render.rasterize import interpolate, interpolate_face, rasterize
from ..render.render import shade
from ..render.util import safe_normalize, xfm_points
from ..solvers.arpack import eigsh_shift_invert
from ..solvers.diff_eigs import rayleigh_corrected_eigenvalues
from .dmtet import MarchingTets, map_uv, sdf_reg_loss
from .grid import load_background_grid
from .sdf_mlp import SDFNet


class SplitSDFGeometry:
    """Front/back split neural SDF + bounded deform (dmtet.py:341-437).

    Params: {"front": mlp, "back": mlp, "deform": (V, 3)}."""

    def __init__(self, grid_verts: np.ndarray, grid_res: int, scale: float = 1.0,
                 freq_num: int = 4, hidden_dim: int = 256, layer_num: int = 3,
                 z_threshold: float = -0.2):
        # numpy -> CPU directly (jnp.asarray would hop via the TPU)
        self.verts = jax.device_put(np.asarray(grid_verts), jax.devices("cpu")[0])
        self.grid_res = grid_res
        self.scale = scale
        self.z_threshold = z_threshold
        self.net = SDFNet(freq_num, scale, layer_num, hidden_dim)
        self.deform_bound = scale * 1.8 / (grid_res * 2)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "front": self.net.init(k1, self.verts[:2]),
            "back": self.net.init(k2, self.verts[:2]),
            "deform": jnp.zeros_like(self.verts),
        }

    def deformed_verts(self, params):
        return self.verts + self.deform_bound * jnp.tanh(params["deform"])

    def sdf_at(self, params, points):
        """Branchless split: both nets evaluate, z selects
        (dmtet.py:426-437 without boolean indexing)."""
        sf = self.net.apply(params["front"], points / self.scale)
        sb = self.net.apply(params["back"], points / self.scale)
        return jnp.where(points[..., 2] >= self.z_threshold, sf, sb)

    def sdf(self, params):
        return self.sdf_at(params, self.deformed_verts(params))

    def pretrain_regression(self, params, points, sdf_vals, **kw):
        """Direct SDF regression of BOTH split nets to the same samples
        (train_sdfnerf parity, /root/reference/src/dmtet/geometry/sdf.py:
        25-73; the reference pretrains front/back identically before the
        z-split specializes them)."""
        from .sdf_mlp import train_sdf_regression

        params = dict(params)
        for side in ("front", "back"):
            params[side] = train_sdf_regression(
                self.net, params[side], np.asarray(points) / self.scale,
                sdf_vals, **kw
            )
        return params

    def mesh_template_loss(self, params, query_points, signed_distance,
                           margin: float = 0.0):
        pred = self.sdf_at(params, query_points)
        inside = signed_distance > margin
        outside = signed_distance < -margin
        pen_in = jnp.where(inside & (pred <= margin), -pred, 0.0)
        pen_out = jnp.where(outside & (pred >= margin), pred, 0.0)
        return (jnp.sum(pen_in) + jnp.sum(pen_out)) / self.grid_res**3 * 1000.0


def masked_auto_normals(v_pos, tris, tri_mask):
    """Smooth vertex normals over a capacity-padded triangle set."""
    V = v_pos.shape[0]
    v0, v1, v2 = (v_pos[tris[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0) * tri_mask[:, None]
    idx = tris.reshape(-1)
    v_nrm = jax.ops.segment_sum(jnp.repeat(fn, 3, axis=0), idx, num_segments=V)
    v_nrm = jnp.where(
        jnp.sum(v_nrm * v_nrm, -1, keepdims=True) > 1e-20,
        v_nrm,
        jnp.asarray([0.0, 0.0, 1.0], v_nrm.dtype),
    )
    return safe_normalize(v_nrm), safe_normalize(fn + 1e-20)


class JointImageAudioTask:
    def __init__(
        self,
        grid_res: int = 32,
        scale: float = 1.0,
        mode_num: int = 16,
        mat=MatSet.Ceramic,
        freq_num: int = 4,
        hidden_dim: int = 256,
        z_threshold: float = -0.2,
        sigma: float = 20000.0,
        extra_modes: int = 6,
        light_res: int = 32,
        tets_dir: Optional[str] = None,
        dtype=jnp.float32,
        img_loss: str = "mse",
        tonemapper: str = None,
    ):
        kw = {} if tets_dir is None else {"tets_dir": tets_dir}
        verts, tets = load_background_grid(grid_res, **kw)
        self.grid_verts = verts.astype(np.float64) * scale
        self.marching = MarchingTets(self.grid_verts, tets)
        self.geo = SplitSDFGeometry(
            self.grid_verts, grid_res, scale, freq_num, hidden_dim,
            z_threshold=z_threshold,
        )
        self.mat = Material.of(mat)
        self.mode_num = mode_num
        self.sigma = sigma
        self.extra_modes = extra_modes
        self.dtype = dtype
        aabb = (self.grid_verts.min(0) - 0.1, self.grid_verts.max(0) + 0.1)
        self.texture = MLPTexture3D(aabb)
        self.light = EnvironmentLight(base_res=light_res)
        self.material = {"kd_ks_normal": self.texture, "bsdf": "pbr"}
        # pluggable color-reconstruction loss (reference dmtet.py:491 passes
        # a createLoss(FLAGS)-built loss_fn into tick; renderutils/loss.py)
        from ..render.image_loss import make_image_loss

        self.img_loss_fn = make_image_loss(img_loss, tonemapper)
        self._loss_cache = {}
        self._edges = jnp.asarray(self.marching.unique_edges)
        # device-resident warm eigensolver across remeshes (geometry/
        # warm_eigs.py); cold/low-overlap iterations fall back to host
        from .warm_eigs import WarmShapeEigensolver

        self.warm = WarmShapeEigensolver(
            self.marching.num_grid_verts + self.marching.num_edges,
            mode_num + extra_modes,
            dtype=jnp.float32 if jax.default_backend() != "cpu" else jnp.float64,
            reanchor_every=50,
        )
        # true-eigensolve cadence; off-cadence steps map the stored basis
        # across the remesh.  Default 1 (reference parity) — see
        # geometry_task.py: Adam steps on an SDF MLP move the true
        # eigenvalues by ~2.5% per step, beyond the mapped correction's
        # first-order accuracy; raise only for small-step regimes.
        self.refresh_every = 1
        self._steps_since_refresh = 0

    # -- parameters ---------------------------------------------------------

    def init_params(self, key):
        kg, kt, kl = jax.random.split(key, 3)
        return {
            "geo": self.geo.init_params(kg),
            "tex": self.texture.init_params(kt),
            "light": self.light.init_params(kl),
        }

    # -- host-side march + eigensolve (detached) ----------------------------

    def _march_host(self, params):
        params_host = jax.device_put(
            jax.tree.map(lambda x: np.asarray(x), params), jax.devices("cpu")[0]
        )
        pos = self.geo.deformed_verts(params_host["geo"])
        sdf = self.geo.sdf(params_host["geo"])
        return self.marching(pos, sdf)

    def _eigensolve_host(self, out, comp, k):
        verts_c = np.asarray(out.all_verts)[comp["keep_idx"]]
        with jax.default_device(jax.devices("cpu")[0]):
            ops = assembly.build_element_ops(
                jnp.asarray(verts_c), jnp.asarray(comp["tets"]), 1,
                dtype=jnp.float64,
                tet_mask=jnp.asarray(comp["tet_mask"], jnp.float64),
            )
        mu, lam = lame_params(self.mat.youngs / self.mat.density, self.mat.poisson)
        K, M = assembly.assemble_scipy(ops, mu, lam, 1.0)
        n = 3 * comp["num_verts"]
        vals, vecs = eigsh_shift_invert(K[:n, :n], M[:n, :n], k=k, sigma=self.sigma)
        U = np.zeros((3 * len(comp["keep_idx"]), k))
        U[:n] = vecs
        return vals, U

    # -- differentiable joint loss ------------------------------------------

    def _render_buffers(self, all_verts, tris, tri_mask, v_tex, t_tex_idx,
                        params, mvp, campos, resolution, key):
        v_pos = all_verts.astype(jnp.float32)
        v_clip = xfm_points(v_pos, jnp.asarray(mvp, jnp.float32))
        rast = rasterize(
            v_clip, tris, resolution, tri_mask=tri_mask, num_layers=1
        )[0]
        v_nrm, f_nrm = masked_auto_normals(v_pos, tris, tri_mask.astype(jnp.float32))
        gb_pos = interpolate(v_pos, rast, tris)
        gb_nrm = interpolate(v_nrm, rast, tris)
        gb_geom = interpolate_face(f_nrm, rast)
        gb_tng = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), gb_pos.shape)
        gb_texc = interpolate(v_tex, rast, t_tex_idx)
        view_pos = jnp.asarray(campos, jnp.float32).reshape(1, 1, 3)
        buffers = shade(
            gb_pos, gb_geom, gb_nrm, gb_tng, gb_texc, view_pos,
            self.light, params["light"], self.material, {"kd_ks_normal": params["tex"]},
            bsdf=None, rng_key=key,
        )
        alpha = rast.alpha_soft[..., None]
        return buffers, alpha

    def _loss_core(self, params, keep_idx, tets_c, tet_mask,
                   tris, tri_mask, v_tex, t_tex_idx,
                   lam, U, target_vals, target_img, mvp, campos,
                   t_iter, key, audio_weight, sdf_regularizer, resolution):
        # recompute the differentiable vertex array from params (the
        # detached host march fixed only the topology)
        pos = self.geo.deformed_verts(params["geo"]).astype(self.dtype)
        sdf = self.geo.sdf(params["geo"]).astype(self.dtype)
        out = self.marching(pos, sdf)
        all_verts = out.all_verts

        # ---- image loss (dmtet.py:480-489)
        buffers, alpha = self._render_buffers(
            all_verts, tris, tri_mask, v_tex, t_tex_idx, params, mvp, campos,
            resolution, key,
        )
        shaded = buffers["shaded"]
        pred_rgb = shaded[..., :3] * alpha
        pred_a = alpha
        ref_rgb = target_img[..., :3] * target_img[..., 3:]
        ref_a = target_img[..., 3:]
        # alpha channel always MSE; color channel through the pluggable
        # family (mse/l1/smape/relmse x optional log_srgb), parity with
        # reference dmtet.py:490-491
        img_loss = jnp.mean((pred_a - ref_a) ** 2) + self.img_loss_fn(
            pred_rgb, ref_rgb
        )

        # ---- regularizers (dmtet.py:491-504)
        sdf_weight = sdf_regularizer - (sdf_regularizer - 0.01) * jnp.minimum(
            1.0, 4.0 * t_iter
        )
        reg = sdf_reg_loss(sdf, self._edges) * sdf_weight
        reg = reg + jnp.mean(
            buffers["kd_grad"][..., :-1] * buffers["kd_grad"][..., -1:]
        ) * 0.03 * jnp.minimum(1.0, 2.0 * t_iter)
        reg = reg + jnp.mean(
            buffers["occlusion"][..., :-1] * buffers["occlusion"][..., -1:]
        ) * 0.001 * jnp.minimum(1.0, 2.0 * t_iter)
        reg = reg + self.light.regularizer(params["light"]) * 0.005

        # ---- audio loss (dmtet.py:506-513)
        verts_c = all_verts[keep_idx]
        ops = assembly.build_element_ops(
            verts_c, tets_c, 1, dtype=self.dtype, tet_mask=tet_mask
        )
        mu, lame_l = lame_params(self.mat.youngs / self.mat.density, self.mat.poisson)
        vals = rayleigh_corrected_eigenvalues(
            lambda x: assembly.k_matvec(ops, x, mu, lame_l),
            lambda x: assembly.m_matvec(ops, x, 1.0),
            lam, U,
        )[self.extra_modes:]
        audio_loss = jnp.mean((vals - target_vals) ** 2 / target_vals**2)

        total = img_loss + reg + audio_weight * audio_loss
        return total, (img_loss, reg, audio_loss)

    def step_loss_grad(self, params, target_vals, target_img, mvp, campos,
                       t_iter, key, audio_weight=1.0, sdf_regularizer=0.02,
                       resolution=(128, 128), tri_bucket=2048):
        out = self._march_host(params)
        comp = MarchingTets.compact(out)
        tric = MarchingTets.compact_triangles_padded(out, tri_bucket)
        k = len(target_vals) + self.extra_modes
        if self.warm is not None and k == self.warm.k:
            mapped = None
            if (
                self.refresh_every > 1
                and self._steps_since_refresh + 1 < self.refresh_every
            ):
                mapped = self.warm.map_only(out, comp)
            if mapped is not None:
                self._steps_since_refresh += 1
                lam, U = mapped
            else:
                self._steps_since_refresh = 0
                from ..fem.material import lame_params as _lp

                mu, lame_l = _lp(
                    self.mat.youngs / self.mat.density, self.mat.poisson
                )
                lam, U = self.warm.solve(
                    out, comp, float(mu), float(lame_l),
                    host_solve=lambda: self._eigensolve_host(out, comp, k),
                )
        else:
            lam, U = self._eigensolve_host(out, comp, k)
        v_tex, t_tex_idx = map_uv(tric["face_gidx"], out.surf_tris.shape[0])

        sig = (len(comp["keep_idx"]), comp["tets"].shape[0],
               tric["tris"].shape[0], resolution)
        if sig not in self._loss_cache:
            self._loss_cache[sig] = jax.jit(
                jax.value_and_grad(self._loss_core, has_aux=True),
                static_argnames=("resolution",),
            )
        fn = self._loss_cache[sig]
        (loss, aux), g = fn(
            params,
            jnp.asarray(comp["keep_idx"]),
            jnp.asarray(comp["tets"]),
            jnp.asarray(comp["tet_mask"], self.dtype),
            jnp.asarray(tric["tris"]),
            jnp.asarray(tric["tri_mask"]),
            jnp.asarray(v_tex),
            jnp.asarray(t_tex_idx),
            jnp.asarray(lam, self.dtype),
            jnp.asarray(U, self.dtype),
            jnp.asarray(target_vals, self.dtype),
            jnp.asarray(target_img, jnp.float32),
            jnp.asarray(mvp, jnp.float32),
            jnp.asarray(campos, jnp.float32),
            jnp.float32(t_iter),
            key,
            jnp.float32(audio_weight),
            jnp.float32(sdf_regularizer),
            resolution=resolution,
        )
        return loss, aux, g, comp, out

    # -- optimization loop ---------------------------------------------------

    def optimize(self, params, target_vals, targets, iters: int = 500,
                 lr_geo: float = 1e-3, lr_app: float = 1e-2,
                 audio_weight: float = 1.0, resolution=(128, 128),
                 verbose: bool = True, seed: int = 0, log_every: int = 10,
                 on_iter=None):
        """targets: list of dicts {'img' (H, W, 4), 'mvp', 'campos'} cycled
        per iteration (the reference streams a DatasetMesh the same way).

        on_iter(rec): called with each iteration's metric record as it is
        produced, so a crash/kill mid-run cannot lose the whole history
        (round-2 post-mortem: metrics written only after return came back
        as 0-byte evidence files)."""
        label = {"geo": "geo", "tex": "app", "light": "app"}
        opt = optax.multi_transform(
            {
                "geo": optax.adam(optax.exponential_decay(lr_geo, 100, 0.9, staircase=True)),
                "app": optax.adam(optax.exponential_decay(lr_app, 100, 0.9, staircase=True)),
            },
            {k: label[k] for k in ("geo", "tex", "light")},
        )
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(seed)
        history = []
        best = {"loss": np.inf}
        for it in range(iters):
            tgt = targets[it % len(targets)]
            key, sub = jax.random.split(key)
            try:
                loss, (il, rl, al), g, comp, out = self.step_loss_grad(
                    params, target_vals, tgt["img"], tgt["mvp"], tgt["campos"],
                    it / max(iters, 1), sub, audio_weight, resolution=resolution,
                )
            except Exception as e:  # degenerate mesh mid-optimization
                print(f"iter {it}: step failed ({e}); skipping")
                continue
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            rec = {"iter": it, "loss": float(loss), "img": float(il),
                   "reg": float(rl), "audio": float(al)}
            history.append(rec)
            if on_iter is not None:
                on_iter(rec)
            if float(loss) < best["loss"]:
                vc = np.asarray(out.all_verts)[comp["keep_idx"]][: comp["num_verts"]]
                best = {"loss": float(loss), "verts": vc,
                        "tets": comp["tets"][: comp["num_tets"]],
                        "img": float(il), "audio": float(al)}
            if verbose and it % log_every == 0:
                print(f"iter {it}: loss {float(loss):.5f} img {float(il):.5f} "
                      f"reg {float(rl):.5f} audio {float(al):.5f}")
        return params, best, history
