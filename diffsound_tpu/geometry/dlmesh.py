"""DLMesh: direct vertex-position optimization geometry.

Functional counterpart of the reference DLMesh
(/root/reference/src/dmtet/geometry/dlmesh.py:20-85): the trainable
parameter IS the vertex array of a fixed-topology triangle mesh; tick =
image MSE (alpha + masked color) + Laplacian regularizer (absolute or
relative to the initial guess, annealed by 1 - t) + albedo-smoothness +
visibility + light white-balance regularizers.  Being pure JAX, the
geometry is just a params pytree {"v_pos"} and tick a jitted
value_and_grad — no Module machinery needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..render import mesh as rmesh
from ..render.light import EnvironmentLight
from ..render.regularizer import laplace_regularizer_const
from ..render.render import render_mesh


class DLMesh:
    def __init__(
        self,
        base_mesh: rmesh.Mesh,
        light: EnvironmentLight,
        material: dict,
        laplace: str = "relative",
        laplace_scale: float = 10000.0,
        total_iters: int = 1000,
    ):
        self.initial_v_pos = jnp.asarray(base_mesh.v_pos)
        self.base = base_mesh
        self.light = light
        self.material = material
        self.laplace = laplace
        self.laplace_scale = laplace_scale
        self.total_iters = total_iters
        self._vg = None

    def init_params(self, key, tex_params, light_params):
        return {
            "v_pos": self.initial_v_pos,
            "tex": tex_params,
            "light": light_params,
        }

    def get_mesh(self, v_pos) -> rmesh.Mesh:
        m = self.base.with_(v_pos=v_pos, material=self.material)
        m = rmesh.auto_normals(m)
        if m.v_tex is not None:
            m = rmesh.compute_tangents(m)
        return m

    def aabb(self):
        return rmesh.aabb(self.base.with_(v_pos=self.initial_v_pos))

    def render(self, params, mvp, campos, resolution, background=None,
               bsdf=None, rng_key=None):
        m = self.get_mesh(params["v_pos"])
        return render_mesh(
            m, {"kd_ks_normal": params["tex"]}, self.light, params["light"],
            mvp, campos, resolution, background=background, bsdf=bsdf,
            rng_key=rng_key,
        )

    def tick(self, params, target_img, mvp, campos, iteration, rng_key,
             resolution):
        """-> (img_loss, reg_loss) (dlmesh.py:52-85)."""
        buffers = self.render(
            params, mvp, campos, resolution, rng_key=rng_key
        )
        t_iter = iteration / self.total_iters
        shaded = buffers["shaded"]
        img_loss = jnp.mean((shaded[..., 3:] - target_img[..., 3:]) ** 2)
        img_loss = img_loss + jnp.mean(
            jnp.abs(
                shaded[..., :3] * target_img[..., 3:]
                - target_img[..., :3] * target_img[..., 3:]
            )
        )

        if self.laplace == "absolute":
            lap_v = params["v_pos"]
        else:
            lap_v = params["v_pos"] - self.initial_v_pos
        # clamp the anneal at zero: past total_iters a negative weight
        # would invert the regularizer into a reward
        reg = laplace_regularizer_const(lap_v, self.base.t_pos_idx) * (
            self.laplace_scale * jnp.maximum(0.0, 1.0 - t_iter)
        )
        ramp = jnp.minimum(1.0, iteration / 500.0)
        reg = reg + jnp.mean(
            buffers["kd_grad"][..., :-1] * buffers["kd_grad"][..., -1:]
        ) * 0.03 * ramp
        reg = reg + jnp.mean(
            buffers["occlusion"][..., :-1] * buffers["occlusion"][..., -1:]
        ) * 0.001 * ramp
        reg = reg + self.light.regularizer(params["light"]) * 0.005
        return img_loss, reg

    def optimize(self, params, targets, iters: int = 1000, lr: float = 1e-3,
                 resolution=(128, 128), seed: int = 0, verbose: bool = True,
                 log_every: int = 50):
        opt = optax.adam(optax.exponential_decay(lr, 100, 0.9, staircase=True))
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(seed)

        if self._vg is None:

            def total(params, img, mvp, campos, it, k):
                il, rl = self.tick(params, img, mvp, campos, it, k, resolution)
                return il + rl, (il, rl)

            self._vg = jax.jit(jax.value_and_grad(total, has_aux=True))

        history = []
        for it in range(iters):
            tgt = targets[it % len(targets)]
            key, sub = jax.random.split(key)
            (loss, (il, rl)), g = self._vg(
                params, jnp.asarray(tgt["img"], jnp.float32),
                jnp.asarray(tgt["mvp"], jnp.float32),
                jnp.asarray(tgt["campos"], jnp.float32),
                jnp.float32(it), sub,
            )
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            history.append({"iter": it, "loss": float(loss),
                            "img": float(il), "reg": float(rl)})
            if verbose and it % log_every == 0:
                print(f"iter {it}: loss {float(loss):.5f} "
                      f"img {float(il):.5f} reg {float(rl):.5f}")
        return params, history
