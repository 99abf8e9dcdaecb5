"""Render-layer tests: BSDF parity vs the reference's pure-torch ground
truth (loaded from /root/reference at test time), rasterizer geometry +
gradients, mesh ops, textures, environment light, and the full pipeline.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsound_tpu.render import util
from diffsound_tpu.render.bsdf import (
    frostbite,
    lambert,
    pbr_bsdf,
    pbr_specular,
    prepare_shading_normal,
)
from diffsound_tpu.render.light import EnvironmentLight, fg_lut
from diffsound_tpu.render.mesh import Mesh, auto_normals, compute_tangents, unit_size
from diffsound_tpu.render.mlptexture import MLPTexture3D
from diffsound_tpu.render.rasterize import interpolate, rasterize
from diffsound_tpu.render.regularizer import (
    edge_to_face_mapping,
    laplace_regularizer_const,
    normal_consistency,
)
from diffsound_tpu.render.render import render_mesh, render_uv
from diffsound_tpu.render.texture import Texture2D, sample_bilinear


REF_BSDF = "/root/reference/src/dmtet/render/renderutils/bsdf.py"


def _load_ref_bsdf():
    spec = importlib.util.spec_from_file_location("ref_bsdf", REF_BSDF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_dirs(rng, shape):
    v = rng.normal(size=shape + (3,)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.mark.skipif(not os.path.exists(REF_BSDF), reason="reference absent")
class TestBSDFParityVsReference:
    """Run the same random inputs through our JAX BSDFs and the
    reference's pure-python torch ground truth (its own test pattern,
    renderutils/tests/test_bsdf.py:20-58)."""

    def setup_method(self, _):
        self.ref = _load_ref_bsdf()
        self.rng = np.random.default_rng(7)

    def test_lambert(self):
        import torch

        n = _rand_dirs(self.rng, (64,))
        wi = _rand_dirs(self.rng, (64,))
        ours = np.asarray(lambert(jnp.asarray(n), jnp.asarray(wi)))
        ref = self.ref.bsdf_lambert(torch.tensor(n), torch.tensor(wi)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_frostbite(self):
        import torch

        n = _rand_dirs(self.rng, (64,))
        wi = _rand_dirs(self.rng, (64,))
        wo = _rand_dirs(self.rng, (64,))
        r = self.rng.uniform(0.05, 1.0, (64, 1)).astype(np.float32)
        ours = np.asarray(
            frostbite(jnp.asarray(n), jnp.asarray(wi), jnp.asarray(wo), jnp.asarray(r))
        )
        ref = self.ref.bsdf_frostbite(
            torch.tensor(n), torch.tensor(wi), torch.tensor(wo), torch.tensor(r)
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_pbr_specular(self):
        import torch

        n = _rand_dirs(self.rng, (128,))
        wo = _rand_dirs(self.rng, (128,))
        wi = _rand_dirs(self.rng, (128,))
        col = self.rng.uniform(0, 1, (128, 3)).astype(np.float32)
        alpha = self.rng.uniform(0.01, 1.0, (128, 1)).astype(np.float32)
        ours = np.asarray(
            pbr_specular(jnp.asarray(col), jnp.asarray(n), jnp.asarray(wo), jnp.asarray(wi), jnp.asarray(alpha))
        )
        ref = self.ref.bsdf_pbr_specular(
            torch.tensor(col), torch.tensor(n), torch.tensor(wo), torch.tensor(wi), torch.tensor(alpha)
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)

    def test_pbr_full(self):
        import torch

        S = 64
        kd = self.rng.uniform(0, 1, (S, 3)).astype(np.float32)
        arm = self.rng.uniform(0, 1, (S, 3)).astype(np.float32)
        pos = self.rng.normal(size=(S, 3)).astype(np.float32)
        nrm = _rand_dirs(self.rng, (S,))
        view_pos = pos + _rand_dirs(self.rng, (S,)) * 3
        light_pos = pos + _rand_dirs(self.rng, (S,)) * 3
        ours = np.asarray(
            pbr_bsdf(*(jnp.asarray(x) for x in (kd, arm, pos, nrm, view_pos, light_pos)))
        )
        ref = self.ref.bsdf_pbr(
            *(torch.tensor(x) for x in (kd, arm, pos, nrm, view_pos, light_pos)),
            0.08, 0,
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)

    def test_prepare_shading_normal(self):
        import torch

        S = 64
        pos = self.rng.normal(size=(S, 3)).astype(np.float32)
        view_pos = pos + _rand_dirs(self.rng, (S,)) * 2
        pn = _rand_dirs(self.rng, (S,))
        sn = _rand_dirs(self.rng, (S,))
        tn = _rand_dirs(self.rng, (S,))
        gn = _rand_dirs(self.rng, (S,))
        ours = np.asarray(
            prepare_shading_normal(
                *(jnp.asarray(x) for x in (pos, view_pos, pn, sn, tn, gn)), True, True
            )
        )
        ref = self.ref.bsdf_prepare_shading_normal(
            *(torch.tensor(x) for x in (pos, view_pos, pn, sn, tn, gn)), True, True
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _quad(z=0.0, s=0.5):
    verts = np.array(
        [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, tris


class TestRasterizer:
    def _mvp(self, eye=(0, 0, 2.5)):
        return util.perspective(0.7854) @ util.lookat(eye, [0, 0, 0], [0, 1, 0])

    def test_coverage_and_bary(self):
        verts, tris = _quad()
        mvp = self._mvp()
        vc = util.xfm_points(jnp.asarray(verts), jnp.asarray(mvp))
        r = rasterize(vc, jnp.asarray(tris), (64, 64))[0]
        hit = np.asarray(r.tri_id > 0)
        assert hit[32, 32] and not hit[2, 2]
        # interpolated world position at the center pixel ~ ray through
        # origin hits the z=0 plane near (0, 0, 0)
        pos = np.asarray(interpolate(jnp.asarray(verts), r, jnp.asarray(tris)))
        assert np.linalg.norm(pos[32, 32]) < 0.05
        assert abs(pos[32, 32, 2]) < 1e-6

    def test_depth_order_and_peeling(self):
        # small front quad occludes a big back quad
        vf, tf = _quad(z=0.5, s=0.2)
        vb, tb = _quad(z=-0.5, s=0.8)
        verts = np.concatenate([vf, vb])
        tris = np.concatenate([tf, tb + 4]).astype(np.int32)
        mvp = self._mvp()
        vc = util.xfm_points(jnp.asarray(verts), jnp.asarray(mvp))
        layers = rasterize(vc, jnp.asarray(tris), (64, 64), num_layers=2)
        front, back = layers
        # center: front layer hits the small quad (tris 0-1), back layer
        # hits the big quad (tris 2-3)
        assert int(front.tri_id[32, 32]) in (1, 2)
        assert int(back.tri_id[32, 32]) in (3, 4)
        # periphery (inside big quad, outside small): only the big quad,
        # first layer
        assert int(front.tri_id[32, 14]) in (3, 4)
        assert int(back.tri_id[32, 14]) == 0

    def test_tri_mask_excludes(self):
        verts, tris = _quad()
        mvp = self._mvp()
        vc = util.xfm_points(jnp.asarray(verts), jnp.asarray(mvp))
        mask = jnp.asarray([True, False])
        r = rasterize(vc, jnp.asarray(tris), (32, 32), tri_mask=mask)[0]
        ids = np.unique(np.asarray(r.tri_id))
        assert 2 not in ids  # masked triangle never drawn

    def test_silhouette_gradient_sign(self):
        verts, tris = _quad()
        mvp = self._mvp()

        def alpha_sum(s):
            v = jnp.asarray(verts) * s
            vc = util.xfm_points(v, jnp.asarray(mvp))
            return jnp.sum(rasterize(vc, jnp.asarray(tris), (64, 64))[0].alpha_soft)

        g = jax.grad(alpha_sum)(1.0)
        assert float(g) > 100.0  # growing the quad grows coverage

    def test_perspective_correct_bary(self):
        # a quad tilted in depth: the interpolated world position at any
        # covered pixel must (a) lie on the quad's plane and (b) project
        # back exactly to that pixel's NDC center — screen-linear
        # (non-perspective) interpolation fails (b) off-center
        verts = np.array(
            [[-0.5, -0.5, 0.5], [0.5, -0.5, -1.5], [0.5, 0.5, -1.5], [-0.5, 0.5, 0.5]],
            np.float32,
        )
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mvp = self._mvp()
        vc = util.xfm_points(jnp.asarray(verts), jnp.asarray(mvp))
        r = rasterize(vc, jnp.asarray(tris), (65, 65))[0]
        pos = np.asarray(interpolate(jnp.asarray(verts), r, jnp.asarray(tris)))
        hit = np.asarray(r.tri_id > 0)
        jj, ii = 25, 19  # off-center covered pixel (near half of the quad)
        assert hit[jj, ii]
        p = pos[jj, ii]
        # plane through the quad: z = -2x - 0.5
        assert abs(p[2] + 2 * p[0] + 0.5) < 1e-3
        clip = np.asarray(mvp) @ np.append(p, 1.0)
        ndc = clip[:2] / clip[3]
        ndc_expect = np.array([(ii + 0.5) / 65 * 2 - 1, (jj + 0.5) / 65 * 2 - 1])
        np.testing.assert_allclose(ndc, ndc_expect, atol=2e-3)


class TestMeshOps:
    def test_auto_normals_sphere(self):
        # build a UV sphere
        nu, nv = 16, 16
        th = np.linspace(0.2, np.pi - 0.2, nu)
        ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        verts = np.stack(
            [
                (np.sin(th)[:, None] * np.cos(ph)[None, :]).ravel(),
                (np.cos(th)[:, None] * np.ones_like(ph)[None, :]).ravel(),
                (np.sin(th)[:, None] * np.sin(ph)[None, :]).ravel(),
            ],
            -1,
        ).astype(np.float32)
        tris = []
        for i in range(nu - 1):
            for j in range(nv):
                a = i * nv + j
                b = i * nv + (j + 1) % nv
                c = (i + 1) * nv + j
                d = (i + 1) * nv + (j + 1) % nv
                tris += [[a, b, c], [b, d, c]]
        tris = np.asarray(tris, np.int32)
        m = auto_normals(Mesh(v_pos=jnp.asarray(verts), t_pos_idx=jnp.asarray(tris)))
        n = np.asarray(m.v_nrm)
        radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
        cos = np.abs(np.sum(n * radial, -1))
        assert np.mean(cos) > 0.97

    def test_tangents_orthogonal(self):
        verts, tris = _quad()
        uv = (verts[:, :2] + 0.5).astype(np.float32)
        m = Mesh(
            v_pos=jnp.asarray(verts), t_pos_idx=jnp.asarray(tris),
            v_tex=jnp.asarray(uv), t_tex_idx=jnp.asarray(tris),
        )
        m = auto_normals(m)
        m = compute_tangents(m)
        t = np.asarray(m.v_tng)
        n = np.asarray(m.v_nrm)
        assert np.abs(np.sum(t * n, -1)).max() < 1e-5
        assert np.allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)

    def test_unit_size(self):
        verts, tris = _quad(s=3.0)
        m = unit_size(Mesh(v_pos=jnp.asarray(verts + 5.0), t_pos_idx=jnp.asarray(tris)))
        v = np.asarray(m.v_pos)
        assert abs((v.max(0) - v.min(0)).max() - 2.0) < 1e-5
        assert np.abs((v.max(0) + v.min(0)) / 2).max() < 1e-5


class TestTexture:
    def test_bilinear_texel_centers(self):
        rng = np.random.default_rng(0)
        tex = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        # uv at texel centers returns exact texel values
        uv = np.stack(
            np.meshgrid((np.arange(8) + 0.5) / 8, (np.arange(8) + 0.5) / 8, indexing="xy"),
            -1,
        ).astype(np.float32)
        out = np.asarray(sample_bilinear(jnp.asarray(tex), jnp.asarray(uv)))
        np.testing.assert_allclose(out, tex, atol=1e-6)

    def test_mip_levels(self):
        tex = Texture2D(np.ones((16, 16, 3), np.float32) * 0.5)
        uv = jnp.asarray([[0.5, 0.5]])
        out = tex.sample(tex.params, uv, mip_bias=jnp.asarray([3.0]))
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

    def test_constant_texture(self):
        tex = Texture2D(np.asarray([0.2, 0.4, 0.6], np.float32))
        out = tex.sample(tex.params, jnp.asarray([[0.3, 0.9]]))
        np.testing.assert_allclose(np.asarray(out)[0], [0.2, 0.4, 0.6], atol=1e-6)


class TestLight:
    def test_constant_env_diffuse_identity(self):
        light = EnvironmentLight(base_res=32)
        params = {"base": jnp.ones((6, 32, 32, 3)) * 0.7}
        diffuse, spec = light.build_mips(params)
        np.testing.assert_allclose(np.asarray(diffuse), 0.7, rtol=1e-4)
        for m in spec:
            np.testing.assert_allclose(np.asarray(m), 0.7, rtol=1e-4)

    def test_shade_diffuse_white_light(self):
        light = EnvironmentLight(base_res=32)
        params = {"base": jnp.ones((6, 32, 32, 3))}
        pos = jnp.zeros((4, 4, 3))
        nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 4, 3))
        kd = jnp.ones((4, 4, 3)) * 0.5
        ks = jnp.zeros((4, 4, 3))
        view = jnp.asarray([0.0, 0.0, 2.0]).reshape(1, 1, 3)
        out = light.shade(params, pos, nrm, kd, ks, view, specular=False)
        np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-3)

    def test_white_regularizer(self):
        light = EnvironmentLight(base_res=16)
        white = {"base": jnp.ones((6, 16, 16, 3)) * 0.3}
        assert float(light.regularizer(white)) < 1e-9
        colored = {"base": white["base"].at[..., 0].set(0.9)}
        assert float(light.regularizer(colored)) > 0.01

    def test_fg_lut_sanity(self):
        lut = fg_lut()
        assert lut.shape == (256, 256, 2)
        assert np.all(np.isfinite(lut)) and lut.min() >= 0
        # smooth surfaces reflect more coherently: FG_a decreases with
        # roughness at fixed NdotV... (weak sanity: values bounded by ~1.5)
        assert lut.max() < 1.2  # split-sum FG terms are bounded near 1

    def test_light_gradient_flows(self):
        light = EnvironmentLight(base_res=16)
        params = light.init_params(jax.random.PRNGKey(0))
        nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (2, 2, 3))

        def f(p):
            out = light.shade(
                p, jnp.zeros((2, 2, 3)), nrm, jnp.ones((2, 2, 3)),
                jnp.asarray([0.0, 0.4, 0.5]).reshape(1, 1, 3) * jnp.ones((2, 2, 3)),
                jnp.asarray([0.0, 0.0, 2.0]).reshape(1, 1, 3),
            )
            return jnp.sum(out)

        g = jax.grad(f)(params)
        assert float(jnp.abs(g["base"]).max()) > 0


class TestRenderPipeline:
    def _scene(self):
        verts, tris = _quad()
        uv = (verts[:, :2] + 0.5).astype(np.float32)
        from diffsound_tpu.render.material import default_material

        mat = default_material()
        m = Mesh(
            v_pos=jnp.asarray(verts), t_pos_idx=jnp.asarray(tris),
            v_tex=jnp.asarray(uv), t_tex_idx=jnp.asarray(tris), material=mat,
        )
        m = auto_normals(m)
        m = compute_tangents(m)
        mat_params = {"kd": mat["kd"].params, "ks": mat["ks"].params}
        light = EnvironmentLight(base_res=16)
        lp = {"base": jnp.ones((6, 16, 16, 3)) * 0.8}
        mvp = util.perspective(0.7854) @ util.lookat([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
        return m, mat_params, light, lp, mvp

    def test_render_mesh_finite(self):
        m, mp, light, lp, mvp = self._scene()
        out = render_mesh(m, mp, light, lp, mvp, [0, 0, 2.5], (32, 32))
        img = np.asarray(out["shaded"])
        assert img.shape == (32, 32, 4)
        assert np.all(np.isfinite(img))
        assert img[16, 16, 3] > 0.9  # center covered
        assert img[16, 16, :3].max() > 0.05  # lit

    def test_render_gradients_to_everything(self):
        m, mp, light, lp, mvp = self._scene()

        def loss(v_pos, mat_p, light_p):
            mm = m.with_(v_pos=v_pos)
            out = render_mesh(mm, mat_p, light, light_p, mvp, [0, 0, 2.5], (24, 24))
            return jnp.mean(out["shaded"] ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(m.v_pos, mp, lp)
        assert float(jnp.abs(g[0]).max()) > 0  # geometry
        assert float(jnp.abs(g[1]["kd"]).max()) > 0  # material
        assert float(jnp.abs(g[2]["base"]).max()) > 0  # light


    def test_render_spp_supersampling(self):
        """spp=2 matches spp=1 in the interior and carries geometry
        gradients; edge pixels are the ones allowed to differ (that is
        the point of supersampling)."""
        m, mp, light, lp, mvp = self._scene()
        out1 = render_mesh(m, mp, light, lp, mvp, [0, 0, 2.5], (32, 32))
        out2 = render_mesh(m, mp, light, lp, mvp, [0, 0, 2.5], (32, 32), spp=2)
        a1 = np.asarray(out1["shaded"])
        a2 = np.asarray(out2["shaded"])
        assert a2.shape == (32, 32, 4)
        assert np.all(np.isfinite(a2))
        # interior block (fully covered at both rates) must agree closely
        np.testing.assert_allclose(a1[12:20, 12:20], a2[12:20, 12:20],
                                   atol=5e-3)

        def loss(v_pos):
            mm = m.with_(v_pos=v_pos)
            out = render_mesh(mm, mp, light, lp, mvp, [0, 0, 2.5], (24, 24),
                              spp=2)
            return jnp.mean(out["shaded"] ** 2)

        g = jax.grad(loss)(m.v_pos)
        assert float(jnp.abs(g).max()) > 0

    def test_render_uv_bake(self):
        m, mp, light, lp, mvp = self._scene()
        mlp = MLPTexture3D(aabb=(np.full(3, -1.0), np.full(3, 1.0)))
        p = mlp.init_params(jax.random.PRNGKey(0))
        mask, kd, ks, nrm = render_uv(m, (32, 32), mlp, p)
        assert mask.shape == (32, 32, 1)
        assert float(mask.sum()) > 0
        assert np.all(np.isfinite(np.asarray(kd)))


class TestRegularizers:
    def test_laplacian_zero_for_uniform_plane(self):
        # regular grid: interior umbrella term vanishes
        n = 5
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], -1).astype(np.float32)
        tris = []
        for i in range(n - 1):
            for j in range(n - 1):
                a, b = i * n + j, i * n + j + 1
                c, d = (i + 1) * n + j, (i + 1) * n + j + 1
                tris += [[a, b, c], [b, d, c]]
        tris = np.asarray(tris, np.int32)
        val = float(laplace_regularizer_const(jnp.asarray(verts), jnp.asarray(tris)))
        bumped = verts.copy()
        bumped[12, 2] = 1.0  # poke the center
        val2 = float(laplace_regularizer_const(jnp.asarray(bumped), jnp.asarray(tris)))
        assert val2 > val

    def test_normal_consistency_flat_vs_bent(self):
        verts, tris = _quad()
        tpe = edge_to_face_mapping(tris)
        flat = float(normal_consistency(jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(tpe)))
        bent = verts.copy()
        bent[1, 2] = 0.5
        bval = float(normal_consistency(jnp.asarray(bent), jnp.asarray(tris), jnp.asarray(tpe)))
        assert flat < 1e-6
        assert bval > 1e-3


class TestObjIO:
    def test_roundtrip(self, tmp_path):
        verts, tris = _quad()
        uv = (verts[:, :2] + 0.5).astype(np.float32)
        from diffsound_tpu.render.material import default_material
        from diffsound_tpu.render.obj import load_obj, write_obj

        m = Mesh(
            v_pos=jnp.asarray(verts), t_pos_idx=jnp.asarray(tris),
            v_tex=jnp.asarray(uv), t_tex_idx=jnp.asarray(tris),
            material=default_material(),
        )
        m = auto_normals(m)
        write_obj(str(tmp_path), m)
        m2 = load_obj(str(tmp_path / "mesh.obj"))
        np.testing.assert_allclose(np.asarray(m2.v_pos), verts, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2.t_pos_idx), tris)
        assert m2.v_tex is not None and m2.v_nrm is not None


REF_LOSS = "/root/reference/src/dmtet/render/renderutils/loss.py"


@pytest.mark.skipif(not os.path.exists(REF_LOSS), reason="reference absent")
class TestImageLossParityVsReference:
    """Every (loss, tonemapper) combination of the HDR image-loss family
    matches the reference's pure-torch implementation (its use_python
    path) in value and input gradient on random HDR images."""

    def setup_method(self, _):
        spec = importlib.util.spec_from_file_location("ref_loss", REF_LOSS)
        self.ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(self.ref)
        rng = np.random.default_rng(11)
        # HDR-ish range incl. exact zeros and values > 1
        self.img = (rng.random((2, 16, 16, 3)) * 4.0).astype(np.float32)
        self.tgt = (rng.random((2, 16, 16, 3)) * 4.0).astype(np.float32)
        self.img[0, 0, 0] = 0.0

    @pytest.mark.parametrize("loss", ["mse", "smape", "relmse", "logl1"])
    @pytest.mark.parametrize("tonemapper", ["none", "log_srgb"])
    def test_value_and_grad_parity(self, loss, tonemapper):
        import torch

        from diffsound_tpu.render.image_loss import image_loss_fn

        ti = torch.tensor(self.img, requires_grad=True)
        tt = torch.tensor(self.tgt)
        ref_val = self.ref.image_loss_fn(ti, tt, loss, tonemapper)
        ref_val.backward()

        f = lambda a: image_loss_fn(
            a, jnp.asarray(self.tgt), loss,
            None if tonemapper == "none" else tonemapper,
        )
        val, grad = jax.value_and_grad(f)(jnp.asarray(self.img))

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(grad), ti.grad.numpy(), rtol=1e-4, atol=1e-7
        )
