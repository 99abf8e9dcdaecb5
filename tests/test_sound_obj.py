"""End-to-end modal model tests: LOBPCG vs ARPACK frequencies, material
gradient flow, bowl-mesh ingestion from the reference data assets."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsound_tpu.fem.mesh import TetMesh, cube_tet_mesh
from diffsound_tpu.models.sound_obj import DiffSoundObject, build_model

BOWL = "/root/reference/data/mesh/bowl/bowl.obj_.msh"


def small_obj(task="material", order=1, dtype=jnp.float64, mode_num=8):
    mesh = cube_tet_mesh(3, size=0.1)  # 10 cm cube -> audible-range modes
    return DiffSoundObject(
        mesh=mesh,
        mode_num=mode_num,
        order=order,
        mat=(2700, 7.2e10, 0.19, 6, 1e-7),
        task=task,
        dtype=dtype,
    )


class TestDiffSoundObject:
    def test_lobpcg_matches_arpack(self):
        obj = small_obj(task="gt")
        eig_l = obj.eigen_decomposition(method="lobpcg")
        eig_a = obj.eigen_decomposition(method="arpack", sigma=1e5)
        fl = np.asarray(obj.get_undamped_freqs({}, eig_l))
        fa = np.asarray(obj.get_undamped_freqs({}, eig_a))
        np.testing.assert_allclose(fl, fa, rtol=1e-5)
        assert fl[0] > 20.0  # audible

    def test_material_gradients_flow(self):
        obj = small_obj(task="material")
        params = obj.init_params(jax.random.PRNGKey(0), pretrain=False)
        eig = obj.eigen_decomposition(params)

        def loss(p):
            return jnp.sum(obj.get_undamped_freqs(p, eig))

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["youngs_logits"]).max()) > 0
        assert float(jnp.abs(g["poisson_logits"]).max()) > 0
        assert all(bool(jnp.all(jnp.isfinite(v))) for v in g.values())

    def test_freq_scales_with_sqrt_youngs(self):
        """f ~ sqrt(E): doubling E scales frequencies by sqrt(2) exactly
        for fixed nu (structural sanity of the whole pipeline)."""
        mesh = cube_tet_mesh(2, size=0.1)
        o1 = DiffSoundObject(mesh=mesh, mode_num=6, order=1,
                             mat=(2700, 7.2e10, 0.19, 6, 1e-7), task="gt",
                             dtype=jnp.float64)
        o2 = DiffSoundObject(mesh=mesh, mode_num=6, order=1,
                             mat=(2700, 2 * 7.2e10, 0.19, 6, 1e-7), task="gt",
                             dtype=jnp.float64)
        f1 = np.asarray(o1.get_undamped_freqs({}, o1.eigen_decomposition()))
        f2 = np.asarray(o2.get_undamped_freqs({}, o2.eigen_decomposition()))
        np.testing.assert_allclose(f2 / f1, np.sqrt(2.0), rtol=1e-5)

    def test_mat_baseline_freezes_poisson(self):
        obj = small_obj(task="mat_baseline")
        params = obj.init_params(jax.random.PRNGKey(0), pretrain=False)
        assert params["poisson_logits"].shape == (1,)
        assert obj.bins.trainable_keys() == ("youngs_logits",)
        # frozen poisson equals the table value exactly (single bin)
        assert abs(float(obj.bins.poisson(params)) - obj.mat.poisson) < 1e-6

    def test_order2_runs(self):
        obj = small_obj(task="gt", order=2, mode_num=4)
        eig = obj.eigen_decomposition()
        f = np.asarray(obj.get_undamped_freqs({}, eig))
        assert np.all(np.isfinite(f)) and np.all(np.diff(f) >= -1e-6)

    def test_warm_start_refresh(self):
        obj = small_obj(task="material")
        params = obj.init_params(jax.random.PRNGKey(0), pretrain=False)
        eig0 = obj.eigen_decomposition(params)  # auto -> cold ARPACK
        assert int(eig0.iterations) == 0
        # small parameter change -> warm device LOBPCG converges quickly
        params2 = jax.tree.map(lambda x: x + 0.01, params)
        eig1 = obj.eigen_decomposition(params2, prev=eig0)  # auto -> lobpcg
        assert 0 < int(eig1.iterations) < 40
        f0 = np.asarray(obj.get_undamped_freqs(params2, eig1))
        eig_ref = obj.eigen_decomposition(params2, method="arpack", sigma=1e5)
        f_ref = np.asarray(obj.get_undamped_freqs(params2, eig_ref))
        np.testing.assert_allclose(f0, f_ref, rtol=1e-6)


@pytest.mark.skipif(not os.path.exists(BOWL), reason="reference data absent")
class TestBowlMesh:
    def test_load_binary_gmsh(self):
        mesh = TetMesh.from_file(BOWL)
        assert mesh.num_vertices > 2500
        assert mesh.num_tets > 5000
        assert np.all(mesh.volumes() > 0)

    def test_bowl_order2_modal_freqs(self):
        mesh = TetMesh.from_file(BOWL)
        obj = DiffSoundObject(
            mesh=mesh, mode_num=16, order=2,
            mat=(2700, 7.2e10, 0.19, 6, 1e-7), task="gt", dtype=jnp.float64,
        )
        eig_a = obj.eigen_decomposition(method="arpack")
        fa = np.asarray(obj.get_undamped_freqs({}, eig_a))
        # ceramic bowl: audible modal frequencies, ascending
        assert 20.0 < fa[0] < 20000.0
        assert np.all(np.diff(fa) >= -1e-6)

        # device LOBPCG warm-started from the cold solve (the training
        # loop's refresh path) reproduces ARPACK to solver precision
        eig_l = obj.eigen_decomposition(prev=eig_a, method="lobpcg")
        fl = np.asarray(obj.get_undamped_freqs({}, eig_l))
        np.testing.assert_allclose(fl, fa, rtol=1e-6)
        assert int(eig_l.iterations) < 30


class TestModalCache:
    def test_cached_equals_matvec_path(self):
        """The per-refresh quadratic-form cache reproduces the matvec-based
        corrected eigenvalues and their material gradients exactly (K is
        linear in mu, lambda)."""
        obj = small_obj(task="material")
        params = obj.init_params(jax.random.PRNGKey(0), pretrain=False)
        eig = obj.eigen_decomposition(params)
        cache = obj.modal_cache(eig)

        # perturb the material: cache must track without re-solving
        params2 = jax.tree.map(lambda x: x + 0.1, params)
        direct = np.asarray(obj.get_vals(params2, eig))
        cached = np.asarray(
            obj.corrected_eigenvalues_cached(params2, cache)[obj.extra_modes :]
        )
        np.testing.assert_allclose(cached, direct, rtol=1e-10)

        g_direct = jax.grad(lambda p: jnp.sum(obj.get_undamped_freqs(p, eig)))(
            params2
        )
        g_cached = jax.grad(
            lambda p: jnp.sum(obj.get_undamped_freqs_cached(p, cache))
        )(params2)
        for k in g_direct:
            np.testing.assert_allclose(
                np.asarray(g_cached[k]), np.asarray(g_direct[k]), rtol=1e-8
            )


def test_order3_end_to_end_frequencies():
    """DiffSoundObject at order 3 (tetra20 promotion + order-general
    assembly + ARPACK): frequencies converge from the order-2 values
    (richer space => slightly lower) and stay in family."""
    import jax.numpy as jnp

    from diffsound_tpu.fem.mesh import cube_tet_mesh
    from diffsound_tpu.models.sound_obj import build_model

    mesh = cube_tet_mesh(2, size=0.5)
    freqs = {}
    for order in (2, 3):
        model = build_model(
            mesh=mesh, mode_num=6, order=order,
            mat=(2700, 7.2e10, 0.19, 6, 1e-7), task="gt", dtype=jnp.float64,
        )
        eig = model.eigen_decomposition(method="arpack", sigma=1e5)
        freqs[order] = np.asarray(model.get_undamped_freqs({}, eig))
    rel = np.abs(freqs[3] - freqs[2]) / freqs[2]
    assert rel.max() < 0.06, rel
    assert np.all(freqs[3] <= freqs[2] * 1.001)
