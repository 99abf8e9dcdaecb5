"""Material tables and isotropic linear elasticity.

Parity with /root/reference/src/diffelastic/material_model.py:8-26 (MatSet
table: density, Young's modulus, Poisson ratio, Rayleigh alpha, beta) and
the Piola stress sigma(F) = mu (F + F^T) + lambda tr(F) I used throughout
(/root/reference/src/diffelastic/diff_model.py:34-42).

TPU note: stiffness never goes through a per-gauss-point stress evaluation
on the hot path.  Isotropy means K = mu * K_mu + lambda * K_lam with
material-independent element blocks (see `fem.assembly`), so material
gradients flow through two scalars — the stress function here exists for
tests and for exotic (e.g. learned) material models.
"""

from dataclasses import dataclass

import jax.numpy as jnp


class MatSet:
    """(density, youngs, poisson, alpha, beta) material table."""

    Ceramic = 2700, 7.2e10, 0.19, 6, 1e-7
    Glass = 2600, 6.2e10, 0.20, 1, 1e-7
    Wood = 750, 1.1e10, 0.25, 60, 2e-6
    Plastic = 1070, 1.4e9, 0.35, 30, 1e-6
    Iron = 8000, 2.1e11, 0.28, 10, 1e-7
    Polycarbonate = 1190, 2.4e9, 0.37, 0.5, 4e-7
    Steel = 7850, 2.0e11, 0.29, 20, 3e-8
    Tin = 7265, 5e10, 0.325, 2, 3e-8
    Test = 2700, 6e10, 0.19, 6, 1e-7
    RandomMin = 2700, 1e10, 0.1, 6, 1e-7
    RandomMax = 2700, 1e11, 0.4, 6, 1e-7


@dataclass(frozen=True)
class Material:
    density: float
    youngs: float
    poisson: float
    alpha: float
    beta: float

    @staticmethod
    def of(spec) -> "Material":
        """Accept a MatSet tuple, a name string, or a Material."""
        if isinstance(spec, Material):
            return spec
        if isinstance(spec, str):
            spec = getattr(MatSet, spec)
        d, e, p, a, b = spec
        return Material(float(d), float(e), float(p), float(a), float(b))


def lame_params(youngs, poisson):
    """(mu, lambda) from (E, nu)."""
    lam = youngs * poisson / ((1 + poisson) * (1 - 2 * poisson))
    mu = youngs / (2 * (1 + poisson))
    return mu, lam


def linear_stress(F, youngs, poisson):
    """Piola stress sigma = mu (F + F^T) + lambda tr(F) I for F (..., 3, 3)."""
    mu, lam = lame_params(youngs, poisson)
    tr = jnp.trace(F, axis1=-2, axis2=-1)[..., None, None]
    eye = jnp.eye(3, dtype=F.dtype)
    return mu * (F + jnp.swapaxes(F, -1, -2)) + lam * tr * eye


def elasticity_tensor(youngs, poisson, dtype=jnp.float64):
    """9x9 d(sigma)/d(F) with row-major (i,j) vec layout:
    C[(i,j),(k,l)] = mu (delta_ik delta_jl + delta_il delta_jk)
                   + lambda delta_ij delta_kl."""
    mu, lam = lame_params(youngs, poisson)
    eye = jnp.eye(3, dtype=dtype)
    c = mu * (
        jnp.einsum("ik,jl->ijkl", eye, eye) + jnp.einsum("il,jk->ijkl", eye, eye)
    ) + lam * jnp.einsum("ij,kl->ijkl", eye, eye)
    return c.reshape(9, 9)


class TinyNN:
    """Learned stress model: 3-layer MLP F(9) -> sigma(9) with tanh output
    (parity: /root/reference/src/diffelastic/material_model.py:28-56).

    The output is scaled by `stress_scale` so the tanh squashing operates
    on O(1) values (the reference feeds density-normalized quantities).
    Drives `assembly.k_matvec_stress` — the general stress path the
    factored isotropic operators cannot express."""

    def __init__(self, mid_dim: int = 32, non_linear: bool = True,
                 stress_scale: float = 1.0):
        self.mid_dim = mid_dim
        self.non_linear = non_linear
        self.stress_scale = stress_scale

    def init_params(self, key, dtype=jnp.float32):
        import jax

        k1, k2, k3 = jax.random.split(key, 3)
        m = self.mid_dim
        return {
            "w1": jax.random.normal(k1, (9, m), dtype) * jnp.sqrt(2.0 / 9),
            "b1": jnp.zeros((m,), dtype),
            "w2": jax.random.normal(k2, (m, m), dtype) * jnp.sqrt(2.0 / m),
            "b2": jnp.zeros((m,), dtype),
            "w3": jax.random.normal(k3, (m, 9), dtype) * jnp.sqrt(1.0 / m),
            "b3": jnp.zeros((9,), dtype),
        }

    def stress(self, params, F):
        """F (..., 3, 3) -> sigma (..., 3, 3)."""
        import jax

        x = F.reshape(*F.shape[:-2], 9)
        x = x @ params["w1"] + params["b1"]
        if self.non_linear:
            x = jax.nn.relu(x)
        x = x @ params["w2"] + params["b2"]
        if self.non_linear:
            x = jax.nn.relu(x)
        x = x @ params["w3"] + params["b3"]
        x = jnp.tanh(x) * self.stress_scale
        return x.reshape(*F.shape[:-2], 3, 3)

    def stress_fn(self, params):
        return lambda F: self.stress(params, F)

    def jacobian_F(self, params, dtype=jnp.float64):
        """9x9 elasticity tensor d(sigma)/d(F) at F = 0 (parity:
        diff_model.py:45-48 jacobian_F)."""
        import jax

        flat = lambda f9: self.stress(
            params, f9.reshape(3, 3).astype(dtype)
        ).reshape(9)
        return jax.jacobian(flat)(jnp.zeros(9, dtype))
