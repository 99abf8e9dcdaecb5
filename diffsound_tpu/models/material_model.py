"""Trainable material parameterization: bin-weighted Young's modulus and
Poisson ratio.

Equivalent of the reference's `TrainableLinear`
(/root/reference/src/diffelastic/diff_model.py:51-96): E is a softplus-
weighted convex combination over 16 log-spaced bins spanning [E0/10,
E0*10]; nu over 16 linear bins in [0.01, 0.499], or a single frozen bin in
the "mat_baseline" ablation.  `pretrain` reproduces
`init_material_coeffs` (diff_model.py:154-179) as a scan-jitted Adam loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.oscillator import weighted_value
from ..fem.material import Material, lame_params


@dataclass(frozen=True)
class MaterialBins:
    mat: Material
    bin_num: int = 16
    learn_poisson: bool = True
    youngs_values: np.ndarray = field(default=None)
    poisson_values: np.ndarray = field(default=None)

    def __post_init__(self):
        yv = np.exp(
            np.linspace(
                np.log(self.mat.youngs / 10), np.log(self.mat.youngs * 10), self.bin_num
            )
        )
        pv = (
            np.linspace(0.01, 0.499, self.bin_num)
            if self.learn_poisson
            else np.asarray([self.mat.poisson])
        )
        object.__setattr__(self, "youngs_values", yv)
        object.__setattr__(self, "poisson_values", pv)

    def init_params(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "youngs_logits": jax.random.uniform(
                k1, (self.bin_num,), dtype, -1.0, 1.0
            ),
            "poisson_logits": jax.random.uniform(
                k2, (len(self.poisson_values),), dtype, -1.0, 1.0
            ),
        }

    def youngs(self, params):
        return weighted_value(
            params["youngs_logits"],
            jnp.asarray(self.youngs_values, params["youngs_logits"].dtype),
        )

    def poisson(self, params):
        return weighted_value(
            params["poisson_logits"],
            jnp.asarray(self.poisson_values, params["poisson_logits"].dtype),
        )

    def lame(self, params, density_normalized: bool = True):
        """(mu, lambda); by default nondimensionalized by density (E/rho)
        so f32 assembly on TPU stays well-scaled — eigenvalues of
        (K/rho, M/rho) equal those of (K, M)."""
        E = self.youngs(params)
        nu = self.poisson(params)
        if density_normalized:
            E = E / self.mat.density
        return lame_params(E, nu)

    def trainable_keys(self):
        return (
            ("youngs_logits", "poisson_logits")
            if self.learn_poisson
            else ("youngs_logits",)
        )

    def mask_grads(self, grads):
        """Zero the gradients of frozen parameters (the reference passes
        only `youngs` to Adam in the mat_baseline ablation,
        diff_model.py:149-150).  Without this, Adam amplifies the ~0
        numerical-noise gradient on the frozen single-bin poisson logit
        into full-learning-rate random-walk steps."""
        keys = self.trainable_keys()
        import jax.numpy as _jnp

        return {
            k: (v if k in keys else _jnp.zeros_like(v)) for k, v in grads.items()
        }

    def pretrain(self, params, steps: int = 5000, lr: float = 5e-3):
        """Fit the bin logits so the weighted values hit the table's
        (E, nu) before inference starts."""
        import optax

        gt_y, gt_p = self.mat.youngs, self.mat.poisson
        opt = optax.adam(lr)

        def loss_fn(p):
            ly = (self.youngs(p) - gt_y) ** 2 / gt_y**2
            lp = (self.poisson(p) - gt_p) ** 2 / gt_p**2
            return ly + lp

        @jax.jit
        def run(p):
            state = opt.init(p)

            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p)
                updates, s = opt.update(g, s)
                return (optax.apply_updates(p, updates), s), None

            (p, _), _ = jax.lax.scan(step, (p, state), None, length=steps)
            return p

        return run(params)
