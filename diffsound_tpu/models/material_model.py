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
        (E, nu) before inference starts.  Adam projection (exact=False):
        the exact two-bin placement would leave every other logit at -18
        where softplus gradients are ~1e-8 — a FROZEN init for the
        gradient recipes that train from here."""
        return self.fit_to(params, self.mat.youngs, self.mat.poisson,
                           steps=steps, lr=lr, exact=False)

    def exact_logits(self, target: float, values: np.ndarray, dtype):
        """Closed-form logits whose softplus-normalized convex combination
        equals `target` exactly: weight split between the two bracketing
        bins, every other bin at softplus(-18) ~ 1.5e-8.

        Adam-based projection systematically overshoots values near the
        low end of a log-spaced bin range (residual softplus weight on
        the large bins biases the average up — measured +55% for a
        target at bin 2 of 16 spanning 2 decades, the round-2 pair-0
        failure)."""
        v = np.asarray(values, np.float64)
        n = len(v)
        t = float(np.clip(target, v.min(), v.max()))
        if n == 1:
            return jnp.asarray([0.0], dtype)
        i = int(np.clip(np.searchsorted(v, t) - 1, 0, n - 2))
        floor = 1.5e-8  # softplus(-18)
        w = np.full(n, floor)
        # solve a v_i + b v_{i+1} = t - S with a + b = 1 - F, where F/S are
        # the floor bins' total weight/value mass (weights sum to 1, so the
        # softplus normalization is the identity)
        F = floor * (n - 2)
        S = floor * (float(np.sum(v)) - v[i] - v[i + 1])
        a = ((1.0 - F) * v[i + 1] - (t - S)) / (v[i + 1] - v[i])
        a = float(np.clip(a, floor, 1.0 - F - floor))
        w[i], w[i + 1] = a, (1.0 - F) - a
        logits = np.log(np.expm1(np.maximum(w, 1e-12)))
        return jnp.asarray(logits, dtype)

    def fit_to(self, params, youngs: float, poisson: float,
               steps: int = 300, lr: float = 2e-3, exact: bool = True):
        """Project explicit (E, nu) values onto the bin logits.

        exact=True (the modal-Newton handoff): closed-form two-bin
        placement, then a short Adam polish — representation error
        ~1e-7 relative.  exact=False (gradient-recipe inits): Adam-only
        from the incoming logits, which keeps every bin's logit in the
        responsive range for later training (placement accuracy ~1%,
        biased high near the low end of log-spaced ranges)."""
        import optax

        if exact:
            dtype = params["youngs_logits"].dtype
            params = dict(params)
            params["youngs_logits"] = self.exact_logits(
                youngs, self.youngs_values, dtype
            )
            if self.learn_poisson:
                params["poisson_logits"] = self.exact_logits(
                    poisson, self.poisson_values, dtype
                )
        gt_y, gt_p = youngs, poisson
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
