"""BEM acoustic transfer validated against the analytic pulsating sphere:
a sphere with uniform radial velocity v radiates

    p(r) = rho c v (ka / (ka + i)) * (a / r) * e^{ik(r - a)}

(time convention e^{-i omega t}, G = e^{ikr}/4 pi r)."""

import numpy as np
import pytest

from diffsound_tpu.acoustics.bem import AIR_DENSITY, BEMModel, SPEED_OF_SOUND
from tests.test_geometry import icosphere


def test_pulsating_sphere_magnitude():
    a = 0.1  # 10 cm sphere
    freq = 1000.0
    k = 2 * np.pi * freq / SPEED_OF_SOUND
    verts, faces = icosphere(3, radius=a)

    model = BEMModel(verts, faces, freq)
    # outward normals for an origin-centered sphere point along +r;
    # uniform radial velocity v -> dp/dn = -rho * dv/dt = i omega rho v
    v = 1.0
    omega = 2 * np.pi * freq
    psi = 1j * omega * AIR_DENSITY * v * np.ones(len(faces))
    model.boundary_equation_solve(psi)

    r_eval = 1.0
    pts = np.array([[r_eval, 0, 0], [0, r_eval, 0], [0, 0, r_eval]])
    p = np.asarray(model.potential_solve(pts))

    ka = k * a
    p_exact = (
        AIR_DENSITY * SPEED_OF_SOUND * v
        * (ka / np.sqrt(1 + ka**2))
        * (a / r_eval)
    )
    # centroid-quadrature BEM on icosphere(3): expect ~10% accuracy
    rel = np.abs(np.abs(p) - p_exact) / p_exact
    assert np.all(rel < 0.15), (np.abs(p), p_exact)
    # all three directions agree (spherical symmetry)
    assert np.std(np.abs(p)) / np.mean(np.abs(p)) < 0.02


def test_farfield_decay():
    verts, faces = icosphere(2, radius=0.1)
    model = BEMModel(verts, faces, 500.0)
    psi = np.ones(len(faces)) * 1j
    model.boundary_equation_solve(psi)
    p1 = np.abs(np.asarray(model.potential_solve(np.array([[1.0, 0, 0]]))))[0]
    p2 = np.abs(np.asarray(model.potential_solve(np.array([[2.0, 0, 0]]))))[0]
    assert abs(p1 / p2 - 2.0) < 0.1  # 1/r decay
