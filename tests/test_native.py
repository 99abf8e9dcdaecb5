"""Native C++ mesh ops vs numpy fallbacks — same results either way."""

import numpy as np
import pytest

from diffsound_tpu.fem.mesh import cube_tet_mesh
from diffsound_tpu.native import meshops


def test_native_builds():
    assert meshops.native_available(), "g++ build of meshops failed"


def test_unique_edges_matches_numpy():
    mesh = cube_tet_mesh(3)
    edges_n, ids_n = meshops.unique_edges(mesh.tets)
    # numpy reference
    pairs = mesh.tets[:, [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]]].reshape(-1, 2)
    pairs = np.sort(pairs, axis=1)
    uniq = np.unique(pairs, axis=0)
    assert len(edges_n) == len(uniq)
    # same edge set (native is first-seen order, reference sorted)
    assert set(map(tuple, edges_n)) == set(map(tuple, uniq))
    # ids consistent: the edge each id points at matches the tet's pair
    for t in range(0, mesh.num_tets, 7):
        for e, (a, b) in enumerate([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]):
            va, vb = sorted((mesh.tets[t, a], mesh.tets[t, b]))
            assert tuple(edges_n[ids_n[t, e]]) == (va, vb)


def test_promote_order2_matches_tetmesh():
    mesh = cube_tet_mesh(2)
    ref = mesh.to_high_order(2)
    res = meshops.promote_order2(mesh.vertices, mesh.tets)
    assert res is not None
    verts10, tets10 = res
    assert verts10.shape == ref.vertices.shape
    assert tets10.shape == ref.tets.shape
    # same geometry: corner columns identical, midpoints at same coords
    np.testing.assert_array_equal(tets10[:, [0, 2, 4, 9]], ref.tets[:, [0, 2, 4, 9]])
    np.testing.assert_allclose(
        verts10[tets10[:, 1]], ref.vertices[ref.tets[:, 1]], atol=1e-15
    )
    np.testing.assert_allclose(
        verts10[tets10[:, 8]], ref.vertices[ref.tets[:, 8]], atol=1e-15
    )


def test_connected_components():
    a = cube_tet_mesh(1)
    b = cube_tet_mesh(2)
    verts = np.concatenate([a.vertices, b.vertices + 5.0])
    tets = np.concatenate([a.tets, b.tets + a.num_vertices])
    n, labels = meshops.connected_components(tets, len(verts))
    assert n == 2
    assert len(np.unique(labels[: a.num_vertices])) == 1
    assert len(np.unique(labels[a.num_vertices :])) == 1


def test_compact_tets_matches_numpy():
    mesh = cube_tet_mesh(3)
    rng = np.random.default_rng(0)
    mask = rng.random(mesh.num_tets) < 0.5
    keep, tc = meshops.compact_tets(mesh.tets.astype(np.int32), mask)
    valid = mesh.tets[mask]
    used, inv = np.unique(valid.reshape(-1), return_inverse=True)
    np.testing.assert_array_equal(keep, used)
    np.testing.assert_array_equal(tc, inv.reshape(-1, 4))


def test_face_connected_components():
    """Shared face = one body; shared vertex or edge only = separate
    (mechanical hinge) components."""
    from diffsound_tpu.native.meshops import face_connected_components
    import numpy as np

    # two tets sharing face (0,1,2)
    tets = np.array([[0, 1, 2, 3], [0, 1, 2, 4]])
    n, lab = face_connected_components(tets)
    assert n == 1 and lab[0] == lab[1]

    # two tets sharing only vertex 0
    tets = np.array([[0, 1, 2, 3], [0, 4, 5, 6]])
    n, lab = face_connected_components(tets)
    assert n == 2 and lab[0] != lab[1]

    # two tets sharing only edge (0, 1)
    tets = np.array([[0, 1, 2, 3], [0, 1, 4, 5]])
    n, lab = face_connected_components(tets)
    assert n == 2 and lab[0] != lab[1]
