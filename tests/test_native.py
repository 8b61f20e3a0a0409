"""Native C++ geometry kernels vs pure-Python fallbacks."""

import numpy as np
import pytest

from oai_analysis_2_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if native._load() is None:
        pytest.skip("native library unavailable (no compiler)")


class TestNative:
    def test_connected_components_matches_scipy(self, lib_available):
        rng = np.random.default_rng(0)
        # several disjoint triangle strips
        faces = []
        offset = 0
        for comp in range(4):
            n = rng.integers(3, 12)
            for i in range(n):
                faces.append([offset + i, offset + i + 1, offset + i + 2])
            offset += n + 2
        faces = np.array(faces, np.int32)
        n_points = offset

        got = native.connected_components(n_points, faces)

        from scipy import sparse
        from scipy.sparse.csgraph import connected_components as cc

        rows = faces[:, [0, 1, 2]].reshape(-1)
        cols = faces[:, [1, 2, 0]].reshape(-1)
        g = sparse.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_points, n_points))
        _, expect = cc(g, directed=False)

        # same partition (labels may be permuted)
        for comp in np.unique(expect):
            vals = np.unique(got[expect == comp])
            assert len(vals) == 1

    def test_mesh_edges_matches_numpy(self, lib_available):
        faces = np.array([[0, 1, 2], [2, 1, 3], [3, 4, 2]], np.int32)
        edges, boundary = native.mesh_edges(faces)

        f = faces.astype(np.int64)
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
        und = np.sort(e, axis=1)
        uniq, counts = np.unique(und, axis=0, return_counts=True)

        got_sorted = edges[np.lexsort((edges[:, 1], edges[:, 0]))]
        np.testing.assert_array_equal(np.sort(got_sorted, axis=1), uniq)
        assert boundary.sum() == (counts == 1).sum()
