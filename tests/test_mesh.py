"""Mesh subsystem tests: marching tetrahedra phantoms, components, smoothing,
exact point-triangle distance, attribute transfer, clustering, projection."""

import numpy as np
import pytest

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.mesh.components import extract_faces, filter_small_components
from oai_analysis_2_tpu.mesh.marching import marching_tetrahedra
from oai_analysis_2_tpu.mesh.ops import (
    distance_to_surface,
    face_centroids,
    face_normals,
    get_distance,
    map_attributes,
    smooth_mesh,
)
from oai_analysis_2_tpu.mesh.types import Mesh
from oai_analysis_2_tpu.ops.clustering import kmeans
from oai_analysis_2_tpu.ops.decomposition import compute_least_square_circle, linear_kpca


def _ball_volume(n=24, r=8.0, center=None):
    c = center or (n / 2, n / 2, n / 2)
    x, y, z = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    d = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
    return np.clip(1.0 - (d - r), 0.0, 1.0).astype(np.float32)  # smooth step at r


def _edge_counts(mesh):
    e = np.concatenate(
        [mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]], axis=0
    )
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


class TestMarchingTetrahedra:
    def test_sphere_watertight_euler_area(self):
        vol = _ball_volume()
        mesh = marching_tetrahedra(vol, level=0.5)
        assert mesh.n_cells > 100
        counts = _edge_counts(mesh)
        assert np.all(counts == 2), "surface must be watertight"
        v, f = mesh.n_points, mesh.n_cells
        e = len(counts)
        assert v - e + f == 2, "sphere Euler characteristic"
        tri = mesh.triangles()
        areas = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
        )
        r = 8.5  # level 0.5 of the smooth step sits at d = r + 0.5
        assert abs(areas.sum() - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.05

    def test_orientation_ascent(self):
        """Normals must point toward higher values (into the object) —
        the reference's gradient_direction='ascent' (mesh_processing.py:333)."""
        vol = _ball_volume()
        mesh = marching_tetrahedra(vol, level=0.5)
        center = np.array([12.0, 12.0, 12.0])
        normals = face_normals(mesh)
        centroids = face_centroids(mesh)
        inward = np.sum(normals * (center - centroids), axis=1)
        assert (inward > 0).mean() > 0.99

    def test_spacing_scales_coordinates(self):
        vol = _ball_volume(16, r=5, center=(8, 8, 8))
        m1 = marching_tetrahedra(vol, 0.5, spacing=(1, 1, 1))
        m2 = marching_tetrahedra(vol, 0.5, spacing=(2.0, 1.0, 0.5))
        np.testing.assert_allclose(
            m2.vertices, m1.vertices * np.array([2.0, 1.0, 0.5]), atol=1e-5
        )

    def test_empty_when_no_crossing(self):
        mesh = marching_tetrahedra(np.zeros((5, 5, 5), np.float32), 0.5)
        assert mesh.n_cells == 0


class TestComponents:
    def test_filter_small_components(self):
        n = 40
        vol = _ball_volume(n, r=10, center=(15, 15, 15))
        vol2 = _ball_volume(n, r=2.5, center=(33, 33, 33))
        mesh = marching_tetrahedra(np.maximum(vol, vol2), 0.5)
        big_only = filter_small_components(mesh, filter_threshold=1000)
        assert 0 < big_only.n_cells < mesh.n_cells
        # all kept faces belong to the big sphere (centroids near its center)
        c = face_centroids(big_only)
        assert np.all(np.linalg.norm(c - np.array([15, 15, 15]), axis=1) < 14)

    def test_extract_faces_reindexes(self):
        mesh = Mesh(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32),
            np.array([[0, 1, 2], [1, 2, 3]], np.int32),
        )
        sub = extract_faces(mesh, [0])
        assert sub.n_points == 3 and sub.n_cells == 1
        np.testing.assert_array_equal(sub.vertices, mesh.vertices[:3])


class TestSmoothing:
    def test_smoothing_reduces_roughness(self):
        rng = np.random.default_rng(0)
        vol = _ball_volume()
        mesh = marching_tetrahedra(vol, 0.5)
        noisy = mesh.copy()
        noisy.vertices = mesh.vertices + rng.normal(0, 0.15, mesh.vertices.shape).astype(
            np.float32
        )
        sm = smooth_mesh(noisy, num_iterations=150)
        center = noisy.vertices.mean(axis=0)

        def roughness(m):
            r = np.linalg.norm(m.vertices - center, axis=1)
            return r.std()

        assert roughness(sm) < roughness(noisy)
        # volume preserved approximately (no collapse)
        assert np.ptp(sm.vertices[:, 0]) > 0.8 * np.ptp(noisy.vertices[:, 0])

    def test_tiered_matches_uniform_table(self):
        """The degree-tiered gather layout (production fast path) must
        reproduce the uniform-K table loop bit-for-bit up to f32 sum
        reordering: same edges, same degrees, same update rule."""
        import jax.numpy as jnp

        from oai_analysis_2_tpu.mesh import ops as mops

        vol = _ball_volume()
        mesh = marching_tetrahedra(vol, 0.5)
        deg = np.bincount(
            mops._adjacency(mesh)[0], minlength=mesh.n_points
        )
        assert (deg > mops._K_LOW).any(), "phantom must exercise the high tier"

        sm = smooth_mesh(mesh, num_iterations=50)  # tiered path

        src, dst, _ = mops._adjacency(mesh)
        nv = mops.bucket_size(mesh.n_points + 1)
        tbl, _degp = mops._neighbor_table(src.astype(np.int64), dst, nv, nv - 1)
        ref = np.asarray(
            mops._smooth_loop(
                jnp.asarray(mops.pad_rows(mesh.vertices, nv)),
                jnp.asarray(tbl),
                50,
                jnp.float32(0.01),
            )
        )[: mesh.n_points]
        np.testing.assert_allclose(sm.vertices, ref, rtol=0, atol=2e-4)

    def test_tiered_slots_layout(self):
        from oai_analysis_2_tpu.mesh.ops import _tiered_slots

        deg = np.array([6, 11, 6, 6, 9, 6], np.int64)
        out = _tiered_slots(deg, 256)
        assert out is not None
        slots, n8p = out
        assert n8p == 256 - 8
        # low-degree vertices pack from 0, high-degree from n8p; all unique
        assert sorted(slots[[0, 2, 3, 5]]) == [0, 1, 2, 3]
        assert sorted(slots[[1, 4]]) == [n8p, n8p + 1]
        # a bucket too tight for the split falls back to the uniform table
        assert _tiered_slots(np.full(250, 6, np.int64), 256) is None


class TestDistance:
    def _plane(self, z, n=8, offset=0.0):
        xs, ys = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32))
        verts = np.stack([xs.ravel() + offset, ys.ravel(), np.full(n * n, z, np.float32)], 1)
        faces = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                faces.append([a, a + 1, a + n])
                faces.append([a + 1, a + n + 1, a + n])
        return Mesh(verts, np.array(faces, np.int32))

    def test_parallel_planes(self):
        inner = self._plane(0.0)
        outer = self._plane(3.0)
        di, do = get_distance(inner, outer)
        np.testing.assert_allclose(di.point_data, 3.0, atol=1e-5)
        np.testing.assert_allclose(do.point_data, 3.0, atol=1e-5)

    def test_point_to_triangle_regions(self):
        tri = Mesh(
            np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32),
            np.array([[0, 1, 2]], np.int32),
        )
        pts = np.array(
            [
                [0.5, 0.5, 1.0],  # above interior -> plane distance 1
                [3.0, 0.0, 0.0],  # beyond vertex (2,0,0) -> distance 1
                [1.0, -2.0, 0.0],  # below edge y=0 -> distance 2
                [0.5, 0.5, 0.0],  # on the triangle -> 0
            ],
            np.float32,
        )
        d = distance_to_surface(pts, tri)
        np.testing.assert_allclose(d, [1.0, 1.0, 2.0, 0.0], atol=1e-5)

    def test_second_distance_differs(self):
        inner = self._plane(0.0, n=4)
        outer = self._plane(5.0, n=12, offset=-4.0)
        di, do = get_distance(inner, outer)
        assert np.allclose(di.point_data, 5.0, atol=1e-4)
        assert do.point_data.max() > 5.0  # far plane points see slanted distance


class TestMapAttributes:
    def test_nearest_neighbor_transfer(self):
        src = Mesh(
            np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32),
            np.array([[0, 1, 2]], np.int32),
            point_data=np.array([1.0, 2.0, 3.0], np.float32),
        )
        tgt = Mesh(
            np.array([[0.1, 0, 0], [9.5, 0.2, 0], [0, 9.9, 0.3]], np.float32),
            np.array([[0, 1, 2]], np.int32),
        )
        out = map_attributes(src, tgt)
        np.testing.assert_allclose(out.point_data, [1.0, 2.0, 3.0])


class TestClustering:
    def test_two_blobs(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.3, (50, 3))
        b = rng.normal(5, 0.3, (40, 3))
        labels, centers = kmeans(np.concatenate([a, b]), k=2)
        assert len(np.unique(labels[:50])) == 1
        assert len(np.unique(labels[50:])) == 1
        assert labels[0] != labels[-1]

    def test_host_backend_matches_device(self):
        """The default host (numpy) path and the jitted device path implement
        the same algorithm (same farthest-point init + Lloyd fixpoint), so
        their partitions must agree up to label permutation — including on
        k>2 and on features wider than the split call sites use."""
        from oai_analysis_2_tpu.ops.clustering import kmeans_many

        rng = np.random.default_rng(7)
        problems = []
        for i, (n, k_blobs) in enumerate([(300, 2), (1111, 3), (64, 2)]):
            cents = rng.normal(0, 8, (k_blobs, 4))
            pts = np.concatenate(
                [rng.normal(c, 0.4, (n // k_blobs + 1, 4)) for c in cents]
            ).astype(np.float32)
            problems.append(pts[:n])
        for k in (2, 3):
            host = kmeans_many(problems, k=k, backend="host")
            dev = kmeans_many(problems, k=k, backend="device")
            for h, d in zip(host, dev):
                # agreement up to a permutation of the k labels
                best = 0.0
                import itertools

                for perm in itertools.permutations(range(k)):
                    remap = np.asarray(perm)[np.asarray(d)]
                    best = max(best, float(np.mean(np.asarray(h) == remap)))
                assert best > 0.99, best

    def test_host_early_exit_is_fixpoint(self):
        """Early exit fires only when labels repeat, i.e. at the Lloyd
        fixpoint — so a longer fixed schedule must return the same labels."""
        from oai_analysis_2_tpu.ops.clustering import _kmeans_np

        rng = np.random.default_rng(3)
        x = np.concatenate(
            [rng.normal(0, 0.5, (400, 6)), rng.normal(4, 0.5, (500, 6))]
        ).astype(np.float32)
        l50, c50 = _kmeans_np(x, 2, 50)
        l500, c500 = _kmeans_np(x, 2, 500)
        np.testing.assert_array_equal(l50, l500)
        np.testing.assert_allclose(c50, c500, rtol=0, atol=0)


class TestDecomposition:
    def test_circle_fit(self):
        rng = np.random.default_rng(1)
        t = rng.uniform(0, 2 * np.pi, 200)
        x = 3.0 + 5.0 * np.cos(t) + rng.normal(0, 0.01, 200)
        y = -2.0 + 5.0 * np.sin(t) + rng.normal(0, 0.01, 200)
        center, r = compute_least_square_circle(x, y)
        np.testing.assert_allclose(center, [3.0, -2.0], atol=0.01)
        assert abs(r - 5.0) < 0.01

    def test_linear_kpca_matches_pca(self):
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (100, 3)) @ np.diag([5.0, 2.0, 0.1])
        scores = linear_kpca(x, 2)
        # variance ordering + centered + orthogonal components
        assert scores[:, 0].var() > scores[:, 1].var()
        np.testing.assert_allclose(scores.mean(axis=0), 0, atol=1e-4)
        corr = np.corrcoef(scores[:, 0], scores[:, 1])[0, 1]
        assert abs(corr) < 0.05


class TestThicknessEndToEnd:
    def test_slab_thickness(self):
        """A 4-voxel-thick slab: inner/outer split + distance ~ 4."""
        from oai_analysis_2_tpu.mesh.processing import get_thickness_mesh

        # large enough that each slab face clears the reference's 3000-cell
        # component filter with MC extraction (2 tris/cube, vs tets' 4)
        vol = np.zeros((44, 44, 44), np.float32)
        vol[:, :, 20:24] = 1.0  # slab normal to z (array is z,y,x -> slab in x!)
        img = image_from_array(vol)
        inner, outer = get_thickness_mesh(img, mesh_type="TC", num_iterations=20)
        assert inner.n_points > 50 and outer.n_points > 50
        d = np.concatenate([inner.point_data, outer.point_data])
        assert 3.0 < np.median(d) < 5.0


class TestBatchedThickness:
    def test_union_smoothing_matches_individual(self):
        from oai_analysis_2_tpu.mesh.ops import smooth_mesh, smooth_meshes

        vol1 = _ball_volume(20, r=6, center=(10, 10, 10))
        vol2 = _ball_volume(16, r=5, center=(8, 8, 8))
        m1 = marching_tetrahedra(vol1, 0.5)
        m2 = marching_tetrahedra(vol2, 0.5)
        joint = smooth_meshes([m1, m2], num_iterations=30)
        solo1 = smooth_mesh(m1, num_iterations=30)
        solo2 = smooth_mesh(m2, num_iterations=30)
        np.testing.assert_allclose(joint[0].vertices, solo1.vertices, atol=1e-4)
        np.testing.assert_allclose(joint[1].vertices, solo2.vertices, atol=1e-4)

    def test_split_meshes_matches_per_mesh(self):
        """The batched split (one kmeans_many device program for every
        tissue) must reproduce per-mesh split_mesh exactly — padding to the
        shared bucket/feature width is arithmetic-neutral."""
        from oai_analysis_2_tpu.mesh.split import _split_problems, split_meshes
        from oai_analysis_2_tpu.ops.clustering import kmeans

        vol1 = _ball_volume(24, r=8, center=(12, 12, 12))
        vol2 = np.zeros((30, 30, 30), np.float32)
        vol2[:, :, 12:16] = 1.0
        meshes = [marching_tetrahedra(vol1, 0.5), marching_tetrahedra(vol2, 0.5)]
        types = ["FC", "TC"]
        batched = split_meshes(meshes, types)
        for mesh, t, (bi, bo) in zip(meshes, types, batched):
            problems, finish = _split_problems(mesh, t)
            si, so = finish([kmeans(p, k=2)[0] for p in problems])
            np.testing.assert_array_equal(bi.vertices, si.vertices)
            np.testing.assert_array_equal(bo.faces, so.faces)

    def test_marching_cubes_multi_device_placement(self):
        """marching_cubes_multi(devices=...) (per-knee chip placement in the
        cohort batch) must produce the same meshes as the packed
        single-device path, including empty maps."""
        import jax
        import jax.numpy as jnp

        from oai_analysis_2_tpu.mesh.marching_cubes import marching_cubes_multi

        vols_np = [
            _ball_volume(24, r=8, center=(12, 12, 12)),
            _ball_volume(24, r=6, center=(10, 12, 14)),
            np.zeros((24, 24, 24), np.float32),
            _ball_volume(24, r=9, center=(12, 10, 12)),
        ]
        vols = [jnp.asarray(v) for v in vols_np]
        want = marching_cubes_multi(vols, level=0.5, spacing=(0.7, 1.0, 1.3))
        devs = [jax.devices()[i % min(4, len(jax.devices()))] for i in range(4)]
        got = marching_cubes_multi(
            vols, level=0.5, spacing=(0.7, 1.0, 1.3), devices=devs)
        assert len(got) == len(want) == 4
        assert got[2].n_points == 0
        for g, w in zip(got, want):
            np.testing.assert_allclose(g.vertices, w.vertices, atol=1e-5)
            np.testing.assert_array_equal(g.faces, w.faces)

    def test_grouped_smoothing_matches_individual(self):
        """smooth_mesh_groups (the vmapped per-knee stacked loop, sharded
        over the data axis in the cohort batch) must match per-mesh
        smooth_mesh up to f32 sum reordering — with and without an actual
        8-device sharding."""
        import jax
        from jax.sharding import Mesh as JMesh
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from oai_analysis_2_tpu.mesh.ops import smooth_mesh, smooth_mesh_groups

        vols = [
            _ball_volume(20, r=6, center=(10, 10, 10)),
            _ball_volume(16, r=5, center=(8, 8, 8)),
            _ball_volume(18, r=6, center=(9, 9, 9)),
            _ball_volume(22, r=7, center=(11, 11, 11)),
        ]
        meshes = [marching_tetrahedra(v, 0.5) for v in vols]
        groups = [meshes[:2], meshes[2:]]
        solos = [smooth_mesh(m, num_iterations=30) for m in meshes]

        for sharding in (
            None,
            NamedSharding(JMesh(np.array(jax.devices()[:2]), ("data",)), P("data")),
        ):
            out = smooth_mesh_groups(groups, num_iterations=30, sharding=sharding)
            flat = [m for g in out for m in g]
            assert len(flat) == 4
            for got, want in zip(flat, solos):
                np.testing.assert_allclose(got.vertices, want.vertices, atol=2e-4)

    def test_distance_devices_parity(self):
        """distance_to_surface_async placed on a non-default device (the
        knee-parallel batch form) must return the same distances, and the
        packed sync must handle mixed-device pending lists."""
        import jax

        from oai_analysis_2_tpu.mesh.ops import (
            _sync_distances,
            distance_to_surface,
            distance_to_surface_async,
        )

        a = marching_tetrahedra(_ball_volume(18, r=6, center=(9, 9, 9)), 0.5)
        b = marching_tetrahedra(_ball_volume(18, r=4, center=(9, 9, 9)), 0.5)
        want = distance_to_surface(a.vertices, b)

        devs = jax.devices()
        pendings = [
            distance_to_surface_async(a.vertices, b, device=devs[i % len(devs)])
            for i in range(4)
        ]
        outs = _sync_distances(pendings, [a.n_points] * 4)
        for got in outs:
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_grouped_smoothing_empty_group_member(self):
        from oai_analysis_2_tpu.mesh.ops import smooth_mesh_groups
        from oai_analysis_2_tpu.mesh.types import Mesh

        empty = Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
        m = marching_tetrahedra(_ball_volume(16, r=5, center=(8, 8, 8)), 0.5)
        out = smooth_mesh_groups([[m, empty], [empty, empty]], num_iterations=10)
        assert out[0][1].n_points == 0 and out[1][0].n_points == 0
        assert out[0][0].n_points == m.n_points

    def test_get_thickness_meshes_batch(self):
        from oai_analysis_2_tpu.mesh.processing import get_thickness_meshes

        vol = np.zeros((44, 44, 44), np.float32)
        vol[:, :, 20:24] = 1.0  # large enough for the 3000-cell filter at MC density
        img = image_from_array(vol)
        results = get_thickness_meshes([img, img], ["TC", "TC"], num_iterations=20)
        assert len(results) == 2
        (i1, o1), (i2, o2) = results
        assert i1.n_points > 50
        np.testing.assert_allclose(i1.point_data, i2.point_data, atol=1e-5)


class TestDeviceHostMarchingParity:
    def test_device_path_matches_host(self):
        """The device emission orders vertices by sorted (lo, hi) edge key —
        the same order as the host np.unique path — so outputs must match
        exactly."""
        import jax.numpy as jnp

        vol = _ball_volume(20, r=6)
        host = marching_tetrahedra(vol, 0.5, spacing=(0.5, 1.0, 2.0))
        for emission in (False, True):
            dev = marching_tetrahedra(
                jnp.asarray(vol), 0.5, spacing=(0.5, 1.0, 2.0),
                device_emission=emission,
            )
            assert dev.n_points == host.n_points
            assert dev.n_cells == host.n_cells
            np.testing.assert_allclose(dev.vertices, host.vertices, atol=1e-5)
            np.testing.assert_array_equal(dev.faces, host.faces)


class TestRasterize:
    def test_rasterize_thickness(self):
        from oai_analysis_2_tpu.mesh.projection import rasterize_thickness

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, 500)
        y = rng.uniform(0, 2, 500)
        th = 2.0 * np.ones(500)
        mean, counts, bounds = rasterize_thickness(x, y, th, grid_size=(16, 16))
        assert mean.shape == (16, 16)
        assert counts.sum() == 500
        filled = mean[counts > 0]
        np.testing.assert_allclose(filled, 2.0, atol=1e-6)


def _cap_shell_volume(shape_zyx, r_in, r_out, center=None, aspect_z=2.0):
    """Curved cartilage-like cap shell (cf. bench.py's _shell_probmap):
    probability ~1 between two radii, upper polar cap only."""
    d, h, w = shape_zyx
    c = center or (d * 0.5, h * 0.55, w * 0.5)
    z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape_zyx],
                          indexing="ij")
    rr = np.sqrt(((z - c[0]) * aspect_z) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
    mid, half = (r_in + r_out) / 2.0, (r_out - r_in) / 2.0
    shell = np.clip(1.0 - np.abs(rr - mid) / half, 0.0, 1.0)
    return (shell * (y < c[1])).astype(np.float32)


class TestAtlas2DThicknessMap:
    """The FullDemo cells 9-12 chain end-to-end on phantoms: subject
    thickness mesh -> closest-point transfer onto an atlas mesh
    (map_attributes) -> 2D unrolling (project_thickness) -> common raster
    (rasterize_thickness), with the output raster's statistics pinned."""

    def test_fc_chain_raster_statistics(self):
        from oai_analysis_2_tpu.mesh.processing import (
            get_mesh,
            get_thickness_mesh,
            map_attributes,
            project_thickness,
            rasterize_thickness,
            split_mesh,
        )

        shape = (48, 96, 96)
        subject = image_from_array(_cap_shell_volume(shape, 28.0, 35.0))
        atlas = image_from_array(
            _cap_shell_volume(shape, 28.0, 35.0, center=(26, 55, 50))
        )

        inner, _outer = get_thickness_mesh(subject, mesh_type="FC", num_iterations=30)
        assert inner.n_points > 300
        atlas_inner, _ = split_mesh(get_mesh(atlas, num_iterations=30), mesh_type="FC")
        mapped = map_attributes(inner, atlas_inner)

        x2d, y2d, th = project_thickness(mapped, mesh_type="FC")
        mean_map, counts, bounds = rasterize_thickness(x2d, y2d, th, grid_size=(64, 64))

        # every projected point lands in exactly one cell
        assert counts.sum() == mapped.n_points == len(th)
        # the unrolled cap fills a plausible band of the raster: neither a
        # degenerate point-pile nor the whole grid
        coverage = float((counts > 0).mean())
        assert 0.05 < coverage < 0.9, coverage
        # rasterization is a binned mean: the raster's point-weighted mean
        # IS the projected thickness mean, and the cell-mean is close to it
        filled = mean_map[counts > 0]
        w_mean = float((mean_map * counts).sum() / counts.sum())
        np.testing.assert_allclose(w_mean, float(th.mean()), rtol=1e-6)
        assert abs(float(filled.mean()) - float(th.mean())) < 0.35 * float(th.mean())
        # physical plausibility: the 0.5-isosurface pair of this shell profile
        # sits ~half-width apart (3.5 vox * 0.5 * 2 sides), aspect-stretched
        # in z — pin the band, not the exact value
        assert 1.2 < float(np.median(th)) < 4.2, float(np.median(th))
        # transfer fidelity: the atlas-mapped distribution tracks the
        # subject's own thickness distribution
        subj_med = float(np.median(np.asarray(inner.point_data)))
        assert abs(float(np.median(th)) - subj_med) < 0.3 * subj_med

    def test_tc_chain_straddles_plateau_split(self):
        """TC projection splits plateaus at z=50 (mesh_processing.py:510-514)
        — a shell whose z-extent straddles 50 must produce both plateaus and
        a finite raster."""
        from oai_analysis_2_tpu.mesh.processing import (
            get_mesh,
            get_thickness_mesh,
            map_attributes,
            project_thickness,
            rasterize_thickness,
            split_mesh,
        )

        shape = (64, 64, 64)  # z-extent 0..96 at spacing 1.5 straddles 50
        spacing = (1.0, 1.0, 1.5)
        subject = image_from_array(
            _cap_shell_volume(shape, 20.0, 26.0, aspect_z=1.0), spacing=spacing
        )
        atlas = image_from_array(
            _cap_shell_volume(shape, 20.0, 26.0, center=(33, 36, 33), aspect_z=1.0),
            spacing=spacing,
        )
        inner, _ = get_thickness_mesh(subject, mesh_type="TC", num_iterations=30)
        atlas_inner, _ = split_mesh(get_mesh(atlas, num_iterations=30), mesh_type="TC")
        mapped = map_attributes(inner, atlas_inner)
        assert mapped.vertices[:, 2].min() < 50 < mapped.vertices[:, 2].max()

        x2d, y2d, th = project_thickness(mapped, mesh_type="TC")
        mean_map, counts, _ = rasterize_thickness(x2d, y2d, th, grid_size=(64, 64))
        assert counts.sum() == mapped.n_points
        assert np.isfinite(mean_map).all()
        filled = mean_map[counts > 0]
        assert filled.size > 20 and 0.5 < float(np.median(filled)) < 8.0
