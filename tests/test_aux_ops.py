"""Aux kernel ops: pointnet2 primitives, bev_pool, ingroup_inds, on-device
voxelizer — vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from q3d_tpu.ops.pointnet2_utils import (farthest_point_sample, ball_query,
                                         group_points, three_nn,
                                         three_interpolate)
from q3d_tpu.ops.bev_pool import bev_pool
from q3d_tpu.ops.ingroup_inds import ingroup_inds
from q3d_tpu.ops.voxelizer import voxelize_np, voxelize_jax


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32) * 10)
    idx = farthest_point_sample(xyz, 16)
    assert idx.shape == (2, 16)
    for b in range(2):
        sel = np.asarray(idx[b])
        assert len(set(sel.tolist())) == 16  # distinct picks
    # FPS picks should be more spread than random picks
    pts = np.asarray(xyz[0])[np.asarray(idx[0])]
    d_fps = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    d_fps = d_fps[d_fps > 0].min()
    rnd = np.asarray(xyz[0])[:16]
    d_rnd = np.linalg.norm(rnd[:, None] - rnd[None], axis=-1)
    d_rnd = d_rnd[d_rnd > 0].min()
    assert d_fps >= d_rnd


def test_ball_query_radius_and_fill():
    xyz = jnp.asarray(np.array([[[0, 0, 0], [0.1, 0, 0], [5, 5, 5],
                                 [0.2, 0, 0]]], np.float32))
    centers = jnp.asarray(np.array([[[0, 0, 0]]], np.float32))
    idx, valid = ball_query(0.5, 3, xyz, centers)
    got = set(np.asarray(idx[0, 0]).tolist())
    assert got == {0, 1, 3}
    idx2, valid2 = ball_query(0.5, 8, xyz, centers)
    arr = np.asarray(idx2[0, 0])
    assert set(arr.tolist()) == {0, 1, 3}        # fill repeats first hit
    assert np.asarray(valid2[0, 0]).sum() == 3


def test_three_interpolate_exact_at_known_point():
    known = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]],
                                 np.float32))
    feats = jnp.asarray(np.array([[[1.0], [2.0], [3.0]]], np.float32))
    unknown = jnp.asarray(np.array([[[0, 0, 0]]], np.float32))
    dist, idx = three_nn(unknown, known)
    out = three_interpolate(feats, idx, dist)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), 1.0, atol=1e-4)


def test_bev_pool_sums_cells():
    feats = jnp.asarray(np.ones((4, 2), np.float32))
    coords = jnp.asarray(np.array([[0, 0, 0, 0], [0, 0, 0, 0],
                                   [1, 1, 0, 0], [5, 5, 5, 5]], np.int32))
    out = bev_pool(feats, coords, batch_size=1, D=1, H=2, W=2)
    assert out.shape == (1, 1, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), [2, 2])
    np.testing.assert_allclose(np.asarray(out[0, 0, 1, 1]), [1, 1])


def test_ingroup_inds_appearance_order():
    gids = jnp.asarray(np.array([3, 1, 3, 3, 1, -1, 2], np.int32))
    out = np.asarray(ingroup_inds(gids))
    np.testing.assert_array_equal(out, [0, 0, 1, 2, 1, -1, 0])


def test_voxelize_jax_matches_np_aggregates():
    rng = np.random.RandomState(1)
    points = rng.uniform(0, 10, (2000, 4)).astype(np.float32)
    vs = [0.5, 0.5, 10.0]
    pr = [0, 0, -5, 10, 10, 5]
    v_np, c_np, n_np, k = voxelize_np(points, vs, pr, 4, 512)
    grid = np.round((np.array(pr[3:]) - np.array(pr[:3]))
                    / np.array(vs)).astype(np.int64)
    v_j, c_j, n_j = voxelize_jax(jnp.asarray(points),
                                 jnp.ones(2000, bool), vs, pr, grid, 4, 512)
    # same voxel set (order differs: np=first-seen, jax=key-sorted)
    set_np = {tuple(c) for c in np.asarray(c_np) if c[0] >= 0}
    set_j = {tuple(c) for c in np.asarray(c_j) if c[0] >= 0}
    assert set_np == set_j
    assert int(np.asarray(n_j).sum()) == int(n_np.sum())


def test_vector_pool_structure():
    from q3d_tpu.ops.vector_pool import vector_pool
    # one neighbor in a known octant -> only that cell carries its feature
    xyz = jnp.asarray(np.array([[[0.4, 0.4, 0.4], [5, 5, 5]]], np.float32))
    feats = jnp.asarray(np.array([[[1.0, 2.0], [9.0, 9.0]]], np.float32))
    centers = jnp.asarray(np.array([[[0, 0, 0]]], np.float32))
    out = np.asarray(vector_pool(xyz, feats, centers, radius=1.0,
                                 nsample=4, grid=2))
    assert out.shape == (1, 1, 8 * 2)
    cells = out.reshape(8, 2)
    nz = np.where(np.abs(cells).sum(1) > 0)[0]
    assert len(nz) == 1            # single occupied cell
    np.testing.assert_allclose(cells[nz[0]], [1.0, 2.0])
    # (+,+,+) octant with grid=2 -> cell index (1,1,1) = 7
    assert nz[0] == 7


def test_vector_pool_interpolate_oracle():
    """vector_pool_interpolate == numpy oracle of the reference chain
    (get_dense_voxels_by_center grid centers + 3-NN inverse-distance
    interpolation + use_xyz offset concat, pointnet2_modules.py:160-380):
    checked per (query, cell) on a small random cloud."""
    from q3d_tpu.ops.vector_pool import vector_pool_interpolate

    rng = np.random.RandomState(2)
    B, N, C, M = 1, 40, 5, 3
    grid, R, mult = 2, 1.0, 2.0
    xyz = rng.uniform(-3, 3, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)

    got = np.asarray(vector_pool_interpolate(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(new_xyz),
        R, nsample=64, grid=grid, dist_mult=mult))
    G = grid ** 3
    got = got.reshape(B, M, G, C + 9)

    # oracle grid centers (reference get_dense_voxels_by_center: offsets
    # -R+R/n .. R-R/n step 2R/n, meshgrid 'ij')
    step = 2 * R / grid
    g1 = np.arange(grid) * step - R + step / 2
    cx, cy, cz = np.meshgrid(g1, g1, g1, indexing="ij")
    centers = np.stack([cx, cy, cz], -1).reshape(-1, 3)

    for m in range(M):
        # candidate set: within R*(1+mult) of the query (static-shape cap)
        cand = np.where(np.linalg.norm(xyz[0] - new_xyz[0, m],
                                       axis=-1) <= R * (1 + mult))[0]
        for g in range(G):
            c = new_xyz[0, m] + centers[g]
            d = np.linalg.norm(xyz[0, cand] - c, axis=-1)
            ok = d <= mult * R
            if not ok.any():
                np.testing.assert_array_equal(got[0, m, g],
                                              np.zeros(C + 9))
                continue
            di = d[ok]
            ci = cand[ok]
            order = np.argsort(di, kind="stable")[:3]
            w = 1.0 / (di[order] + 1e-8)
            w = w / w.sum()
            want_f = (feats[0, ci[order]] * w[:, None]).sum(0)
            np.testing.assert_allclose(got[0, m, g, :C], want_f,
                                       rtol=2e-4, atol=2e-5)
            # offsets: grid center minus each selected neighbor (pad with
            # the nearest when fewer than 3 found is NOT required — the
            # kernel zeroes the weight; only check the found ones)
            offs = got[0, m, g, C:].reshape(3, 3)
            for j, oi in enumerate(order):
                want_o = centers[g] - (xyz[0, ci[oi]] - new_xyz[0, m])
                np.testing.assert_allclose(offs[j], want_o, rtol=2e-4,
                                           atol=2e-5)


def test_vector_pool_first_choice_oracle():
    """vector_pool(mode='first') == numpy oracle of the reference's
    voxel_random_choice semantics (vector_pool_gpu.cu:344-365: keep the
    FIRST point per sub-voxel in neighbor scan order)."""
    from q3d_tpu.ops.vector_pool import vector_pool

    rng = np.random.RandomState(11)
    B, N, M, C, grid, R, ns = 2, 64, 5, 4, 3, 1.0, 32
    xyz = rng.randn(B, N, 3).astype(np.float32) * 1.5
    feats = rng.randn(B, N, C).astype(np.float32)
    centers = rng.randn(B, M, 3).astype(np.float32)

    got, cnt = vector_pool(jnp.asarray(xyz), jnp.asarray(feats),
                           jnp.asarray(centers), radius=R, nsample=ns,
                           grid=grid, return_counts=True, mode="first")
    got = np.asarray(got).reshape(B, M, grid ** 3, C)
    cnt = np.asarray(cnt)

    G = grid ** 3
    for b in range(B):
        for m in range(M):
            want = np.zeros((G, C), np.float32)
            hit = np.zeros(G, bool)
            found = 0
            for k in range(N):          # reference scan order
                rel = xyz[b, k] - centers[b, m]
                if (rel ** 2).sum() >= R ** 2:
                    continue
                found += 1
                if found > ns:
                    break
                cell = np.clip(((rel / (2 * R) + 0.5) * grid).astype(int),
                               0, grid - 1)
                g = (cell[0] * grid + cell[1]) * grid + cell[2]
                if not hit[g]:
                    hit[g] = True
                    want[g] = feats[b, k]
            np.testing.assert_allclose(got[b, m], want, rtol=1e-6)
            np.testing.assert_array_equal(cnt[b, m] > 0, hit)
