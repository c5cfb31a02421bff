"""Native (C++) runtime vs numpy reference implementations."""

import numpy as np
import pytest

from q3d_tpu.runtime import native
from q3d_tpu.ops.voxelizer import voxelize_np


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_voxelizer_matches_numpy():
    rng = np.random.RandomState(0)
    points = rng.uniform(-2, 42, (20000, 4)).astype(np.float32)
    vs = [0.16, 0.16, 4.0]
    pr = [0.0, -20.0, -3.0, 40.0, 20.0, 1.0]
    grid = np.round((np.array(pr[3:]) - np.array(pr[:3])) / np.array(vs)).astype(np.int64)
    v_np, c_np, n_np, k_np = voxelize_np(points, vs, pr, 8, 4000)
    v_c, c_c, n_c, k_c = native.voxelize(points, vs, pr, grid, 8, 4000)
    assert k_np == k_c
    np.testing.assert_array_equal(c_np, c_c)
    np.testing.assert_array_equal(n_np, n_c)
    np.testing.assert_allclose(v_np, v_c)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_voxelizer_speed():
    import time
    rng = np.random.RandomState(1)
    points = rng.uniform(-50, 50, (300000, 5)).astype(np.float32)
    vs = [0.1, 0.1, 0.2]
    pr = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
    grid = np.round((np.array(pr[3:]) - np.array(pr[:3])) / np.array(vs)).astype(np.int64)
    t0 = time.perf_counter()
    native.voxelize(points, vs, pr, grid, 10, 60000)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native voxelizer too slow: {dt:.3f}s"


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("seed,spatial", [(0, (6, 12, 16)), (1, (5, 9, 9))])
def test_native_chunk_rulebooks_bitmatch_engine(seed, spatial):
    """C++ chunk rulebooks (subm + strided downsample incl. output coords)
    must be BIT-equal to the device engine's on random scenes with boundary
    voxels."""
    import jax.numpy as jnp
    from q3d_tpu.ops.spconv import engine
    from q3d_tpu.ops.spconv.sparse_tensor import SparseConvTensor

    rng = np.random.RandomState(seed)
    B, cap, n_active = 2, 160, 120
    D, H, W = spatial
    coords = set()
    while len(coords) < n_active:
        coords.add((rng.randint(B), rng.randint(D), rng.randint(H),
                    rng.randint(W)))
    idx = np.full((cap, 4), -1, np.int32)
    for i, c in enumerate(sorted(coords)):
        idx[i] = c
    st = SparseConvTensor(
        features=jnp.zeros((cap, 3), jnp.float32), indices=jnp.asarray(idx),
        spatial_shape=spatial, batch_size=B).sort_rows()

    # host twin of the sorted tensor's coords (B, V, nd) layout
    vox = np.full((B, cap, 3), -1, np.int32)
    counts = [0] * B
    for c in sorted(coords):
        vox[c[0], counts[c[0]]] = c[1:]
        counts[c[0]] += 1
    # NOTE: flatten_sort_coords sorts by (b, z, y, x) — same order as
    # SparseConvTensor.sort_rows, so row ids line up
    hcoords = native.flatten_sort_coords(vox, spatial)

    # row-id alignment requires identical capacity layout: engine tensor has
    # cap rows; host table has B*cap rows — rebuild with the same capacity
    assert hcoords.shape[0] == B * cap
    st2 = SparseConvTensor(
        features=jnp.zeros((B * cap, 3), jnp.float32),
        indices=jnp.asarray(hcoords), spatial_shape=spatial,
        batch_size=B, sorted_rows=True)

    dev_subm = np.asarray(engine.subm_chunk_indices(st2, 3))
    host_subm = native.subm_chunk_rulebook(hcoords, spatial, 3, 1)
    np.testing.assert_array_equal(dev_subm, host_subm)

    for pad in (1, (0, 1, 1)):
        out_idx, chunk, out_sp = engine.sparse_conv_downsample_chunk(
            st2, 3, 2, pad)
        oc, hchunk, hosp = native.downsample_chunk_rulebook(
            hcoords, spatial, 3, 2, pad, B * cap)
        assert tuple(hosp) == tuple(out_sp)
        np.testing.assert_array_equal(np.asarray(out_idx), oc)
        np.testing.assert_array_equal(np.asarray(chunk), hchunk)


def test_chunk_prep_matches_pallas_prepare():
    """native.chunk_prep == pallas_conv.prepare_chunk on random chunk
    tables (anchor/code split, block spans, overflow-COO list, ok flag)."""
    import jax.numpy as jnp
    from q3d_tpu.runtime import native
    from q3d_tpu.ops.spconv import pallas_conv

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    for m, cap_rows in ((1000, 1024), (700, 4096)):
        g = 9
        # combined entries: anchor + code*cap_rows, some all-miss
        anchor = rng.randint(0, cap_rows, (m, g)).astype(np.int32)
        code = rng.randint(0, 3, (m, g)).astype(np.int32)
        chunk = anchor + code * cap_rows
        miss = rng.rand(m, g) < 0.3
        chunk = np.where(miss, 3 * cap_rows, chunk).astype(np.int32)

        ref = pallas_conv.prepare_chunk(jnp.asarray(chunk), cap_rows)
        got = native.chunk_prep(chunk, cap_rows)
        np.testing.assert_array_equal(np.asarray(ref[0]), got[0])  # anchor
        np.testing.assert_array_equal(np.asarray(ref[1]), got[1])  # code
        np.testing.assert_array_equal(np.asarray(ref[2]), got[2])  # span_q
        assert bool(ref[4]) == bool(got[4])
        if bool(ref[4]):          # overflow list only pinned when it fits
            for a, b in zip(ref[3][:4], got[3][:4]):
                np.testing.assert_array_equal(np.asarray(a), b)

        # reduced spans-only form + device completion == full prep
        red = native.chunk_prep_spans(chunk, cap_rows)
        comp = pallas_conv.complete_prep(jnp.asarray(chunk), cap_rows, red,
                                         bm=pallas_conv.DEFAULT_BM)
        np.testing.assert_array_equal(np.asarray(comp[0]), got[0])
        np.testing.assert_array_equal(np.asarray(comp[1]), got[1])
        np.testing.assert_array_equal(np.asarray(comp[2]), got[2])
        assert bool(comp[4]) == bool(got[4])
        if bool(got[4]):
            for a, b in zip(comp[3][:4], got[3][:4]):
                np.testing.assert_array_equal(np.asarray(a), b)


def test_cap_policy_sweep_python_equals_native():
    """VERDICT r3 #5: ONE policy table (ops/spconv/policy.py) drives the
    overflow-cap + block choice on both the python and native prep paths.
    Sweep realistic capacities {1k, 40k, 100k, 160k}: native auto-cap must
    (a) land on a policy ladder rung, (b) fit the true count (ok=True),
    and (c) match pallas_conv.prepare_chunk bit-for-bit at the same cap."""
    import jax.numpy as jnp
    from q3d_tpu.ops.spconv import pallas_conv, policy

    if not native.available():
        pytest.skip("native lib unavailable")

    rng = np.random.RandomState(11)
    for n_vox, spatial in ((1000, (6, 128, 128)), (40000, (41, 1024, 1024)),
                           (100000, (41, 1440, 1440)),
                           (160000, (41, 1440, 1440))):
        nz, ny, nx = spatial
        # lidar-like synthetic occupancy: cluster runs along x
        n_runs = max(n_vox // 6, 1)
        zy = np.stack([rng.randint(0, nz, n_runs),
                       rng.randint(0, ny, n_runs)], 1)
        xs = rng.randint(0, max(nx - 8, 1), n_runs)
        coords = []
        for (z, y), x0 in zip(zy, xs):
            run = rng.randint(2, 9)
            for dx in range(run):
                coords.append((0, z, y, min(x0 + dx, nx - 1)))
        coords = np.array(coords[:n_vox], np.int32)
        key = ((coords[:, 1].astype(np.int64) * ny + coords[:, 2]) * nx
               + coords[:, 3])
        coords = coords[np.argsort(np.unique(key, return_index=True)[1])]
        uniq = np.unique(key)
        zz = (uniq // (ny * nx)).astype(np.int32)
        yy = ((uniq // nx) % ny).astype(np.int32)
        xx = (uniq % nx).astype(np.int32)
        coords = np.stack([np.zeros_like(zz), zz, yy, xx], 1)
        cap_rows = coords.shape[0]

        chunk = native.subm_chunk_rulebook(coords, spatial, 3, 1)
        # the real consumer policy (r5): block_for adds the packing factor,
        # whose span granule q = 32 * pack parameterizes the C++ prep
        bm, s, _, pack = policy.block_for(cap_rows, 64, "int8")
        q = 32 * pack

        native._CAP_MEMO.clear()
        got = native.chunk_prep(chunk, cap_rows, bm=bm, s=s, q=q)
        cap_used = got[3][0].shape[0]
        assert cap_used % policy.CAP_GRANULE == 0
        assert bool(got[4]), f"auto cap must fit at n={n_vox}"
        # steady state: second call reuses the SAME rung (shape-stable)
        again = native.chunk_prep(chunk, cap_rows, bm=bm, s=s, q=q)
        assert again[3][0].shape[0] == cap_used

        ref = pallas_conv.prepare_chunk(jnp.asarray(chunk), cap_rows,
                                        bm=bm, s=s, cap=cap_used, pack=pack)
        for i in (0, 1, 2):
            np.testing.assert_array_equal(np.asarray(ref[i]), got[i])
        for a, b in zip(ref[3][:4], got[3][:4]):
            np.testing.assert_array_equal(np.asarray(a), b)
        assert bool(ref[4]) == bool(got[4])

        red = native.chunk_prep_spans(chunk, cap_rows, bm=bm, s=s, q=q)
        assert red[1][0].shape[0] == cap_used
        for a, b in zip(red[1][:4], got[3][:4]):
            np.testing.assert_array_equal(a, b)

        # every packing tier's span grid: python == native at the same q
        for cin_t in (16, 32, 64, 128):
            bmt, st_, _, pkt = policy.block_for(cap_rows, cin_t, "int8")
            gq = native.chunk_prep_spans(chunk, cap_rows, bm=bmt, s=st_,
                                         q=32 * pkt)
            rq = pallas_conv.prepare_chunk(jnp.asarray(chunk), cap_rows,
                                           bm=bmt, s=st_,
                                           cap=gq[1][0].shape[0], pack=pkt)
            np.testing.assert_array_equal(np.asarray(rq[2]), gq[0])
