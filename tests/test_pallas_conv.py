"""One-hot span-gather kernel vs the exact chunked gather path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q3d_tpu.ops.spconv import SparseConvTensor, engine, pallas_conv
from tests.test_spconv import _random_sparse


def _sorted_sparse(rng, batch, spatial, n_active, cin, capacity):
    st, dense = _random_sparse(rng, batch, spatial, n_active, cin, capacity)
    return st.replace(sorted_rows=True).with_hash(), dense


@pytest.mark.parametrize("seed,n_active,capacity,cin,cout", [
    (0, 300, 384, 4, 8),
    (1, 380, 384, 8, 16),
    (2, 640, 640, 4, 4),
])
def test_onehot_conv_matches_chunked_subm(seed, n_active, capacity, cin, cout):
    rng = np.random.RandomState(seed)
    spatial = (4, 10, 16)
    st, _ = _sorted_sparse(rng, 2, spatial, n_active, cin, capacity)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    gidx = engine.subm_gather_indices(st, 3)
    cidx = engine.chunk_anchor_code(gidx, st.capacity)
    ref = np.asarray(engine.gather_conv_chunked(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w))
    out = np.asarray(pallas_conv.gather_conv_chunked_fast(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        bm=64, s=128, interpret=True, force_kernel=True))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


def test_onehot_conv_int8_with_scale_and_valid():
    rng = np.random.RandomState(3)
    spatial, cin, cout = (3, 8, 12), 4, 8
    st, _ = _sorted_sparse(rng, 1, spatial, 200, cin, 256)
    q = jnp.asarray(rng.randint(-127, 128, size=(256, cin)), jnp.int8)
    st = st.replace(features=q)
    w = jnp.asarray(rng.randint(-127, 128, size=(27, cin, cout)), jnp.int8)
    scale = jnp.asarray(rng.rand(1, cout).astype(np.float32))
    valid = st.indices[:, 0] >= 0
    gidx = engine.subm_gather_indices(st, 3)
    cidx = engine.chunk_anchor_code(gidx, st.capacity)
    ref = np.asarray(engine.gather_conv_chunked(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        out_valid=valid, out_scale=scale))
    out = np.asarray(pallas_conv.gather_conv_chunked_fast(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        out_valid=valid, out_scale=scale, bm=64, s=128, interpret=True, force_kernel=True))
    np.testing.assert_allclose(ref, out, rtol=1e-6, atol=1e-6)


def test_onehot_conv_overflow_residual_exact():
    """Tiny S forces most anchors through the overflow-COO residual pass;
    the result must still equal the gather path exactly."""
    rng = np.random.RandomState(4)
    spatial, cin, cout = (4, 10, 16), 4, 8
    st, _ = _sorted_sparse(rng, 2, spatial, 300, cin, 384)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    gidx = engine.subm_gather_indices(st, 3)
    cidx = engine.chunk_anchor_code(gidx, st.capacity)
    # explicit generous cap: the tiny S routes MOST entries through the
    # residual here, far beyond the production default (which is sized for
    # real scenes' <100 overflow entries and guarded by the ok-fallback)
    prep = pallas_conv.prepare_chunk(cidx, st.capacity, bm=128, s=32,
                                     cap=4096)
    *_, ovf, ok = prep
    assert bool(ok)              # overflow list fits -> kernel + residual
    assert int((np.asarray(ovf[0]) >= 0).sum()) > 0   # residual is exercised
    ref = np.asarray(engine.gather_conv_chunked(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w))
    out = np.asarray(pallas_conv.gather_conv_chunked_fast(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        bm=128, s=32, interpret=True, force_kernel=True, prep=prep))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


def test_onehot_conv_cap_overflow_falls_back():
    """Overflow list larger than its capacity -> the cond takes the exact
    gather branch."""
    rng = np.random.RandomState(6)
    spatial, cin, cout = (4, 10, 16), 4, 8
    st, _ = _sorted_sparse(rng, 2, spatial, 300, cin, 384)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    gidx = engine.subm_gather_indices(st, 3)
    cidx = engine.chunk_anchor_code(gidx, st.capacity)
    prep = pallas_conv.prepare_chunk(cidx, st.capacity, bm=128, s=32, cap=4)
    assert not bool(prep[-1])
    ref = np.asarray(engine.gather_conv_chunked(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w))
    out = np.asarray(pallas_conv.gather_conv_chunked_fast(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        bm=128, s=32, interpret=True, prep=prep, force_kernel=True))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


def test_onehot_conv_downsample_rulebook():
    """Same kernel on a strided conv's chunk table (anchors index the
    input's window matrix, outputs are the downsampled coordinate set)."""
    rng = np.random.RandomState(5)
    spatial, cin, cout = (4, 10, 16), 4, 8
    st, _ = _sorted_sparse(rng, 1, spatial, 300, cin, 384)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    out_idx, cidx, out_spatial = engine.sparse_conv_downsample_chunk(
        st, 3, 2, 1)
    valid = out_idx[:, 0] >= 0
    ref = np.asarray(engine.gather_conv_chunked(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        out_valid=valid))
    out = np.asarray(pallas_conv.gather_conv_chunked_fast(
        st.features, st.keys(), st.indices[:, -1], int(spatial[-1]), cidx, w,
        out_valid=valid, bm=64, s=128, interpret=True, force_kernel=True))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,pack", [(16, 8), (32, 4), (64, 2)])
def test_onehot_conv_packed_matches_chunked(cin, pack, monkeypatch):
    """r5 row-packed kernel (P window rows per span row, P*3C lanes) ==
    exact chunked gather, for every packing tier the policy produces.
    (Packing is default-off — measured slower on the 2026-08 Mosaic, see
    policy.pack_for — but the path stays correct for re-probing.)"""
    monkeypatch.setenv("Q3D_SPAN_PACK", "auto")
    from q3d_tpu.ops.spconv.policy import pack_for
    assert pack_for(cin) == pack
    rng = np.random.RandomState(cin)
    spatial = (4, 12, 16)
    st, _ = _sorted_sparse(rng, 2, spatial, 500, cin, 768)
    cout = 24
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    chunk = engine.subm_chunk_indices(st, 3)
    args = (st.features, st.keys(), st.indices[:, -1],
            int(st.spatial_shape[-1]), chunk, w)
    ref = np.asarray(engine.gather_conv_chunked(*args))
    got = np.asarray(pallas_conv.gather_conv_chunked_fast(
        *args, bm=64, s=512, pack=pack, interpret=True, force_kernel=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # pack=1 on the same (bm, s) must agree too (same spans, unpacked)
    got1 = np.asarray(pallas_conv.gather_conv_chunked_fast(
        *args, bm=64, s=512, pack=1, interpret=True, force_kernel=True))
    np.testing.assert_allclose(got1, ref, rtol=2e-5, atol=2e-5)


def test_onehot_conv_packed_int8_exact():
    """Packed kernel in int8 deploy form: int8 features/weights, int32
    accumulation — must be BIT-exact vs the chunked gather GEMM."""
    rng = np.random.RandomState(5)
    cin, cout = 16, 8
    spatial = (3, 10, 14)
    st, _ = _sorted_sparse(rng, 1, spatial, 300, cin, 512)
    q = jnp.asarray(rng.randint(-127, 128, size=(512, cin)), jnp.int8)
    st = st.replace(features=q)
    w = jnp.asarray(rng.randint(-20, 21, size=(27, cin, cout)), jnp.int8)
    chunk = engine.subm_chunk_indices(st, 3)
    args = (st.features, st.keys(), st.indices[:, -1],
            int(st.spatial_shape[-1]), chunk, w)
    ref = np.asarray(engine.gather_conv_chunked(*args))
    got = np.asarray(pallas_conv.gather_conv_chunked_fast(
        *args, bm=64, s=256, pack=8, interpret=True, force_kernel=True))
    np.testing.assert_array_equal(got, ref)


def test_onehot_conv_packed_policy_default_path(monkeypatch):
    """End-to-end policy path: no explicit (bm, s) — block_for picks the
    packed tier and the prep is built with the matching span granule."""
    monkeypatch.setenv("Q3D_SPAN_PACK", "auto")
    rng = np.random.RandomState(9)
    cin, cout = 16, 16
    spatial = (4, 14, 20)
    st, _ = _sorted_sparse(rng, 1, spatial, 700, cin, 1024)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    chunk = engine.subm_chunk_indices(st, 3)
    args = (st.features, st.keys(), st.indices[:, -1],
            int(st.spatial_shape[-1]), chunk, w)
    ref = np.asarray(engine.gather_conv_chunked(*args))
    got = np.asarray(pallas_conv.gather_conv_chunked_fast(
        *args, interpret=True, force_kernel=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
