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
