"""Sparsity patterns and Sparsify module (reference tests/test_sparse.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmx_compressor_tpu.sparse import (
    Sparseness,
    Dense,
    TopK,
    BlockTopK,
    Bernoulli,
    Sparsify,
)


@pytest.mark.parametrize(
    "sh",
    ["DENSE", "TOPK{0.5}(M)", "TOPK{0.5}(U)", "BTOPK{4:8,-1}(U)", "BTOPK{2:8,1}(M)", "BERN"],
)
def test_shorthand_roundtrip(sh):
    s = Sparseness.from_shorthand(sh)
    assert repr(s) == sh


def test_block_topk_mask_pattern():
    s = BlockTopK(K=2, block_size=4, block_dim=-1)
    score = jnp.asarray(
        [[1.0, 5.0, 2.0, 8.0], [0.1, 0.2, 0.3, 0.4]], jnp.float32
    )
    mask = np.asarray(s.get_mask(score))
    np.testing.assert_array_equal(mask, [[0, 1, 0, 1], [0, 0, 1, 1]])
    assert mask.sum(axis=-1).tolist() == [2, 2]


def test_block_topk_block_dim0():
    s = BlockTopK(K=1, block_size=2, block_dim=0)
    score = jnp.asarray([[3.0, 0.1], [1.0, 0.5]], jnp.float32)
    mask = np.asarray(s.get_mask(score))
    np.testing.assert_array_equal(mask, [[1, 0], [0, 1]])


def test_block_topk_exact_k_with_ties():
    s = BlockTopK(K=2, block_size=4, block_dim=-1)
    score = jnp.ones((3, 4), jnp.float32)
    mask = np.asarray(s.get_mask(score))
    np.testing.assert_array_equal(mask.sum(axis=-1), 2)


def test_topk_global_density():
    s = TopK(density=0.25)
    score = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)), jnp.float32)
    mask = np.asarray(s.get_mask(score))
    assert mask.sum() == 16  # 25% of 64


def test_sparsify_effective_weight():
    sp = Sparsify(sparseness="BTOPK{4:8,-1}(U)")
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)), jnp.float32)
    out = np.asarray(sp(w))
    nz = (out != 0).sum(axis=-1)
    assert (nz <= 8).all()  # 4 non-zeros per 8-block, 2 blocks per row


def test_sparsify_dense_identity():
    sp = Sparsify(sparseness="DENSE")
    w = jnp.ones((4, 8))
    np.testing.assert_array_equal(np.asarray(sp(w)), np.asarray(w))


def test_sparsify_ste_gradient_flows_to_weight():
    sp = Sparsify(sparseness="BTOPK{4:8,-1}(U)", backward_mode="STE")
    sp.training = True
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8,)), jnp.float32)
    sp._materialize(w.shape)
    g = jax.grad(lambda t: jnp.sum(sp(t)))(w)
    mask = np.asarray(sp.sparseness.get_mask(sp.score.value))
    np.testing.assert_array_equal(np.asarray(g), mask)


def test_bernoulli_supermask():
    s = Bernoulli()
    score = jnp.full((1000,), 0.7, jnp.float32)
    mask = np.asarray(s.get_mask(score, key=jax.random.key(0)))
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    assert 0.6 < mask.mean() < 0.8
