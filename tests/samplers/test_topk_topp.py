"""Sort-free top-k / top-p / min-p masks vs sort-based references
(the bisection kernels in ops/sampling.py replace the reference's sorted
implementations, sampler.py:223 — these goldens pin the set semantics:
top-k = the k largest logits; top-p = the minimal descending-prob prefix
with mass >= p; min-p = probs >= min_p * max_prob)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_magic_vllm_tpu.ops.sampling import apply_top_k_top_p_min_p

B, V = 8, 1000


def _distinct_logits(rng):
    x = rng.standard_normal((B, V)).astype(np.float32) * 3.0
    # make per-row values distinct so the expected sets are unambiguous
    x += np.argsort(np.argsort(x, axis=-1), axis=-1) * 1e-5
    return x


def _kept(masked):
    return [set(np.nonzero(np.isfinite(row))[0].tolist())
            for row in np.asarray(masked)]


@pytest.mark.parametrize("seed", range(3))
def test_top_k_matches_sorted(seed):
    rng = np.random.default_rng(seed)
    logits = _distinct_logits(rng)
    ks = rng.integers(1, 50, B)
    out = apply_top_k_top_p_min_p(
        jnp.asarray(logits), jnp.asarray(ks, jnp.int32),
        jnp.ones((B, ), jnp.float32), jnp.zeros((B, ), jnp.float32))
    for row, k, kept in zip(logits, ks, _kept(out)):
        expect = set(np.argsort(row)[-k:].tolist())
        assert kept == expect, (k, len(kept))


@pytest.mark.parametrize("seed", range(3))
def test_top_p_matches_sorted(seed):
    rng = np.random.default_rng(100 + seed)
    logits = _distinct_logits(rng)
    ps = rng.uniform(0.05, 0.95, B).astype(np.float32)
    out = apply_top_k_top_p_min_p(
        jnp.asarray(logits), jnp.full((B, ), V, jnp.int32),
        jnp.asarray(ps), jnp.zeros((B, ), jnp.float32))
    for row, p, kept in zip(logits, ps, _kept(out)):
        probs = np.exp(row - row.max())
        probs /= probs.sum()
        order = np.argsort(-probs)
        csum = np.cumsum(probs[order])
        n = int(np.searchsorted(csum, p) + 1)  # minimal prefix mass >= p
        expect = set(order[:n].tolist())
        assert kept == expect, (p, len(kept), len(expect))


@pytest.mark.parametrize("seed", range(3))
def test_min_p_matches_reference(seed):
    rng = np.random.default_rng(200 + seed)
    logits = _distinct_logits(rng)
    mps = rng.uniform(0.01, 0.5, B).astype(np.float32)
    out = apply_top_k_top_p_min_p(
        jnp.asarray(logits), jnp.full((B, ), V, jnp.int32),
        jnp.ones((B, ), jnp.float32), jnp.asarray(mps))
    for row, mp, kept in zip(logits, mps, _kept(out)):
        probs = np.exp(row - row.max())
        probs /= probs.sum()
        expect = set(np.nonzero(probs >= mp * probs.max())[0].tolist())
        assert kept == expect


def test_combined_filters_intersect():
    rng = np.random.default_rng(7)
    logits = _distinct_logits(rng)
    ks = np.full(B, 20)
    ps = np.full(B, 0.8, np.float32)
    out = apply_top_k_top_p_min_p(
        jnp.asarray(logits), jnp.asarray(ks, jnp.int32),
        jnp.asarray(ps), jnp.zeros((B, ), jnp.float32))
    only_k = apply_top_k_top_p_min_p(
        jnp.asarray(logits), jnp.asarray(ks, jnp.int32),
        jnp.ones((B, ), jnp.float32), jnp.zeros((B, ), jnp.float32))
    only_p = apply_top_k_top_p_min_p(
        jnp.asarray(logits), jnp.full((B, ), V, jnp.int32),
        jnp.asarray(ps), jnp.zeros((B, ), jnp.float32))
    for both, k_set, p_set in zip(_kept(out), _kept(only_k),
                                  _kept(only_p)):
        assert both == (k_set & p_set)
