"""Lossless-ness of the in-graph one-hot rejection sampler (VERDICT r4
#4): regardless of the proposal sequence, the marginal distribution of
the first emitted token must equal the target temperature-softmax —
the textbook speculative-sampling guarantee. Also: greedy rows reduce
exactly to the greedy-rejection kernel semantics, and the host numpy
reference agrees in distribution."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_magic_vllm_tpu.spec_decode.rejection import (
    onehot_rejection_ingraph, rejection_sample_greedy)

V = 7
K = 3
S = K + 1


def _run(lg_row, proposals_row, temp, n_trials, seed0=0):
    """Vectorize trials over the batch axis with distinct keys."""
    lg = jnp.asarray(np.tile(lg_row[None], (n_trials, 1, 1)))
    props = jnp.asarray(np.tile(proposals_row[None], (n_trials, 1)))
    plen = jnp.full((n_trials, ), K, jnp.int32)
    base_pos = jnp.full((n_trials, ), 5, jnp.int32)
    t = jnp.full((n_trials, ), temp, jnp.float32)
    keys = jnp.asarray(
        np.stack([np.arange(seed0, seed0 + n_trials, dtype=np.uint32),
                  np.full((n_trials, ), 17, np.uint32)], axis=1))
    emitted, n_out, chosen = onehot_rejection_ingraph(
        lg, props, plen, base_pos, t, keys)
    return np.asarray(emitted), np.asarray(n_out), np.asarray(chosen)


@pytest.mark.parametrize("prop_style", ["likely", "unlikely", "mixed"])
def test_first_token_marginal_is_target(prop_style):
    rng = np.random.default_rng(42)
    lg_row = rng.standard_normal((S, V)).astype(np.float32) * 2.0
    temp = 0.8
    p_target = np.exp(lg_row[0] / temp)
    p_target /= p_target.sum()
    if prop_style == "likely":
        props = np.full((K, ), int(np.argmax(p_target)), np.int32)
    elif prop_style == "unlikely":
        props = np.full((K, ), int(np.argmin(p_target)), np.int32)
    else:
        props = rng.integers(0, V, K).astype(np.int32)

    N = 40000
    emitted, n_out, _ = _run(lg_row, props, temp, N)
    first = emitted[:, 0]
    freq = np.bincount(first, minlength=V) / N
    # 40k trials: tolerate ~4 sigma of binomial noise per bin
    tol = 4 * np.sqrt(p_target * (1 - p_target) / N) + 1e-3
    assert np.all(np.abs(freq - p_target) < tol), (freq, p_target)


def test_greedy_rows_match_greedy_kernel():
    rng = np.random.default_rng(3)
    lg_row = rng.standard_normal((S, V)).astype(np.float32)
    props = rng.integers(0, V, K).astype(np.int32)
    emitted, n_out, chosen = _run(lg_row, props, 0.0, 4)
    ref = rejection_sample_greedy(lg_row, list(map(int, props)))
    for t in range(4):  # greedy: identical across keys
        out = [int(x) for x in emitted[t, :n_out[t]]]
        assert out == list(ref)


def test_accept_path_emits_proposals_verbatim():
    """Put ~all mass on the proposal at each step: everything accepts and
    a bonus token is emitted from row K."""
    lg_row = np.full((S, V), -20.0, np.float32)
    props = np.array([2, 5, 1], np.int32)
    for j, tok in enumerate(props):
        lg_row[j, tok] = 20.0
    lg_row[K, 3] = 20.0  # bonus row strongly prefers 3
    emitted, n_out, _ = _run(lg_row, props, 1.0, 64)
    assert np.all(n_out == S)
    assert np.all(emitted[:, :K] == props[None, :])
    assert np.all(emitted[:, K] == 3)


def test_reject_path_excludes_proposal():
    """Proposal has ~zero target mass: rejected at step 0, and the
    residual resample can never return the proposal itself."""
    rng = np.random.default_rng(9)
    lg_row = rng.standard_normal((S, V)).astype(np.float32)
    bad = 4
    lg_row[0, bad] = -30.0
    props = np.array([bad, 0, 0], np.int32)
    emitted, n_out, _ = _run(lg_row, props, 1.0, 2048)
    assert np.all(n_out == 1)
    assert not np.any(emitted[:, 0] == bad)


def test_partial_plen_stops_at_padding():
    rng = np.random.default_rng(5)
    lg_row = rng.standard_normal((S, V)).astype(np.float32)
    lg = jnp.asarray(np.tile(lg_row[None], (8, 1, 1)))
    props = jnp.asarray(np.tile(np.array([1, -1, -1], np.int32)[None],
                                (8, 1)))
    plen = jnp.full((8, ), 1, jnp.int32)
    emitted, n_out, _ = map(np.asarray, onehot_rejection_ingraph(
        lg, props, plen, jnp.full((8, ), 2, jnp.int32),
        jnp.full((8, ), 1.0, jnp.float32),
        jnp.asarray(np.stack([np.arange(8, dtype=np.uint32),
                              np.full((8, ), 3, np.uint32)], 1))))
    assert np.all(n_out <= 2)  # at most proposal + bonus/correction
