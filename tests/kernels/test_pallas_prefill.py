"""Flash segment-prefill kernel vs the jnp reference (interpret mode on
CPU; the same path compiles on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.ops.attention import segment_prefill_attention_ref
from neural_magic_vllm_tpu.ops.pallas_prefill import _segment_prefill_pallas


def _inputs(T, nqh, kvh, hd, bounds, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((T, nqh, hd)), dtype)
    k = jnp.asarray(rng.standard_normal((T, kvh, hd)) * 0.3, dtype)
    v = jnp.asarray(rng.standard_normal((T, kvh, hd)) * 0.3, dtype)
    seq_ids = np.full(T, -1, np.int32)
    q_pos = np.zeros(T, np.int32)
    for s in range(len(bounds) - 1):
        seq_ids[bounds[s]:bounds[s + 1]] = s
        q_pos[bounds[s]:bounds[s + 1]] = np.arange(bounds[s + 1] -
                                                   bounds[s])
    return q, k, v, jnp.asarray(seq_ids), jnp.asarray(q_pos)


@pytest.mark.parametrize("T,nqh,kvh,hd,bounds", [
    (512, 8, 2, 128, [0, 100, 300, 460]),      # GQA, ragged, padded tail
    (256, 4, 4, 128, [0, 256]),                # MHA, single segment
    (512, 16, 8, 128, [0, 17, 35, 214, 512]),  # odd boundaries
])
def test_pallas_segment_prefill_matches_ref(T, nqh, kvh, hd, bounds):
    q, k, v, seq_ids, q_pos = _inputs(T, nqh, kvh, hd, bounds)
    scale = hd**-0.5
    ref = segment_prefill_attention_ref(q, k, v, seq_ids, q_pos,
                                        scale=scale)
    out = _segment_prefill_pallas(q, k, v, seq_ids, q_pos, scale=scale)
    valid = np.asarray(seq_ids) >= 0
    np.testing.assert_allclose(np.asarray(out, np.float32)[valid],
                               np.asarray(ref, np.float32)[valid],
                               rtol=2e-2, atol=2e-2)


def test_pallas_segment_prefill_logit_cap():
    q, k, v, seq_ids, q_pos = _inputs(256, 8, 2, 128, [0, 120, 256])
    ref = segment_prefill_attention_ref(q, k, v, seq_ids, q_pos, scale=0.1,
                                        logit_cap=20.0)
    out = _segment_prefill_pallas(q, k, v, seq_ids, q_pos, scale=0.1,
                                  logit_cap=20.0)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("window", [32, 200])
def test_pallas_segment_prefill_sliding_window(window):
    """In-kernel sliding window + below-diagonal block pruning == the jnp
    masked reference (r4: the ref fallback materializes O(T^2) scores —
    32 GiB at the 16k bucket — so windowed prefill must run the kernel)."""
    q, k, v, seq_ids, q_pos = _inputs(512, 8, 2, 128, [0, 100, 300, 460])
    scale = 128**-0.5
    ref = segment_prefill_attention_ref(q, k, v, seq_ids, q_pos,
                                        scale=scale, sliding_window=window)
    out = _segment_prefill_pallas(q, k, v, seq_ids, q_pos, scale=scale,
                                  window=window)
    valid = np.asarray(seq_ids) >= 0
    np.testing.assert_allclose(np.asarray(out, np.float32)[valid],
                               np.asarray(ref, np.float32)[valid],
                               rtol=2e-2, atol=2e-2)
