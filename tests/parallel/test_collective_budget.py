"""Collective-budget ratchet (VERDICT r4 #6 scaling evidence): the TP
decode step is latency-bound, so every collective GSPMD inserts is a
per-layer ICI round trip. AOT-compile the real decode step for a v5e
topology (PJRT compile-only — no TPU hardware needed) and pin the
collective counts; a regression that adds reshards fails here long
before anyone can measure it on a pod.

Budget at tp=8, 2 layers (audited via tools/collective_audit.py):
  - 2 all-reduces per layer from reduce_sum: the attention-out and
    MLP-down row-parallel sums — the reference's two
    tensor_model_parallel_all_reduce sites (llama.py:176,236). EXACT.
  - reshard all-gathers/permutes from the jnp attention path's KV
    scatter + head regrouping, and the sampling pipeline's distributed
    vocab reductions: RATCHETED (must not grow).
  - collective-permute-start/done pairs must stay ASYNC (start/done
    split = XLA's overlap machinery engaged).
"""
import pytest


def _compile():
    pytest.importorskip("jax.experimental.topologies")
    from jax.experimental import topologies
    try:
        topologies.get_topology_desc(platform="tpu",
                                     topology_name="v5e:2x4")
    except Exception as e:  # pragma: no cover - no libtpu in env
        pytest.skip(f"TPU compile-only topology unavailable: {e}")
    from tools.collective_audit import audit, build_and_compile
    compiled = build_and_compile("v5e:2x4", tp=8, layers=2)
    return audit(compiled.as_text())


def test_tp_decode_collective_budget():
    kinds, by_source = _compile()
    layer_allreduce = sum(
        n for (k, s), n in by_source.items()
        if k == "all-reduce" and "while/body" in s and "reduce_sum" in s)
    # the two row-parallel sums per scan body — exact, not ratcheted
    assert layer_allreduce == 2, by_source
    # ratchets: current audited totals; growth = a new reshard crept in
    assert kinds.get("all-reduce", 0) <= 9, kinds
    assert kinds.get("all-gather", 0) <= 9, kinds
    assert kinds.get("reduce-scatter", 0) <= 2, kinds
    # async overlap machinery: permutes must be start/done pairs
    assert kinds.get("collective-permute-start", 0) == \
        kinds.get("collective-permute-done", 0)
    assert kinds.get("collective-permute", 0) == 0  # no sync permutes
