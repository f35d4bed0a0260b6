"""Collective audit: AOT-compile the TP decode step for a real TPU
topology (no hardware needed — PJRT compile-only) and report every
collective op the partitioner inserted, attributed to the source op.

This is the multi-chip scaling evidence the single-chip rig cannot
measure directly (SURVEY §2.9): TP decode is latency-bound, so the
collective COUNT and their schedule positions bound scaling efficiency.
The expected budget for a llama-family TP decode layer is exactly two
all-reduces (attention out-projection + MLP down-projection, the
reference's tensor_model_parallel_all_reduce sites,
vllm/model_executor/models/llama.py:176,236); anything beyond that is a
GSPMD reshard worth hunting. Async `collective-permute-start/done` pairs
in the scheduled HLO are XLA's overlap machinery at work.

Usage:
  python tools/collective_audit.py [--topology v5e:2x4] [--tp 8]
                                   [--layers 2] [--json]
"""
import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_and_compile(topology: str, tp: int, layers: int,
                      batch: int = 8):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _build_model
    from neural_magic_vllm_tpu.layers.attention import AttentionMetadata
    from neural_magic_vllm_tpu.models import get_model_class
    from neural_magic_vllm_tpu.ops.sampling import SamplingTensors, sample
    from neural_magic_vllm_tpu.parallel import build_shardings

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    devices = np.array(topo.devices)
    assert devices.size % tp == 0, (devices.size, tp)
    mesh = Mesh(devices.reshape(devices.size // tp, tp),
                ("data", "model"))

    mc = _build_model(n_kv_heads=tp, n_heads=tp * 2, hidden=128 * tp,
                      inter=256 * tp, vocab=128 * tp, layers=layers,
                      dtype="bfloat16")
    model = get_model_class(["LlamaForCausalLM"])(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    shardings = build_shardings(mesh, params, model.param_specs())
    params_s = jax.tree_util.tree_map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        params, shardings)

    B, nb, bs, L = batch, 16, 16, layers
    kvh, hd = model.num_kv_heads, model.head_dim
    kv_sh = NamedSharding(mesh, P(None, None, "model", None, None))
    kv = jax.ShapeDtypeStruct((L, nb, kvh, bs, hd), jnp.bfloat16,
                              sharding=kv_sh)
    rsh = NamedSharding(mesh, P())

    def r(shape, dt=jnp.int32):
        return jax.ShapeDtypeStruct(shape, dt, sharding=rsh)

    meta = AttentionMetadata(slot_mapping=r((B, )),
                             block_tables=r((B, 4)),
                             context_lens=r((B, )))
    samp = SamplingTensors(
        temperature=r((B, ), jnp.float32), top_k=r((B, )),
        top_p=r((B, ), jnp.float32), min_p=r((B, ), jnp.float32),
        presence_penalty=r((B, ), jnp.float32),
        frequency_penalty=r((B, ), jnp.float32),
        repetition_penalty=r((B, ), jnp.float32),
        keys=r((B, 2), jnp.uint32))

    def step(params, kv_caches, tokens, positions, meta, samp):
        hidden, new_caches = model.forward(params, tokens, positions,
                                           kv_caches, meta,
                                           is_prefill=False)
        logits = model.compute_logits(params, hidden)
        tid, _, _, _ = sample(logits, samp, max_logprobs=0)
        return new_caches, tid

    with mesh:
        compiled = jax.jit(step).lower(params_s, (kv, kv), r((B, )),
                                       r((B, )), meta, samp).compile()
    return compiled


def audit(hlo: str):
    """Per-collective counts + op_name attribution + async pairs."""
    kinds = collections.Counter()
    by_source = collections.Counter()
    for line in hlo.splitlines():
        m = re.search(r"%([a-z\-]+)[\.\d]* = ", line)
        if not m:
            continue
        name = m.group(1)
        if any(k in name for k in
               ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")):
            kinds[name] += 1
            if not name.endswith("-done"):
                src = re.search(r'op_name="([^"]*)"', line)
                short = re.sub(r"jit\(step\)/", "",
                               src.group(1) if src else "?").split(";")[0]
                by_source[(name.replace("-start", ""), short)] += 1
    return kinds, by_source


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    compiled = build_and_compile(args.topology, args.tp, args.layers)
    hlo = compiled.as_text()
    kinds, by_source = audit(hlo)
    async_pairs = kinds.get("collective-permute-start", 0)
    out = {
        "topology": args.topology, "tp": args.tp,
        "layers": args.layers,
        "kinds": dict(kinds),
        "async_permute_pairs": async_pairs,
        "scheduled": "is_scheduled=true" in hlo,
        "by_source": [
            {"kind": k, "source": s, "n": n}
            for (k, s), n in by_source.most_common()],
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(f"topology={args.topology} tp={args.tp} "
              f"layers={args.layers} scheduled={out['scheduled']}")
        for k, n in sorted(kinds.items()):
            print(f"  {k:28s} {n}")
        print("attribution (collective <- source op):")
        for row in out["by_source"]:
            print(f"  {row['n']:3d}  {row['kind']:22s} <- {row['source']}")


if __name__ == "__main__":
    main()
