"""Pipeline parallelism, TPU-native: in-graph GPipe over a "stage" mesh
axis.

The reference implements PP as per-stage worker processes relaying
IntermediateTensors over NCCL with one scheduler per "virtual engine"
(vllm/distributed/parallel_state.py:886, vllm/worker/worker_base.py:266-278,
vllm/engine/llm_engine.py:303-307, async interleave
async_llm_engine.py:580-613). On TPU the idiomatic equivalent is a single
SPMD program: the layer-stacked params and KV caches are sharded over a
"stage" mesh axis, activations rotate stage->stage+1 with lax.ppermute, and
the batch is split into microbatches that fill the pipeline (the
scaling-book GPipe formulation). One scheduler and one dispatch per step —
the virtual-engine machinery is a process-topology artifact that a
single-controller design does not need.

Composition with TP: the shard_map is MANUAL over "stage" only
(``axis_names={"stage"}``); the "model" axis stays automatic, so GSPMD
still partitions each stage's layer compute across TP chips and inserts
the ICI collectives, exactly as in the pp=1 path.

Mechanics:
- every "layers" param leaf [L, ...] and the KV stacks [L, nb, kvh, bs, hd]
  are sharded P("stage") on the layer axis; each stage holds its L/S layer
  slice (THE point of PP: weights + KV that don't fit one chip's HBM).
- the token batch is split into M microbatches; the loop runs M+S-1 ticks.
  At tick t stage s processes microbatch t-s. Pipeline-bubble ticks run
  with slot_mapping=-1 (KV writes dropped) and their output is ignored.
- KV updates keep the in-place flat-row scatter with LOCAL layer ids
  (ops/kv_cache.write_kv_flat): inside the manual region the local stack is
  [L/S * nb, kvh, bs, hd] and layer ids run 0..L/S-1.
- microbatched single-sequence prefill is exactly chunked prefill: chunk m
  attends the cache its predecessors wrote (context_lens + m*mbT).
- ragged batched prefill (meta.seq_ids) runs as ONE microbatch: a sequence
  may not straddle a microbatch boundary (its later tokens would need
  cached-context attention), so the whole chunk travels the stages
  together. Correct, stage-serial; decode — where PP throughput matters —
  microbatches fully.
- the final hidden states are valid on the last stage only and are
  psum-broadcast (one [T, H] collective) so every stage returns them.

Scope: models whose ``_layer`` uses layer_id only for cache addressing
(the llama/gpt families). PP + LoRA, PP + multimodal and PP + stateful
(mamba) models are rejected at config time.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from neural_magic_vllm_tpu.layers.attention import AttentionMetadata


def build_pp_mesh(num_stages: int, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = num_stages * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices for pp={num_stages} x tp={tp}")
    arr = np.array(devices[:n]).reshape(num_stages, tp)
    return Mesh(arr, ("stage", "model"))


def _pick_microbatches(total: int, num_stages: int) -> int:
    """Largest M <= 4*S that divides the (static, bucketed) token/row
    count. More microbatches shrink the bubble fraction (S-1)/(M+S-1);
    beyond ~4S the per-tick work gets too small to feed the MXU."""
    for m in range(min(4 * num_stages, total), 0, -1):
        if total % m == 0:
            return m
    return 1


class PipelinedModel:
    """Drop-in model adapter running the wrapped model under in-graph
    GPipe. Exposes the same forward/compute_logits/param_specs/loading
    surface the model runner uses, so every step executable (prefill,
    batched prefill, fused multi-step decode, spec decode) gets PP
    without per-path plumbing."""

    def __init__(self, model, mesh: Mesh):
        self.model = model
        self.mesh = mesh
        self.num_stages = int(mesh.shape["stage"])
        if model.num_layers % self.num_stages != 0:
            raise ValueError(
                f"num_layers={model.num_layers} not divisible by "
                f"pipeline_parallel_size={self.num_stages}")

    def __getattr__(self, name):
        # Delegate everything else (init_params, load_params, num_layers,
        # rope, has_state, ...) to the wrapped model.
        return getattr(self.model, name)

    def param_specs(self) -> Dict[str, Any]:
        """Wrapped specs with the layer-stack axis sharded over "stage".
        Per-layer leaves are [L, ...]; their spec's leading entry is the
        layer axis (None in the wrapped model), which PP claims."""
        specs = self.model.param_specs()
        specs["layers"] = jax.tree_util.tree_map(
            lambda s: P("stage", *s[1:]), specs["layers"],
            is_leaf=lambda x: isinstance(x, P))
        return specs

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        return self.model.compute_logits(params, hidden)

    def forward(
        self,
        params: Dict[str, Any],
        token_ids: jax.Array,  # [T]
        positions: jax.Array,  # [T]
        kv_caches,  # (k_stack [L,nb,kvh,bs,hd], v_stack)
        meta: AttentionMetadata,
        *,
        is_prefill: bool,
        lora=None,
        lora_idx=None,
        mm=None,
    ):
        if lora is not None:
            raise NotImplementedError("PP + LoRA is not supported")
        if meta.state_slots is not None:
            raise NotImplementedError("PP + stateful (mamba) models")
        model = self.model
        S = self.num_stages
        Lps = model.num_layers // S
        k_stack, v_stack = kv_caches
        nb = k_stack.shape[1]
        T = token_ids.shape[0]

        batched_prefill = meta.seq_ids is not None
        M = 1 if batched_prefill else _pick_microbatches(T, S)
        mbT = T // M

        # Embedding (+ multimodal patch merge) and rope tables run in plain
        # GSPMD land; microbatch slices are taken inside the manual region.
        x_all = model.embed_tokens(params, token_ids)
        if mm is not None:
            flat_embeds, mm_idx = mm
            img = jnp.take(flat_embeds, jnp.clip(mm_idx, 0), axis=0)
            x_all = jnp.where((mm_idx >= 0)[:, None], img.astype(x_all.dtype),
                              x_all)
        rope_cos, rope_sin = model.rope.precompute(positions)

        def staged(layers, k_loc, v_loc, x_all, rope_cos, rope_sin,
                   slot_mapping, block_tables, context_lens, seq_ids,
                   q_pos):
            # Local views: layers leaves [Lps, ...]; k/v [Lps, nb, ...].
            stage = jax.lax.axis_index("stage")
            k_state = k_loc.reshape((Lps * nb, ) + k_loc.shape[2:])
            v_state = v_loc.reshape((Lps * nb, ) + v_loc.shape[2:])
            model._nb = nb
            H = x_all.shape[-1]

            carry_x = jnp.zeros((mbT, H), x_all.dtype)
            out = jnp.zeros((M, mbT, H), x_all.dtype)
            lids = jnp.arange(Lps, dtype=jnp.int32)  # LOCAL layer ids

            for t in range(M + S - 1):
                mb = t - stage  # this stage's microbatch at tick t (traced)
                valid = (mb >= 0) & (mb < M)
                mb_c = jnp.clip(mb, 0, M - 1)
                start = mb_c * mbT
                mb_x = jax.lax.dynamic_slice_in_dim(x_all, start, mbT)
                mb_cos = jax.lax.dynamic_slice_in_dim(rope_cos, start, mbT)
                mb_sin = jax.lax.dynamic_slice_in_dim(rope_sin, start, mbT)
                mb_slots = jnp.where(
                    valid,
                    jax.lax.dynamic_slice_in_dim(slot_mapping, start, mbT),
                    -1)  # bubble ticks: KV writes dropped
                if batched_prefill:
                    mb_meta = AttentionMetadata(
                        slot_mapping=mb_slots, block_tables=block_tables,
                        context_lens=context_lens, seq_ids=seq_ids,
                        q_pos=q_pos)
                elif is_prefill:
                    # chunk m attends the context earlier chunks wrote
                    mb_meta = AttentionMetadata(
                        slot_mapping=mb_slots, block_tables=block_tables,
                        context_lens=context_lens + mb_c * mbT)
                else:
                    mb_meta = AttentionMetadata(
                        slot_mapping=mb_slots,
                        block_tables=jax.lax.dynamic_slice_in_dim(
                            block_tables, start, mbT, axis=0),
                        context_lens=jax.lax.dynamic_slice_in_dim(
                            context_lens, start, mbT))

                x_in = jnp.where(stage == 0, mb_x, carry_x)

                def body(carry, xs_):
                    res, k_s, v_s = carry
                    lp, lid = xs_
                    res, (k_s, v_s) = model._layer(
                        lp, res, mb_cos, mb_sin, k_s, v_s, mb_meta,
                        is_prefill, None, layer_id=lid)
                    return (res, k_s, v_s), None

                (y, k_state, v_state), _ = jax.lax.scan(
                    body, (x_in, k_state, v_state), (layers, lids))
                done_mb = t - (S - 1)
                if 0 <= done_mb < M:  # last stage finished this microbatch
                    upd = jnp.where(stage == S - 1, y, 0.0)
                    out = jax.lax.dynamic_update_slice_in_dim(
                        out, upd[None].astype(out.dtype), done_mb, axis=0)
                carry_x = jax.lax.ppermute(
                    y, "stage", [(i, (i + 1) % S) for i in range(S)])

            out = jax.lax.psum(out, "stage")  # only the last stage wrote it
            return (out.reshape(T, H),
                    k_state.reshape((Lps, nb) + k_state.shape[1:]),
                    v_state.reshape((Lps, nb) + v_state.shape[1:]))

        # Every "layers" leaf is layer-stacked [L, ...] (incl. the optional
        # kv_scales [L, 2]); a P("stage") tree prefix shards them all on the
        # layer axis. The local scan then slices local [Lps, ...] leaves.
        layer_spec = P("stage")
        rep = P()
        sm = jax.shard_map(
            staged,
            mesh=self.mesh,
            axis_names={"stage"},
            in_specs=(layer_spec, layer_spec, layer_spec,
                      rep, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, layer_spec, layer_spec),
            check_vma=True,
        )
        zero = jnp.zeros((1, ), jnp.int32)
        res, k_new, v_new = sm(
            params["layers"], k_stack, v_stack, x_all, rope_cos, rope_sin,
            meta.slot_mapping, meta.block_tables, meta.context_lens,
            meta.seq_ids if batched_prefill else zero,
            meta.q_pos if batched_prefill else zero)
        from neural_magic_vllm_tpu.layers.norm import rms_norm
        final = rms_norm(res, params["final_norm"], model.rms_eps,
                         model.norm_weight_offset)
        return final, (k_new, v_new)
