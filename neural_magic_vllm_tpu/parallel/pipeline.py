"""Pipeline parallelism, TPU-native: in-graph GPipe over a "stage" mesh
axis (the reference implements PP as per-stage worker processes relaying
IntermediateTensors over NCCL, vllm/distributed/parallel_state.py +
worker_base.py:266-278; on TPU the idiomatic equivalent is a single SPMD
program — layers sharded over the stage axis, activations rotated with
lax.ppermute, microbatches filling the pipeline — the scaling-book /
praxis GPipe formulation).

Semantics:
- the layer-stacked params [L, ...] are viewed [S, L/S, ...] and sharded
  P("stage") on the leading axis; each stage holds only its layer slice
  (THE point of PP: weights/KV that don't fit one chip's HBM).
- the token batch is split into M microbatches; the loop runs M+S-1
  ticks. At tick t stage s processes microbatch t-s; activations move
  stage->stage+1 via ppermute each tick. Pipeline-bubble ticks are
  masked by passing slot_mapping=-1 (KV writes dropped) and ignoring the
  output.
- per-stage KV shards keep the in-place flat-row scatter with LOCAL layer
  ids (ops/kv_cache.write_kv_flat).
- microbatched single-sequence prefill is exactly chunked prefill: chunk
  m attends the cache its predecessors wrote (context_lens + m*mbT).
- the final hidden states are valid on the last stage only and are
  psum-broadcast (one [T, H] collective) so every stage returns them.

Scope: LlamaForCausalLM-family models whose ``_layer`` uses layer_id only
for cache addressing (llama/mistral/qwen2/gemma/phi3 + variants);
ragged BATCHED fresh prefill (meta.seq_ids) needs sequence-aligned
microbatches and is not wired yet. Engine integration lands with the
multi-host executor; this module + tests pin the compiled pattern.
"""
import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from neural_magic_vllm_tpu.layers.attention import AttentionMetadata


def build_pp_mesh(num_stages: int, tp: int = 1, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = num_stages * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices for pp={num_stages} x tp={tp}")
    arr = np.array(devices[:n]).reshape(num_stages, tp)
    return Mesh(arr, ("stage", "model"))


def stage_params(model, params, num_stages: int):
    """[L, ...] layer stacks -> [S, L/S, ...] (pure reshape)."""
    S = num_stages
    return dict(params, layers=jax.tree_util.tree_map(
        lambda a: a.reshape((S, a.shape[0] // S) + a.shape[1:]),
        params["layers"]))


def gpipe_forward(model, mesh: Mesh, num_microbatches: int):
    """fn(params_staged, kv_caches, token_ids, positions, meta,
    is_prefill) running the decoder under GPipe on `mesh`.

    kv_caches: layer-stacked [L, nb, kvh, bs, hd] pairs.
    token_ids/positions: [T], T % num_microbatches == 0."""
    S = mesh.shape["stage"]
    M = num_microbatches
    L = model.num_layers
    assert L % S == 0, (L, S)
    Lps = L // S

    def staged(params, k_loc, v_loc, tokens, positions, slot_mapping,
               block_tables, context_lens, *, is_prefill):
        # local: params["layers"] leaves [1, Lps, ...]; kv [1, Lps*nb, ...]
        stage = jax.lax.axis_index("stage")
        layers_loc = jax.tree_util.tree_map(lambda a: a[0],
                                            params["layers"])
        k_state = k_loc[0]
        v_state = v_loc[0]
        model._nb = k_state.shape[0] // Lps

        T = tokens.shape[0]
        mbT = T // M
        x_all = model.embed_tokens(params, tokens)  # [T, H]
        H = x_all.shape[-1]

        carry_x = jnp.zeros((mbT, H), x_all.dtype)
        out = jnp.zeros((M, mbT, H), x_all.dtype)

        for t in range(M + S - 1):
            mb = t - stage  # this stage's microbatch at tick t (traced)
            valid = (mb >= 0) & (mb < M)
            mb_c = jnp.clip(mb, 0, M - 1)
            start = mb_c * mbT
            mb_x = jax.lax.dynamic_slice_in_dim(x_all, start, mbT)
            mb_pos = jax.lax.dynamic_slice_in_dim(positions, start, mbT)
            mb_slots = jnp.where(
                valid,
                jax.lax.dynamic_slice_in_dim(slot_mapping, start, mbT),
                -1)  # bubble ticks: KV writes dropped
            if is_prefill:
                mb_meta = AttentionMetadata(
                    slot_mapping=mb_slots,
                    block_tables=block_tables,
                    context_lens=context_lens + mb_c * mbT)
            else:
                mb_meta = AttentionMetadata(
                    slot_mapping=mb_slots,
                    block_tables=jax.lax.dynamic_slice_in_dim(
                        block_tables, start, mbT, axis=0),
                    context_lens=jax.lax.dynamic_slice_in_dim(
                        context_lens, start, mbT))

            x_in = jnp.where(stage == 0, mb_x, carry_x)
            rope_cos, rope_sin = model.rope.precompute(mb_pos)
            lids = jnp.arange(Lps, dtype=jnp.int32)  # LOCAL layer ids

            def body(carry, xs_):
                res, k_s, v_s = carry
                lp, lid = xs_
                res, (k_s, v_s) = model._layer(lp, res, rope_cos, rope_sin,
                                               k_s, v_s, mb_meta,
                                               is_prefill, None,
                                               layer_id=lid)
                return (res, k_s, v_s), None

            (y, k_state, v_state), _ = jax.lax.scan(
                body, (x_in, k_state, v_state), (layers_loc, lids))
            done_mb = t - (S - 1)
            if 0 <= done_mb < M:  # last stage finished microbatch done_mb
                upd = jnp.where(stage == S - 1, y, 0.0)
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, upd[None].astype(out.dtype), done_mb, axis=0)
            carry_x = jax.lax.ppermute(
                y, "stage", [(i, (i + 1) % S) for i in range(S)])

        out = jax.lax.psum(out, "stage")  # only the last stage wrote it
        from neural_magic_vllm_tpu.layers.norm import rms_norm
        final = rms_norm(out.reshape(T, H), params["final_norm"],
                         model.rms_eps, model.norm_weight_offset)
        return final, k_state[None], v_state[None]

    def fn(params_staged, kv_caches, token_ids, positions, meta,
           is_prefill: bool):
        if meta.seq_ids is not None:
            raise NotImplementedError(
                "GPipe over ragged batched prefill needs sequence-aligned "
                "microbatches")
        k_stack, v_stack = kv_caches  # [L, nb, kvh, bs, hd]
        nb = k_stack.shape[1]
        k_st = k_stack.reshape((S, Lps * nb) + k_stack.shape[2:])
        v_st = v_stack.reshape((S, Lps * nb) + v_stack.shape[2:])

        def rep_spec(a):
            return P(*((None, ) * jnp.ndim(a)))

        pspec = {k: (jax.tree_util.tree_map(
                         lambda a: P("stage",
                                     *((None, ) * (a.ndim - 1))), v)
                     if k == "layers" else
                     jax.tree_util.tree_map(rep_spec, v))
                 for k, v in params_staged.items()}
        kv_spec = P("stage", *((None, ) * (k_st.ndim - 1)))

        kwargs = dict(
            mesh=mesh,
            in_specs=(pspec, kv_spec, kv_spec, P(None), P(None), P(None),
                      rep_spec(meta.block_tables),
                      rep_spec(meta.context_lens)),
            out_specs=(P(None), kv_spec, kv_spec))
        try:
            sm = shard_map(functools.partial(staged,
                                             is_prefill=is_prefill),
                           check_rep=False, **kwargs)
        except TypeError:  # jax>=0.8: check_rep retired (check_vma)
            sm = shard_map(functools.partial(staged,
                                             is_prefill=is_prefill),
                           check_vma=False, **kwargs)
        final, k_st, v_st = sm(params_staged, k_st, v_st, token_ids,
                               positions, meta.slot_mapping,
                               meta.block_tables, meta.context_lens)
        return final, (k_st.reshape(k_stack.shape),
                       v_st.reshape(v_stack.shape))

    return fn
