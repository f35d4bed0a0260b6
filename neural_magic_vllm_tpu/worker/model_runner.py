"""TPU model runner: bucketed AOT-compiled step executables.

Replaces the reference's CUDA-graph capture (vllm/worker/model_runner.py:910)
and mirrors its own TPU port's design (vllm/worker/tpu_model_runner.py):
- every step runs a jitted executable whose shapes come from a bucket
  lattice (prefill token buckets, decode batch buckets); warmup pre-compiles
  all buckets so serving never hits a compile.
- KV caches are donated to every step so XLA updates them in place.
- sampling runs in-graph (temperature/top-k/top-p/min-p/seeds/top-n
  logprobs); a host fallback covers penalties, logits processors, prompt
  logprobs and beam search.
"""
import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.layers.attention import AttentionMetadata
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.models import get_model_class
from neural_magic_vllm_tpu.ops.sampling import SamplingTensors, sample
from neural_magic_vllm_tpu.sampling_params import SamplingParams, \
    SamplingType
from neural_magic_vllm_tpu.sequence import (CompletionSequenceGroupOutput,
                                            EmbeddingSequenceGroupOutput,
                                            Logprob, SamplerOutput,
                                            SequenceGroupMetadata,
                                            SequenceOutput)
from neural_magic_vllm_tpu.utils import cdiv, next_power_of_2
from neural_magic_vllm_tpu.worker import host_sampler
from neural_magic_vllm_tpu.worker.cache_engine import CacheEngine

logger = init_logger(__name__)

_SAMPLING_EPS = 1e-5


def _fold_position(samp: SamplingTensors, positions) -> SamplingTensors:
    """Derive per-step PRNG keys in-graph: key = (k0, k1 ^ position * odd).
    Keeps seeded sampling reproducible and identical across single-step and
    multi-step execution."""
    k1 = samp.keys[:, 1] ^ (positions.astype(jnp.uint32) *
                            jnp.uint32(2654435761))
    keys = jnp.stack([samp.keys[:, 0], k1], axis=1)
    return samp._replace(keys=keys)


def _needs_host_sampling(sp: SamplingParams) -> bool:
    """Host fallback is reserved for genuinely host-side features; the
    penalty family runs IN-GRAPH (token-history buffers shipped per step,
    counts built on device — ops/sampling.apply_penalties)."""
    return (bool(sp.logits_processors) or sp.min_tokens > 0
            or sp.use_beam_search)


def _uses_penalties(sp: SamplingParams) -> bool:
    return (abs(sp.presence_penalty) >= _SAMPLING_EPS
            or abs(sp.frequency_penalty) >= _SAMPLING_EPS
            or abs(sp.repetition_penalty - 1.0) >= _SAMPLING_EPS)


def _hlo_dump_wrapper(jfn, kind, opts, dump_dir):
    """NMV_TPU_DUMP_HLO=<dir>: write each executable's optimized HLO
    (with op_name metadata) on first use per arg-shape signature. The
    axon tunnel scrubs --xla_dump_to on its remote compile helper, so
    tools/profile_table.py gets its fusion -> module attribution source
    from here instead."""
    import functools
    import os
    seen = set()

    @functools.wraps(jfn)
    def wrapped(*args, **kw):
        sig = jax.tree_util.tree_structure((args, kw)), tuple(
            (getattr(x, "shape", None), str(getattr(x, "dtype", "")))
            for x in jax.tree_util.tree_leaves((args, kw)))
        h = hash(sig)
        if h not in seen:
            seen.add(h)
            try:
                text = jfn.lower(*args, **kw).compile().as_text()
                os.makedirs(dump_dir, exist_ok=True)
                fname = (f"{kind}_{str(opts).replace(' ', '')}_"
                         f"{len(seen)}.after_optimizations.txt")
                with open(os.path.join(dump_dir, fname), "w") as f:
                    f.write(text)
            except Exception as e:  # pragma: no cover
                logger.warning("HLO dump failed for %s: %s", kind, e)
        return jfn(*args, **kw)

    return wrapped


class TPUModelRunner:

    def __init__(self, model_config, cache_config, scheduler_config,
                 parallel_config, device_config, load_config,
                 mesh=None, speculative_config=None,
                 lora_config=None) -> None:
        self.model_config = model_config
        self.cache_config = cache_config
        self.scheduler_config = scheduler_config
        self.parallel_config = parallel_config
        self.device_config = device_config
        self.load_config = load_config
        self.mesh = mesh
        self.speculative_config = speculative_config
        self.lora_config = lora_config
        self.lora_manager = None
        self._spec_proposer = None
        self.draft_model = None
        self.draft_model_config = None
        self.draft_params = None
        self.draft_cache_engine = None
        self._draft_seen: Dict[int, int] = {}
        self._spec_fn = None
        self.mlp_speculator = None
        self.mlp_spec_config = None
        self._spec_hidden: Dict[int, np.ndarray] = {}
        if speculative_config is not None and speculative_config.enabled \
                and speculative_config.speculative_model:
            from neural_magic_vllm_tpu.config import ModelConfig
            from neural_magic_vllm_tpu.spec_decode.metrics import \
                SpecDecodeWorkerMetrics
            spec_model_config = ModelConfig(
                model=speculative_config.speculative_model,
                dtype=model_config.dtype,
                max_model_len=model_config.max_model_len,
                skip_tokenizer_init=True)
            if getattr(spec_model_config.hf_config, "model_type",
                       "") == "mlp_speculator":
                # MLPSpeculator proposer: no draft KV cache; proposals come
                # from the target's last hidden state (reference
                # MLPSpeculatorWorker, spec_decode/mlp_speculator_worker.py)
                from neural_magic_vllm_tpu.models.mlp_speculator import \
                    MLPSpeculator
                self.mlp_spec_config = spec_model_config
                self.mlp_speculator = MLPSpeculator(spec_model_config)
            else:
                self.draft_model_config = spec_model_config
                arch_d = getattr(self.draft_model_config.hf_config,
                                 "architectures", ["LlamaForCausalLM"])
                draft_tp = getattr(speculative_config,
                                   "speculative_draft_tensor_parallel_size",
                                   None)
                target_tp = (parallel_config.tensor_parallel_size
                             if parallel_config is not None else 1)
                if draft_tp is not None and draft_tp not in (1, target_tp):
                    raise ValueError(
                        "speculative_draft_tensor_parallel_size must be 1 "
                        f"or the target TP ({target_tp}), got {draft_tp}")
                # draft at TP1 on a TP-N mesh: replicated params + KV, no
                # per-layer collectives for the draft (the reference's
                # SmallerTpProposerWorker role,
                # spec_decode/smaller_tp_proposer_worker.py)
                self._draft_replicated = (draft_tp == 1 and target_tp > 1)
                self.draft_model = get_model_class(arch_d)(
                    self.draft_model_config,
                    None if self._draft_replicated else parallel_config)
            self._spec_metrics = SpecDecodeWorkerMetrics()
        elif speculative_config is not None and speculative_config.enabled \
                and speculative_config.ngram_prompt_lookup_max > 0:
            from neural_magic_vllm_tpu.spec_decode import NGramProposer
            from neural_magic_vllm_tpu.spec_decode.metrics import \
                SpecDecodeWorkerMetrics
            self._spec_proposer = NGramProposer(
                speculative_config.ngram_prompt_lookup_max,
                speculative_config.ngram_prompt_lookup_min or 1,
                speculative_config.num_speculative_tokens)
            self._spec_metrics = SpecDecodeWorkerMetrics()

        self.block_size = cache_config.block_size
        self.max_blocks_per_seq = cdiv(model_config.max_model_len,
                                       self.block_size)
        self.max_logprobs = model_config.max_logprobs

        arch = getattr(model_config.hf_config, "architectures",
                       ["LlamaForCausalLM"])
        from neural_magic_vllm_tpu.quantization import create_quant_config
        self.quant_config = create_quant_config(model_config)
        if self.quant_config is not None:
            logger.info("Quantization: %s", self.quant_config.get_name())
        self.model = get_model_class(arch)(model_config, parallel_config,
                                           self.quant_config)
        if self.mesh is not None and self.mesh.shape.get("stage", 1) > 1:
            # In-graph GPipe PP: wrap the model so every step executable
            # (prefill / batched prefill / fused multi-step decode / spec
            # decode) pipelines over the "stage" axis transparently.
            from neural_magic_vllm_tpu.models.llama import LlamaForCausalLM
            from neural_magic_vllm_tpu.parallel.pipeline import \
                PipelinedModel
            if not isinstance(self.model, LlamaForCausalLM):
                raise NotImplementedError(
                    "pipeline_parallel_size > 1 currently supports the "
                    "llama model family (llama/mistral/qwen2/gemma/phi3 "
                    f"and variants); got {type(self.model).__name__}")
            if lora_config is not None:
                raise NotImplementedError("PP + LoRA is not supported")
            self.model = PipelinedModel(self.model, self.mesh)
        if lora_config is not None and getattr(self.model, "merged", False):
            # LoRA adapters address q/k/v/gate/up individually
            self.model.merged = False
        self.params = None
        # request_id -> flat projected image embeddings (multimodal prefill;
        # computed once, reused across chunked-prefill steps)
        self._mm_cache: Dict[str, Any] = {}
        # per-seq partial pooling state for chunked embedding prefills
        # (CLS first-token hidden / ALL per-chunk hiddens)
        self._pool_stash: Dict[int, Any] = {}
        # stateful (mamba) models: seq_id -> recurrent-state slot, LRU —
        # slots not referenced by the current step belong to finished or
        # RECOMPUTE-preempted sequences and are safe to recycle (a fresh
        # prefill resets its slot in-graph).
        self.has_state = getattr(self.model, "has_state", False)
        self.num_state_slots = scheduler_config.max_num_seqs
        from collections import OrderedDict
        self._state_slots: "OrderedDict[int, int]" = OrderedDict()
        self._state_free: List[int] = list(range(self.num_state_slots))
        if self.has_state:
            if speculative_config is not None and speculative_config.enabled:
                raise NotImplementedError(
                    "speculative decoding is unsupported for stateful "
                    "(mamba) models")
            if scheduler_config.num_scheduler_steps > 1:
                raise NotImplementedError(
                    "multi-step decode is unsupported for stateful "
                    "(mamba) models")
            if cache_config.enable_prefix_caching:
                raise NotImplementedError(
                    "prefix caching is unsupported for stateful (mamba) "
                    "models — recurrent state is not block-addressable")
        self._salt = int(np.random.default_rng(model_config.seed).integers(
            0, 2**31))
        # (kind, bucket-independent static opts) -> jitted fn
        self._fns: Dict[Tuple, Any] = {}
        # Adaptive fused-K: per-decode-bucket measured single-step ms and
        # the K chosen against fused_dispatch_target_ms (filled at warmup).
        self._bucket_step_ms: Dict[int, float] = {}
        self._fused_k_table: Dict[int, int] = {}
        # Multi-host: attached by the launcher on the driver host. When
        # set, every jitted dispatch is preceded by a StepPayload broadcast
        # so follower hosts enter the same global-mesh executable
        # (parallel/multihost.py; reference worker_base.py:215-282).
        self.control_plane = None
        # On-device guided decoding: packed DFA tables (lazy; see
        # guided_decoding/device_fsm.py).
        self._guided_mgr = None
        # jitted active-slot LoRA gather (see _compact_lora)
        self._lora_compact_fn = None

    def _get_guided_mgr(self):
        if self._guided_mgr is None:
            from neural_magic_vllm_tpu import envs
            from neural_magic_vllm_tpu.guided_decoding.device_fsm import \
                GuidedTableManager
            self._guided_mgr = GuidedTableManager(
                vocab_size=self.model_config.get_vocab_size(),
                max_states=envs.NMV_TPU_GUIDED_DEVICE_STATES,
                max_transitions=envs.NMV_TPU_GUIDED_DEVICE_NNZ,
                mesh=self.mesh)
        return self._guided_mgr

    def _device_guided_fsm(self, sgm: SequenceGroupMetadata):
        """DeviceFSM for a guided row that can ride the fused in-graph
        dispatch, or None (-> host logits-processor path). Device tables
        are driver-local; multi-host serving keeps the host path so
        followers replay identical dispatches."""
        from neural_magic_vllm_tpu import envs
        if not envs.NMV_TPU_GUIDED_DEVICE or self.control_plane is not None:
            return None
        sp = sgm.sampling_params
        if sp is None or sp.min_tokens > 0 or sp.use_beam_search:
            return None
        procs = sp.logits_processors or []
        if len(procs) != 1:
            return None
        from neural_magic_vllm_tpu.guided_decoding import FSMLogitsProcessor
        from neural_magic_vllm_tpu.guided_decoding.device_fsm import \
            build_device_fsm
        p = procs[0]
        if not isinstance(p, FSMLogitsProcessor):
            return None
        eos = sgm.eos_token_id
        # materialization runs on a BACKGROUND thread (review r5 #3: a
        # synchronous build stalled every in-flight decode for up to the
        # 60 s budget on a pattern's first request); rows use the host
        # path until the tables are ready
        if not hasattr(p.fsm, "_device_fsm"):
            pending = getattr(p.fsm, "_device_fsm_building", None)
            if pending is None:
                import threading
                vocab_size = self.model_config.get_vocab_size()

                def _build():
                    build_device_fsm(
                        p.fsm, vocab_size, eos,
                        max_states=envs.NMV_TPU_GUIDED_DEVICE_STATES,
                        max_transitions=envs.NMV_TPU_GUIDED_DEVICE_NNZ,
                        time_budget_s=envs.NMV_TPU_GUIDED_BUILD_BUDGET_S)

                pending = threading.Thread(target=_build,
                                           name="nmv-guided-fsm",
                                           daemon=True)
                p.fsm._device_fsm_building = pending
                pending.start()
            # small patterns finish inline (bounded wait); big ones keep
            # building in the background while rows use the host path
            pending.join(timeout=0.5)
            if not hasattr(p.fsm, "_device_fsm"):
                return None
        dfsm = p.fsm._device_fsm or None
        if dfsm is None or dfsm.eos_token_id != eos:
            return None
        return dfsm

    def _bcast(self, kind: str, nlp, arrays: Dict[str, Any],
               samp=None, lidx=None) -> None:
        """Publish one dispatch's host inputs to follower hosts. When LoRA
        serving is on, the slot table + per-row slot indices ride along so
        followers enter the same executable with identical stacks."""
        if self.control_plane is None:
            return
        from neural_magic_vllm_tpu.ops.sampling import SamplingTensors
        from neural_magic_vllm_tpu.parallel.multihost import StepPayload
        arr = {k: np.asarray(v) for k, v in arrays.items()
               if v is not None}
        if samp is not None:
            for f in SamplingTensors._fields:
                v = getattr(samp, f)
                if v is not None:
                    arr[f"samp_{f}"] = np.asarray(v)
        scalars = {"num_logprobs": list(nlp) if isinstance(nlp, tuple)
                   else nlp}
        if lidx is not None:
            arr["lora_lidx"] = np.asarray(lidx)
            scalars["lora_slots"] = self.lora_manager.slot_assignment()
        self.control_plane.broadcast(StepPayload(
            kind=kind, arrays=arr, scalars=scalars))

    # --- model loading ----------------------------------------------------------
    def load_model(self) -> None:
        t0 = time.time()
        if self.load_config.load_format == "dummy":
            params = self.model.init_params(
                jax.random.PRNGKey(self.model_config.seed))
        elif self.load_config.load_format == "nmv":
            # fast reload of a previously saved canonical tree (the
            # reference's ShardedStateLoader role, loader.py:446: skip HF
            # name mapping / transposes / quant repacking entirely)
            import orbax.checkpoint as ocp
            import os
            path = os.path.join(os.path.abspath(self.model_config.model),
                                "nmv_state")
            params = ocp.StandardCheckpointer().restore(path)
            if hasattr(self.model, "adopt_state"):
                # states saved merged/unmerged load into either variant
                params = self.model.adopt_state(params)
        else:
            params = self.model.load_params(self.model_config.model)
        params = self._maybe_inject_kv_scales(params)
        self.params = self._shard_params(params)
        if self.draft_model is not None:
            if self.load_config.load_format == "dummy":
                dparams = self.draft_model.init_params(
                    jax.random.PRNGKey(self.model_config.seed + 1))
            else:
                dparams = self.draft_model.load_params(
                    self.draft_model_config.model)
            if getattr(self, "_draft_replicated", False) and \
                    self.mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                self.draft_params = jax.device_put(dparams, repl)
            else:
                self.draft_params = self._shard_params(dparams)
        if self.mlp_speculator is not None:
            if self.load_config.load_format == "dummy":
                sparams = self.mlp_speculator.init_params(
                    jax.random.PRNGKey(self.model_config.seed + 1))
            else:
                sparams = self.mlp_speculator.load_params(
                    self.mlp_spec_config.model)
            self.mlp_spec_params = jax.device_put(sparams)
        if self.lora_config is not None:
            from neural_magic_vllm_tpu.lora.worker_manager import \
                WorkerLoRAManager
            self.lora_manager = WorkerLoRAManager(
                self.lora_config, self.model,
                dtype=jnp.dtype(self.model_config.dtype), mesh=self.mesh)
        logger.info("Model loaded in %.2fs", time.time() - t0)

    def save_state(self, model_dir: str) -> None:
        """Save the CANONICAL device param tree for fast reload with
        --load-format nmv (reference save_sharded_state,
        model_runner.py:304; orbax shards large arrays on disk)."""
        import orbax.checkpoint as ocp
        import os
        path = os.path.join(os.path.abspath(model_dir), "nmv_state")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.params, force=True)
        ckptr.wait_until_finished()  # the save is async

    def _maybe_inject_kv_scales(self, params):
        """Per-layer FP8 KV scales from --quantization-param-path JSON
        (reference quantization/schema.py + kv_cache_dtype plumbing)."""
        path = getattr(self.model_config, "quantization_param_path", None)
        if not path:
            return params
        import json
        with open(path) as f:
            schema = json.load(f)
        factors = schema.get("kv_cache", {}).get("scaling_factor", {})
        # schema: {tp_rank: {layer: scale}} or flat {layer: scale}
        if factors and isinstance(next(iter(factors.values())), dict):
            factors = factors.get("0", next(iter(factors.values())))
        L = self.model_config.get_num_layers(self.parallel_config)
        arr = np.ones((L, 2), np.float32)
        for k, v in factors.items():
            arr[int(k)] = float(v)
        if isinstance(params.get("layers"), dict):
            params["layers"]["kv_scales"] = jnp.asarray(arr)
        return params

    def _shard_params(self, params):
        if self.mesh is None:
            return jax.device_put(params)
        from neural_magic_vllm_tpu.parallel import build_shardings
        shardings = build_shardings(self.mesh, params,
                                    self.model.param_specs())
        return jax.device_put(params, shardings)

    def build_state_arrays(self):
        """Recurrent-state slot arrays for stateful models (appended to the
        cache pytree by CacheEngine); None for stateless models."""
        if not self.has_state:
            return None
        return self.model.state_arrays(self.num_state_slots)

    def _state_slot(self, seq_id: int, active: set) -> int:
        """Slot for seq_id, recycling the LRU slot of a non-active
        sequence when full."""
        if seq_id in self._state_slots:
            self._state_slots.move_to_end(seq_id)
            return self._state_slots[seq_id]
        if self._state_free:
            slot = self._state_free.pop()
        else:
            victim = next(sid for sid in self._state_slots
                          if sid not in active)
            slot = self._state_slots.pop(victim)
        self._state_slots[seq_id] = slot
        return slot

    def kv_sharding(self):
        """KV stacks [L, nb, kvh, bs, hd] are GLOBAL-shaped (total kv
        heads); the kv-head axis shards over "model" when it divides
        evenly, else the cache replicates (TP > kv heads: every chip
        serves all heads, matching query-head replication)."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        tp = self.mesh.shape.get("model", 1)
        total_kv = self.model_config.get_total_num_kv_heads()
        kvh = "model" if total_kv % tp == 0 else None
        stage = "stage" if self.mesh.shape.get("stage", 1) > 1 else None
        return NamedSharding(self.mesh, P(stage, None, kvh, None, None))

    def draft_kv_sharding(self):
        if self.mesh is None or self.draft_model_config is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        if getattr(self, "_draft_replicated", False):
            return NamedSharding(self.mesh, P())
        tp = self.mesh.shape.get("model", 1)
        total_kv = self.draft_model_config.get_total_num_kv_heads()
        spec = P(None, None, "model", None, None) \
            if total_kv % tp == 0 else P(None, None, None, None, None)
        return NamedSharding(self.mesh, spec)

    def _dp_batch_constraint(self):
        """Constraint fn sharding a [B, ...] array's batch dim over the
        mesh "data" axis — real data parallelism for the decode stack:
        GSPMD splits the GEMM rows, sampling, and lm_head per data shard
        (weights and KV stay replicated over "data"). Identity when
        dp == 1. Reference role: DP replica serving; here it is one
        engine whose decode batch is row-sharded across the mesh."""
        if self.mesh is None or self.mesh.shape.get("data", 1) == 1:
            return lambda x: x
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh

        def constrain(x):
            if getattr(x, "ndim", 0) < 1:
                return x
            spec = P(*(("data",) + (None,) * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

        return constrain

    # --- step executables -----------------------------------------------------
    def _out_replicator(self):
        """Host-fetched dispatch outputs (sampled ids, logprobs, logits)
        must be fully replicated under a MULTI-PROCESS mesh: a
        data-sharded output spans non-addressable devices and
        jax.device_get on the driver raises. The constraint is a tiny
        all-gather of token ids (or the logits rows on the host-sampling
        path); KV caches keep their sharded layout. Caught by the
        4-process dp2 x tp4 e2e test — invisible on single-process
        meshes where every device is addressable."""
        if self.mesh is None:
            return lambda t: t
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())

        def rep(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, repl), tree)

        return rep

    def _get_fn(self, kind: str, num_logprobs: int):
        key = (kind, num_logprobs)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        rep = self._out_replicator()

        if kind == "prefill_sample":

            def fn(params, kv_caches, tokens, positions, meta, sample_idx,
                   samp, lora, lora_idx, mm=None):
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=True,
                                                   lora=lora,
                                                   lora_idx=lora_idx,
                                                   mm=mm)
                last = jax.lax.dynamic_slice_in_dim(hidden, sample_idx, 1, 0)
                logits = model.compute_logits(params, last)
                pos = jax.lax.dynamic_slice_in_dim(positions, sample_idx, 1,
                                                   0)
                out = sample(logits, _fold_position(samp, pos),
                             max_logprobs=num_logprobs)
                return new_caches, rep(out)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "prefill_batch":
            # ragged batched prefill: several context-free prompts share ONE
            # weight pass (segment attention); per-seq last-token sampling

            def fn(params, kv_caches, tokens, positions, meta, sample_idx,
                   samp, lora, lora_idx):
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=True,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                sel = jnp.take(hidden, sample_idx, axis=0)  # [B, H]
                logits = model.compute_logits(params, sel)
                pos_sel = jnp.take(positions, sample_idx, axis=0)
                out = sample(logits, _fold_position(samp, pos_sel),
                             max_logprobs=num_logprobs)
                return new_caches, rep(out)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "draft_prefill":
            # mirror a prompt into the draft model's KV cache (no sampling)
            draft = self.draft_model

            def fn(dparams, draft_kv, tokens, positions, meta):
                _, new_kv = draft.forward(dparams, tokens, positions,
                                          draft_kv, meta, is_prefill=True)
                return new_kv

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "prefill_hidden":
            # raw hidden states (embedding-model pooling, reference
            # EmbeddingModelRunner, vllm/worker/embedding_model_runner.py)

            def fn(params, kv_caches, tokens, positions, meta, lora,
                   lora_idx, mm=None):
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=True,
                                                   lora=lora,
                                                   lora_idx=lora_idx,
                                                   mm=mm)
                return new_caches, rep(hidden)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "prefill_logits":
            # full-chunk logits (prompt logprobs / host sampling)

            def fn(params, kv_caches, tokens, positions, meta, lora,
                   lora_idx, mm=None):
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=True,
                                                   lora=lora,
                                                   lora_idx=lora_idx,
                                                   mm=mm)
                logits = model.compute_logits(params, hidden)
                return new_caches, rep(logits)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_spec_verify":
            # ngram/proposer verification with IN-GRAPH greedy rejection:
            # the flat [B*S, V] logits never leave the device (the host
            # pull was 328 MB/dispatch at bs128 k=4 on the 8B model —
            # measured 20 s/dispatch through the tunnel, spec_bench r4).
            # Reference runs rejection on-accelerator too
            # (rejection_sampler.py:11). num_logprobs is reused as S=k+1.
            S = num_logprobs

            def fn(params, kv_caches, tokens, positions, meta, proposals,
                   plen, lora, lora_idx):
                hidden, new_caches = model.forward(params, tokens,
                                                   positions, kv_caches,
                                                   meta, is_prefill=False,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                logits = model.compute_logits(params, hidden)
                Bm = proposals.shape[0]
                k = S - 1
                lg = logits[:Bm * S].reshape(Bm, S, -1)
                argmx = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [Bm, S]
                jk = jax.lax.broadcasted_iota(jnp.int32, (Bm, k), 1)
                match = (argmx[:, :k] == proposals) & (jk < plen[:, None])
                # greedy rejection: accept the matching prefix; row n_acc
                # (the first mismatch, or the bonus row) emits the target
                # argmax either way -> emitted[j] = argmx[j] for j <= n_acc
                n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32),
                                            axis=1), axis=1)  # [Bm]
                js = jax.lax.broadcasted_iota(jnp.int32, (Bm, S), 1)
                emitted = jnp.where(js <= n_acc[:, None], argmx, -1)
                lse = jax.nn.logsumexp(lg, axis=-1)  # [Bm, S]
                chosen = jnp.take_along_axis(
                    lg, jnp.clip(emitted, 0)[:, :, None], axis=2)[..., 0]
                return new_caches, rep((emitted, n_acc + 1,
                                        chosen - lse))

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_spec_verify_stoch":
            # ngram verification with IN-GRAPH seeded one-hot rejection
            # sampling (VERDICT r4 #4): accept proposal d_j with prob
            # p_target(d_j) (one-hot draft), resample the first reject
            # from the residual (p with d_j zeroed), bonus-sample p_k on
            # full accept — lossless, and only ids + logprobs cross the
            # link. Reference runs rejection on-accelerator too
            # (vllm/model_executor/layers/rejection_sampler.py:11).
            from neural_magic_vllm_tpu.spec_decode.rejection import \
                onehot_rejection_ingraph
            S = num_logprobs

            def fn(params, kv_caches, tokens, positions, meta, proposals,
                   plen, base_pos, temperature, keys, lora, lora_idx):
                hidden, new_caches = model.forward(params, tokens,
                                                   positions, kv_caches,
                                                   meta, is_prefill=False,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                logits = model.compute_logits(params, hidden)
                Bm = proposals.shape[0]
                lg = logits[:Bm * S].reshape(Bm, S, -1).astype(jnp.float32)
                return new_caches, rep(onehot_rejection_ingraph(
                    lg, proposals, plen, base_pos, temperature, keys))

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_sample":
            dp_shard = self._dp_batch_constraint()

            def fn(params, kv_caches, tokens, positions, meta, samp, lora,
                   lora_idx):
                tokens = dp_shard(tokens)
                positions = dp_shard(positions)
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=False,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                logits = model.compute_logits(params, hidden)
                out = sample(logits, _fold_position(samp, positions),
                             max_logprobs=num_logprobs)
                return new_caches, rep(out)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_multi":
            # K fused decode iterations: sampled tokens feed the next
            # iteration in-graph; ONE host round trip per K tokens/seq.
            # This is the TPU answer to host-latency amortization (the
            # reference's multi-step scheduling / CUDA-graph trick).
            K, nlp = num_logprobs
            bs = self.block_size
            dp_shard = self._dp_batch_constraint()

            def fn(params, kv_caches, tokens, positions, tables, valid,
                   samp, lora, lora_idx):
                tokens = dp_shard(tokens)
                positions = dp_shard(positions)
                tables = dp_shard(tables)
                valid = dp_shard(valid)
                # Penalty requests: the output-token history buffer rides
                # the scan carry so iteration k's penalties see tokens
                # sampled at iterations < k (in-graph append).
                has_pen = samp.output_tokens is not None

                def body(carry, _):
                    if has_pen:
                        kv, toks, pos, obuf, widx = carry
                    else:
                        kv, toks, pos = carry
                    blk = jnp.take_along_axis(tables, (pos // bs)[:, None],
                                              axis=1)[:, 0]
                    slots = jnp.where(valid, blk * bs + pos % bs, -1)
                    meta = AttentionMetadata(slot_mapping=slots,
                                             block_tables=tables,
                                             context_lens=pos + 1)
                    hidden, newkv = model.forward(params, toks, pos, kv,
                                                  meta, is_prefill=False,
                                                  lora=lora,
                                                  lora_idx=lora_idx)
                    logits = model.compute_logits(params, hidden)
                    samp_k = _fold_position(samp, pos)
                    if has_pen:
                        samp_k = samp_k._replace(output_tokens=obuf)
                    out = sample(logits, samp_k, max_logprobs=nlp)
                    tid = out[0]
                    if has_pen:
                        obuf = obuf.at[jnp.arange(obuf.shape[0]),
                                       widx].set(tid, mode="drop")
                        return (newkv, tid, pos + 1, obuf, widx + 1), out
                    return (newkv, tid, pos + 1), out

                init = (kv_caches, tokens, positions)
                if has_pen:
                    init = init + (samp.output_tokens, samp.output_len)
                carry_out, ys = jax.lax.scan(body, init, None, length=K)
                return carry_out[0], rep(ys)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "prefill_batch_decode":
            # piggyback: [b_dec decode rows] + [t_pad batched-prefill
            # segment rows] share ONE weight stream; decode rows advance
            # one step and sample in-graph, each prompt samples its last
            # token (reference's prefill-majority unified batch,
            # flash_attn.py:252-367)
            def fn(params, kv_caches, d_tokens, d_positions, d_slots,
                   d_tables, d_ctx, d_samp, p_tokens, p_positions,
                   p_slots, p_seq_ids, sample_idx, p_samp, lora,
                   lora_idx):
                Bd = d_tokens.shape[0]
                tokens = jnp.concatenate([d_tokens, p_tokens])
                positions = jnp.concatenate([d_positions, p_positions])
                meta = AttentionMetadata(
                    slot_mapping=jnp.concatenate([d_slots, p_slots]),
                    block_tables=d_tables,
                    context_lens=d_ctx,
                    seq_ids=p_seq_ids,
                    q_pos=p_positions)
                hidden, new_caches = model.forward(params, tokens,
                                                   positions, kv_caches,
                                                   meta, is_prefill=False,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                d_logits = model.compute_logits(params, hidden[:Bd])
                d_out = sample(d_logits,
                               _fold_position(d_samp, d_positions),
                               max_logprobs=num_logprobs)
                sel = jnp.take(hidden[Bd:], sample_idx, axis=0)
                p_logits = model.compute_logits(params, sel)
                pos_sel = jnp.take(p_positions, sample_idx, axis=0)
                p_out = sample(p_logits, _fold_position(p_samp, pos_sel),
                               max_logprobs=num_logprobs)
                return new_caches, (rep(d_out), rep(p_out))

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_multi_mixed":
            # K fused decode iterations + one chunked prefill advancing
            # mixed_chunk_width tokens PER ITERATION in the same forward
            # (VERDICT r4 #1). The chunk's GEMM rows concatenate onto the
            # decode rows, so prefill rides the decode batch's weight
            # stream; attention splits decode-paged / context-prefill in
            # layers/attention.py. Per-iteration chunk inputs arrive as
            # scan xs; the prompt's first generated token is sampled
            # in-graph at its final chunk (p_sample_idx >= 0). Reference:
            # unified prefill+decode batch in one flash_attn launch
            # (flash_attn.py:252-367) under the chunked-prefill policy
            # (scheduler.py:846).
            K, nlp = num_logprobs
            bs = self.block_size

            def fn(params, kv_caches, tokens, positions, tables, valid,
                   samp, lora, lora_idx, p_tokens, p_positions, p_slots,
                   p_ctx, p_sample_idx, p_tables, p_samp):
                # per-iteration chunk inputs ride the scan xs — each
                # iteration may belong to a DIFFERENT prompt (its own
                # block table, context offset and sampling row), so one
                # window prefills up to K short prompts while decodes
                # advance K steps
                def body(carry, xs):
                    kv, toks, pos = carry
                    (ptok_k, ppos_k, pslot_k, pctx_k, psi_k, ptab_k,
                     psamp_k) = xs
                    blk = jnp.take_along_axis(tables, (pos // bs)[:, None],
                                              axis=1)[:, 0]
                    slots = jnp.where(valid, blk * bs + pos % bs, -1)
                    all_tokens = jnp.concatenate([toks, ptok_k])
                    all_pos = jnp.concatenate([pos, ppos_k])
                    meta = AttentionMetadata(
                        slot_mapping=jnp.concatenate([slots, pslot_k]),
                        block_tables=tables,
                        context_lens=pos + 1,
                        p_block_tables=ptab_k[None],
                        p_context_lens=pctx_k[None])
                    hidden, newkv = model.forward(params, all_tokens,
                                                  all_pos, kv, meta,
                                                  is_prefill=False,
                                                  lora=lora,
                                                  lora_idx=lora_idx)
                    B = toks.shape[0]
                    logits = model.compute_logits(params, hidden[:B])
                    out = sample(logits, _fold_position(samp, pos),
                                 max_logprobs=nlp)
                    tid = out[0]
                    # prefill sample (gated by p_sample_idx >= 0 on host;
                    # always computed in-graph — one row)
                    prow = hidden[B + jnp.clip(psi_k, 0)]
                    p_logits = model.compute_logits(params, prow[None])
                    p_out = sample(
                        p_logits,
                        _fold_position(psamp_k, (pctx_k + psi_k)[None]),
                        max_logprobs=nlp)
                    return (newkv, tid, pos + 1), (out, p_out)

                xs = (p_tokens, p_positions, p_slots, p_ctx,
                      p_sample_idx, p_tables, p_samp)
                carry_out, (ys, p_ys) = jax.lax.scan(
                    body, (kv_caches, tokens, positions), xs, length=K)
                return carry_out[0], (rep(ys), rep(p_ys))

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_multi_guided":
            # decode_multi + in-graph guided decoding: rows carrying a
            # DFA state id (gstate >= 0) mask their logits by the packed
            # allow-table and advance their state after sampling, all
            # inside the K-step scan — guided rows ride the SAME fused
            # dispatch (VERDICT r4 #2; reference masks per step on host,
            # outlines_logits_processors.py:67-148).
            from neural_magic_vllm_tpu.ops.guided import (
                guided_advance, guided_gather_rows, guided_mask)
            K, nlp = num_logprobs
            bs = self.block_size
            dp_shard = self._dp_batch_constraint()

            def fn(params, kv_caches, tokens, positions, tables, valid,
                   samp, lora, lora_idx, gstate, eos_ids, gtab):
                tokens = dp_shard(tokens)
                positions = dp_shard(positions)
                tables = dp_shard(tables)
                valid = dp_shard(valid)
                has_pen = samp.output_tokens is not None

                def body(carry, _):
                    if has_pen:
                        kv, toks, pos, gs, obuf, widx = carry
                    else:
                        kv, toks, pos, gs = carry
                    blk = jnp.take_along_axis(tables, (pos // bs)[:, None],
                                              axis=1)[:, 0]
                    slots = jnp.where(valid, blk * bs + pos % bs, -1)
                    meta = AttentionMetadata(slot_mapping=slots,
                                             block_tables=tables,
                                             context_lens=pos + 1)
                    hidden, newkv = model.forward(params, toks, pos, kv,
                                                  meta, is_prefill=False,
                                                  lora=lora,
                                                  lora_idx=lora_idx)
                    logits = model.compute_logits(params, hidden)
                    arows, rrows = guided_gather_rows(gtab, gs)
                    logits = guided_mask(logits, gs, arows)
                    samp_k = _fold_position(samp, pos)
                    if has_pen:
                        samp_k = samp_k._replace(output_tokens=obuf)
                    out = sample(logits, samp_k, max_logprobs=nlp)
                    tid = out[0]
                    gs = guided_advance(gtab, gs, tid, eos_ids, rrows)
                    if has_pen:
                        obuf = obuf.at[jnp.arange(obuf.shape[0]),
                                       widx].set(tid, mode="drop")
                        return (newkv, tid, pos + 1, gs, obuf,
                                widx + 1), out
                    return (newkv, tid, pos + 1, gs), out

                init = (kv_caches, tokens, positions, gstate)
                if has_pen:
                    init = init + (samp.output_tokens, samp.output_len)
                carry_out, ys = jax.lax.scan(body, init, None, length=K)
                return carry_out[0], rep(ys)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_logits":

            def fn(params, kv_caches, tokens, positions, meta, lora,
                   lora_idx):
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=False,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                logits = model.compute_logits(params, hidden)
                return new_caches, rep(logits)

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "decode_logits_hidden":
            # logits + raw hidden states (MLPSpeculator verification:
            # proposals for the NEXT step condition on the hidden state of
            # the last accepted row)

            def fn(params, kv_caches, tokens, positions, meta, lora,
                   lora_idx):
                hidden, new_caches = model.forward(params, tokens, positions,
                                                   kv_caches, meta,
                                                   is_prefill=False,
                                                   lora=lora,
                                                   lora_idx=lora_idx)
                logits = model.compute_logits(params, hidden)
                return new_caches, rep((logits, hidden))

            jfn = jax.jit(fn, donate_argnums=(1, ))

        elif kind == "mlp_propose":
            spec = self.mlp_speculator
            K = num_logprobs  # reused as the proposal length

            def fn(sparams, last_tokens, hidden):
                return spec.propose(sparams, last_tokens, hidden, K)

            jfn = jax.jit(fn)
        else:
            raise ValueError(kind)
        from neural_magic_vllm_tpu import envs as _envs
        if _envs.NMV_TPU_DUMP_HLO:
            jfn = _hlo_dump_wrapper(jfn, kind, num_logprobs,
                                    _envs.NMV_TPU_DUMP_HLO)
        self._fns[key] = jfn
        return jfn

    # --- warmup -----------------------------------------------------------------
    def warmup(self, cache_engine: CacheEngine,
               full: bool = False) -> None:
        """Pre-compile the serving executables for every bucket (reference
        tpu_model_runner.py:159-197). With full=False only the largest
        buckets compile eagerly (CI-friendly); the rest compile on first
        use (persisted in the XLA compilation cache)."""
        t0 = time.time()
        prefill_buckets = self.scheduler_config.prefill_buckets()
        decode_buckets = self.scheduler_config.decode_buckets()
        if not full:
            prefill_buckets = prefill_buckets[-1:]
            decode_buckets = decode_buckets[-1:]
        for s in prefill_buckets:
            tb = time.time()
            kv = cache_engine.kv_caches
            kv = self._run_dummy_prefill(kv, s)
            cache_engine.kv_caches = kv
            logger.info("Warmup prefill bucket %d: %.1fs", s,
                        time.time() - tb)
            if full:
                # batched-prefill executable for this token bucket (b is
                # a function of t_pad, so this covers the whole lattice)
                tb = time.time()
                cache_engine.kv_caches = self._run_dummy_prefill_batch(
                    cache_engine.kv_caches, s)
                logger.info("Warmup batched-prefill bucket %d: %.1fs", s,
                            time.time() - tb)
                from neural_magic_vllm_tpu import envs as _envs
                if _envs.NMV_TPU_MIXED_PREFILL_WINDOW and \
                        self.scheduler_config.chunked_prefill_enabled and \
                        self._fused_composition_ok():
                    tb = time.time()
                    cache_engine.kv_caches = \
                        self._run_dummy_prefill_batch_decode(
                            cache_engine.kv_caches, s)
                    logger.info("Warmup piggyback prefill bucket %d "
                                "(+%d decode rows): %.1fs", s,
                                self._piggyback_rows(), time.time() - tb)
        for b in decode_buckets:
            tb = time.time()
            kv = self._run_dummy_decode(cache_engine.kv_caches, b)
            jax.block_until_ready(jax.tree_util.tree_leaves(kv)[0])
            cache_engine.kv_caches = kv
            logger.info("Warmup decode bucket %d: %.1fs", b,
                        time.time() - tb)
            # timed runs (chained through the donated KV cache, fresh
            # token values, so the tunneled device cannot answer from
            # a dispatch cache — PERF.md measurement caveats). Min of
            # two: one noisy high reading otherwise under-fuses the
            # most-used bucket for the whole serving session. Always
            # measured (not only under fused_dispatch_target_ms) so the
            # headline bench and serving report the same per-bucket step
            # cost and the warmup log never prints a placeholder.
            best = float("inf")
            for fill in (1, 2):
                t1 = time.perf_counter()
                kv = self._run_dummy_decode(cache_engine.kv_caches, b,
                                            token_fill=fill)
                jax.block_until_ready(jax.tree_util.tree_leaves(kv)[0])
                best = min(best, (time.perf_counter() - t1) * 1e3)
                cache_engine.kv_caches = kv
            self._bucket_step_ms[b] = best
        K = self.scheduler_config.num_scheduler_steps
        if K > 1:  # the fused multi-step executable used in steady state
            for b in decode_buckets:
                self._fused_k_table[b] = self._pick_fused_k(b, K)
            # monotone smoothing: a smaller bucket's step time cannot
            # genuinely exceed a larger bucket's, so its K must be at
            # least the larger bucket's (guards against one noisy timing
            # pinning a mid-lattice bucket at K=1)
            for i in range(len(decode_buckets) - 2, -1, -1):
                b, nxt = decode_buckets[i], decode_buckets[i + 1]
                self._fused_k_table[b] = max(self._fused_k_table[b],
                                             self._fused_k_table[nxt])
            for b in decode_buckets:
                K_b = self._fused_k_table[b]
                if K_b <= 1:
                    continue
                tb = time.time()
                kv = cache_engine.kv_caches
                kv = self._run_dummy_decode_multi(kv, b, K_b)
                cache_engine.kv_caches = kv
                logger.info("Warmup fused-%d decode bucket %d: %.1fs "
                            "(step %.0f ms)", K_b, b, time.time() - tb,
                            self._bucket_step_ms.get(b, -1.0))
        if full:
            from neural_magic_vllm_tpu import envs as _envs
            if K > 1 and _envs.NMV_TPU_MIXED_PREFILL_WINDOW and \
                    self.scheduler_config.chunked_prefill_enabled and \
                    self._fused_composition_ok():
                # mixed decode+prefill window executables
                for b in decode_buckets:
                    K_b = self._fused_k_table.get(b, K)
                    if K_b <= 1:
                        continue
                    tb = time.time()
                    cache_engine.kv_caches = self._run_dummy_decode_mixed(
                        cache_engine.kv_caches, b, K_b)
                    logger.info("Warmup mixed fused-%d decode bucket %d "
                                "(+%d-token chunk lane): %.1fs", K_b, b,
                                self.scheduler_config.mixed_chunk_width(),
                                time.time() - tb)
            if K > 1 and _envs.NMV_TPU_GUIDED_DEVICE and \
                    self.control_plane is None:
                # guided fused-decode variant: same bucket x K_b lattice
                # as decode_multi so the first device-guided request
                # never compiles at serve time
                for b in decode_buckets:
                    K_b = self._fused_k_table.get(b, K)
                    if K_b <= 1:
                        continue
                    tb = time.time()
                    cache_engine.kv_caches = \
                        self._run_dummy_decode_multi_guided(
                            cache_engine.kv_caches, b, K_b)
                    logger.info("Warmup guided fused-%d decode bucket "
                                "%d: %.1fs", K_b, b, time.time() - tb)
            # queue-pressure short windows: small buckets fuse K=4 when
            # requests wait (fused_k_for_batch); pre-compile those
            # variants so the arrival the shrink protects never pays a
            # serve-time compile (review r5 finding #1)
            if K > 1:
                K_small = min(4, K)
                for b in decode_buckets:
                    if b >= _envs.NMV_TPU_MIXED_WINDOW_MIN_DECODE or \
                            K_small >= self._fused_k_table.get(b, K):
                        continue
                    tb = time.time()
                    cache_engine.kv_caches = self._run_dummy_decode_multi(
                        cache_engine.kv_caches, b, K_small)
                    if _envs.NMV_TPU_GUIDED_DEVICE and \
                            self.control_plane is None:
                        cache_engine.kv_caches = \
                            self._run_dummy_decode_multi_guided(
                                cache_engine.kv_caches, b, K_small)
                    logger.info("Warmup short fused-%d decode bucket %d: "
                                "%.1fs", K_small, b, time.time() - tb)
            # host-sampled decode_logits executables (guided / beam /
            # penalty minority) ride a coarse powers-of-4 lattice; warm
            # every bucket so the FIRST guided request in steady state
            # never triggers a serve-time XLA compile (advisor r4).
            for b in self.scheduler_config.host_logits_buckets():
                tb = time.time()
                cache_engine.kv_caches = self._run_dummy_decode_logits(
                    cache_engine.kv_caches, b)
                logger.info("Warmup decode_logits bucket %d: %.1fs", b,
                            time.time() - tb)
        if not full:
            # batched-prefill executable at the largest token bucket only
            cache_engine.kv_caches = self._run_dummy_prefill_batch(
                cache_engine.kv_caches, prefill_buckets[-1])
        logger.info("Warmup done in %.1fs (%d prefill + %d decode buckets)",
                    time.time() - t0, len(prefill_buckets),
                    len(decode_buckets))

    def _dummy_samp(self, B: int) -> SamplingTensors:
        return SamplingTensors(
            temperature=jnp.zeros((B, ), jnp.float32),
            top_k=jnp.full((B, ), 1, jnp.int32),
            top_p=jnp.ones((B, ), jnp.float32),
            min_p=jnp.zeros((B, ), jnp.float32),
            presence_penalty=jnp.zeros((B, ), jnp.float32),
            frequency_penalty=jnp.zeros((B, ), jnp.float32),
            repetition_penalty=jnp.ones((B, ), jnp.float32),
            keys=jnp.zeros((B, 2), jnp.uint32),
        )

    def _run_dummy_prefill(self, kv_caches, s: int):
        meta = AttentionMetadata(
            slot_mapping=jnp.full((s, ), -1, jnp.int32),
            block_tables=jnp.zeros((1, self.max_blocks_per_seq), jnp.int32),
            context_lens=jnp.zeros((1, ), jnp.int32),
            state_slots=jnp.full((1, ), self.num_state_slots, jnp.int32)
            if self.has_state else None)
        fn = self._get_fn("prefill_sample", 0)
        lora, lidx = self._lora_args(None, s)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((s, ), jnp.int32),
                       jnp.zeros((s, ), jnp.int32), meta,
                       jnp.int32(0), self._dummy_samp(1), lora, lidx)
        return new_kv

    def _run_dummy_prefill_batch(self, kv_caches, s: int):
        b = self._prefill_batch_width(s)
        meta = AttentionMetadata(
            slot_mapping=jnp.full((s, ), -1, jnp.int32),
            block_tables=jnp.zeros((1, 4), jnp.int32),
            context_lens=jnp.zeros((1, ), jnp.int32),
            seq_ids=jnp.zeros((s, ), jnp.int32),
            q_pos=jnp.arange(s, dtype=jnp.int32))
        fn = self._get_fn("prefill_batch", 0)
        lora, lidx = self._lora_args(None, s)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((s, ), jnp.int32),
                       jnp.arange(s, dtype=jnp.int32), meta,
                       jnp.zeros((b, ), jnp.int32), self._dummy_samp(b),
                       lora, lidx)
        return new_kv

    def _run_dummy_decode_multi(self, kv_caches, b: int, K: int):
        fn = self._get_fn("decode_multi", (K, 0))
        lora, lidx = self._lora_args(None, b)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, self.max_blocks_per_seq), jnp.int32),
                       jnp.zeros((b, ), jnp.bool_), self._dummy_samp(b),
                       lora, lidx)
        return new_kv

    def _run_dummy_decode(self, kv_caches, b: int, token_fill: int = 0):
        meta = AttentionMetadata(
            slot_mapping=jnp.full((b, ), -1, jnp.int32),
            block_tables=jnp.zeros((b, self.max_blocks_per_seq), jnp.int32),
            context_lens=jnp.ones((b, ), jnp.int32),
            state_slots=jnp.full((b, ), self.num_state_slots, jnp.int32)
            if self.has_state else None)
        fn = self._get_fn("decode_sample", 0)
        lora, lidx = self._lora_args(None, b)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.full((b, ), token_fill, jnp.int32),
                       jnp.zeros((b, ), jnp.int32), meta,
                       self._dummy_samp(b), lora, lidx)
        return new_kv

    def _run_dummy_prefill_batch_decode(self, kv_caches, s: int):
        b = self._prefill_batch_width(s)
        bd = self._piggyback_rows()
        fn = self._get_fn("prefill_batch_decode", 0)
        lora, lidx = self._lora_args(None, bd + s)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((bd, ), jnp.int32),
                       jnp.zeros((bd, ), jnp.int32),
                       jnp.full((bd, ), -1, jnp.int32),
                       jnp.zeros((bd, self.max_blocks_per_seq), jnp.int32),
                       jnp.ones((bd, ), jnp.int32),
                       self._dummy_samp(bd),
                       jnp.zeros((s, ), jnp.int32),
                       jnp.arange(s, dtype=jnp.int32),
                       jnp.full((s, ), -1, jnp.int32),
                       jnp.full((s, ), -1, jnp.int32),
                       jnp.zeros((b, ), jnp.int32),
                       self._dummy_samp(b), lora, lidx)
        return new_kv

    def _run_dummy_decode_mixed(self, kv_caches, b: int, K: int):
        C = self.scheduler_config.mixed_chunk_width()
        fn = self._get_fn("decode_multi_mixed", (K, 0))
        lora, lidx = self._lora_args(None, b + C)
        one = self._dummy_samp(1)
        p_samp = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *([one] * K))
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, self.max_blocks_per_seq), jnp.int32),
                       jnp.zeros((b, ), jnp.bool_), self._dummy_samp(b),
                       lora, lidx,
                       jnp.zeros((K, C), jnp.int32),
                       jnp.zeros((K, C), jnp.int32),
                       jnp.full((K, C), -1, jnp.int32),
                       jnp.zeros((K, ), jnp.int32),
                       jnp.full((K, ), -1, jnp.int32),
                       jnp.zeros((K, self.max_blocks_per_seq), jnp.int32),
                       p_samp)
        return new_kv

    def _run_dummy_decode_multi_guided(self, kv_caches, b: int, K: int):
        mgr = self._get_guided_mgr()
        fn = self._get_fn("decode_multi_guided", (K, 0))
        lora, lidx = self._lora_args(None, b)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, self.max_blocks_per_seq), jnp.int32),
                       jnp.zeros((b, ), jnp.bool_), self._dummy_samp(b),
                       lora, lidx,
                       jnp.full((b, ), -1, jnp.int32),
                       jnp.full((b, ), -1, jnp.int32),
                       mgr.device_tables)
        return new_kv

    def _run_dummy_decode_logits(self, kv_caches, b: int):
        meta = AttentionMetadata(
            slot_mapping=jnp.full((b, ), -1, jnp.int32),
            block_tables=jnp.zeros((b, self.max_blocks_per_seq), jnp.int32),
            context_lens=jnp.ones((b, ), jnp.int32),
            state_slots=jnp.full((b, ), self.num_state_slots, jnp.int32)
            if self.has_state else None)
        fn = self._get_fn("decode_logits", 0)
        lora, lidx = self._lora_args(None, b)
        new_kv, _ = fn(self.params, kv_caches,
                       jnp.zeros((b, ), jnp.int32),
                       jnp.zeros((b, ), jnp.int32), meta, lora, lidx)
        return new_kv

    def _pick_fused_k(self, bucket: int, k_cfg: int) -> int:
        """Largest candidate K <= num_scheduler_steps whose fused dispatch
        (K x measured single-step ms) fits fused_dispatch_target_ms.
        Candidates are powers of two plus k_cfg itself. Without a target
        (or a measurement) the configured K is used unchanged."""
        target = self.scheduler_config.fused_dispatch_target_ms
        step_ms = self._bucket_step_ms.get(bucket)
        if target <= 0 or step_ms is None or step_ms <= 0:
            return k_cfg
        best = 1
        k = 1
        while k <= k_cfg:
            if k * step_ms <= target:
                best = k
            k *= 2
        if k_cfg * step_ms <= target:
            best = k_cfg
        return best

    def fused_k_for_batch(self, num_decodes: int) -> int:
        """K for this step's decode dispatch: per-bucket adaptive when
        fused_dispatch_target_ms is set (falling back to the nearest
        measured bucket at or above), else the configured K. At low load
        (small padded batch) with requests WAITING, the window shrinks to
        4 so the arrival's prefill isn't stuck behind a long dispatch."""
        k_cfg = self.scheduler_config.num_scheduler_steps
        if k_cfg <= 1:
            return 1
        from neural_magic_vllm_tpu import envs as _envs
        if getattr(self, "_num_waiting", 0) > 0 and \
                self.scheduler_config.pad_decode_batch(num_decodes) < \
                _envs.NMV_TPU_MIXED_WINDOW_MIN_DECODE:
            return min(4, k_cfg)
        if self.scheduler_config.fused_dispatch_target_ms <= 0 or \
                not self._fused_k_table:
            return k_cfg
        b_pad = self.scheduler_config.pad_decode_batch(num_decodes)
        if b_pad in self._fused_k_table:
            return self._fused_k_table[b_pad]
        for b in sorted(self._fused_k_table):
            if b >= b_pad:
                return self._fused_k_table[b]
        return self._fused_k_table[max(self._fused_k_table)]

    # --- memory profiling -------------------------------------------------------
    def param_bytes(self) -> int:
        """Total bytes of the loaded parameter pytree (used to estimate
        peak memory when the PJRT client exposes no memory_stats)."""
        leaves = jax.tree_util.tree_leaves(self.params)
        if self.draft_params is not None:
            leaves += jax.tree_util.tree_leaves(self.draft_params)
        return sum(x.nbytes for x in leaves)

    def profile_peak_bytes(self, cache_engine_tmp_blocks: int = 8) -> int:
        """Run the largest prefill against a tiny KV cache and report peak
        device memory (reference determine_num_available_blocks,
        worker.py:155-198)."""
        model = self.model
        kvh = self.model_config.get_num_kv_heads(self.parallel_config)
        hd = self.model_config.get_head_size()
        from neural_magic_vllm_tpu.worker.cache_engine import \
            get_kv_cache_dtype
        kv_dtype = get_kv_cache_dtype(self.cache_config.cache_dtype,
                                      self.model_config.dtype)
        tmp_engine = CacheEngine(
            num_layers=self.model_config.get_num_layers(
                self.parallel_config), num_kv_heads=kvh, head_dim=hd,
            block_size=self.block_size,
            num_device_blocks=cache_engine_tmp_blocks, num_cpu_blocks=0,
            kv_dtype=kv_dtype, sharding=self.kv_sharding(),
            extra_state=self.build_state_arrays())
        s = self.scheduler_config.prefill_buckets()[-1]
        kv = self._run_dummy_prefill(tmp_engine.kv_caches, s)
        jax.block_until_ready(kv)
        dev = jax.devices()[0]
        stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
        del kv, tmp_engine
        if stats and "peak_bytes_in_use" in stats:
            return int(stats["peak_bytes_in_use"])
        return -1

    # --- input preparation -------------------------------------------------------
    def _block_table_row(self, table: List[int],
                         width: Optional[int] = None) -> np.ndarray:
        width = width if width is not None else self.max_blocks_per_seq
        row = np.zeros((width, ), np.int32)
        n = min(len(table), width)
        row[:n] = table[:n]
        return row

    def _lora_args(self, lora_requests: Optional[List], n: int,
                   spans: Optional[List[int]] = None):
        """(lora pytree, [n] slot indices) for the step executables; when
        LoRA serving is enabled the stacks are ALWAYS passed (constant jit
        treedef) with slot 0 = null adapter for unadapted rows.

        Decode calls have one row per request (spans=None); prefill calls
        pass spans = token count per request so EVERY prompt token routes
        through its adapter."""
        if self.lora_manager is None:
            return None, None
        idx = np.zeros((n, ), np.int32)
        slots: List[int] = []
        if lora_requests is not None:
            slots = self.lora_manager.slots_for(lora_requests)
            if spans is None:
                idx[:len(slots)] = slots
            else:
                cursor = 0
                for slot, span in zip(slots, spans):
                    idx[cursor:cursor + span] = slot
                    cursor += span
        lora = self.lora_manager.lora_params()
        S = int(lora["scaling"].shape[0])
        # Active-slot compaction (reference punica bgmv touches only
        # active adapters' rows, csrc/punica/bgmv/bgmv_impl.cuh:451):
        # above the dense crossover, gather ONLY the slots present in
        # this dispatch into a compact [L, S_act, r, *] stack on device,
        # then every layer (x K fused steps) streams O(active) instead of
        # O(total-loaded) adapter bytes — and small active sets drop back
        # into the dense-einsum formulation. Disabled under multi-host
        # (followers must trace the identical full-stack executable).
        if S > 8 and self.control_plane is None and \
                not getattr(self, "is_follower", False):
            active = sorted(set(slots) | {0})
            s_act = max(8, next_power_of_2(len(active)))
            if s_act < S:
                active_arr = np.zeros((s_act, ), np.int32)
                active_arr[:len(active)] = active
                remap = np.zeros((S, ), np.int32)
                remap[active_arr[:len(active)]] = np.arange(
                    len(active), dtype=np.int32)
                idx = remap[idx]
                lora = self._compact_lora(lora, jnp.asarray(active_arr))
        return lora, jnp.asarray(idx)

    def _compact_lora(self, lora, active):
        """Jitted device-side gather of the active adapter slots (one
        tiny dispatch per step; the fused-K scan then re-reads only the
        compact stacks every layer x step)."""
        if self._lora_compact_fn is None:
            def gather(tree, act):
                return {
                    "a": {k: v[:, act] for k, v in tree["a"].items()},
                    "b": {k: v[:, act] for k, v in tree["b"].items()},
                    "scaling": tree["scaling"][act],
                    "pos_scale": tree["pos_scale"][act],
                }
            self._lora_compact_fn = jax.jit(gather)
        return self._lora_compact_fn(lora, active)

    def _get_spec_fn(self):
        """Fused draft-propose + verify + rejection executable (built once;
        shared by the driver dispatch and the multi-host follower replay)."""
        if self._spec_fn is None:
            from neural_magic_vllm_tpu.spec_decode.draft_model import \
                build_spec_step
            k = self.speculative_config.num_speculative_tokens
            self._spec_fn = jax.jit(
                build_spec_step(self.model, self.draft_model,
                                self.block_size, k),
                donate_argnums=(2, 3))
        return self._spec_fn

    def _prefill_table_width(self, end: int) -> int:
        """Block-table width for a single-sequence prefill chunk ending at
        token ``end``. On TPU this is ALWAYS the max width: warmup
        compiles each prefill bucket exactly once at full width, and the
        Pallas kernels read only the pages context_len covers, so a
        static width avoids per-(bucket, width) serve-time compiles (the
        'serving never hits a compile' contract). Off-TPU the jnp
        reference gathers the whole table, so a bucketed width keeps CPU
        tests cheap."""
        if jax.default_backend() in ("tpu", "axon"):
            return self.max_blocks_per_seq
        return self.scheduler_config.pad_table_width(
            max(1, cdiv(end, self.block_size)), self.max_blocks_per_seq)

    def _table_width(self, tables: List[List[int]]) -> int:
        # On TPU the Pallas decode kernel reads only the pages covered by
        # each row's context_len, so a single static (max) width avoids
        # per-width recompiles of the whole step graph. The XLA reference
        # path gathers the ENTIRE table width, so off-TPU (CPU tests) a
        # bucketed width bounds the gather instead.
        if jax.default_backend() in ("tpu", "axon"):
            return self.max_blocks_per_seq
        need = max((len(t) for t in tables), default=1)
        return self.scheduler_config.pad_table_width(
            need, self.max_blocks_per_seq)

    def _seq_key(self, sgm: SequenceGroupMetadata,
                 seq_id: int) -> np.ndarray:
        """Per-(request, sequence) base PRNG key; the token position is
        folded in IN-GRAPH (_fold_position), so seeded requests are
        reproducible across runs and across single/multi-step execution.
        Only the seed and the sequence's index WITHIN its group enter the
        key — never global ids."""
        sp = sgm.sampling_params
        seq_index = sorted(sgm.seq_data).index(seq_id)
        if sp.seed is not None:
            k0 = np.uint32(sp.seed & 0xFFFFFFFF)
        else:
            k0 = np.uint32((hash(sgm.request_id) ^ self._salt) & 0xFFFFFFFF)
        k1 = np.uint32((seq_index * 97 + 1) & 0xFFFFFFFF)
        return np.array([k0, k1], np.uint32)

    def _samp_tensors(self, sgms_and_seqs,
                      lookahead: int = 0) -> SamplingTensors:
        B = len(sgms_and_seqs)
        temp = np.zeros((B, ), np.float32)
        top_k = np.zeros((B, ), np.int32)
        top_p = np.ones((B, ), np.float32)
        min_p = np.zeros((B, ), np.float32)
        pres = np.zeros((B, ), np.float32)
        freq = np.zeros((B, ), np.float32)
        rep = np.ones((B, ), np.float32)
        keys = np.zeros((B, 2), np.uint32)
        V = self.model_config.get_vocab_size()
        any_penalty = False
        for i, (sgm, seq_id) in enumerate(sgms_and_seqs):
            sp = sgm.sampling_params
            temp[i] = sp.temperature
            top_k[i] = sp.top_k if sp.top_k > 0 else V
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
            pres[i] = sp.presence_penalty
            freq[i] = sp.frequency_penalty
            rep[i] = sp.repetition_penalty
            any_penalty = any_penalty or _uses_penalties(sp)
            keys[i] = self._seq_key(sgm, seq_id)
        prompt_tokens = output_tokens = output_len = None
        if any_penalty:
            # Padded token-history buffers (pad sentinel = V, dropped by
            # the in-graph bincount); widths on a pow2 bucket so the
            # executable count stays bounded.
            datas = [sgm.seq_data[sid] for sgm, sid in sgms_and_seqs]

            def pow2(n):  # pow2 width bucket, floor 64
                w = 64
                while w < n:
                    w *= 2
                return w

            P = pow2(max(len(d.prompt_token_ids) for d in datas))
            olens = [len(d.output_token_ids) for d in datas]
            O = pow2(max(olens) + lookahead + 1)
            pt = np.full((B, P), V, np.int32)
            ot = np.full((B, O), V, np.int32)
            ol = np.zeros((B, ), np.int32)
            for i, d in enumerate(datas):
                pt[i, :len(d.prompt_token_ids)] = d.prompt_token_ids
                ot[i, :olens[i]] = d.output_token_ids
                ol[i] = olens[i]
            prompt_tokens = jnp.asarray(pt)
            output_tokens = jnp.asarray(ot)
            output_len = jnp.asarray(ol)
        return SamplingTensors(temperature=jnp.asarray(temp),
                               top_k=jnp.asarray(top_k),
                               top_p=jnp.asarray(top_p),
                               min_p=jnp.asarray(min_p),
                               presence_penalty=jnp.asarray(pres),
                               frequency_penalty=jnp.asarray(freq),
                               repetition_penalty=jnp.asarray(rep),
                               keys=jnp.asarray(keys),
                               prompt_tokens=prompt_tokens,
                               output_tokens=output_tokens,
                               output_len=output_len)

    def _logprob_dict(self, token: int, chosen_lp: float,
                      top_vals: Optional[np.ndarray],
                      top_ids: Optional[np.ndarray],
                      num_logprobs: Optional[int]) -> Dict[int, Logprob]:
        if not num_logprobs:
            # hot path: no per-request logprobs — skip the top-k rank
            # search entirely (it is O(max_logprobs) numpy work per token)
            return {token: Logprob(chosen_lp)}
        lp: Dict[int, Logprob] = {}
        if num_logprobs and top_ids is not None:
            for rank in range(min(num_logprobs, len(top_ids))):
                lp[int(top_ids[rank])] = Logprob(float(top_vals[rank]),
                                                 rank=rank + 1)
        if token not in lp:
            rank = None
            if top_ids is not None:
                hits = np.nonzero(top_ids == token)[0]
                rank = int(hits[0]) + 1 if len(hits) else None
            lp[token] = Logprob(float(chosen_lp), rank=rank)
        return lp

    # --- execution ----------------------------------------------------------------
    def purge_finished(self, request_ids, seq_ids) -> None:
        """Drop per-request host caches for finished/aborted requests
        (aborted multimodal prompts would otherwise leak their projected
        image embeddings; reference finished_requests_ids role)."""
        for rid in request_ids:
            self._mm_cache.pop(rid, None)
        for sid in seq_ids:
            self._draft_seen.pop(sid, None)
            self._spec_hidden.pop(sid, None)
            self._pool_stash.pop(sid, None)

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        cache_engine: CacheEngine,
        num_waiting: int = 0,
    ) -> List[SamplerOutput]:
        """Returns one SamplerOutput per fused step (len > 1 only on the
        multi-step decode fast path). ``num_waiting``: WAITING-queue depth
        at schedule time — small decode batches shorten their fused
        window so the queued arrival isn't stuck behind a K=16 dispatch
        (the r4 TTFT-tail diagnosis; saturated batches keep full K since
        the queue is never empty there and dispatch overhead amortizes
        over many rows)."""
        self._num_waiting = num_waiting
        prefills = [(i, m) for i, m in enumerate(seq_group_metadata_list)
                    if m.is_prompt]
        decodes = [(i, m) for i, m in enumerate(seq_group_metadata_list)
                   if not m.is_prompt]
        if self.has_state:
            self._active_seq_ids = {
                sid for m in seq_group_metadata_list for sid in m.seq_data}

        # Guided rows whose DFA fits the device tables ride the fused
        # dispatch in-graph instead of dropping to host sampling
        # (guided_decoding/device_fsm.py; VERDICT r4 #2).
        guided_dev: Dict[int, Any] = {}
        if decodes and not prefills and \
                self.scheduler_config.num_scheduler_steps > 1:
            for i, m in decodes:
                if len(m.seq_data) == 1 and \
                        _needs_host_sampling(m.sampling_params):
                    d = self._device_guided_fsm(m)
                    if d is not None:
                        guided_dev[i] = d
            if guided_dev:
                uniq = list({id(d): d
                             for d in guided_dev.values()}.values())
                if self._get_guided_mgr().admit(uniq) is None:
                    guided_dev = {}

        all_single_decode = (not prefills and decodes and all(
            len(m.seq_data) == 1 for _, m in decodes) and not any(
                _needs_host_sampling(m.sampling_params) and
                i not in guided_dev for i, m in decodes))
        all_plain_decode = all_single_decode and not guided_dev

        # Mixed prefill+decode policy (round-5, evidence-driven — PERF.md
        # "serving trace r5"): a LARGE decode batch with a SMALL prefill
        # load takes the fused K-window (prefill lanes ride the decode
        # weight streams, decodes never stall); a prefill-heavy step
        # takes the piggyback dispatch below (dedicated batched prefill
        # keeps its tokens-per-weight-stream efficiency, the decode batch
        # rides it one step). Windowed prefill measured ~1.6k tok/s vs
        # 4.5k dedicated, so the window is reserved for decode-dominated
        # steps where protecting decode cadence wins.
        if prefills and decodes:
            ptoks = sum(m.token_chunk_size for _, m in prefills)
            C = self.scheduler_config.mixed_chunk_width()
            from neural_magic_vllm_tpu import envs as _envs
            big_decode = self.scheduler_config.pad_decode_batch(
                len(decodes)) >= _envs.NMV_TPU_MIXED_WINDOW_MIN_DECODE
            if big_decode and ptoks <= 2 * C and self._mixed_window_ok(
                    prefills, decodes, guided_dev):
                return self._execute_mixed_window(
                    prefills, decodes, cache_engine,
                    self.fused_k_for_batch(len(decodes)),
                    len(seq_group_metadata_list))

        if self.draft_model is not None and all_plain_decode and \
                not any(self._needs_full_sampling(m.sampling_params)
                        for _, m in decodes):
            sc = self.speculative_config
            disable_bs = sc.speculative_disable_by_batch_size
            if disable_bs is None or len(decodes) < disable_bs:
                return self._execute_decode_spec_draft(
                    [m for _, m in decodes], cache_engine)

        if self.mlp_speculator is not None and all_plain_decode and \
                not any(self._needs_full_sampling(m.sampling_params)
                        for _, m in decodes):
            sc = self.speculative_config
            disable_bs = sc.speculative_disable_by_batch_size
            if disable_bs is None or len(decodes) < disable_bs:
                return self._execute_decode_spec_mlp(
                    [m for _, m in decodes], cache_engine)

        if self._spec_proposer is not None and all_plain_decode and \
                not any(_uses_penalties(m.sampling_params)
                        for _, m in decodes):
            sc = self.speculative_config
            disable_bs = sc.speculative_disable_by_batch_size
            if disable_bs is None or len(decodes) < disable_bs:
                return self._execute_decode_spec([m for _, m in decodes],
                                                 cache_engine)

        if all_single_decode:
            K = self.fused_k_for_batch(len(decodes))
            if K > 1:
                return self._execute_decode_multi(
                    [m for _, m in decodes], cache_engine, K,
                    guided=[guided_dev.get(i) for i, _ in decodes]
                    if guided_dev else None)

        # Mixed batch: a host-sampled minority (guided FSM /
        # logits_processors / min_tokens) must NOT drag the on-device
        # majority down to single-step decode — the majority keeps its ONE
        # fused-K dispatch while the minority runs K small-bucket
        # host-sampled steps alongside (the FSM must observe each sampled
        # token before masking the next, so K=1-per-dispatch is inherent
        # to the host rows only). Reference runs logits processors
        # single-step for everyone (sampler.py:50-119); this split is the
        # TPU answer to keeping guided traffic from serializing the batch.
        from neural_magic_vllm_tpu import envs
        if (not prefills and decodes and not self.has_state
                and not envs.NMV_TPU_DISABLE_MIXED_FUSED
                and self.draft_model is None and self.mlp_speculator is None
                and self._spec_proposer is None
                and all(len(m.seq_data) == 1 for _, m in decodes)):
            host_dec = [(i, m) for i, m in decodes
                        if _needs_host_sampling(m.sampling_params)
                        and i not in guided_dev]
            if host_dec and len(host_dec) < len(decodes) and not any(
                    m.sampling_params.use_beam_search for _, m in host_dec):
                dev_dec = [(i, m) for i, m in decodes
                           if not _needs_host_sampling(m.sampling_params)
                           or i in guided_dev]
                K = self.fused_k_for_batch(len(dev_dec))
                if K > 1:
                    return self._execute_decode_mixed(
                        dev_dec, host_dec, cache_engine, K,
                        guided=[guided_dev.get(i) for i, _ in dev_dec]
                        if guided_dev else None)

        group_outputs: Dict[int, CompletionSequenceGroupOutput] = {}
        batchable = [(i, m) for i, m in prefills
                     if self._prefill_batchable(m)]
        used_piggyback = False
        if batchable and decodes and self._piggyback_ok(decodes):
            res = self._execute_prefill_batch(batchable, cache_engine,
                                              decodes=decodes)
            if res:
                used_piggyback = True
                group_outputs.update(res)
                prefills = [(i, m) for i, m in prefills
                            if i not in group_outputs]
        if not used_piggyback and len(batchable) >= 2:
            group_outputs.update(
                self._execute_prefill_batch(batchable, cache_engine))
            prefills = [(i, m) for i, m in prefills
                        if i not in group_outputs]
        for idx, sgm in prefills:
            group_outputs[idx] = self._execute_prefill(sgm, cache_engine)
        if decodes and not used_piggyback:
            for idx, out in zip(
                [i for i, _ in decodes],
                    self._execute_decode([m for _, m in decodes],
                                         cache_engine)):
                group_outputs[idx] = out

        return [SamplerOutput(outputs=[
            group_outputs[i] for i in range(len(seq_group_metadata_list))
        ])]

    # --- prefill ---------------------------------------------------------------
    def _prefill_batchable(self, sgm: SequenceGroupMetadata) -> bool:
        """Fresh full-prompt prefills with on-device sampling can share one
        weight pass (segment attention); chunked continuations, prefix-cache
        hits and host-sampled requests take the single-seq path."""
        if getattr(sgm, "pooling_params", None) is not None:
            return False
        if getattr(sgm, "multi_modal_data", None) or self.has_state:
            return False
        sp = sgm.sampling_params
        if sp is None or _needs_host_sampling(sp) or \
                sp.prompt_logprobs is not None or sp.best_of > 1:
            return False
        if not sgm.do_sample or sgm.computed_block_nums:
            return False
        seq_data = next(iter(sgm.seq_data.values()))
        return seq_data.get_num_computed_tokens() == 0

    def _prefill_batch_width(self, t_pad: int) -> int:
        """Static sample-row width of the batched-prefill executable at
        token bucket t_pad. Tying b to the token bucket (never to the
        ragged prompt count) collapses the executable space from a
        (t_pad x b_pad) product to ONE executable per token bucket, so
        full warmup covers the whole lattice and serving never compiles
        (the round-2 serving trace showed 18 s serve-time compiles from
        unwarmed (t_pad, b_pad) combos). t_pad // 16 bounds realistic
        prompt counts; overflow items fall back to the single path."""
        return max(8, t_pad // 16)

    def _piggyback_rows(self) -> int:
        """Static decode-row count of the piggyback executable (one per
        prefill token bucket; tying it to the decode bucket lattice would
        multiply the executable space 12x)."""
        return min(256, self.scheduler_config.pad_decode_batch(
            self.scheduler_config.max_num_seqs))

    def _fused_composition_ok(self) -> bool:
        """Shared eligibility gate for the mixed-window / piggyback
        compositions (and their warmup sites — keep them AGREEING, or a
        serve-time trace appears that warmup never compiled): no stateful
        models, no speculative machinery, no multi-host replay, no data
        parallelism (concatenated prefill rows break the dp batch
        sharding)."""
        return not (self.has_state or self.draft_model is not None
                    or self.mlp_speculator is not None
                    or self._spec_proposer is not None
                    or self.control_plane is not None
                    or (self.mesh is not None
                        and self.mesh.shape.get("dp", 1) > 1))

    def _piggyback_ok(self, decodes) -> bool:
        """Decode rows may ride a batched-prefill dispatch when they are
        plain single-seq device-sampled rows fitting the static row
        count."""
        from neural_magic_vllm_tpu import envs
        if not envs.NMV_TPU_MIXED_PREFILL_WINDOW or not decodes:
            return False
        if not self._fused_composition_ok():
            return False
        if len(decodes) > self._piggyback_rows():
            return False
        for _, m in decodes:
            if len(m.seq_data) != 1:
                return False
            msp = m.sampling_params
            if _needs_host_sampling(msp) or _uses_penalties(msp):
                return False
        return True

    def _execute_prefill_batch(self, items, cache_engine: CacheEngine,
                               decodes=None
                               ) -> Dict[int, CompletionSequenceGroupOutput]:
        """One weight pass over several concatenated fresh prompts; with
        ``decodes``, the decode batch rides the SAME weight stream and
        advances one step (piggyback — the prefill-majority unified batch
        of reference flash_attn.py:252-367). The prefill keeps its
        tokens-per-weight-stream efficiency (the round-5 serving trace
        measured windowed prefill at ~1.6k tok/s vs 4.5k dedicated), and
        decodes never fully stall behind it."""
        while True:
            total = sum(next(iter(m.seq_data.values())).get_len()
                        for _, m in items)
            t_pad = self.scheduler_config.pad_prefill_len(total)
            if t_pad < total:  # beyond the largest bucket: single-seq path
                return {}
            b_pad = self._prefill_batch_width(t_pad)
            if len(items) <= b_pad:
                break
            # more (ultra-short) prompts than the bucket's static rows:
            # trim the tail to the single-prefill path
            items = items[:b_pad]
        B = len(items)

        tokens = np.zeros((t_pad, ), np.int32)
        positions = np.zeros((t_pad, ), np.int32)
        slots = np.full((t_pad, ), -1, np.int32)
        seq_ids = np.full((t_pad, ), -1, np.int32)
        sample_idx = np.zeros((b_pad, ), np.int32)
        rows = []
        cursor = 0
        for row, (idx, sgm) in enumerate(items):
            seq_id = next(iter(sgm.seq_data))
            data = sgm.seq_data[seq_id]
            ids = data.get_token_ids()
            S = len(ids)
            table = sgm.block_tables[seq_id]
            tokens[cursor:cursor + S] = ids
            positions[cursor:cursor + S] = np.arange(S, dtype=np.int32)
            for j in range(S):
                slots[cursor + j] = table[j // self.block_size] * \
                    self.block_size + j % self.block_size
            seq_ids[cursor:cursor + S] = row
            sample_idx[row] = cursor + S - 1
            rows.append((sgm, seq_id))
            cursor += S

        meta = AttentionMetadata(
            slot_mapping=jnp.asarray(slots),
            block_tables=jnp.zeros((1, 4), jnp.int32),  # unused
            context_lens=jnp.zeros((1, ), jnp.int32),
            seq_ids=jnp.asarray(seq_ids),
            q_pos=jnp.asarray(positions))

        if self.draft_model is not None:
            fn_d = self._get_fn("draft_prefill", 0)
            self._bcast("draft_prefill", 0,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, seq_ids=seq_ids,
                             q_pos=positions))
            self.draft_cache_engine.kv_caches = fn_d(
                self.draft_params, self.draft_cache_engine.kv_caches,
                jnp.asarray(tokens), jnp.asarray(positions), meta)
            for sgm, sid in rows:
                self._draft_seen[sid] = sgm.seq_data[sid].get_len()

        any_logprobs = any((sgm.sampling_params.logprobs or 0) > 0
                           for sgm, _ in rows) or (decodes and any(
                               (m.sampling_params.logprobs or 0) > 0
                               for _, m in decodes))
        nlp = self.max_logprobs if any_logprobs else 0
        pad_rows = rows + [rows[-1]] * (b_pad - B)
        samp = self._samp_tensors(pad_rows)
        d_extra = self._piggyback_rows() if decodes else 0
        if self.lora_manager is not None:
            # activate adapters BEFORE snapshotting the (immutable) stacks
            d_reqs = [m.lora_request for _, m in decodes] if decodes else []
            slot_of = self.lora_manager.slots_for(
                d_reqs + [sgm.lora_request for sgm, _ in rows])
            li = np.zeros((d_extra + t_pad, ), np.int32)
            li[:len(d_reqs)] = slot_of[:len(d_reqs)]
            cursor = d_extra
            for row, (sgm, sid) in enumerate(rows):
                S = sgm.seq_data[sid].get_len()
                li[cursor:cursor + S] = slot_of[len(d_reqs) + row]
                cursor += S
            lora = self.lora_manager.lora_params()
            lidx_flat = jnp.asarray(li)
        else:
            lora, lidx_flat = None, None

        if decodes:
            return self._dispatch_piggyback(
                items, rows, decodes, cache_engine, tokens, positions,
                slots, seq_ids, sample_idx, samp, nlp, lora, lidx_flat)

        fn = self._get_fn("prefill_batch", nlp)
        self._bcast("prefill_batch", nlp,
                    dict(tokens=tokens, positions=positions,
                         slot_mapping=slots, seq_ids=seq_ids,
                         q_pos=positions, sample_idx=sample_idx), samp,
                    lidx=lidx_flat)
        new_kv, out = fn(self.params, cache_engine.kv_caches,
                         jnp.asarray(tokens), jnp.asarray(positions), meta,
                         jnp.asarray(sample_idx), samp, lora, lidx_flat)
        cache_engine.kv_caches = new_kv
        tid, chosen, tv, ti = jax.device_get(out)

        outputs: Dict[int, CompletionSequenceGroupOutput] = {}
        for row, (idx, sgm) in enumerate(items):
            seq_id = rows[row][1]
            num_lp = sgm.sampling_params.logprobs or 0
            lp = self._logprob_dict(int(tid[row]), float(chosen[row]),
                                    tv[row] if nlp else None,
                                    ti[row] if nlp else None, num_lp)
            outputs[idx] = CompletionSequenceGroupOutput(
                samples=[SequenceOutput(seq_id, int(tid[row]), lp)])
        return outputs

    def _dispatch_piggyback(self, items, rows, decodes, cache_engine,
                            p_tokens, p_positions, p_slots, p_seq_ids,
                            sample_idx, p_samp, nlp, lora, lidx_flat
                            ) -> Dict[int, CompletionSequenceGroupOutput]:
        """Combined dispatch: [b_dec decode rows] + [t_pad prefill
        segment rows]; returns outputs for BOTH group sets."""
        b_dec = self._piggyback_rows()
        d_rows = [(m, next(iter(m.seq_data))) for _, m in decodes]
        Bd = len(d_rows)
        d_tokens = np.zeros((b_dec, ), np.int32)
        d_positions = np.zeros((b_dec, ), np.int32)
        d_slots = np.full((b_dec, ), -1, np.int32)
        d_ctx = np.ones((b_dec, ), np.int32)
        width = self._table_width(
            [m.block_tables[sid] for m, sid in d_rows])
        d_tables = np.zeros((b_dec, width), np.int32)
        for i, (m, sid) in enumerate(d_rows):
            data = m.seq_data[sid]
            L = data.get_len()
            d_tokens[i] = data.get_last_token_id()
            d_positions[i] = L - 1
            table = m.block_tables[sid]
            d_slots[i] = table[(L - 1) // self.block_size] * \
                self.block_size + (L - 1) % self.block_size
            d_ctx[i] = L
            d_tables[i] = self._block_table_row(table, width)
        d_pad = d_rows + [d_rows[-1]] * (b_dec - Bd)
        d_samp = self._samp_tensors(d_pad)

        fn = self._get_fn("prefill_batch_decode", nlp)
        new_kv, (d_out, p_out) = fn(
            self.params, cache_engine.kv_caches,
            jnp.asarray(d_tokens), jnp.asarray(d_positions),
            jnp.asarray(d_slots), jnp.asarray(d_tables),
            jnp.asarray(d_ctx), d_samp,
            jnp.asarray(p_tokens), jnp.asarray(p_positions),
            jnp.asarray(p_slots), jnp.asarray(p_seq_ids),
            jnp.asarray(sample_idx), p_samp, lora, lidx_flat)
        cache_engine.kv_caches = new_kv
        d_tid, d_chosen, d_tv, d_ti = jax.device_get(d_out)
        tid, chosen, tv, ti = jax.device_get(p_out)

        outputs: Dict[int, CompletionSequenceGroupOutput] = {}
        for row, (idx, sgm) in enumerate(items):
            seq_id = rows[row][1]
            num_lp = sgm.sampling_params.logprobs or 0
            lp = self._logprob_dict(int(tid[row]), float(chosen[row]),
                                    tv[row] if nlp else None,
                                    ti[row] if nlp else None, num_lp)
            outputs[idx] = CompletionSequenceGroupOutput(
                samples=[SequenceOutput(seq_id, int(tid[row]), lp)])
        for i, (idx, m) in enumerate(decodes):
            sid = d_rows[i][1]
            num_lp = m.sampling_params.logprobs or 0
            lp = self._logprob_dict(int(d_tid[i]), float(d_chosen[i]),
                                    d_tv[i] if nlp else None,
                                    d_ti[i] if nlp else None, num_lp)
            outputs[idx] = CompletionSequenceGroupOutput(
                samples=[SequenceOutput(sid, int(d_tid[i]), lp)])
        return outputs

    def _execute_prefill(self, sgm: SequenceGroupMetadata,
                         cache_engine: CacheEngine
                         ) -> CompletionSequenceGroupOutput:
        if getattr(sgm, "pooling_params", None) is not None:
            return self._execute_embedding_prefill(sgm, cache_engine)
        seq_id = next(iter(sgm.seq_data))
        seq_data = sgm.seq_data[seq_id]
        sp = sgm.sampling_params
        token_ids = seq_data.get_token_ids()
        seq_len = len(token_ids)
        computed = seq_data.get_num_computed_tokens()
        chunk = sgm.token_chunk_size
        end = computed + chunk

        # Prefix-cache hit: skip tokens whose blocks are already computed
        # (reference model_runner.py:465-483). Keep >= 1 query token.
        start = computed
        if sgm.computed_block_nums:
            cached_tokens = len(sgm.computed_block_nums) * self.block_size
            start = max(start, min(cached_tokens, end - 1))

        q_tokens = token_ids[start:end]
        S = len(q_tokens)
        s_pad = self.scheduler_config.pad_prefill_len(S)

        table = sgm.block_tables[seq_id]
        tokens = np.zeros((s_pad, ), np.int32)
        tokens[:S] = q_tokens
        positions = np.zeros((s_pad, ), np.int32)
        positions[:S] = np.arange(start, end, dtype=np.int32)
        slots = np.full((s_pad, ), -1, np.int32)
        for j, p in enumerate(range(start, end)):
            slots[j] = table[p // self.block_size] * self.block_size + \
                p % self.block_size

        # Table width: must span cached context AND the current chunk —
        # the Pallas context-prefill kernel reads the chunk's freshly
        # written KV back through the table (writes go via slot_mapping;
        # the jnp reference path reads only the context rows and ignores
        # the extra entries).
        width = self._prefill_table_width(end)
        state_slots = None
        if self.has_state:
            state_slots = jnp.asarray(
                [self._state_slot(seq_id, self._active_seq_ids)], np.int32)
        meta = AttentionMetadata(
            slot_mapping=jnp.asarray(slots),
            block_tables=jnp.asarray(
                self._block_table_row(table, width)[None, :]),
            context_lens=jnp.asarray([start], np.int32),
            state_slots=state_slots)

        if self.draft_model is not None:
            self._draft_prefill(jnp.asarray(tokens), jnp.asarray(positions),
                                meta, self.draft_cache_engine, seq_id, end)

        mm = None
        if getattr(self.model, "is_multimodal", False) and \
                getattr(sgm, "multi_modal_data", None):
            mm = self._mm_args(sgm, token_ids, start, end, s_pad)

        num_logprobs = sp.logprobs or 0
        want_prompt_lp = sp.prompt_logprobs is not None
        # best_of > 1: parallel sampling draws best_of tokens from the
        # prompt's final distribution (host path, then the output processor
        # forks the children).
        host = (_needs_host_sampling(sp) or want_prompt_lp
                or sp.best_of > 1)

        lora, lidx = self._lora_args([sgm.lora_request], s_pad,
                                     spans=[S])
        # multimodal features ride the broadcast so follower hosts trace
        # the same executable (mm=None vs mm=(flat, idx) are different
        # jit signatures)
        mm_arrs = {} if mm is None else dict(mm_flat=mm[0], mm_idx=mm[1])
        if state_slots is not None:
            mm_arrs["state_slots"] = state_slots
        if host:
            fn = self._get_fn("prefill_logits", 0)
            self._bcast("prefill_logits", 0,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots,
                             block_tables=meta.block_tables,
                             context_lens=meta.context_lens, **mm_arrs),
                        lidx=lidx)
            new_kv, logits = fn(self.params, cache_engine.kv_caches,
                                jnp.asarray(tokens), jnp.asarray(positions),
                                meta, lora, lidx, mm)
            cache_engine.kv_caches = new_kv
            logits_np = np.asarray(logits[:S], np.float32)
            prompt_lp = None
            if want_prompt_lp:
                # every chunk contributes its positions (the output
                # processor concatenates); prefix-cache-covered positions
                # lead with None padding on the first chunk
                prompt_lp = host_sampler.prompt_logprobs_from_chunk(
                    logits_np, seq_data.prompt_token_ids, start,
                    sp.prompt_logprobs, first_chunk=(computed == 0))
            if not sgm.do_sample:
                return CompletionSequenceGroupOutput(
                    samples=[], prompt_logprobs=prompt_lp)
            samples = []
            if sp.use_beam_search:
                # seed the beams with the top-best_of DISTINCT tokens
                # (reference beam prefill, sampler.py:330-360)
                for token, lp in host_sampler.beam_candidates(
                        logits_np[S - 1], sp.best_of, sp):
                    samples.append(SequenceOutput(seq_id, token, lp))
            else:
                for j in range(sp.best_of):
                    token, lp = host_sampler.sample_row(
                        logits_np[S - 1], sp, seq_data.prompt_token_ids,
                        seq_data.output_token_ids,
                        eos_token_id=sgm.eos_token_id,
                        step_seed=seq_data.get_len() * (j + 1) + j,
                        entropy=hash(sgm.request_id) & (2**62 - 1),
                        num_logprobs=num_logprobs)
                    samples.append(SequenceOutput(seq_id, token, lp))
            return CompletionSequenceGroupOutput(
                samples=samples, prompt_logprobs=prompt_lp)

        nlp = self.max_logprobs if num_logprobs else 0
        fn = self._get_fn("prefill_sample", nlp)
        samp = self._samp_tensors([(sgm, seq_id)])
        self._bcast("prefill_sample", nlp,
                    dict(tokens=tokens, positions=positions,
                         slot_mapping=slots,
                         block_tables=meta.block_tables,
                         context_lens=meta.context_lens,
                         sample_idx=np.int32(S - 1), **mm_arrs), samp,
                    lidx=lidx)
        new_kv, out = fn(self.params, cache_engine.kv_caches,
                         jnp.asarray(tokens), jnp.asarray(positions), meta,
                         jnp.int32(S - 1), samp, lora, lidx, mm)
        cache_engine.kv_caches = new_kv
        if not sgm.do_sample:
            return CompletionSequenceGroupOutput(samples=[])
        tid, chosen, tv, ti = jax.device_get(out)
        lp = self._logprob_dict(int(tid[0]), float(chosen[0]),
                                tv[0] if nlp else None,
                                ti[0] if nlp else None, num_logprobs)
        return CompletionSequenceGroupOutput(
            samples=[SequenceOutput(seq_id, int(tid[0]), lp)])

    def _mm_args(self, sgm: SequenceGroupMetadata, token_ids: List[int],
                 start: int, end: int, s_pad: int):
        """(flat patch embeddings, per-slot gather index) for a multimodal
        prefill chunk. The vision tower runs ONCE per request (image count
        padded to a pow2 bucket to bound executable count); each chunk then
        just ships an [s_pad] int32 index — chunked prefill crosses image
        spans for free."""
        flat = self._mm_cache.get(sgm.request_id)
        if flat is None:
            flat = self.model.encode_request(self.params,
                                             sgm.multi_modal_data)
            self._mm_cache[sgm.request_id] = flat
        tok_id = self.model.image_token_id
        is_img = np.asarray(token_ids) == tok_id
        csum = np.cumsum(is_img) - is_img  # exclusive prefix count
        idx = np.full((s_pad, ), -1, np.int32)
        span = np.arange(start, end)
        sel = is_img[span]
        idx[:end - start][sel] = csum[span][sel]
        if end >= len(token_ids):  # prompt fully prefetched: free the cache
            self._mm_cache.pop(sgm.request_id, None)
        return (flat, jnp.asarray(idx))

    def _execute_embedding_prefill(self, sgm: SequenceGroupMetadata,
                                   cache_engine: CacheEngine
                                   ) -> EmbeddingSequenceGroupOutput:
        """Prefill an embedding request and pool the last token's hidden
        state (pooling type LAST; reference layers/pooler.py)."""
        seq_id = next(iter(sgm.seq_data))
        seq_data = sgm.seq_data[seq_id]
        token_ids = seq_data.get_token_ids()
        computed = seq_data.get_num_computed_tokens()
        chunk = sgm.token_chunk_size
        end = computed + chunk
        q_tokens = token_ids[computed:end]
        S = len(q_tokens)
        s_pad = self.scheduler_config.pad_prefill_len(S)
        table = sgm.block_tables[seq_id]
        tokens = np.zeros((s_pad, ), np.int32)
        tokens[:S] = q_tokens
        positions = np.zeros((s_pad, ), np.int32)
        positions[:S] = np.arange(computed, end, dtype=np.int32)
        slots = np.full((s_pad, ), -1, np.int32)
        for j, pos in enumerate(range(computed, end)):
            slots[j] = table[pos // self.block_size] * self.block_size + \
                pos % self.block_size
        # width spans context + current chunk (Pallas context-prefill
        # reads the chunk's KV through the table; see _execute_prefill)
        width = self._prefill_table_width(end)
        meta = AttentionMetadata(
            slot_mapping=jnp.asarray(slots),
            block_tables=jnp.asarray(self._block_table_row(table,
                                                           width)[None, :]),
            context_lens=jnp.asarray([computed], np.int32))
        lora, lidx = self._lora_args([sgm.lora_request], s_pad,
                                     spans=[S])
        fn = self._get_fn("prefill_hidden", 0)
        self._bcast("prefill_hidden", 0,
                    dict(tokens=tokens, positions=positions,
                         slot_mapping=slots,
                         block_tables=meta.block_tables,
                         context_lens=meta.context_lens), lidx=lidx)
        new_kv, hidden = fn(self.params, cache_engine.kv_caches,
                            jnp.asarray(tokens), jnp.asarray(positions),
                            meta, lora, lidx)
        cache_engine.kv_caches = new_kv
        ptype = getattr(self.model, "pooling_type", "LAST")
        done = end >= seq_data.get_len()
        if ptype == "CLS":
            # first REAL token's hidden state (chunk 0 carries it)
            if computed == 0:
                self._pool_stash[seq_id] = np.asarray(hidden[0], np.float32)
            if not done:
                return EmbeddingSequenceGroupOutput(embeddings=None)
            return EmbeddingSequenceGroupOutput(
                embeddings=self._pool_stash.pop(seq_id).tolist())
        if ptype == "ALL":
            # per-token hidden states across all chunks [total, H]
            chunk_h = np.asarray(hidden[:S], np.float32)
            if not done:
                self._pool_stash.setdefault(seq_id, []).append(chunk_h)
                return EmbeddingSequenceGroupOutput(embeddings=None)
            parts = self._pool_stash.pop(seq_id, []) + [chunk_h]
            return EmbeddingSequenceGroupOutput(
                embeddings=np.concatenate(parts, axis=0).tolist())
        if not done:  # LAST: only the final chunk's tail matters
            return EmbeddingSequenceGroupOutput(embeddings=None)
        emb = np.asarray(hidden[S - 1], np.float32).tolist()
        return EmbeddingSequenceGroupOutput(embeddings=emb)

    # --- fused multi-step decode --------------------------------------------
    def _execute_decode_multi(self, sgms: List[SequenceGroupMetadata],
                              cache_engine: CacheEngine,
                              K: int, guided=None) -> List[SamplerOutput]:
        """K decode iterations in one dispatch (in-graph token feedback).
        Precondition: single-seq groups, device sampling, lookahead slots
        already allocated by the scheduler for K-1 extra tokens. ``guided``
        (optional, row-aligned) carries a DeviceFSM per guided row — those
        rows mask + advance their DFA in-graph (decode_multi_guided)."""
        rows = [(sgm, next(iter(sgm.seq_data))) for sgm in sgms]
        B = len(rows)
        b_pad = self.scheduler_config.pad_decode_batch(B)

        tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        valid = np.zeros((b_pad, ), np.bool_)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            tokens[i] = data.get_last_token_id()
            positions[i] = data.get_len() - 1
            valid[i] = True
            tables[i] = self._block_table_row(sgm.block_tables[seq_id],
                                              width)

        any_logprobs = any((sgm.sampling_params.logprobs or 0) > 0
                           for sgm, _ in rows)
        nlp = self.max_logprobs if any_logprobs else 0
        pad_rows = rows + [rows[-1]] * (b_pad - B)
        samp = self._samp_tensors(pad_rows, lookahead=K)
        lora, lidx = self._lora_args([sgm.lora_request for sgm, _ in rows],
                                     b_pad)
        use_guided = guided is not None and any(g is not None
                                                for g in guided)
        if use_guided:
            mgr = self._get_guided_mgr()
            bases = mgr.admit(list(
                {id(g): g for g in guided if g is not None}.values()))
            assert bases is not None, "caller must pre-admit guided FSMs"
            gstate = np.full((b_pad, ), -1, np.int32)
            eos_ids = np.full((b_pad, ), -1, np.int32)
            for i, (sgm, seq_id) in enumerate(rows):
                d = guided[i]
                if d is None:
                    continue
                out_ids = sgm.seq_data[seq_id].output_token_ids
                gstate[i] = bases[id(d)] + d.state_for(out_ids)
                if sgm.eos_token_id is not None:
                    eos_ids[i] = sgm.eos_token_id
            fn = self._get_fn("decode_multi_guided", (K, nlp))
            new_kv, ys = fn(self.params, cache_engine.kv_caches,
                            jnp.asarray(tokens), jnp.asarray(positions),
                            jnp.asarray(tables), jnp.asarray(valid), samp,
                            lora, lidx, jnp.asarray(gstate),
                            jnp.asarray(eos_ids), mgr.device_tables)
        else:
            fn = self._get_fn("decode_multi", (K, nlp))
            self._bcast("decode_multi", (K, nlp),
                        dict(tokens=tokens, positions=positions,
                             block_tables=tables, valid=valid), samp,
                        lidx=lidx)
            new_kv, ys = fn(self.params, cache_engine.kv_caches,
                            jnp.asarray(tokens), jnp.asarray(positions),
                            jnp.asarray(tables), jnp.asarray(valid), samp,
                            lora, lidx)
        cache_engine.kv_caches = new_kv
        tid, chosen, tv, ti = jax.device_get(ys)  # each [K, b_pad, ...]

        # bulk numpy -> python conversion: .tolist() is ~10x cheaper than
        # 2*K*B individual int()/float() numpy-scalar casts
        tid_l = np.asarray(tid)[:, :B].tolist()
        chosen_l = np.asarray(chosen)[:, :B].tolist()
        outputs: List[SamplerOutput] = []
        for k in range(K):
            group_outputs = []
            tid_k, chosen_k = tid_l[k], chosen_l[k]
            for i, (sgm, seq_id) in enumerate(rows):
                num_lp = sgm.sampling_params.logprobs or 0
                lp = self._logprob_dict(tid_k[i], chosen_k[i],
                                        tv[k, i] if nlp else None,
                                        ti[k, i] if nlp else None, num_lp)
                group_outputs.append(
                    CompletionSequenceGroupOutput(samples=[
                        SequenceOutput(seq_id, tid_k[i], lp)
                    ]))
            outputs.append(SamplerOutput(outputs=group_outputs))
        return outputs

    def _mixed_window_ok(self, prefills, decodes, guided_dev) -> bool:
        """Gate for the mixed fused decode+prefill window: 1..K plain
        chunked prefills whose chunks fit the K x C iteration lanes,
        plus >= 1 plain device-sampled decodes."""
        from neural_magic_vllm_tpu import envs
        if not envs.NMV_TPU_MIXED_PREFILL_WINDOW:
            return False
        if not prefills or not decodes or guided_dev:
            return False
        if not self._fused_composition_ok():
            return False
        # NOTE: under adaptive fused-K (fused_dispatch_target_ms) the
        # scheduler's lane budget uses the CONFIGURED K while this check
        # uses the measured K_b; a K_b below the packed lane count simply
        # declines the window (piggyback/separate paths run instead).
        K = self.fused_k_for_batch(len(decodes))
        C = self.scheduler_config.mixed_chunk_width()
        if K <= 1:
            return False
        lanes = 0
        for _, sgm in prefills:
            sp = sgm.sampling_params
            if (getattr(sgm, "pooling_params", None) is not None
                    or getattr(sgm, "multi_modal_data", None)
                    or sgm.computed_block_nums):
                return False
            if sp is None or _needs_host_sampling(sp) \
                    or _uses_penalties(sp) \
                    or sp.prompt_logprobs is not None or sp.best_of > 1:
                return False
            if sgm.lora_request is not None and len(prefills) > 1:
                # chunk-lane lora_idx is static across iterations
                return False
            lanes += cdiv(sgm.token_chunk_size, C)
        if lanes > K:
            return False
        for _, m in decodes:
            if len(m.seq_data) != 1:
                return False
            msp = m.sampling_params
            if _needs_host_sampling(msp) or _uses_penalties(msp):
                return False
        return True

    def _execute_mixed_window(self, prefills: List[Tuple[int, Any]],
                              dec: List[Tuple[int, Any]],
                              cache_engine: CacheEngine, K: int,
                              n_groups: int) -> List[SamplerOutput]:
        """One fused dispatch: K decode steps for ``dec`` + the scheduled
        chunks of 1..K prefill groups packed into consecutive scan
        iterations of C tokens each (front-loaded; trailing iterations
        carry no chunk tokens). Each completing prompt's first generated
        token is sampled in-graph at its final chunk iteration."""
        self._mixed_window_max_groups = max(
            getattr(self, "_mixed_window_max_groups", 0), len(prefills))
        C = self.scheduler_config.mixed_chunk_width()
        sgms = [m for _, m in dec]
        rows = [(sgm, next(iter(sgm.seq_data))) for sgm in sgms]
        B = len(rows)
        b_pad = self.scheduler_config.pad_decode_batch(B)

        tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        valid = np.zeros((b_pad, ), np.bool_)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            tokens[i] = data.get_last_token_id()
            positions[i] = data.get_len() - 1
            valid[i] = True
            tables[i] = self._block_table_row(sgm.block_tables[seq_id],
                                              width)

        # --- prefill chunk lanes (one group per iteration range) -----------
        p_width = self._prefill_table_width(max(
            m.seq_data[next(iter(m.seq_data))].get_num_computed_tokens() +
            m.token_chunk_size for _, m in prefills))
        p_tokens = np.zeros((K, C), np.int32)
        p_positions = np.zeros((K, C), np.int32)
        p_slots = np.full((K, C), -1, np.int32)
        p_ctx = np.zeros((K, ), np.int32)
        p_sample_idx = np.full((K, ), -1, np.int32)
        p_tables = np.zeros((K, p_width), np.int32)
        # iteration -> (group list index, is_final_chunk_iteration)
        it_owner: List[Optional[int]] = [None] * K
        samp_rows: List[Tuple[Any, int]] = []
        it = 0
        for g, (pidx, psgm) in enumerate(prefills):
            p_seq_id = next(iter(psgm.seq_data))
            p_data = psgm.seq_data[p_seq_id]
            computed = p_data.get_num_computed_tokens()
            chunk = psgm.token_chunk_size
            end = computed + chunk
            token_ids = p_data.get_token_ids()
            p_table_list = psgm.block_tables[p_seq_id]
            trow = self._block_table_row(p_table_list, p_width)
            n_iters = cdiv(chunk, C)
            for j in range(n_iters):
                lo = computed + j * C
                hi = min(lo + C, end)
                n = hi - lo
                p_tokens[it, :n] = token_ids[lo:hi]
                p_positions[it, :n] = np.arange(lo, hi, dtype=np.int32)
                for jj, p in enumerate(range(lo, hi)):
                    p_slots[it, jj] = (
                        p_table_list[p // self.block_size] *
                        self.block_size + p % self.block_size)
                p_ctx[it] = lo
                p_tables[it] = trow
                it_owner[it] = g
                if j == n_iters - 1 and bool(
                        getattr(psgm, "do_sample", True)):
                    p_sample_idx[it] = (chunk - 1) % C
                it += 1
            samp_rows.append((psgm, p_seq_id))
        # idle trailing iterations: no tokens (slots -1); ctx 0 harmless

        any_logprobs = any((sgm.sampling_params.logprobs or 0) > 0
                           for sgm, _ in rows) or any(
            bool(m.sampling_params.logprobs) for _, m in prefills)
        nlp = self.max_logprobs if any_logprobs else 0
        pad_rows = rows + [rows[-1]] * (b_pad - B)
        samp = self._samp_tensors(pad_rows, lookahead=K)
        # per-iteration prefill sampling rows (stacked along the scan)
        g_samps = [self._samp_tensors([sr]) for sr in samp_rows]
        it_samps = [g_samps[it_owner[k]] if it_owner[k] is not None
                    else g_samps[0] for k in range(K)]
        p_samp = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *it_samps)
        # rows [0:B] decode, [B:b_pad] padding, [b_pad:b_pad+C] chunk
        p_lora_req = prefills[0][1].lora_request
        lora, lidx = self._lora_args(
            [sgm.lora_request for sgm, _ in rows] +
            [None] * (b_pad - B) + [p_lora_req],
            b_pad + C, spans=[1] * b_pad + [C])
        fn = self._get_fn("decode_multi_mixed", (K, nlp))
        new_kv, (ys, p_ys) = fn(
            self.params, cache_engine.kv_caches,
            jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(tables), jnp.asarray(valid), samp, lora, lidx,
            jnp.asarray(p_tokens), jnp.asarray(p_positions),
            jnp.asarray(p_slots), jnp.asarray(p_ctx),
            jnp.asarray(p_sample_idx), jnp.asarray(p_tables), p_samp)
        cache_engine.kv_caches = new_kv
        tid, chosen, tv, ti = jax.device_get(ys)
        p_tid, p_chosen, p_tv, p_ti = jax.device_get(p_ys)

        tid_l = np.asarray(tid)[:, :B].tolist()
        chosen_l = np.asarray(chosen)[:, :B].tolist()
        dec_idx = [i for i, _ in dec]
        outputs: List[SamplerOutput] = []
        for k in range(K):
            merged: Dict[int, CompletionSequenceGroupOutput] = {}
            tid_k, chosen_k = tid_l[k], chosen_l[k]
            for i, (sgm, seq_id) in enumerate(rows):
                num_lp = sgm.sampling_params.logprobs or 0
                lp = self._logprob_dict(tid_k[i], chosen_k[i],
                                        tv[k, i] if nlp else None,
                                        ti[k, i] if nlp else None, num_lp)
                merged[dec_idx[i]] = CompletionSequenceGroupOutput(
                    samples=[SequenceOutput(seq_id, tid_k[i], lp)])
            if p_sample_idx[k] >= 0:
                g = it_owner[k]
                pidx, psgm = prefills[g]
                p_seq_id = samp_rows[g][1]
                num_lp = psgm.sampling_params.logprobs or 0
                lp = self._logprob_dict(
                    int(p_tid[k][0]), float(p_chosen[k][0]),
                    p_tv[k][0] if nlp else None,
                    p_ti[k][0] if nlp else None, num_lp)
                merged[pidx] = CompletionSequenceGroupOutput(samples=[
                    SequenceOutput(p_seq_id, int(p_tid[k][0]), lp)])
            outputs.append(SamplerOutput(outputs=[
                merged.get(i, CompletionSequenceGroupOutput(samples=[]))
                for i in range(n_groups)]))
        return outputs

    def _execute_decode_mixed(self, dev: List[Tuple[int, Any]],
                              host: List[Tuple[int, Any]],
                              cache_engine: CacheEngine, K: int,
                              guided=None) -> List[SamplerOutput]:
        """Fused-K dispatch for the on-device majority (including
        device-guided rows) + K host-sampled single-step dispatches for
        the remaining host minority, zipped back into K per-step
        SamplerOutputs in scheduling order."""
        dev_outs = self._execute_decode_multi([m for _, m in dev],
                                              cache_engine, K,
                                              guided=guided)
        host_steps = self._execute_decode_host_multi(
            [m for _, m in host], cache_engine, K)
        order = sorted(i for i, _ in dev + host)
        outputs: List[SamplerOutput] = []
        for k in range(K):
            merged: Dict[int, CompletionSequenceGroupOutput] = {}
            for j, (idx, _) in enumerate(dev):
                merged[idx] = dev_outs[k].outputs[j]
            for j, (idx, _) in enumerate(host):
                merged[idx] = host_steps[k][j]
            outputs.append(SamplerOutput(
                outputs=[merged[i] for i in order]))
        return outputs

    def _execute_decode_host_multi(self, sgms: List[SequenceGroupMetadata],
                                   cache_engine: CacheEngine, K: int
                                   ) -> List[List[
                                       CompletionSequenceGroupOutput]]:
        """K single-step host-sampled decode iterations (token feedback on
        the host: a guided FSM must see token k before masking step k+1).
        Uses the scheduler's fused-window lookahead slots (K-1 reserved
        for every running seq, config.py: num_scheduler_steps - 1), so
        positions may advance K-1 past the scheduled slot."""
        rows = [(sgm, next(iter(sgm.seq_data))) for sgm in sgms]
        B = len(rows)
        # coarse lattice: see host_logits_buckets (warmup pre-compiles it)
        b_pad = self.scheduler_config.pad_host_batch(B)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        out_ids: List[List[int]] = []
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            tokens[i] = data.get_last_token_id()
            positions[i] = data.get_len() - 1
            tables[i] = self._block_table_row(sgm.block_tables[seq_id],
                                              width)
            out_ids.append(list(data.output_token_ids))
        lora, lidx = self._lora_args([sgm.lora_request for sgm, _ in rows],
                                     b_pad)
        fn = self._get_fn("decode_logits", 0)
        frozen = [False] * B
        steps: List[List[CompletionSequenceGroupOutput]] = []
        for _ in range(K):
            slots = np.full((b_pad, ), -1, np.int32)
            ctx = np.ones((b_pad, ), np.int32)
            for i in range(B):
                p = int(positions[i])
                slots[i] = tables[i][p // self.block_size] * \
                    self.block_size + p % self.block_size
                ctx[i] = p + 1
            meta = AttentionMetadata(slot_mapping=jnp.asarray(slots),
                                     block_tables=jnp.asarray(tables),
                                     context_lens=jnp.asarray(ctx))
            self._bcast("decode_logits", 0,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, block_tables=tables,
                             context_lens=ctx), lidx=lidx)
            new_kv, logits = fn(self.params, cache_engine.kv_caches,
                                jnp.asarray(tokens),
                                jnp.asarray(positions), meta, lora, lidx)
            cache_engine.kv_caches = new_kv
            logits_np = np.asarray(logits[:B], np.float32)
            step_out: List[CompletionSequenceGroupOutput] = []
            for i, (sgm, seq_id) in enumerate(rows):
                sp = sgm.sampling_params
                data = sgm.seq_data[seq_id]
                if frozen[i]:
                    # EOS already emitted inside this window: repeat it
                    # (the engine's stop checker drops everything after
                    # the first EOS) instead of advancing a guided FSM
                    # past its accept state
                    token = int(tokens[i])
                    lp = {token: Logprob(0.0)}
                else:
                    token, lp = host_sampler.sample_row(
                        logits_np[i], sp, data.prompt_token_ids,
                        out_ids[i],
                        eos_token_id=sgm.eos_token_id,
                        step_seed=int(positions[i]) + 1,
                        entropy=hash(sgm.request_id) & (2**62 - 1),
                        num_logprobs=sp.logprobs or 0)
                    if sgm.eos_token_id is not None and \
                            token == sgm.eos_token_id and not sp.ignore_eos:
                        frozen[i] = True
                out_ids[i].append(token)
                step_out.append(CompletionSequenceGroupOutput(samples=[
                    SequenceOutput(seq_id, token, lp)]))
                tokens[i] = token
                positions[i] += 1
            steps.append(step_out)
        return steps

    # --- speculative decode ---------------------------------------------------
    @staticmethod
    def _needs_full_sampling(sp: SamplingParams) -> bool:
        """Draft-model verification applies plain temperature softmax in
        graph; rows needing top-k/p/min-p fall back to regular decode."""
        V_off = sp.top_k <= 0
        return ((not V_off and sp.top_k < 2**30) or sp.top_p < 1.0
                or sp.min_p > 0.0 or _uses_penalties(sp))

    def _draft_prefill(self, tokens, positions, meta, draft_cache_engine,
                       seq_id: int, prompt_len: int) -> None:
        """Mirror a prompt into the draft model's KV cache (the
        MultiStepWorker's first pass, reference multi_step_worker.py)."""
        fn = self._get_fn("draft_prefill", 0)
        self._bcast("draft_prefill", 0,
                    dict(tokens=tokens, positions=positions,
                         slot_mapping=meta.slot_mapping,
                         block_tables=meta.block_tables,
                         context_lens=meta.context_lens))
        new_kv = fn(self.draft_params, draft_cache_engine.kv_caches,
                    tokens, positions, meta)
        draft_cache_engine.kv_caches = new_kv
        self._draft_seen[seq_id] = prompt_len

    def _execute_decode_spec_draft(self, sgms: List[SequenceGroupMetadata],
                                   cache_engine: CacheEngine
                                   ) -> List[SamplerOutput]:
        """One fused draft-propose + target-verify + rejection dispatch
        (spec_decode/draft_model.py)."""
        k = self.speculative_config.num_speculative_tokens
        dce = self.draft_cache_engine
        rows = [(sgm, next(iter(sgm.seq_data))) for sgm in sgms]
        B = len(rows)
        b_pad = self.scheduler_config.pad_decode_batch(B)

        last_tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        valid = np.zeros((b_pad, ), np.bool_)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        cu_tok = np.zeros((b_pad, k), np.int32)
        cu_pos = np.zeros((b_pad, k), np.int32)
        cu_valid = np.zeros((b_pad, k), np.bool_)
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            L = data.get_len()
            last_tokens[i] = data.get_last_token_id()
            positions[i] = L - 1
            valid[i] = True
            tables[i] = self._block_table_row(sgm.block_tables[seq_id],
                                              width)
            seen = self._draft_seen.get(seq_id, 0)
            ids = data.get_token_ids()
            if (L - 1) - seen > k:
                # draft cache too stale to catch up in one fused step
                # (shouldn't happen outside exotic preemption interleavings)
                return [SamplerOutput(
                    outputs=self._execute_decode(sgms, cache_engine))]
            for j, idx in enumerate(range(seen, L - 1)):
                cu_tok[i, j] = ids[idx]
                cu_pos[i, j] = idx
                cu_valid[i, j] = True

        pad_rows = rows + [rows[-1]] * (b_pad - B)
        samp = self._samp_tensors(pad_rows)
        self._bcast("spec_draft", 0,
                    dict(cu_tok=cu_tok, cu_pos=cu_pos, cu_valid=cu_valid,
                         last_tokens=last_tokens, positions=positions,
                         block_tables=tables, valid=valid,
                         temperature=samp.temperature, keys=samp.keys))
        new_kv, new_dkv, out_tokens, n_out, chosen_lp = self._get_spec_fn()(
            self.params, self.draft_params, cache_engine.kv_caches,
            dce.kv_caches, jnp.asarray(cu_tok), jnp.asarray(cu_pos),
            jnp.asarray(cu_valid), jnp.asarray(last_tokens),
            jnp.asarray(positions), jnp.asarray(tables),
            jnp.asarray(valid), samp.temperature, samp.keys)
        cache_engine.kv_caches = new_kv
        dce.kv_caches = new_dkv
        out_tokens = np.asarray(out_tokens)
        n_out = np.asarray(n_out)
        chosen_lp = np.asarray(chosen_lp)

        self._spec_metrics.num_steps += 1
        for i, (sgm, seq_id) in enumerate(rows):
            self._spec_metrics.num_spec_tokens += k
            self._spec_metrics.accepted_tokens += int(n_out[i]) - 1
            self._spec_metrics.emitted_tokens += int(n_out[i])
            L = sgm.seq_data[seq_id].get_len()
            # Propose fed [last, d_1..d_{k-1}], writing draft KV through
            # index L + k - 2. On a REJECTION (accepted = n_acc < k) the
            # first unfed committed index is L + n_acc (the resample
            # token, which next step's propose feeds as its last token).
            # On a FULL accept (accepted = k) the committed d_k at index
            # L + k - 1 was never fed — propose stops at d_{k-1} — so
            # catch-up must back-fill it next step. The old
            # `L + accepted` formula skipped d_k forever after every full
            # accept, leaving a permanently stale draft-KV slot per
            # full-accept round (measured: draft==target acceptance 0.48
            # instead of ~1.0).
            self._draft_seen[seq_id] = L + min(int(n_out[i]) - 1, k - 1)

        max_len = int(n_out[:B].max())
        outputs: List[SamplerOutput] = []
        for step in range(max_len):
            group_outputs = []
            for i, (sgm, seq_id) in enumerate(rows):
                if step < int(n_out[i]):
                    tok = int(out_tokens[i, step])
                    lp = {tok: Logprob(float(chosen_lp[i, step]))}
                    group_outputs.append(CompletionSequenceGroupOutput(
                        samples=[SequenceOutput(seq_id, tok, lp)]))
                else:
                    group_outputs.append(
                        CompletionSequenceGroupOutput(samples=[]))
            outputs.append(SamplerOutput(outputs=group_outputs))
        outputs[0].spec_decode_worker_metrics = self._spec_metrics
        return outputs

    def _execute_decode_spec_mlp(self, sgms: List[SequenceGroupMetadata],
                                 cache_engine: CacheEngine
                                 ) -> List[SamplerOutput]:
        """MLPSpeculator step (reference MLPSpeculatorWorker): propose k
        tokens from (last token, hidden state that sampled it) in one
        device call, verify through the batched decode executable, accept
        via rejection sampling on host, and carry the last accepted row's
        hidden state for the next step's proposals. The first decode step
        of each sequence (no hidden yet) runs unspeculated and just
        collects its hidden state."""
        k = min(self.speculative_config.num_speculative_tokens,
                self.mlp_speculator.n_predict)
        rows = [(sgm, next(iter(sgm.seq_data))) for sgm in sgms]
        B = len(rows)

        have_hidden = all(sid in self._spec_hidden for _, sid in rows)
        if not have_hidden:
            # unspeculated warm step: plain batch, collect hidden
            b_pad = self.scheduler_config.pad_decode_batch(B)
            tokens = np.zeros((b_pad, ), np.int32)
            positions = np.zeros((b_pad, ), np.int32)
            slots = np.full((b_pad, ), -1, np.int32)
            ctx_lens = np.ones((b_pad, ), np.int32)
            width = self._table_width(
                [sgm.block_tables[sid] for sgm, sid in rows])
            tables = np.zeros((b_pad, width), np.int32)
            for i, (sgm, seq_id) in enumerate(rows):
                data = sgm.seq_data[seq_id]
                L = data.get_len()
                tokens[i] = data.get_last_token_id()
                positions[i] = L - 1
                table = sgm.block_tables[seq_id]
                slots[i] = table[(L - 1) // self.block_size] * \
                    self.block_size + (L - 1) % self.block_size
                ctx_lens[i] = L
                tables[i] = self._block_table_row(table, width)
            meta = AttentionMetadata(slot_mapping=jnp.asarray(slots),
                                     block_tables=jnp.asarray(tables),
                                     context_lens=jnp.asarray(ctx_lens))
            fn = self._get_fn("decode_logits_hidden", 0)
            lora, lidx = self._lora_args(
                [sgm.lora_request for sgm, _ in rows], b_pad)
            self._bcast("decode_logits_hidden", 0,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, block_tables=tables,
                             context_lens=ctx_lens), lidx=lidx)
            new_kv, (logits, hidden) = fn(
                self.params, cache_engine.kv_caches, jnp.asarray(tokens),
                jnp.asarray(positions), meta, lora, lidx)
            cache_engine.kv_caches = new_kv
            logits_np = np.asarray(logits[:B], np.float32)
            hidden_np = np.asarray(hidden[:B], np.float32)
            group_outputs = []
            for i, (sgm, seq_id) in enumerate(rows):
                token, lp = host_sampler.sample_row(
                    logits_np[i], sgm.sampling_params,
                    sgm.seq_data[seq_id].prompt_token_ids,
                    sgm.seq_data[seq_id].output_token_ids,
                    eos_token_id=sgm.eos_token_id,
                    step_seed=sgm.seq_data[seq_id].get_len(),
                    entropy=hash(sgm.request_id) & (2**62 - 1),
                    num_logprobs=sgm.sampling_params.logprobs or 0)
                self._spec_hidden[seq_id] = hidden_np[i]
                group_outputs.append(CompletionSequenceGroupOutput(
                    samples=[SequenceOutput(seq_id, token, lp)]))
            self._prune_spec_hidden()
            return [SamplerOutput(outputs=group_outputs)]

        # 1. proposals in one device call
        last = np.array([sgm.seq_data[sid].get_last_token_id()
                         for sgm, sid in rows], np.int32)
        hid = np.stack([self._spec_hidden[sid] for _, sid in rows])
        fnp = self._get_fn("mlp_propose", k)
        self._bcast("mlp_propose", k,
                    dict(last_tokens=last,
                         hidden=hid.astype(np.float32)))
        props = np.asarray(fnp(self.mlp_spec_params, jnp.asarray(last),
                               jnp.asarray(hid, np.float32)))  # [B, k]

        # 2. batched verification (same flat layout as the ngram path)
        S = k + 1
        flat = B * S
        from neural_magic_vllm_tpu.utils import round_up
        if flat > self.scheduler_config.max_num_seqs:
            b_pad = round_up(flat, 16)
        else:
            b_pad = self.scheduler_config.pad_decode_batch(flat)
        tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        slots = np.full((b_pad, ), -1, np.int32)
        ctx_lens = np.ones((b_pad, ), np.int32)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            p0 = data.get_len() - 1
            table = sgm.block_tables[seq_id]
            row_tokens = [data.get_last_token_id()] + props[i].tolist()
            for j, tok in enumerate(row_tokens):
                r = i * S + j
                pos = p0 + j
                tokens[r] = tok
                positions[r] = pos
                slots[r] = table[pos // self.block_size] * self.block_size \
                    + pos % self.block_size
                ctx_lens[r] = pos + 1
                tables[r] = self._block_table_row(table, width)
        meta = AttentionMetadata(slot_mapping=jnp.asarray(slots),
                                 block_tables=jnp.asarray(tables),
                                 context_lens=jnp.asarray(ctx_lens))
        fn = self._get_fn("decode_logits_hidden", 0)
        spec_reqs = [sgm.lora_request for sgm, _ in rows for _ in range(S)]
        lora, lidx = self._lora_args(spec_reqs, b_pad)
        self._bcast("decode_logits_hidden", 0,
                    dict(tokens=tokens, positions=positions,
                         slot_mapping=slots, block_tables=tables,
                         context_lens=ctx_lens), lidx=lidx)
        new_kv, (logits, hidden) = fn(
            self.params, cache_engine.kv_caches, jnp.asarray(tokens),
            jnp.asarray(positions), meta, lora, lidx)
        cache_engine.kv_caches = new_kv
        logits_np = np.asarray(logits[:flat], np.float32)
        hidden_np = np.asarray(hidden[:flat], np.float32)

        # 3. accept + carry hidden
        from neural_magic_vllm_tpu.spec_decode import (
            rejection_sample_greedy, rejection_sample_onehot)
        from neural_magic_vllm_tpu.spec_decode.rejection import \
            typical_acceptance
        use_typical = (self.speculative_config.draft_token_acceptance_method
                       == "typical_acceptance_sampler")
        outputs_per_seq: List[List[Tuple[int, float]]] = []
        for i, (sgm, seq_id) in enumerate(rows):
            sp = sgm.sampling_params
            prop = props[i].tolist()
            lg = logits_np[i * S:(i + 1) * S]
            if sp.temperature < _SAMPLING_EPS:
                toks = rejection_sample_greedy(lg, prop)
            elif use_typical:
                toks = typical_acceptance(lg, prop, sp.temperature)
            else:
                seed_key = self._seq_key(sgm, seq_id)
                rng = np.random.default_rng(
                    [int(seed_key[0]), int(seed_key[1]),
                     sgm.seq_data[seq_id].get_len()])
                toks = rejection_sample_onehot(lg, prop, sp.temperature,
                                               rng)
            m = len(toks)
            self._spec_hidden[seq_id] = hidden_np[i * S + m - 1]
            lps = []
            for j, tok in enumerate(toks):
                row = lg[j]
                mx = row.max()
                lps.append(float(row[tok] - mx -
                                 np.log(np.exp(row - mx).sum())))
            outputs_per_seq.append(list(zip(toks, lps)))
            self._spec_metrics.num_spec_tokens += k
            self._spec_metrics.accepted_tokens += max(m - 1, 0)
            self._spec_metrics.emitted_tokens += m
        self._spec_metrics.num_steps += 1
        self._prune_spec_hidden()

        max_len = max(len(o) for o in outputs_per_seq)
        outputs: List[SamplerOutput] = []
        for step in range(max_len):
            group_outputs = []
            for i, (sgm, seq_id) in enumerate(rows):
                if step < len(outputs_per_seq[i]):
                    tok, lp = outputs_per_seq[i][step]
                    group_outputs.append(CompletionSequenceGroupOutput(
                        samples=[SequenceOutput(seq_id, tok,
                                                {tok: Logprob(lp)})]))
                else:
                    group_outputs.append(
                        CompletionSequenceGroupOutput(samples=[]))
            outputs.append(SamplerOutput(outputs=group_outputs))
        outputs[0].spec_decode_worker_metrics = self._spec_metrics
        return outputs

    def _prune_spec_hidden(self) -> None:
        cap = 4 * self.scheduler_config.max_num_seqs
        while len(self._spec_hidden) > cap:
            self._spec_hidden.pop(next(iter(self._spec_hidden)))

    def _execute_decode_spec(self, sgms: List[SequenceGroupMetadata],
                             cache_engine: CacheEngine
                             ) -> List[SamplerOutput]:
        """NGram speculative decoding (reference SpecDecodeWorker +
        NGramWorker, spec_decode_worker.py:73 / ngram_worker.py:13),
        TPU-reshaped: verification is ONE batched forward where each
        sequence contributes S = k+1 rows sharing its block table with
        incremental context_lens — exactly the decode executable's shape
        contract, so no batch-expansion machinery is needed. Rejection
        sampling runs host-side on the returned logits."""
        k = self.speculative_config.num_speculative_tokens
        S = k + 1
        rows = [(sgm, next(iter(sgm.seq_data))) for sgm in sgms]
        B = len(rows)
        flat = B * S
        # the flat verification batch can exceed max_num_seqs (the decode
        # bucket cap): extend the lattice in 16-row steps
        from neural_magic_vllm_tpu.utils import round_up
        if flat > self.scheduler_config.max_num_seqs:
            b_pad = round_up(flat, 16)
        else:
            b_pad = self.scheduler_config.pad_decode_batch(flat)

        tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        slots = np.full((b_pad, ), -1, np.int32)
        ctx_lens = np.ones((b_pad, ), np.int32)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        proposals: List[List[int]] = []
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            all_ids = data.get_token_ids()
            prop = self._spec_proposer.propose(all_ids) or []
            proposals.append(prop)
            p0 = data.get_len() - 1
            table = sgm.block_tables[seq_id]
            row_tokens = [data.get_last_token_id()] + list(prop)
            for j, tok in enumerate(row_tokens):
                r = i * S + j
                pos = p0 + j
                tokens[r] = tok
                positions[r] = pos
                slots[r] = table[pos // self.block_size] * self.block_size \
                    + pos % self.block_size
                ctx_lens[r] = pos + 1
                tables[r] = self._block_table_row(table, width)
            # rows j > len(prop) stay padded (slot -1, dropped)

        meta = AttentionMetadata(slot_mapping=jnp.asarray(slots),
                                 block_tables=jnp.asarray(tables),
                                 context_lens=jnp.asarray(ctx_lens))
        spec_reqs = [sgm.lora_request for sgm, _ in rows
                     for _ in range(S)]
        lora, lidx = self._lora_args(spec_reqs, b_pad)

        all_greedy = all(sgm.sampling_params.temperature < _SAMPLING_EPS
                         for sgm, _ in rows)
        if all_greedy:
            # in-graph greedy rejection: only [B_max, S] token ids +
            # logprobs cross the device link, never the [flat, V] logits
            B_max = b_pad // S
            prop_arr = np.full((B_max, k), -1, np.int32)
            plen = np.zeros((B_max, ), np.int32)
            for i, p in enumerate(proposals):
                prop_arr[i, :len(p)] = p
                plen[i] = len(p)
            fn = self._get_fn("decode_spec_verify", S)
            self._bcast("decode_spec_verify", S,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, block_tables=tables,
                             context_lens=ctx_lens, proposals=prop_arr,
                             plen=plen), lidx=lidx)
            new_kv, ys = fn(self.params, cache_engine.kv_caches,
                            jnp.asarray(tokens), jnp.asarray(positions),
                            meta, jnp.asarray(prop_arr),
                            jnp.asarray(plen), lora, lidx)
            cache_engine.kv_caches = new_kv
            emitted, n_emit, lp_arr = jax.device_get(ys)
            accepted = [list(map(int, emitted[i, :n_emit[i]]))
                        for i in range(B)]
            chosen_lp = [[float(lp_arr[i, j])
                          for j in range(int(n_emit[i]))]
                         for i in range(B)]
        elif self.speculative_config.draft_token_acceptance_method \
                != "typical_acceptance_sampler" and \
                self.control_plane is None:
            # mixed/stochastic temperatures: in-graph seeded one-hot
            # rejection sampling (VERDICT r4 #4) — the [flat, V] logits
            # never leave the device (host pull was 328 MB/dispatch at
            # bs128 k=4 on the 8B model, spec_bench r4)
            B_max = b_pad // S
            prop_arr = np.full((B_max, k), -1, np.int32)
            plen = np.zeros((B_max, ), np.int32)
            base_pos = np.zeros((B_max, ), np.int32)
            temp = np.zeros((B_max, ), np.float32)
            keys = np.zeros((B_max, 2), np.uint32)
            for i, (sgm, seq_id) in enumerate(rows):
                prop_arr[i, :len(proposals[i])] = proposals[i]
                plen[i] = len(proposals[i])
                base_pos[i] = sgm.seq_data[seq_id].get_len() - 1
                temp[i] = sgm.sampling_params.temperature
                keys[i] = self._seq_key(sgm, seq_id)
            fn = self._get_fn("decode_spec_verify_stoch", S)
            new_kv, ys = fn(self.params, cache_engine.kv_caches,
                            jnp.asarray(tokens), jnp.asarray(positions),
                            meta, jnp.asarray(prop_arr),
                            jnp.asarray(plen), jnp.asarray(base_pos),
                            jnp.asarray(temp), jnp.asarray(keys),
                            lora, lidx)
            cache_engine.kv_caches = new_kv
            emitted, n_emit, lp_arr = jax.device_get(ys)
            accepted = [list(map(int, emitted[i, :n_emit[i]]))
                        for i in range(B)]
            chosen_lp = [[float(lp_arr[i, j])
                          for j in range(int(n_emit[i]))]
                         for i in range(B)]
        else:
            fn = self._get_fn("decode_logits", 0)
            self._bcast("decode_logits", 0,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, block_tables=tables,
                             context_lens=ctx_lens), lidx=lidx)
            new_kv, logits = fn(self.params, cache_engine.kv_caches,
                                jnp.asarray(tokens), jnp.asarray(positions),
                                meta, lora, lidx)
            cache_engine.kv_caches = new_kv
            logits_np = np.asarray(logits[:flat], np.float32)

            from neural_magic_vllm_tpu.spec_decode import (
                rejection_sample_greedy, rejection_sample_onehot)
            from neural_magic_vllm_tpu.spec_decode.rejection import \
                typical_acceptance
            use_typical = (
                self.speculative_config.draft_token_acceptance_method
                == "typical_acceptance_sampler")
            accepted = []
            chosen_lp = []
            for i, (sgm, seq_id) in enumerate(rows):
                sp = sgm.sampling_params
                prop = proposals[i]
                lg = logits_np[i * S:i * S + len(prop) + 1]
                if sp.temperature < _SAMPLING_EPS:
                    toks = rejection_sample_greedy(lg, prop)
                elif use_typical:
                    toks = typical_acceptance(lg, prop, sp.temperature)
                else:
                    seed_key = self._seq_key(sgm, seq_id)
                    data = sgm.seq_data[seq_id]
                    rng = np.random.default_rng(
                        [int(seed_key[0]), int(seed_key[1]),
                         data.get_len()])
                    toks = rejection_sample_onehot(lg, prop, sp.temperature,
                                                   rng)
                accepted.append(toks)
                lps = []
                for j, tok in enumerate(toks):
                    row = lg[j]
                    m_ = row.max()
                    lps.append(float(row[tok] - m_ -
                                     np.log(np.exp(row - m_).sum())))
                chosen_lp.append(lps)

        self._spec_metrics.num_steps += 1
        for i, prop in enumerate(proposals):
            self._spec_metrics.num_spec_tokens += len(prop)
            # accepted drafts = emitted tokens minus the bonus/correction
            self._spec_metrics.accepted_tokens += max(
                len(accepted[i]) - 1, 0)
            self._spec_metrics.emitted_tokens += len(accepted[i])

        max_len = max(len(a) for a in accepted)
        outputs: List[SamplerOutput] = []
        for step in range(max_len):
            group_outputs = []
            for i, (sgm, seq_id) in enumerate(rows):
                if step < len(accepted[i]):
                    tok = accepted[i][step]
                    lp = {tok: Logprob(chosen_lp[i][step])}
                    group_outputs.append(CompletionSequenceGroupOutput(
                        samples=[SequenceOutput(seq_id, tok, lp)]))
                else:
                    group_outputs.append(
                        CompletionSequenceGroupOutput(samples=[]))
            outputs.append(SamplerOutput(outputs=group_outputs))
        return outputs

    # --- decode -----------------------------------------------------------------
    def _execute_decode(self, sgms: List[SequenceGroupMetadata],
                        cache_engine: CacheEngine
                        ) -> List[CompletionSequenceGroupOutput]:
        host_flags = [_needs_host_sampling(m.sampling_params) for m in sgms]
        if any(host_flags) and not all(host_flags):
            # Split: on-device rows keep in-graph sampling at their own
            # bucket; host rows transfer only THEIR logits rows.
            # (Previously one guided request pulled the full [B, V]
            # logits to host and host-sampled every row — 263 MB/step
            # at bs512 through the device link.)
            host_out = iter(self._execute_decode(
                [m for m, h in zip(sgms, host_flags) if h], cache_engine))
            dev_out = iter(self._execute_decode(
                [m for m, h in zip(sgms, host_flags) if not h],
                cache_engine))
            return [next(host_out) if h else next(dev_out)
                    for h in host_flags]
        rows: List[Tuple[SequenceGroupMetadata, int]] = []
        for sgm in sgms:
            for seq_id in sgm.seq_data:
                rows.append((sgm, seq_id))
        B = len(rows)
        # Host rows ride the coarse host_logits_buckets lattice so full
        # warmup can pre-compile every decode_logits bucket (advisor r4).
        all_host = bool(host_flags) and all(host_flags)
        b_pad = (self.scheduler_config.pad_host_batch(B) if all_host
                 else self.scheduler_config.pad_decode_batch(B))

        tokens = np.zeros((b_pad, ), np.int32)
        positions = np.zeros((b_pad, ), np.int32)
        slots = np.full((b_pad, ), -1, np.int32)
        ctx_lens = np.ones((b_pad, ), np.int32)
        width = self._table_width(
            [sgm.block_tables[sid] for sgm, sid in rows])
        tables = np.zeros((b_pad, width), np.int32)
        for i, (sgm, seq_id) in enumerate(rows):
            data = sgm.seq_data[seq_id]
            seq_len = data.get_len()
            tokens[i] = data.get_last_token_id()
            positions[i] = seq_len - 1
            table = sgm.block_tables[seq_id]
            slots[i] = table[(seq_len - 1) // self.block_size] * \
                self.block_size + (seq_len - 1) % self.block_size
            ctx_lens[i] = seq_len
            tables[i] = self._block_table_row(table, width)

        state_slots = None
        if self.has_state:
            ss = np.full((b_pad, ), self.num_state_slots, np.int32)  # OOB
            for i, (sgm, seq_id) in enumerate(rows):
                ss[i] = self._state_slot(seq_id, self._active_seq_ids)
            state_slots = jnp.asarray(ss)
        meta = AttentionMetadata(slot_mapping=jnp.asarray(slots),
                                 block_tables=jnp.asarray(tables),
                                 context_lens=jnp.asarray(ctx_lens),
                                 state_slots=state_slots)

        host = any(_needs_host_sampling(sgm.sampling_params)
                   for sgm, _ in rows)
        any_logprobs = any((sgm.sampling_params.logprobs or 0) > 0
                           for sgm, _ in rows)

        lora, lidx = self._lora_args([sgm.lora_request for sgm, _ in rows],
                                     b_pad)
        ss_arrs = {} if state_slots is None else dict(
            state_slots=state_slots)
        if host:
            fn = self._get_fn("decode_logits", 0)
            self._bcast("decode_logits", 0,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, block_tables=tables,
                             context_lens=ctx_lens, **ss_arrs),
                        lidx=lidx)
            new_kv, logits = fn(self.params, cache_engine.kv_caches,
                                jnp.asarray(tokens), jnp.asarray(positions),
                                meta, lora, lidx)
            cache_engine.kv_caches = new_kv
            logits_np = np.asarray(logits[:B], np.float32)
            results = []
            for i, (sgm, seq_id) in enumerate(rows):
                data = sgm.seq_data[seq_id]
                token, lp = host_sampler.sample_row(
                    logits_np[i], sgm.sampling_params,
                    data.prompt_token_ids, data.output_token_ids,
                    eos_token_id=sgm.eos_token_id,
                    step_seed=data.get_len(),
                    entropy=hash(sgm.request_id) & (2**62 - 1),
                    num_logprobs=sgm.sampling_params.logprobs or 0)
                results.append((seq_id, token, lp))
        else:
            nlp = self.max_logprobs if any_logprobs else 0
            fn = self._get_fn("decode_sample", nlp)
            pad_rows = rows + [rows[-1]] * (b_pad - B)
            samp = self._samp_tensors(pad_rows)
            self._bcast("decode_sample", nlp,
                        dict(tokens=tokens, positions=positions,
                             slot_mapping=slots, block_tables=tables,
                             context_lens=ctx_lens, **ss_arrs), samp,
                        lidx=lidx)
            new_kv, out = fn(self.params, cache_engine.kv_caches,
                             jnp.asarray(tokens), jnp.asarray(positions),
                             meta, samp, lora, lidx)
            cache_engine.kv_caches = new_kv
            tid, chosen, tv, ti = jax.device_get(out)
            results = []
            for i, (sgm, seq_id) in enumerate(rows):
                num_lp = sgm.sampling_params.logprobs or 0
                lp = self._logprob_dict(int(tid[i]), float(chosen[i]),
                                        tv[i] if nlp else None,
                                        ti[i] if nlp else None, num_lp)
                results.append((seq_id, int(tid[i]), lp))

        # Group rows back into per-seq-group outputs.
        out_list: List[CompletionSequenceGroupOutput] = []
        r = 0
        for sgm in sgms:
            sp = sgm.sampling_params
            n_rows = len(sgm.seq_data)
            if sp.use_beam_search and host:
                # 2*bw combined candidates across parents (reference
                # _beam_search_sample, sampler.py:272-423): score =
                # parent cumulative logprob + token logprob.
                out_list.append(self._beam_candidates_output(
                    sgm, logits_np[r:r + n_rows]))
                r += n_rows
                continue
            samples = []
            for seq_id in sgm.seq_data:
                rid, token, lp = results[r]
                assert rid == seq_id
                samples.append(SequenceOutput(seq_id, token, lp))
                r += 1
            out_list.append(CompletionSequenceGroupOutput(samples=samples))
        return out_list

    def _beam_candidates_output(self, sgm: SequenceGroupMetadata,
                                logits_rows: np.ndarray
                                ) -> CompletionSequenceGroupOutput:
        sp = sgm.sampling_params
        bw = sp.best_of
        parents = list(sgm.seq_data)
        V = logits_rows.shape[1]
        logprobs = logits_rows.astype(np.float64)
        logprobs -= logprobs.max(axis=1, keepdims=True)
        logprobs -= np.log(np.exp(logprobs).sum(axis=1, keepdims=True))
        cum = np.array([sgm.seq_data[sid].cumulative_logprob
                        for sid in parents])[:, None]
        flat = (logprobs + cum).ravel()
        top = np.argsort(-flat)[:2 * bw]
        samples = []
        for cand in top:
            row, token = divmod(int(cand), V)
            samples.append(SequenceOutput(
                parents[row], token,
                {token: Logprob(float(logprobs[row, token]))}))
        return CompletionSequenceGroupOutput(samples=samples)
