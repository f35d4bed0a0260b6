"""Engine configuration dataclasses.

Mirrors the reference's 13-config design (vllm/config.py, 1569 LoC): typed
dataclasses with cross-validation, assembled by EngineArgs. TPU-first twists:
- ``gpu_memory_utilization`` -> ``hbm_utilization``
  (the reference flag name is still accepted by EngineArgs).
- SchedulerConfig carries the static-shape bucket lattice (prefill token
  buckets, decode batch buckets) that replaces CUDA-graph batch sizes.
- ParallelConfig describes a jax.sharding Mesh (data/model axes), not
  NCCL process groups.
"""
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.utils import next_power_of_2, round_up

logger = init_logger(__name__)

_STR_DTYPE_TO_JNP = {
    "float32": "float32",
    "float": "float32",
    "float16": "bfloat16",  # TPU: fp16 promoted to bf16
    "half": "bfloat16",
    "bfloat16": "bfloat16",
    "auto": None,
}


class ModelConfig:
    """Model + tokenizer + dtype + quantization configuration
    (reference vllm/config.py:41)."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        dtype: str = "auto",
        seed: int = 0,
        revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        quantization_param_path: Optional[str] = None,
        sparsity: Optional[str] = None,
        enforce_eager: bool = False,
        max_logprobs: int = 20,
        skip_tokenizer_init: bool = False,
        served_model_name: Optional[Union[str, List[str]]] = None,
        rope_scaling: Optional[Dict[str, Any]] = None,
        rope_theta: Optional[float] = None,
        hf_config: Optional[Any] = None,
        tokenizer_revision: Optional[str] = None,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer or model
        self.tokenizer_mode = tokenizer_mode
        self.trust_remote_code = trust_remote_code
        self.seed = seed
        self.revision = revision
        self.tokenizer_revision = tokenizer_revision
        self.quantization = quantization
        self.quantization_param_path = quantization_param_path
        self.sparsity = sparsity
        self.enforce_eager = enforce_eager
        self.max_logprobs = max_logprobs
        self.skip_tokenizer_init = skip_tokenizer_init
        self.rope_scaling = rope_scaling
        self.rope_theta = rope_theta

        if hf_config is None:
            from neural_magic_vllm_tpu.transformers_utils.config import (
                get_hf_config)
            hf_config = get_hf_config(model, trust_remote_code, revision)
        self.hf_config = hf_config
        self.hf_text_config = getattr(hf_config, "text_config", hf_config)

        # dtype resolution: "auto" follows checkpoint dtype, but fp16 is
        # promoted to bf16 on TPU (same exponent range as fp32; fp16 would
        # need loss-scale handling and has no TPU advantage).
        ckpt_dtype = str(getattr(self.hf_text_config, "torch_dtype", None)
                         or "float32").replace("torch.", "")
        if dtype == "auto":
            self.dtype = "bfloat16" if ckpt_dtype in ("float16", "bfloat16",
                                                      "half") else "float32"
        else:
            resolved = _STR_DTYPE_TO_JNP.get(dtype)
            if resolved is None:
                raise ValueError(f"Unknown dtype: {dtype}")
            self.dtype = resolved

        derived_max = getattr(self.hf_text_config, "max_position_embeddings",
                              None) or 2048
        if max_model_len is None:
            self.max_model_len = derived_max
        else:
            if max_model_len > derived_max and rope_scaling is None:
                logger.warning(
                    "max_model_len %d > model max_position_embeddings %d",
                    max_model_len, derived_max)
            self.max_model_len = max_model_len

        if served_model_name is None:
            self.served_model_name = model
        elif isinstance(served_model_name, list):
            self.served_model_name = served_model_name[0]
        else:
            self.served_model_name = served_model_name

        self._verify_quantization()

    def _verify_quantization(self) -> None:
        if self.quantization is None:
            return
        self.quantization = self.quantization.lower()
        from neural_magic_vllm_tpu.quantization import QUANTIZATION_METHODS
        if self.quantization not in QUANTIZATION_METHODS:
            raise ValueError(
                f"Unknown quantization method: {self.quantization}. "
                f"Supported: {sorted(set(QUANTIZATION_METHODS))}")

    # --- architecture probes ---------------------------------------------
    def get_hidden_size(self) -> int:
        return self.hf_text_config.hidden_size

    def get_head_size(self) -> int:
        cfg = self.hf_text_config
        # DeepSeek-V2 MLA: qk head = nope + rope parts; v is padded to the
        # same size in the paged cache (reference config.py:41 FlashMLA
        # handling; models/deepseek_v2.py decompression)
        if hasattr(cfg, "qk_nope_head_dim") and hasattr(
                cfg, "qk_rope_head_dim"):
            return cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        if hasattr(cfg, "head_dim") and cfg.head_dim is not None:
            return cfg.head_dim
        return cfg.hidden_size // cfg.num_attention_heads

    def get_total_num_attention_heads(self) -> int:
        return self.hf_text_config.num_attention_heads

    def get_total_num_kv_heads(self) -> int:
        cfg = self.hf_text_config
        if getattr(cfg, "new_decoder_architecture", False):  # falcon 40B+
            return getattr(cfg, "num_kv_heads", None) \
                or cfg.num_attention_heads
        if getattr(cfg, "multi_query", False):  # gpt_bigcode/falcon MQA
            return 1
        return getattr(cfg, "num_key_value_heads", None) \
            or cfg.num_attention_heads

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        # When TP > total kv heads, kv heads are replicated.
        return max(
            1,
            self.get_total_num_kv_heads() //
            parallel_config.tensor_parallel_size)

    def get_num_attention_heads(self,
                                parallel_config: "ParallelConfig") -> int:
        return (self.get_total_num_attention_heads() //
                parallel_config.tensor_parallel_size)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        """Number of KV-cached (attention) layers. Hybrid models like
        Jamba interleave attention with recurrent mamba layers — only the
        attention layers hold paged KV (reference jamba.py cache sizing).

        Always the TOTAL layer count: unlike the reference (which divides
        by pipeline_parallel_size because each PP worker allocates its own
        slice, vllm/config.py:327), the single-controller design holds
        GLOBAL-shaped stacks whose layer axis is sharded over the "stage"
        mesh axis — per-stage memory comes from the sharding."""
        cfg = self.hf_text_config
        total = cfg.num_hidden_layers
        if getattr(cfg, "attn_layer_period", None):
            total = sum(1 for i in range(total)
                        if i % cfg.attn_layer_period ==
                        cfg.attn_layer_offset)
        return total

    @property
    def is_stateful(self) -> bool:
        """True for models carrying per-sequence recurrent state (mamba):
        prefix caching / forking / swap are rejected for these."""
        arch = getattr(self.hf_config, "architectures", None) or []
        return any("Jamba" in a or "Mamba" in a for a in arch)

    def get_vocab_size(self) -> int:
        return self.hf_text_config.vocab_size

    def get_sliding_window(self) -> Optional[int]:
        cfg = self.hf_text_config
        if getattr(cfg, "use_sliding_window", True) is False:
            return None
        return getattr(cfg, "sliding_window", None)


class CacheConfig:
    """Paged KV-cache configuration (reference vllm/config.py:447)."""

    def __init__(
        self,
        block_size: int = 16,
        hbm_utilization: float = 0.9,
        swap_space: float = 4.0,  # GiB of host swap per chip
        cache_dtype: str = "auto",
        num_gpu_blocks_override: Optional[int] = None,
        sliding_window: Optional[int] = None,
        enable_prefix_caching: bool = False,
    ) -> None:
        self.block_size = block_size
        self.hbm_utilization = hbm_utilization
        self.swap_space_bytes = int(swap_space * 2**30)
        self.cache_dtype = cache_dtype
        self.num_gpu_blocks_override = num_gpu_blocks_override
        self.sliding_window = sliding_window
        self.enable_prefix_caching = enable_prefix_caching
        self._verify_args()
        # Filled by the worker after HBM profiling:
        self.num_gpu_blocks: Optional[int] = None
        self.num_cpu_blocks: Optional[int] = None

    def _verify_args(self) -> None:
        if self.hbm_utilization > 1.0 or self.hbm_utilization <= 0:
            raise ValueError(
                "hbm_utilization must be in (0, 1], got "
                f"{self.hbm_utilization}.")
        if self.cache_dtype not in ("auto", "fp8", "fp8_e4m3", "fp8_e5m2",
                                    "int8", "bfloat16", "float32"):
            raise ValueError(f"Unknown kv cache dtype: {self.cache_dtype}")
        if self.block_size & (self.block_size - 1):
            raise ValueError(
                f"block_size must be a power of 2, got {self.block_size}")

    @property
    def gpu_memory_utilization(self) -> float:  # reference-compat alias
        return self.hbm_utilization


class ParallelConfig:
    """Device-mesh parallelism (reference vllm/config.py:653, re-imagined).

    The reference builds NCCL process groups; here the same sizes define a
    jax.sharding.Mesh. data = replica axis for batch sharding
    (engine-parallel continuous batching); model = tensor parallel over
    ICI; pipeline_parallel_size > 1 adds a "stage" axis running in-graph
    GPipe (parallel/pipeline.py) — one scheduler, one dispatch per step,
    no per-stage virtual engines.
    """

    def __init__(
        self,
        pipeline_parallel_size: int = 1,
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
        max_parallel_loading_workers: Optional[int] = None,
        disable_custom_all_reduce: bool = True,
        distributed_executor_backend: Optional[str] = None,
    ) -> None:
        self.pipeline_parallel_size = pipeline_parallel_size
        self.tensor_parallel_size = tensor_parallel_size
        self.data_parallel_size = data_parallel_size
        self.max_parallel_loading_workers = max_parallel_loading_workers
        self.disable_custom_all_reduce = disable_custom_all_reduce
        self.distributed_executor_backend = distributed_executor_backend
        self.world_size = (pipeline_parallel_size * tensor_parallel_size *
                           data_parallel_size)
        self._verify_args()

    def _verify_args(self) -> None:
        for n, v in (("tensor_parallel_size", self.tensor_parallel_size),
                     ("pipeline_parallel_size", self.pipeline_parallel_size),
                     ("data_parallel_size", self.data_parallel_size)):
            if v < 1:
                raise ValueError(f"{n} must be >= 1, got {v}")


class SchedulerConfig:
    """Scheduler + static-shape bucket configuration
    (reference vllm/config.py:765 plus the TPU bucket lattice that replaces
    CUDA-graph capture, reference tpu_model_runner.py:591-608)."""

    def __init__(
        self,
        max_num_batched_tokens: Optional[int] = None,
        max_num_seqs: int = 256,
        max_model_len: int = 2048,
        num_lookahead_slots: int = 0,
        delay_factor: float = 0.0,
        enable_chunked_prefill: bool = False,
        preemption_mode: Optional[str] = None,
        min_prefill_bucket: int = 16,
        min_decode_bucket: int = 8,
        num_scheduler_steps: int = 1,
        full_warmup: bool = False,
        fused_dispatch_target_ms: float = 0.0,
    ) -> None:
        if max_num_batched_tokens is None:
            if enable_chunked_prefill:
                max_num_batched_tokens = 512
            else:
                max_num_batched_tokens = max(max_model_len, 2048)
        self.max_num_batched_tokens = max_num_batched_tokens
        if not enable_chunked_prefill \
                and max_num_batched_tokens < max_model_len:
            raise ValueError(
                f"max_num_batched_tokens ({max_num_batched_tokens}) must be "
                f">= max_model_len ({max_model_len}) unless chunked prefill "
                "is enabled.")
        self.max_num_seqs = max_num_seqs
        self.max_model_len = max_model_len
        self.num_lookahead_slots = num_lookahead_slots
        self.delay_factor = delay_factor
        self.chunked_prefill_enabled = enable_chunked_prefill
        self.preemption_mode = preemption_mode
        self.min_prefill_bucket = min_prefill_bucket
        self.min_decode_bucket = min_decode_bucket
        # Compile the ENTIRE bucket lattice at startup (serving fidelity:
        # no compiles during traffic) instead of just the largest buckets.
        self.full_warmup = full_warmup
        # Multi-step decode: K decode iterations fused into one device
        # dispatch (in-graph token feedback), amortizing host latency.
        # Lookahead slots keep the block tables valid K tokens ahead.
        self.num_scheduler_steps = max(1, num_scheduler_steps)
        if self.num_scheduler_steps > 1:
            self.num_lookahead_slots = max(self.num_lookahead_slots,
                                           self.num_scheduler_steps - 1)
        # Adaptive fused-K (serving): cap each fused decode dispatch's wall
        # time so arrivals aren't stuck behind a long dispatch. When > 0,
        # the worker times each decode bucket at warmup and fuses the
        # largest power-of-2 K <= num_scheduler_steps whose dispatch fits
        # the budget; 0 keeps the fixed-K behavior. The scheduler still
        # allocates num_scheduler_steps-1 lookahead slots (a safe
        # over-reserve when the worker runs fewer steps).
        self.fused_dispatch_target_ms = fused_dispatch_target_ms

    def mixed_chunk_width(self) -> int:
        """Static prefill-lane width (tokens per scan iteration) of the
        mixed fused decode+prefill window (worker decode_multi_mixed).
        One fused-K dispatch advances a chunked prefill by up to
        K * mixed_chunk_width tokens while every decode row advances K
        steps — the chunk rides the decode batch's weight stream instead
        of stalling it (reference runs both phases in one kernel launch,
        flash_attn.py:252-367). Power of two in [64, 512] near
        max_num_batched_tokens / K so a scheduler-budget-sized chunk
        fills the window."""
        k = max(1, self.num_scheduler_steps)
        c = next_power_of_2(max(1, self.max_num_batched_tokens // k))
        return min(512, max(64, c))

    # --- static-shape bucket lattice --------------------------------------
    def prefill_buckets(self) -> List[int]:
        """Padded prefill token counts: powers of two from min bucket up to
        max_num_batched_tokens (rounded up to a power of 2)."""
        out = []
        b = self.min_prefill_bucket
        top = next_power_of_2(self.max_num_batched_tokens)
        while b < top:
            out.append(b)
            b *= 2
        out.append(top)
        return out

    def decode_buckets(self) -> List[int]:
        """Padded decode batch sizes: 8,16,32,48,... in 16-steps up to 128
        (mirroring the reference's lattice, tpu_model_runner.py:600-608),
        then 64-steps to 256, then powers of two. Coarser at the top keeps
        the warmed-executable count sane at serving batch sizes (512
        costs 12 buckets, not 33), and the dequant-GEMM tile_m=256 pads
        192 < M <= 512 to 512 anyway, so fine-grained buckets there buy
        nothing (PERF.md round-2 "bs384 pad trap")."""
        cap = self.max_num_seqs
        out = []
        b = self.min_decode_bucket
        while b < min(cap, 16):
            out.append(b)
            b *= 2
        b = 16
        while b < min(cap, 128):
            out.append(b)
            b += 16
        b = 128
        while b < min(cap, 256):
            out.append(b)
            b += 64
        b = 256
        while b < cap:
            out.append(b)
            b *= 2
        if cap <= 16:
            final = cap
        elif cap <= 128:
            final = round_up(cap, 16)
        else:
            final = round_up(cap, 64)
        out.append(final)
        return sorted(set(out))

    def host_logits_buckets(self) -> List[int]:
        """Coarse batch lattice for the host-sampled decode_logits
        executables (guided decoding, beam search, penalties minority).
        Powers of 4 keep the count tiny (cap 512 -> [8, 32, 128, 512])
        so --full-warmup can pre-compile every one and the first guided
        request in steady state never hits a serve-time XLA compile
        (advisor r4). The pad penalty is bounded 4x on the MINORITY rows
        only, and below ~bs128 the decode forward is weight-stream-bound
        (batch-invariant), so padding 9 -> 32 costs ~nothing."""
        final = self.decode_buckets()[-1]
        out = []
        b = max(self.min_decode_bucket, 8)
        while b < final:
            out.append(b)
            b *= 4
        out.append(final)
        return sorted(set(out))

    def pad_host_batch(self, n: int) -> int:
        for b in self.host_logits_buckets():
            if n <= b:
                return b
        return self.host_logits_buckets()[-1]

    def pad_prefill_len(self, n: int) -> int:
        for b in self.prefill_buckets():
            if n <= b:
                return b
        return self.prefill_buckets()[-1]

    def pad_decode_batch(self, n: int) -> int:
        for b in self.decode_buckets():
            if n <= b:
                return b
        return self.decode_buckets()[-1]

    def pad_table_width(self, n: int, max_width: int) -> int:
        """Bucketed block-table width (pow2 >= 4, capped at the model-max).
        Attention reads the KV cache through the table, so a narrow table
        bounds per-step KV traffic by the batch's ACTUAL max context instead
        of max_model_len — the static-shape analogue of the reference's
        dynamic seq_lens."""
        b = 4
        while b < n:
            b *= 2
        return min(b, max_width)


class DeviceConfig:
    """Target platform (reference vllm/config.py:855)."""

    def __init__(self, device: str = "auto") -> None:
        if device == "auto":
            import jax
            platform = jax.default_backend()
            device = "tpu" if platform in ("tpu", "axon") else platform
        self.device_type = device
        self.device = device


class LoadConfig:
    """Weight-loading configuration (reference vllm/config.py:604)."""

    SUPPORTED_FORMATS = ("auto", "safetensors", "pt", "dummy",
                         "sharded_state", "nmv", "npz")

    def __init__(self,
                 load_format: str = "auto",
                 download_dir: Optional[str] = None,
                 model_loader_extra_config: Optional[Dict[str, Any]] = None):
        self.load_format = load_format
        self.download_dir = download_dir
        self.model_loader_extra_config = model_loader_extra_config or {}
        if load_format not in self.SUPPORTED_FORMATS:
            raise ValueError(f"Unknown load format: {load_format}. "
                             f"Supported: {self.SUPPORTED_FORMATS}")


@dataclass
class LoRAConfig:
    """LoRA serving configuration (reference vllm/config.py:1266)."""
    max_lora_rank: int = 16
    max_loras: int = 1
    fully_sharded_loras: bool = False
    max_cpu_loras: Optional[int] = None
    lora_dtype: Optional[str] = None
    lora_extra_vocab_size: int = 256
    long_lora_scaling_factors: Optional[List[float]] = None

    def __post_init__(self):
        possible_ranks = (8, 16, 32, 64, 128, 256)
        if self.max_lora_rank not in possible_ranks:
            raise ValueError(f"max_lora_rank ({self.max_lora_rank}) must be "
                             f"one of {possible_ranks}.")
        if self.max_loras < 1:
            raise ValueError(f"max_loras ({self.max_loras}) must be >= 1.")
        if self.max_cpu_loras is None:
            self.max_cpu_loras = self.max_loras
        elif self.max_cpu_loras < self.max_loras:
            raise ValueError(
                f"max_cpu_loras ({self.max_cpu_loras}) must be >= "
                f"max_loras ({self.max_loras})")


@dataclass
class SpeculativeConfig:
    """Speculative decoding configuration (reference vllm/config.py:888).

    Round-1 supports the ngram (prompt-lookup) proposer; draft-model
    speculation lands with the spec_decode worker.
    """
    num_speculative_tokens: int = 0
    speculative_model: Optional[str] = None
    ngram_prompt_lookup_max: int = 0
    ngram_prompt_lookup_min: int = 0
    speculative_disable_by_batch_size: Optional[int] = None
    # "rejection_sampler" (lossless) | "typical_acceptance_sampler"
    draft_token_acceptance_method: str = "rejection_sampler"
    # run the draft replicated (TP1) while the target stays TP-sharded —
    # the reference's SmallerTpProposerWorker
    # (vllm/spec_decode/smaller_tp_proposer_worker.py). None = target TP;
    # 1 is the only reduced value supported.
    speculative_draft_tensor_parallel_size: Optional[int] = None

    @property
    def enabled(self) -> bool:
        return self.num_speculative_tokens > 0


@dataclass
class DecodingConfig:
    """Guided decoding backend selection (reference vllm/config.py:1511)."""
    guided_decoding_backend: str = "builtin"

    def __post_init__(self):
        if self.guided_decoding_backend not in ("builtin", "outlines",
                                                "lm-format-enforcer"):
            raise ValueError(
                f"Unknown guided decoding backend: "
                f"{self.guided_decoding_backend}")


@dataclass
class ObservabilityConfig:
    """Tracing config (reference vllm/config.py:1526)."""
    otlp_traces_endpoint: Optional[str] = None


@dataclass
class MultiModalConfig:
    """Placeholder for vision-model inputs (reference vllm/config.py:1321)."""
    image_input_type: Optional[str] = None


@dataclass
class EngineConfig:
    """Bundle of all configs (reference vllm/config.py:1537)."""
    model_config: ModelConfig
    cache_config: CacheConfig
    parallel_config: ParallelConfig
    scheduler_config: SchedulerConfig
    device_config: DeviceConfig
    load_config: LoadConfig
    lora_config: Optional[LoRAConfig] = None
    speculative_config: Optional[SpeculativeConfig] = None
    decoding_config: Optional[DecodingConfig] = None
    observability_config: Optional[ObservabilityConfig] = None
    multimodal_config: Optional[MultiModalConfig] = None

    def __post_init__(self):
        if self.decoding_config is None:
            self.decoding_config = DecodingConfig()
        if self.observability_config is None:
            self.observability_config = ObservabilityConfig()

    def to_dict(self):
        return dict(self.__dict__)
