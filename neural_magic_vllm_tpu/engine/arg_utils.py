"""EngineArgs: the user-facing flag surface
(reference vllm/engine/arg_utils.py, ~70 flags -> 13 configs)."""
import argparse
import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Union

from neural_magic_vllm_tpu import envs
from neural_magic_vllm_tpu.config import (CacheConfig, DecodingConfig,
                                          DeviceConfig, EngineConfig,
                                          LoadConfig, LoRAConfig,
                                          ModelConfig, ObservabilityConfig,
                                          ParallelConfig, SchedulerConfig,
                                          SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str = "facebook/opt-125m"
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    skip_tokenizer_init: bool = False
    trust_remote_code: bool = False
    download_dir: Optional[str] = None
    load_format: str = "auto"
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    quantization_param_path: Optional[str] = None
    seed: int = 0
    max_model_len: Optional[int] = None
    # parallelism
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    distributed_executor_backend: Optional[str] = None
    # KV cache
    block_size: int = 16
    enable_prefix_caching: bool = False
    # GiB; NMV_TPU_SWAP_SPACE_GB provides the DEFAULT only — an explicit
    # --swap-space (or constructor value) wins (review r5 finding #8)
    swap_space: Optional[float] = None
    gpu_memory_utilization: float = 0.90  # reference-compat name
    hbm_utilization: Optional[float] = None
    num_gpu_blocks_override: Optional[int] = None
    # scheduler
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_logprobs: int = 20
    enable_chunked_prefill: bool = False
    num_lookahead_slots: int = 0
    num_scheduler_steps: int = 1
    scheduler_delay_factor: float = 0.0
    preemption_mode: Optional[str] = None
    # prompt tokenization offload threads for the async engine (reference
    # --tokenizer-pool-size, Ray actors there; threads here since HF fast
    # tokenizers release the GIL). 0 = tokenize inline.
    tokenizer_pool_size: int = 0
    full_warmup: bool = False
    fused_dispatch_target_ms: float = 0.0
    # model
    revision: Optional[str] = None
    tokenizer_revision: Optional[str] = None
    quantization: Optional[str] = None
    sparsity: Optional[str] = None
    rope_scaling: Optional[Dict[str, Any]] = None
    rope_theta: Optional[float] = None
    enforce_eager: bool = False
    disable_custom_all_reduce: bool = True
    # LoRA
    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    fully_sharded_loras: bool = False
    lora_extra_vocab_size: int = 256
    long_lora_scaling_factors: Optional[List[float]] = None
    max_cpu_loras: Optional[int] = None
    # speculative decoding
    speculative_model: Optional[str] = None
    num_speculative_tokens: Optional[int] = None
    ngram_prompt_lookup_max: Optional[int] = None
    ngram_prompt_lookup_min: Optional[int] = None
    speculative_disable_by_batch_size: Optional[int] = None
    spec_decoding_acceptance_method: str = "rejection_sampler"
    speculative_draft_tensor_parallel_size: Optional[int] = None
    # misc
    device: str = "auto"
    served_model_name: Optional[Union[str, List[str]]] = None
    guided_decoding_backend: str = "builtin"
    otlp_traces_endpoint: Optional[str] = None
    disable_log_stats: bool = False

    # per-flag help (reference arg_utils.py help strings); flags not
    # listed get a generated stub
    _HELP = {
        "model": "HF model directory (or name) to serve.",
        "tokenizer": "tokenizer path; defaults to --model.",
        "load_format": "weight source: auto|safetensors|pt|dummy|nmv|"
                       "bitsandbytes.",
        "dtype": "model dtype: auto|bfloat16|float16|float32.",
        "kv_cache_dtype": "KV cache dtype: auto|fp8|fp8_e4m3|fp8_e5m2.",
        "quantization_param_path": "JSON with per-layer KV scales.",
        "max_model_len": "max sequence length (prompt+generation).",
        "pipeline_parallel_size": "GPipe stages over the 'stage' mesh axis.",
        "tensor_parallel_size": "TP degree over the 'model' mesh axis.",
        "data_parallel_size": "replica axis for batch sharding.",
        "block_size": "paged-KV block size in tokens.",
        "enable_prefix_caching": "hash-based prefix cache reuse.",
        "swap_space": "GiB of host KV swap space per chip.",
        "tokenizer_pool_size": "Thread count for async prompt "
        "tokenization offload (0 = inline).",
        "gpu_memory_utilization": "fraction of HBM usable (0, 1].",
        "num_gpu_blocks_override": "skip profiling; force KV block count.",
        "max_num_batched_tokens": "per-step token budget.",
        "max_num_seqs": "per-step sequence cap (decode batch ceiling).",
        "enable_chunked_prefill": "split long prompts across steps.",
        "num_scheduler_steps": "fused decode steps per dispatch.",
        "fused_dispatch_target_ms": "adaptive fused-K: cap each fused "
                                    "decode dispatch's wall time; K per "
                                    "bucket is measured at warmup "
                                    "(0 = fixed K).",
        "preemption_mode": "recompute|swap (default: auto).",
        "quantization": "weight quantization method (auto-detected from "
                        "the checkpoint when omitted).",
        "enforce_eager": "skip AOT bucket warmup (debug/testing only).",
        "full_warmup": "pre-compile the ENTIRE bucket lattice at startup "
                       "(no compiles during traffic; slower start).",
        "speculative_model": "draft model for speculative decoding.",
        "num_speculative_tokens": "proposal length k.",
        "speculative_draft_tensor_parallel_size":
        "draft model TP; 1 runs the draft replicated while the target "
        "stays TP-sharded (reference SmallerTpProposerWorker).",
        "guided_decoding_backend": "constrained-decoding backend.",
        "otlp_traces_endpoint": "OTLP gRPC endpoint for request traces.",
    }
    _CHOICES = {
        "tokenizer_mode": ("auto", "slow"),
        "dtype": ("auto", "half", "float16", "bfloat16", "float", "float32"),
        "kv_cache_dtype": ("auto", "fp8", "fp8_e4m3", "fp8_e5m2"),
        "load_format": ("auto", "safetensors", "pt", "dummy", "npcache",
                        "nmv", "sharded_state", "bitsandbytes"),
        "preemption_mode": ("recompute", "swap"),
        "spec_decoding_acceptance_method": ("rejection_sampler",
                                            "typical_acceptance_sampler"),
    }

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            help_text = cls._HELP.get(
                f.name, f.name.replace("_", " ") + ".")
            # Field types may be classes (int) or strings ("Optional[int]")
            # depending on annotation evaluation; normalize to a name.
            t = f.type
            if isinstance(t, str):
                tname = t
            elif isinstance(t, type):
                tname = t.__name__
            else:  # typing constructs: str() keeps the [arg]
                tname = str(t)
            tname = tname.replace("typing.", "").replace(
                "Optional[", "").rstrip("]")
            if tname == "bool":
                parser.add_argument(name, action="store_true",
                                    default=f.default, help=help_text)
            else:
                tp = {"int": int, "float": float, "str": str}.get(tname, str)
                parser.add_argument(name, type=tp, default=f.default,
                                    choices=cls._CHOICES.get(f.name),
                                    help=help_text)
        return parser

    def _verify(self) -> None:
        """Reject hostile values before they reach the configs
        (reference: per-flag checks in vllm/engine/arg_utils.py)."""
        def positive(name):
            v = getattr(self, name)
            if v is not None and v <= 0:
                raise ValueError(f"{name} must be positive, got {v}")

        def non_negative(name):
            v = getattr(self, name)
            if v is not None and v < 0:
                raise ValueError(f"{name} must be >= 0, got {v}")

        for n in ("max_model_len", "max_num_seqs", "block_size",
                  "num_scheduler_steps", "max_num_batched_tokens",
                  "tensor_parallel_size", "pipeline_parallel_size",
                  "data_parallel_size", "max_loras", "max_lora_rank",
                  "num_gpu_blocks_override"):
            positive(n)
        for n in ("swap_space", "scheduler_delay_factor",
                  "num_lookahead_slots", "max_logprobs",
                  "lora_extra_vocab_size"):
            non_negative(n)
        if self.block_size not in (8, 16, 32, 64, 128):
            raise ValueError(
                f"block_size must be one of 8/16/32/64/128, got "
                f"{self.block_size}")
        util = self.hbm_utilization if self.hbm_utilization is not None \
            else self.gpu_memory_utilization
        if not 0.0 < util <= 1.0:
            raise ValueError(
                f"gpu_memory_utilization must be in (0, 1], got {util}")
        if self.preemption_mode not in (None, "recompute", "swap"):
            raise ValueError(
                f"preemption_mode must be recompute|swap, got "
                f"{self.preemption_mode!r}")
        if self.kv_cache_dtype not in self._CHOICES["kv_cache_dtype"]:
            raise ValueError(
                f"unknown kv_cache_dtype {self.kv_cache_dtype!r}")

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        return cls(**{a: getattr(args, a) for a in attrs if hasattr(args, a)})

    def create_engine_config(self) -> EngineConfig:
        self._verify()
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code,
            dtype=self.dtype,
            seed=self.seed,
            revision=self.revision,
            tokenizer_revision=self.tokenizer_revision,
            max_model_len=self.max_model_len,
            quantization=self.quantization,
            quantization_param_path=self.quantization_param_path,
            sparsity=self.sparsity,
            enforce_eager=self.enforce_eager,
            max_logprobs=self.max_logprobs,
            skip_tokenizer_init=self.skip_tokenizer_init,
            served_model_name=self.served_model_name,
            rope_scaling=self.rope_scaling,
            rope_theta=self.rope_theta,
        )
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=(self.hbm_utilization
                             or self.gpu_memory_utilization),
            swap_space=(self.swap_space if self.swap_space is not None
                        else (envs.NMV_TPU_SWAP_SPACE_GB
                              if envs.NMV_TPU_SWAP_SPACE_GB is not None
                              else 4.0)),
            cache_dtype=self.kv_cache_dtype,
            num_gpu_blocks_override=self.num_gpu_blocks_override,
            sliding_window=model_config.get_sliding_window(),
            enable_prefix_caching=self.enable_prefix_caching,
        )
        parallel_config = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            disable_custom_all_reduce=self.disable_custom_all_reduce,
            distributed_executor_backend=self.distributed_executor_backend,
        )
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            num_lookahead_slots=(self.num_speculative_tokens
                                 or self.num_lookahead_slots),
            num_scheduler_steps=self.num_scheduler_steps,
            delay_factor=self.scheduler_delay_factor,
            enable_chunked_prefill=self.enable_chunked_prefill,
            preemption_mode=self.preemption_mode,
            full_warmup=self.full_warmup,
            fused_dispatch_target_ms=self.fused_dispatch_target_ms,
        )
        device_config = DeviceConfig(device=self.device)
        load_config = LoadConfig(load_format=self.load_format,
                                 download_dir=self.download_dir)
        lora_config = LoRAConfig(
            max_lora_rank=self.max_lora_rank,
            max_loras=self.max_loras,
            fully_sharded_loras=self.fully_sharded_loras,
            lora_extra_vocab_size=self.lora_extra_vocab_size,
            long_lora_scaling_factors=self.long_lora_scaling_factors,
            max_cpu_loras=self.max_cpu_loras,
        ) if self.enable_lora else None
        speculative_config = None
        if self.num_speculative_tokens:
            speculative_config = SpeculativeConfig(
                num_speculative_tokens=self.num_speculative_tokens,
                speculative_model=self.speculative_model,
                ngram_prompt_lookup_max=self.ngram_prompt_lookup_max or 0,
                ngram_prompt_lookup_min=self.ngram_prompt_lookup_min or 0,
                speculative_disable_by_batch_size=(
                    self.speculative_disable_by_batch_size),
                draft_token_acceptance_method=(
                    self.spec_decoding_acceptance_method),
                speculative_draft_tensor_parallel_size=(
                    self.speculative_draft_tensor_parallel_size))
        decoding_config = DecodingConfig(
            guided_decoding_backend=self.guided_decoding_backend)
        observability_config = ObservabilityConfig(
            otlp_traces_endpoint=self.otlp_traces_endpoint)
        return EngineConfig(model_config=model_config,
                            cache_config=cache_config,
                            parallel_config=parallel_config,
                            scheduler_config=scheduler_config,
                            device_config=device_config,
                            load_config=load_config,
                            lora_config=lora_config,
                            speculative_config=speculative_config,
                            decoding_config=decoding_config,
                            observability_config=observability_config)


@dataclass
class AsyncEngineArgs(EngineArgs):
    engine_use_ray: bool = False
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None
