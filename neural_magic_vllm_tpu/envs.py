"""Environment flags (analogue of reference vllm/envs.py).

All flags are lazily resolved at attribute access so tests can monkeypatch
os.environ. Names use the NMV_TPU_ prefix.
"""
import os
from typing import Any, Callable, Dict


def _env_bool(name: str, default: str = "0") -> bool:
    """Tolerant boolean env parsing: accepts 1/0, true/false, yes/no,
    on/off (any case); empty string means unset (use default)."""
    raw = os.getenv(name)
    if raw is None or raw.strip() == "":
        raw = default
    return raw.strip().lower() in ("1", "true", "yes", "on")


environment_variables: Dict[str, Callable[[], Any]] = {
    # Logging
    "NMV_TPU_CONFIGURE_LOGGING":
    lambda: int(os.getenv("NMV_TPU_CONFIGURE_LOGGING", "1")),
    "NMV_TPU_LOGGING_LEVEL":
    lambda: os.getenv("NMV_TPU_LOGGING_LEVEL", "INFO"),
    # Attention backend override: "pallas" | "jnp" | None (auto)
    "NMV_TPU_ATTENTION_BACKEND":
    lambda: os.getenv("NMV_TPU_ATTENTION_BACKEND", None),
    # Quantized-GEMM backend override: "pallas" | "ref" | None (auto)
    "NMV_TPU_QUANT_BACKEND":
    lambda: os.getenv("NMV_TPU_QUANT_BACKEND", None),
    # XLA persistent compilation cache directory.
    "NMV_TPU_XLA_CACHE_PATH":
    lambda: os.getenv("NMV_TPU_XLA_CACHE_PATH",
                      os.path.expanduser("~/.cache/nmv_tpu/xla_cache")),
    # Engine iteration watchdog (seconds) for the async engine. Generous
    # default: a first-hit XLA bucket compile on TPU can take minutes
    # (unlike the reference's 60s CUDA default, async_llm_engine.py:588).
    "NMV_TPU_ENGINE_ITERATION_TIMEOUT_S":
    lambda: int(os.getenv("NMV_TPU_ENGINE_ITERATION_TIMEOUT_S", "300")),
    # Test hook: artificial preemption (reference scheduler.py:21-24).
    "NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT":
    lambda: _env_bool("NMV_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT", "0"),
    # Force on-host sampling fallback (debugging).
    "NMV_TPU_FORCE_HOST_SAMPLING":
    lambda: _env_bool("NMV_TPU_FORCE_HOST_SAMPLING", "0"),
    # Usage-stat opt-out (reference: VLLM_NO_USAGE_STATS). No-op placeholder.
    "NMV_TPU_NO_USAGE_STATS":
    lambda: _env_bool("NMV_TPU_NO_USAGE_STATS", "1"),
    # Hang debugging: trace every package-local function call to a temp
    # log (reference VLLM_TRACE_FUNCTION, envs.py:199). Very slow.
    "NMV_TPU_TRACE_FUNCTION":
    lambda: _env_bool("NMV_TPU_TRACE_FUNCTION", "0"),
    # MoE expert-GEMM backend: "auto" (grouped Pallas dequant-GEMM for
    # packed experts, ragged_dot for dense), "ragged" (force
    # dequant+ragged_dot) or "dense" (force dense-dispatch einsum).
    "NMV_TPU_MOE_BACKEND":
    lambda: os.getenv("NMV_TPU_MOE_BACKEND", "auto"),
    # Multi-LoRA apply: "" auto (grouped ragged_dot when slots > 8),
    # "1" force grouped, "0" force all-slots einsum.
    "NMV_TPU_LORA_GROUPED":
    lambda: os.getenv("NMV_TPU_LORA_GROUPED", ""),
    # A/B switch (benchmarking): disable the mixed fused-K + host-K decode
    # split, reverting to whole-batch single-step host-sampled decode
    # whenever any request needs host sampling (the pre-round-4 behavior).
    "NMV_TPU_DISABLE_MIXED_FUSED":
    lambda: _env_bool("NMV_TPU_DISABLE_MIXED_FUSED", "0"),
    # Batch-size ceiling for the multi-sequence-per-program decode
    # attention variant (small-batch/long-context regime).
    "NMV_TPU_DECODE_MULTISEQ_MAX_BATCH":
    lambda: int(os.getenv("NMV_TPU_DECODE_MULTISEQ_MAX_BATCH", "16")),
    # MoE token chunking (reference: VLLM_FUSED_MOE_CHUNK_SIZE).
    "NMV_TPU_FUSED_MOE_CHUNK_SIZE":
    lambda: int(os.getenv("NMV_TPU_FUSED_MOE_CHUNK_SIZE", "32768")),

    # opt-in W4A8: quantize activations per-row to int8 inside the fused
    # dequant-GEMM and contract in native int8 on the MXU (2x bf16 rate
    # on real TPUs). Changes numerics vs W4A16; off by default.
    "NMV_TPU_W4A8":
    lambda: _env_bool("NMV_TPU_W4A8", "0"),

    # Write each step executable's optimized HLO (op_name metadata
    # intact) to this directory on first use — the attribution source
    # for tools/profile_table.py (the axon tunnel scrubs --xla_dump_to).
    "NMV_TPU_DUMP_HLO":
    lambda: os.getenv("NMV_TPU_DUMP_HLO", ""),
    # Per-engine-step JSONL trace path (serving decomposition; empty = off)
    "NMV_TPU_STEP_TRACE":
    lambda: os.getenv("NMV_TPU_STEP_TRACE", ""),

    # OpenAI-server API key fallback (reference VLLM_API_KEY, envs.py:161;
    # the --api-key CLI flag wins when both are set).
    "NMV_TPU_API_KEY":
    lambda: os.getenv("NMV_TPU_API_KEY", None),
    # Full logging.config dictConfig JSON path (reference
    # VLLM_LOGGING_CONFIG_PATH, envs.py:189); see logger.py.
    "NMV_TPU_LOGGING_CONFIG_PATH":
    lambda: os.getenv("NMV_TPU_LOGGING_CONFIG_PATH", None),
    # Opt-out alias honored alongside NMV_TPU_NO_USAGE_STATS (reference
    # VLLM_DO_NOT_TRACK / DO_NOT_TRACK, envs.py:178).
    "NMV_TPU_DO_NOT_TRACK":
    lambda: _env_bool("NMV_TPU_DO_NOT_TRACK",
                      os.getenv("DO_NOT_TRACK", "0")),
    # Host KV swap-space override in GiB (reference VLLM_CPU_KVCACHE_SPACE
    # role, envs.py:213): when set, overrides the --swap-space default.
    "NMV_TPU_SWAP_SPACE_GB":
    lambda: (float(os.environ["NMV_TPU_SWAP_SPACE_GB"])
             if "NMV_TPU_SWAP_SPACE_GB" in os.environ else None),

    # Mixed fused decode+prefill window: with chunked prefill + multi-step
    # decode, run one prompt's chunk INSIDE the fused-K decode dispatch
    # (one scan iteration per mixed_chunk_width tokens) so decodes never
    # stall behind prefill dispatches. "0" reverts to separate prefill
    # dispatches (the pre-round-5 behavior).
    "NMV_TPU_MIXED_PREFILL_WINDOW":
    lambda: _env_bool("NMV_TPU_MIXED_PREFILL_WINDOW", "1"),
    # Minimum PADDED decode batch for the fused K-window to carry prefill
    # lanes (below it, a prefill-heavy step takes the piggyback dispatch
    # or the dedicated prefill path — measured crossover, PERF.md r5).
    "NMV_TPU_MIXED_WINDOW_MIN_DECODE":
    lambda: int(os.getenv("NMV_TPU_MIXED_WINDOW_MIN_DECODE", "64")),

    # On-device guided decoding: compile regex/JSON-schema DFAs to
    # device bitmask/rank tables so guided rows ride the fused-K decode
    # dispatch (guided_decoding/device_fsm.py). "0" forces the host
    # logits-processor path for every guided row.
    "NMV_TPU_GUIDED_DEVICE":
    lambda: _env_bool("NMV_TPU_GUIDED_DEVICE", "1"),
    # Device-table budgets: max resident DFA states / transitions.
    # 1024 states x ceil(V/8) bytes ~= 16 MiB of HBM at a 128k vocab;
    # 2^23 transitions = 32 MiB. FSMs exceeding either fall to host.
    "NMV_TPU_GUIDED_DEVICE_STATES":
    lambda: int(os.getenv("NMV_TPU_GUIDED_DEVICE_STATES", "1024")),
    "NMV_TPU_GUIDED_DEVICE_NNZ":
    lambda: int(os.getenv("NMV_TPU_GUIDED_DEVICE_NNZ", str(1 << 23))),
    # Wall-clock budget for materializing one DFA (vectorized build;
    # typical guided_choice/JSON-schema patterns take well under 10 s).
    "NMV_TPU_GUIDED_BUILD_BUDGET_S":
    lambda: float(os.getenv("NMV_TPU_GUIDED_BUILD_BUDGET_S", "60")),
}


def __getattr__(name: str):
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables.keys())
