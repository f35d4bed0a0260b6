"""LLMEngine: the synchronous serving engine
(reference vllm/engine/llm_engine.py:66).

Owns the tokenizer, scheduler, executor, detokenizer, output processor and
stats; step() drives one iteration of continuous batching.
"""
import time
from typing import Dict, Iterable, List, Optional, Union

from neural_magic_vllm_tpu.config import EngineConfig
from neural_magic_vllm_tpu.core.scheduler import Scheduler, SchedulerOutputs
from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs
from neural_magic_vllm_tpu.engine.metrics import StatLogger, Stats
from neural_magic_vllm_tpu.engine.output_processor import \
    SingleStepOutputProcessor
from neural_magic_vllm_tpu.engine.stop_checker import StopChecker
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.outputs import (EmbeddingOutput,
                                           EmbeddingRequestOutput,
                                           RequestOutput)
from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.sequence import (EmbeddingSequenceGroupOutput,
                                            ExecuteModelRequest, Sequence,
                                            SequenceGroup, SequenceStatus)
from neural_magic_vllm_tpu.transformers_utils.detokenizer import Detokenizer
from neural_magic_vllm_tpu.transformers_utils.tokenizer import get_tokenizer
from neural_magic_vllm_tpu.utils import Counter
from neural_magic_vllm_tpu.version import __version__

logger = init_logger(__name__)


class LLMEngine:

    def __init__(self, engine_config: EngineConfig, executor_class=None,
                 log_stats: bool = True) -> None:
        from neural_magic_vllm_tpu.utils import \
            maybe_enable_trace_function_call
        trace_log = maybe_enable_trace_function_call()
        if trace_log:
            logger.info("Function-call tracing -> %s", trace_log)
        cfg = engine_config
        self.model_config = cfg.model_config
        self.cache_config = cfg.cache_config
        self.parallel_config = cfg.parallel_config
        self.scheduler_config = cfg.scheduler_config
        self.device_config = cfg.device_config
        self.load_config = cfg.load_config
        self.lora_config = cfg.lora_config
        self.speculative_config = cfg.speculative_config
        self.decoding_config = cfg.decoding_config
        self.observability_config = cfg.observability_config
        self.log_stats = log_stats

        logger.info(
            "Initializing engine v%s: model=%r dtype=%s max_model_len=%d "
            "tp=%d block_size=%d prefix_caching=%s chunked_prefill=%s",
            __version__, self.model_config.model, self.model_config.dtype,
            self.model_config.max_model_len,
            self.parallel_config.tensor_parallel_size,
            self.cache_config.block_size,
            self.cache_config.enable_prefix_caching,
            self.scheduler_config.chunked_prefill_enabled)

        self.seq_counter = Counter()
        if not self.model_config.skip_tokenizer_init:
            self.tokenizer = get_tokenizer(
                self.model_config.tokenizer,
                tokenizer_mode=self.model_config.tokenizer_mode,
                trust_remote_code=self.model_config.trust_remote_code,
                revision=self.model_config.tokenizer_revision)
            self.detokenizer = Detokenizer(self.tokenizer)
        else:
            self.tokenizer = None
            self.detokenizer = None

        if executor_class is None:
            from neural_magic_vllm_tpu.executor.tpu_executor import \
                TPUExecutor
            executor_class = TPUExecutor
        self.model_executor = executor_class(
            model_config=self.model_config,
            cache_config=self.cache_config,
            parallel_config=self.parallel_config,
            scheduler_config=self.scheduler_config,
            device_config=self.device_config,
            load_config=self.load_config,
            lora_config=self.lora_config,
            speculative_config=self.speculative_config,
        )
        self._initialize_kv_caches()

        self.scheduler = Scheduler(self.scheduler_config, self.cache_config,
                                   self.lora_config)
        self.stop_checker = StopChecker(self.model_config.max_model_len)
        self.output_processor = SingleStepOutputProcessor(
            self.scheduler, self.detokenizer, self.stop_checker,
            self.seq_counter)
        self.stat_logger = StatLogger(
            model_name=self.model_config.served_model_name,
            max_model_len=self.model_config.max_model_len) \
            if log_stats else None
        self.tracer = None
        if self.observability_config and \
                self.observability_config.otlp_traces_endpoint:
            from neural_magic_vllm_tpu.tracing import init_tracer
            self.tracer = init_tracer(
                "nmv_tpu.llm_engine",
                self.observability_config.otlp_traces_endpoint)
        # Per-step JSONL trace for serving-regime decomposition
        # (NMV_TPU_STEP_TRACE=<path>); line-buffered so a killed server
        # still leaves a readable trace.
        from neural_magic_vllm_tpu import envs
        self._step_trace = None
        if envs.NMV_TPU_STEP_TRACE:
            self._step_trace = open(envs.NMV_TPU_STEP_TRACE, "a",
                                    buffering=1)

    def _initialize_kv_caches(self) -> None:
        num_gpu_blocks, num_cpu_blocks = (
            self.model_executor.determine_num_available_blocks())
        if self.cache_config.num_gpu_blocks_override is not None:
            num_gpu_blocks = self.cache_config.num_gpu_blocks_override
        self.cache_config.num_gpu_blocks = num_gpu_blocks
        self.cache_config.num_cpu_blocks = num_cpu_blocks
        self.model_executor.initialize_cache(num_gpu_blocks, num_cpu_blocks)

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs,
                         executor_class=None) -> "LLMEngine":
        engine_config = engine_args.create_engine_config()
        return cls(engine_config, executor_class=executor_class,
                   log_stats=not engine_args.disable_log_stats)

    # --- request intake ----------------------------------------------------------
    def _get_eos_token_id(self) -> Optional[int]:
        if self.tokenizer is None:
            return None
        return self.tokenizer.eos_token_id

    def encode_request(self, prompt: Optional[str],
                       prompt_token_ids: Optional[List[int]],
                       truncate_prompt_tokens: Optional[int] = None
                       ) -> List[int]:
        if prompt_token_ids is None:
            assert prompt is not None and self.tokenizer is not None
            prompt_token_ids = self.tokenizer.encode(prompt)
        if truncate_prompt_tokens is not None:
            prompt_token_ids = prompt_token_ids[-truncate_prompt_tokens:]
        return prompt_token_ids

    def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
        trace_headers: Optional[Dict[str, str]] = None,
        pooling_params=None,
        multi_modal_data=None,
    ) -> None:
        if pooling_params is not None:
            sampling_params = None
        elif sampling_params is None:
            sampling_params = SamplingParams()
        if arrival_time is None:
            arrival_time = time.time()
        prompt_token_ids = self.encode_request(
            prompt, prompt_token_ids,
            sampling_params.truncate_prompt_tokens
            if sampling_params else None)
        if multi_modal_data is not None:
            # Map raw images to model tensors and expand each prompt
            # placeholder into a patch-token run (reference
            # MultiModalRegistry + input processor, multimodal/registry.py).
            from neural_magic_vllm_tpu.multimodal import MULTIMODAL_REGISTRY
            hf_config = self.model_config.hf_config
            if not MULTIMODAL_REGISTRY.supports(hf_config):
                raise ValueError(
                    f"Model {self.model_config.model!r} does not accept "
                    "multi_modal_data.")
            multi_modal_data = MULTIMODAL_REGISTRY.map_input(
                hf_config, multi_modal_data)
            prompt_token_ids = MULTIMODAL_REGISTRY.expand_placeholders(
                hf_config, prompt_token_ids, multi_modal_data)
        if len(prompt_token_ids) >= self.model_config.max_model_len:
            raise ValueError(
                f"Prompt length ({len(prompt_token_ids)}) is at or over the "
                f"model's max length ({self.model_config.max_model_len}).")

        if sampling_params is not None and \
                sampling_params.logprobs is not None and \
                sampling_params.logprobs > self.model_config.max_logprobs:
            raise ValueError(
                f"logprobs={sampling_params.logprobs} > max_logprobs="
                f"{self.model_config.max_logprobs}")

        if sampling_params is not None and self.model_config.is_stateful \
                and (sampling_params.best_of > 1
                     or sampling_params.use_beam_search):
            raise ValueError(
                "Parallel sampling (best_of/n > 1) and beam search are "
                "unsupported for stateful (mamba) models: per-sequence "
                "recurrent state cannot be forked.")

        if sampling_params is not None:
            sampling_params = sampling_params.clone()
        eos = self._get_eos_token_id()
        if self.tokenizer is not None and hasattr(
                self.tokenizer, "eos_token_id"):
            pass
        mm_hash = 0
        if multi_modal_data is not None:
            import hashlib
            mm_hash = int.from_bytes(
                hashlib.sha256(
                    multi_modal_data["pixel_values"].tobytes()).digest()[:8],
                "little")
        seq = Sequence(seq_id=next(self.seq_counter),
                       prompt=prompt,
                       prompt_token_ids=prompt_token_ids,
                       block_size=self.cache_config.block_size,
                       eos_token_id=eos,
                       lora_request=lora_request,
                       mm_hash=mm_hash)
        seq_group = SequenceGroup(request_id=request_id,
                                  seqs=[seq],
                                  sampling_params=sampling_params,
                                  arrival_time=arrival_time,
                                  lora_request=lora_request,
                                  trace_headers=trace_headers,
                                  pooling_params=pooling_params,
                                  multi_modal_data=multi_modal_data)
        self.scheduler.add_seq_group(seq_group)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_seq_group(request_id)

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    # --- stepping -----------------------------------------------------------------
    def step(self) -> List[RequestOutput]:
        t0 = time.perf_counter() if self._step_trace else 0.0
        seq_group_metadata_list, scheduler_outputs = \
            self.scheduler.schedule()
        t1 = time.perf_counter() if self._step_trace else 0.0

        if not scheduler_outputs.is_empty():
            fin_req, fin_seq = self.scheduler.get_and_reset_finished_ids()
            execute_model_req = ExecuteModelRequest(
                seq_group_metadata_list=seq_group_metadata_list,
                blocks_to_swap_in=scheduler_outputs.blocks_to_swap_in,
                blocks_to_swap_out=scheduler_outputs.blocks_to_swap_out,
                blocks_to_copy=scheduler_outputs.blocks_to_copy,
                num_lookahead_slots=scheduler_outputs.num_lookahead_slots,
                running_queue_size=scheduler_outputs.running_queue_size,
                finished_request_ids=fin_req,
                finished_seq_ids=fin_seq,
                num_waiting=len(self.scheduler.waiting),
            )
            outputs = self.model_executor.execute_model(execute_model_req)
        else:
            outputs = []

        t2 = time.perf_counter() if self._step_trace else 0.0
        result = self._process_model_outputs(outputs, scheduler_outputs)
        if self._step_trace:
            self._trace_step(t0, t1, t2, time.perf_counter(),
                             seq_group_metadata_list, scheduler_outputs,
                             len(outputs))
        return result

    def _trace_step(self, t0, t1, t2, t3, sgm_list, scheduler_outputs,
                    n_fused) -> None:
        """One JSON line per engine step (NMV_TPU_STEP_TRACE=<path>):
        the decomposition tool for serving-regime analysis. sched/dispatch/
        outproc are host seconds; dispatch includes device time because the
        executor blocks on results."""
        import json
        npg = scheduler_outputs.num_prefill_groups
        n_prefill_tokens = sum(
            s.token_chunk_size
            for s in scheduler_outputs.scheduled_seq_groups[:npg])
        rec = {
            "t": round(t0, 4),
            "sched_ms": round((t1 - t0) * 1e3, 2),
            "dispatch_ms": round((t2 - t1) * 1e3, 2),
            "outproc_ms": round((t3 - t2) * 1e3, 2),
            "n_prefill": npg,
            "prefill_tokens": n_prefill_tokens,
            "n_decode": len(scheduler_outputs.scheduled_seq_groups) - npg,
            "fused_steps": n_fused,
            "waiting": len(self.scheduler.waiting),
            "running": len(self.scheduler.running),
            "preempted": scheduler_outputs.preempted,
        }
        self._step_trace.write(json.dumps(rec) + "\n")

    def _process_model_outputs(self, outputs,
                               scheduler_outputs: SchedulerOutputs
                               ) -> List[RequestOutput]:
        now = time.time()
        request_outputs: List[RequestOutput] = []

        # Generation-token accounting for stats: count tokens ACTUALLY
        # appended this iteration (returned by the output processors).
        # A finished prefill's first sampled token counts as generation,
        # matching the reference split (reference llm_engine.py:993-995).
        # Appended counts are robust where before/after output-length
        # deltas are not: beam pruning / early stopping removes seqs (and
        # their whole histories) mid-step, and forked children copy full
        # output histories.
        gen_tokens = 0

        # outputs is one SamplerOutput per fused device step (len > 1 on
        # the multi-step decode path); append tokens round by round so stop
        # conditions cut off over-generated tail tokens.
        if len(outputs) > 1:
            # Fused multi-step: group-major fast path where eligible
            # (n=1, no beam, plain samples) — one call appends all K
            # tokens instead of K passes over every group.
            n_steps = len(outputs)
            slow_groups = []
            for gi, scheduled in enumerate(
                    scheduler_outputs.scheduled_seq_groups):
                seq_group = scheduled.seq_group
                if seq_group.is_finished():
                    continue
                per_step = [outputs[k].outputs[gi] for k in range(n_steps)]
                if (isinstance(per_step[0], EmbeddingSequenceGroupOutput)
                        or per_step[0].prompt_logprobs is not None
                        or not per_step[0].samples
                        or not self.output_processor.can_fast_append(
                            seq_group)):
                    # empty step-0 samples: a chunked prefill riding the
                    # mixed fused window emits its (single) sample at its
                    # final chunk's step — step-wise processing applies
                    slow_groups.append((gi, scheduled))
                    continue
                # chunk accounting BEFORE appending: the stage flips to
                # DECODE exactly when the chunk covers the prompt, and
                # appended tokens must not count as computed yet (a
                # mixed-window prefill completing at step 0 otherwise
                # stays PREFILL forever, rescheduled as a 1-token chunk
                # each window — caught by the round-5 serving trace)
                seq_group.update_num_computed_tokens(
                    scheduled.token_chunk_size)
                applied = self.output_processor.process_outputs_multi(
                    seq_group, per_step)
                gen_tokens += applied
                if applied > 1:
                    seq_group.update_num_computed_tokens(applied - 1)
                seq_group.maybe_set_first_token_time(now)
                seq_group.metrics.last_token_time = now
            step_iter = [(step_i, sampler_output, slow_groups)
                         for step_i, sampler_output in enumerate(outputs)]
        else:
            all_groups = list(
                enumerate(scheduler_outputs.scheduled_seq_groups))
            step_iter = [(0, outputs[0], all_groups)] if outputs else []
        for step_i, sampler_output, groups in step_iter:
            assert len(sampler_output.outputs) == len(
                scheduler_outputs.scheduled_seq_groups)
            for gi, scheduled in groups:
                group_output = sampler_output.outputs[gi]
                seq_group = scheduled.seq_group
                if seq_group.is_finished():
                    continue
                if isinstance(group_output, EmbeddingSequenceGroupOutput):
                    seq_group.update_num_computed_tokens(
                        scheduled.token_chunk_size)
                    if group_output.embeddings is not None:
                        seq_group.embeddings = group_output.embeddings
                        for seq in seq_group.get_seqs():
                            seq.status = SequenceStatus.FINISHED_STOPPED
                    continue
                if step_i > 0 and not group_output.samples:
                    # variable-length fused steps (spec decode): this seq
                    # accepted fewer tokens than the longest in the batch;
                    # or a mixed-window prefill before/after its sample step
                    continue
                if step_i == 0:
                    seq_group.update_num_computed_tokens(
                        scheduled.token_chunk_size)
                elif gi >= scheduler_outputs.num_prefill_groups:
                    # decodes advance one computed token per fused step; a
                    # mixed-window prefill's chunk was fully accounted at
                    # step 0 (its first generated token is computed only
                    # when decoded next step)
                    seq_group.update_num_computed_tokens(1)
                gen_tokens += self.output_processor.process_outputs(
                    seq_group, group_output)
                seq_group.maybe_set_first_token_time(now)
                seq_group.metrics.last_token_time = now

        self.scheduler.free_finished_seq_groups()

        for scheduled in scheduler_outputs.scheduled_seq_groups:
            sg = scheduled.seq_group
            if getattr(sg, "pooling_params", None) is not None:
                request_outputs.append(
                    EmbeddingRequestOutput(
                        request_id=sg.request_id,
                        outputs=EmbeddingOutput(sg.embeddings or []),
                        prompt_token_ids=sg.prompt_token_ids,
                        finished=sg.is_finished()))
            else:
                request_outputs.append(RequestOutput.from_seq_group(sg))
        for seq_group in scheduler_outputs.ignored_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))

        if self.stat_logger is not None:
            stats = self._get_stats(scheduler_outputs, request_outputs,
                                    num_generation_tokens=gen_tokens)
            if outputs and outputs[0].spec_decode_worker_metrics is not None:
                stats.spec_decode_metrics = \
                    outputs[0].spec_decode_worker_metrics
            self.stat_logger.log(stats)
        if self.tracer is not None:
            self._emit_traces(request_outputs)
        return request_outputs

    # --- stats / tracing -----------------------------------------------------------
    def _get_stats(self, scheduler_outputs: SchedulerOutputs,
                   request_outputs: List[RequestOutput],
                   num_generation_tokens: int = 0) -> Stats:
        now = time.time()
        num_prompt_tokens = 0
        time_to_first_tokens: List[float] = []
        time_per_output_tokens: List[float] = []
        time_e2e: List[float] = []
        npg = scheduler_outputs.num_prefill_groups
        for i, scheduled in enumerate(
                scheduler_outputs.scheduled_seq_groups):
            sg = scheduled.seq_group
            if i < npg:
                # Groups scheduled as prefill this iteration (they may have
                # left prefill stage by now — count by schedule position).
                num_prompt_tokens += scheduled.token_chunk_size
            m = sg.metrics
            if m.first_token_time and sg.num_seqs() and \
                    sg.get_seqs()[0].get_output_len() == 1:
                time_to_first_tokens.append(m.first_token_time -
                                            m.arrival_time)
            elif not sg.is_prefill():
                time_per_output_tokens.append(now - m.last_token_time)
        for ro in request_outputs:
            if ro.finished and getattr(ro, "metrics", None) and \
                    ro.metrics.finished_time:
                time_e2e.append(ro.metrics.finished_time -
                                ro.metrics.arrival_time)
        free_blocks = self.scheduler.block_manager.get_num_free_gpu_blocks()
        total_blocks = self.cache_config.num_gpu_blocks or 1
        return Stats(
            now=now,
            num_running_sys=len(self.scheduler.running),
            num_waiting_sys=len(self.scheduler.waiting),
            num_swapped_sys=len(self.scheduler.swapped),
            gpu_cache_usage_sys=1.0 - free_blocks / total_blocks,
            num_prompt_tokens_iter=num_prompt_tokens,
            num_generation_tokens_iter=num_generation_tokens,
            num_preemption_iter=scheduler_outputs.preempted,
            time_to_first_tokens_iter=time_to_first_tokens,
            time_per_output_tokens_iter=time_per_output_tokens,
            time_e2e_requests=time_e2e,
        )

    def _emit_traces(self, request_outputs: List[RequestOutput]) -> None:
        from neural_magic_vllm_tpu.tracing import SpanAttributes
        for ro in request_outputs:
            if not ro.finished or getattr(ro, "metrics", None) is None:
                continue
            m = ro.metrics
            with self.tracer.start_as_current_span(
                    "llm_request", start_time=int(m.arrival_time * 1e9)) \
                    as span:
                span.set_attribute(SpanAttributes.LLM_REQUEST_ID,
                                   ro.request_id)
                span.set_attribute(SpanAttributes.LLM_PROMPT_TOKENS,
                                   len(ro.prompt_token_ids))
                span.set_attribute(
                    SpanAttributes.LLM_COMPLETION_TOKENS,
                    sum(len(o.token_ids) for o in ro.outputs))
                if m.first_token_time:
                    span.set_attribute(
                        SpanAttributes.LLM_LATENCY_TIME_TO_FIRST_TOKEN,
                        m.first_token_time - m.arrival_time)
                if m.time_in_queue:
                    span.set_attribute(
                        SpanAttributes.LLM_LATENCY_TIME_IN_QUEUE,
                        m.time_in_queue)
                if m.finished_time:
                    span.set_attribute(SpanAttributes.LLM_LATENCY_E2E,
                                       m.finished_time - m.arrival_time)

    def save_state(self, model_dir: str) -> None:
        """Persist the loaded (converted/quantized) params for fast
        reload via --load-format nmv."""
        self.model_executor.save_state(model_dir)

    # --- LoRA management (reference llm_engine add_lora/remove_lora) ---------
    def add_lora(self, lora_request) -> bool:
        return self.model_executor.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        return self.model_executor.remove_lora(lora_id)

    def list_loras(self):
        return self.model_executor.list_loras()

    def check_health(self) -> None:
        self.model_executor.check_health()
