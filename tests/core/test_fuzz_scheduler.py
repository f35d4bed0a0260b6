"""Randomized scheduler + block-manager invariant stress test.

SURVEY §4/§5: the reference has no TSAN/property harness — concurrency
correctness rests on the single-controller step loop — so the TPU-native
design gets randomized invariant coverage instead: hundreds of steps of
random arrivals/lengths under tight KV capacity (forcing preemption and
swap), asserting block accounting, budget caps, and liveness after every
step, across both preemption modes, chunked prefill, and prefix caching.
"""
import random

import pytest

from neural_magic_vllm_tpu.config import CacheConfig, SchedulerConfig
from neural_magic_vllm_tpu.core.scheduler import Scheduler
from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.sequence import (Logprob, Sequence, SequenceGroup,
                                            SequenceStatus)

NUM_GPU_BLOCKS = 24
NUM_CPU_BLOCKS = 8
BLOCK_SIZE = 4
N_REQUESTS = 25
STEP_CAP = 2000

_seq_ctr = [10_000]


def _build(chunked, prefix, preemption_mode, lookahead=0,
           cpu_blocks=NUM_CPU_BLOCKS, sliding_window=None):
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=32 if chunked else None,
        max_num_seqs=4,
        max_model_len=64,
        num_lookahead_slots=lookahead,
        enable_chunked_prefill=chunked,
        preemption_mode=preemption_mode)
    cache_cfg = CacheConfig(block_size=BLOCK_SIZE,
                            enable_prefix_caching=prefix)
    cache_cfg.num_gpu_blocks = NUM_GPU_BLOCKS
    cache_cfg.num_cpu_blocks = cpu_blocks
    cache_cfg.sliding_window = sliding_window
    return Scheduler(sched_cfg, cache_cfg)


def _group(request_id, prompt_ids, max_tokens, n=1):
    _seq_ctr[0] += 1
    seq = Sequence(seq_id=_seq_ctr[0], prompt=None,
                   prompt_token_ids=prompt_ids, block_size=BLOCK_SIZE)
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens) if n == 1 \
        else SamplingParams(temperature=1.0, n=n, max_tokens=max_tokens)
    return SequenceGroup(request_id=request_id, seqs=[seq],
                         sampling_params=sp)


@pytest.mark.parametrize("preemption_mode", ["recompute", "swap"])
@pytest.mark.parametrize("chunked,prefix",
                         [(False, False), (True, False), (False, True),
                          (True, True)])
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_invariants(seed, chunked, prefix, preemption_mode,
                         lookahead=0, cpu_blocks=NUM_CPU_BLOCKS,
                         sliding_window=None):
    rng = random.Random(seed * 7919 + hash((chunked, prefix)) % 1000)
    sched = _build(chunked, prefix, preemption_mode, lookahead, cpu_blocks,
                   sliding_window)
    bm = sched.block_manager
    budget = sched.scheduler_config.max_num_batched_tokens

    limits = {}
    submitted = 0
    steps = 0
    while submitted < N_REQUESTS or sched.has_unfinished_seqs():
        steps += 1
        assert steps < STEP_CAP, "scheduler stopped making progress"
        while submitted < N_REQUESTS and rng.random() < 0.4:
            plen = rng.randint(1, 20)
            mt = rng.randint(1, 10)
            # shared prefixes so prefix caching actually hits
            base = [7] * (plen // 2) if rng.random() < 0.5 else \
                [rng.randint(0, 255) for _ in range(plen // 2)]
            ids = base + [rng.randint(0, 255)
                          for _ in range(plen - len(base))]
            n = 2 if rng.random() < 0.3 else 1
            g = _group(f"r{submitted}", ids, mt, n=n)
            sched.add_seq_group(g)
            limits[g.request_id] = mt
            submitted += 1

        meta, out = sched.schedule()

        # --- invariants on every step --------------------------------
        assert out.num_batched_tokens <= budget
        n_sched_seqs = sum(
            sg.seq_group.get_max_num_running_seqs()
            for sg in out.scheduled_seq_groups)
        assert n_sched_seqs <= sched.scheduler_config.max_num_seqs
        free_gpu = bm.gpu_allocator.get_num_free_blocks()
        free_cpu = bm.cpu_allocator.get_num_free_blocks()
        assert 0 <= free_gpu <= NUM_GPU_BLOCKS
        assert 0 <= free_cpu <= cpu_blocks
        # a block can't be both swap-in target and swap-out source
        gpu_in = {dst for _, dst in out.blocks_to_swap_in}
        gpu_out = {src for src, _ in out.blocks_to_swap_out}
        assert not (gpu_in & gpu_out)
        # every scheduled running seq has a live block table
        for ssg in out.scheduled_seq_groups:
            for seq in ssg.seq_group.get_seqs(
                    status=SequenceStatus.RUNNING):
                assert bm.get_block_table(seq), \
                    f"running seq {seq.seq_id} has no block table"

        # --- simulate the engine finishing the step ------------------
        for ssg in out.scheduled_seq_groups:
            g = ssg.seq_group
            g.update_num_computed_tokens(ssg.token_chunk_size)
            for seq in list(g.get_seqs(status=SequenceStatus.RUNNING)):
                if seq.data.get_num_uncomputed_tokens() != 0:
                    continue  # mid-prompt chunk: nothing sampled
                if (g.sampling_params.n == 2
                        and seq.get_output_len() == 0):
                    # parallel sampling: output processor forks the
                    # parent on the first sampled token (CoW on the
                    # shared prompt blocks)
                    _seq_ctr[0] += 1
                    child = seq.fork(_seq_ctr[0])
                    tok = rng.randint(0, 255)
                    child.append_token_id(tok, {tok: Logprob(0.0)})
                    g.add(child)
                    sched.fork_seq(seq, child)
                tok = rng.randint(0, 255)
                seq.append_token_id(tok, {tok: Logprob(0.0)})
            for seq in list(g.get_seqs(status=SequenceStatus.RUNNING)):
                if seq.get_output_len() >= limits[g.request_id]:
                    # what the engine's output processor does on stop
                    seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
                    sched.free_seq(seq)
        sched.free_finished_seq_groups()

        # client disconnect: abort a random in-flight request (engine
        # abort path must free blocks from any queue state)
        if rng.random() < 0.05 and limits:
            sched.abort_seq_group(rng.choice(list(limits)))

    # drained: no leaks anywhere (evictor-held prefix blocks count free)
    assert bm.gpu_allocator.get_num_free_blocks() == NUM_GPU_BLOCKS
    assert bm.cpu_allocator.get_num_free_blocks() == cpu_blocks
    assert not sched.running and not sched.waiting and not sched.swapped


@pytest.mark.parametrize("preemption_mode", ["recompute", "swap"])
@pytest.mark.parametrize("seed", range(2))
def test_fuzz_invariants_lookahead(seed, preemption_mode):
    """Lookahead slots (fused multi-step / spec decode): block tables stay
    K tokens ahead of sampling without leaking or over-reserving."""
    # ample CPU swap: running out of swap space is a documented fatal
    # abort (reference scheduler raises the same RuntimeError), not an
    # invariant violation this test is after
    test_fuzz_invariants(seed, False, False, preemption_mode, lookahead=3,
                         cpu_blocks=64)


@pytest.mark.parametrize("preemption_mode", ["recompute", "swap"])
@pytest.mark.parametrize("seed", range(2))
def test_fuzz_invariants_sliding_window(seed, preemption_mode):
    """Sliding-window ring reuse: generations longer than the window run
    in a bounded ring of blocks (reference block_manager_v1.py:304)."""
    test_fuzz_invariants(seed, False, False, preemption_mode,
                         sliding_window=12)
