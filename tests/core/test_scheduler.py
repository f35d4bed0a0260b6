"""Scheduler unit tests (modeled on reference tests/core/test_scheduler.py and
test_chunked_prefill_scheduler.py)."""
from typing import List

from neural_magic_vllm_tpu.config import CacheConfig, SchedulerConfig
from neural_magic_vllm_tpu.core.scheduler import Scheduler
from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.sequence import (Logprob, Sequence, SequenceGroup,
                                            SequenceStatus)


def make_scheduler(max_num_seqs=8, max_num_batched_tokens=None,
                   num_gpu_blocks=64, num_cpu_blocks=16, block_size=4,
                   max_model_len=128, chunked=False,
                   enable_prefix_caching=False):
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_seqs=max_num_seqs,
        max_model_len=max_model_len,
        enable_chunked_prefill=chunked)
    cache_cfg = CacheConfig(block_size=block_size,
                            enable_prefix_caching=enable_prefix_caching)
    cache_cfg.num_gpu_blocks = num_gpu_blocks
    cache_cfg.num_cpu_blocks = num_cpu_blocks
    return Scheduler(sched_cfg, cache_cfg)


_seq_ctr = [0]


def make_group(request_id: str, prompt_len: int, block_size=4,
               max_tokens=16) -> SequenceGroup:
    _seq_ctr[0] += 1
    seq = Sequence(seq_id=_seq_ctr[0], prompt=None,
                   prompt_token_ids=list(range(prompt_len)),
                   block_size=block_size)
    return SequenceGroup(
        request_id=request_id, seqs=[seq],
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=max_tokens))


def append_one_token(groups: List[SequenceGroup], scheduler: Scheduler):
    """Simulate the engine finishing one step: mark computed + append."""
    for sg in groups:
        for seq in sg.get_seqs(status=SequenceStatus.RUNNING):
            seq.data.update_num_computed_tokens(
                seq.data.get_num_uncomputed_tokens())
            seq.append_token_id(0, {0: Logprob(0.0)})


def test_prefill_then_decode():
    scheduler = make_scheduler()
    g1 = make_group("1", prompt_len=8)
    g2 = make_group("2", prompt_len=4)
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)

    meta, out = scheduler.schedule()
    assert out.num_prefill_groups == 2
    assert len(meta) == 2
    assert all(m.is_prompt for m in meta)
    assert out.num_batched_tokens == 12

    append_one_token([g1, g2], scheduler)
    meta, out = scheduler.schedule()
    assert out.num_prefill_groups == 0
    assert len(meta) == 2
    assert not any(m.is_prompt for m in meta)
    assert out.num_batched_tokens == 2


def test_max_num_seqs_cap():
    scheduler = make_scheduler(max_num_seqs=2)
    groups = [make_group(str(i), prompt_len=4) for i in range(4)]
    for g in groups:
        scheduler.add_seq_group(g)
    meta, out = scheduler.schedule()
    assert len(meta) == 2
    assert len(scheduler.waiting) == 2


def test_token_budget_cap():
    scheduler = make_scheduler(max_num_batched_tokens=130, max_model_len=128)
    g1 = make_group("1", prompt_len=100)
    g2 = make_group("2", prompt_len=100)
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)
    meta, out = scheduler.schedule()
    assert len(meta) == 1  # only one 100-token prompt fits in 130


def test_prompt_too_long_ignored():
    scheduler = make_scheduler(max_model_len=16, max_num_batched_tokens=16)
    g = make_group("1", prompt_len=64)
    scheduler.add_seq_group(g)
    meta, out = scheduler.schedule()
    assert len(meta) == 0
    assert len(out.ignored_seq_groups) == 1
    assert g.get_seqs()[0].status == SequenceStatus.FINISHED_IGNORED


def test_preemption_by_recompute_when_no_blocks():
    # 8 blocks of 4 tokens = 32 token slots.
    scheduler = make_scheduler(num_gpu_blocks=8, block_size=4,
                               max_model_len=64,
                               max_num_batched_tokens=64)
    g1 = make_group("1", prompt_len=14)  # 4 blocks (2 slack slots)
    g2 = make_group("2", prompt_len=14)  # 4 blocks
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)
    meta, out = scheduler.schedule()
    assert len(meta) == 2

    # Decode until blocks run out: one group must be preempted (recompute
    # since each group has 1 seq).
    preempted_seen = 0
    for _ in range(8):
        append_one_token([g1, g2], scheduler)
        meta, out = scheduler.schedule()
        preempted_seen += out.preempted
        if out.preempted:
            break
    assert preempted_seen > 0
    assert len(scheduler.waiting) == 1  # recompute -> back to waiting


def test_chunked_prefill_splits_prompt():
    scheduler = make_scheduler(chunked=True, max_num_batched_tokens=16,
                               max_model_len=128, num_gpu_blocks=64)
    g = make_group("1", prompt_len=40)
    scheduler.add_seq_group(g)

    meta, out = scheduler.schedule()
    assert out.num_prefill_groups == 1
    assert meta[0].token_chunk_size == 16
    assert not meta[0].do_sample  # mid-prompt chunk: no sampling

    g.update_num_computed_tokens(16)
    meta, out = scheduler.schedule()
    assert meta[0].token_chunk_size == 16
    assert not meta[0].do_sample

    g.update_num_computed_tokens(16)
    meta, out = scheduler.schedule()
    assert meta[0].token_chunk_size == 8
    assert meta[0].do_sample  # final chunk: sample


def test_chunked_prefill_mixes_decode_and_prefill():
    scheduler = make_scheduler(chunked=True, max_num_batched_tokens=16,
                               max_model_len=128, num_gpu_blocks=64)
    g1 = make_group("1", prompt_len=8)
    scheduler.add_seq_group(g1)
    meta, out = scheduler.schedule()
    assert out.num_prefill_groups == 1
    append_one_token([g1], scheduler)

    g2 = make_group("2", prompt_len=40)
    scheduler.add_seq_group(g2)
    meta, out = scheduler.schedule()
    # g1 decodes (1 token), g2 prefills with the remaining 15-token budget
    assert len(meta) == 2
    chunks = {m.request_id: m.token_chunk_size for m in meta}
    assert chunks["1"] == 1
    assert chunks["2"] == 15


def test_abort():
    scheduler = make_scheduler()
    g = make_group("1", prompt_len=8)
    scheduler.add_seq_group(g)
    scheduler.abort_seq_group("1")
    assert not scheduler.has_unfinished_seqs()
    meta, out = scheduler.schedule()
    assert len(meta) == 0


def test_swapped_readmission_after_swap_preemption():
    # Force swap preemption via preemption_mode="swap".
    sched_cfg = SchedulerConfig(max_num_batched_tokens=64,
                                max_num_seqs=8, max_model_len=64,
                                preemption_mode="swap")
    cache_cfg = CacheConfig(block_size=4)
    cache_cfg.num_gpu_blocks = 8
    cache_cfg.num_cpu_blocks = 16
    scheduler = Scheduler(sched_cfg, cache_cfg)

    g1 = make_group("1", prompt_len=14)
    g2 = make_group("2", prompt_len=14)
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)
    scheduler.schedule()

    swapped = 0
    for _ in range(10):
        append_one_token([g1, g2], scheduler)
        meta, out = scheduler.schedule()
        if out.blocks_to_swap_out:
            swapped += 1
            break
    assert swapped == 1
    assert len(scheduler.swapped) == 1

    # Finish the survivor -> swapped group must be re-admitted.
    survivor = g1 if g1 in scheduler.running else g2
    for seq in survivor.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
        scheduler.free_seq(seq)
    scheduler.free_finished_seq_groups()
    meta, out = scheduler.schedule()
    assert out.blocks_to_swap_in
    assert len(meta) == 1


def test_lora_cap_defers_excess_adapters():
    """No more than max_loras distinct adapters may be in the batch at
    once (reference curr_loras threading, vllm/core/scheduler.py:566-589);
    non-LoRA groups behind a bounced one are still admitted."""
    from neural_magic_vllm_tpu.config import LoRAConfig
    from neural_magic_vllm_tpu.lora import LoRARequest

    sched_cfg = SchedulerConfig(max_num_batched_tokens=None, max_num_seqs=8,
                                max_model_len=128)
    cache_cfg = CacheConfig(block_size=4)
    cache_cfg.num_gpu_blocks = 64
    cache_cfg.num_cpu_blocks = 16
    scheduler = Scheduler(sched_cfg, cache_cfg,
                          lora_config=LoRAConfig(max_loras=1,
                                                 max_lora_rank=8))

    g1 = make_group("l1", prompt_len=4)
    g1.lora_request = LoRARequest("a1", 1, "/nonexistent/a1")
    g2 = make_group("l2", prompt_len=4)
    g2.lora_request = LoRARequest("a2", 2, "/nonexistent/a2")
    g3 = make_group("l3", prompt_len=4)  # no adapter
    for g in (g1, g2, g3):
        scheduler.add_seq_group(g)

    meta, out = scheduler.schedule()
    scheduled = {m.request_id for m in meta}
    # adapter a1 admits; a2 would be a 2nd distinct adapter -> bounced;
    # the adapter-less group still gets in.
    assert scheduled == {"l1", "l3"}

    # Finish g1 -> its adapter slot frees -> a2 admits next step.
    for seq in g1.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
    scheduler.free_finished_seq_groups()
    append_one_token([g3], scheduler)
    meta, out = scheduler.schedule()
    assert "l2" in {m.request_id for m in meta}


def test_lora_cap_shared_adapter_counts_once():
    """Two groups with the SAME adapter occupy one slot."""
    from neural_magic_vllm_tpu.config import LoRAConfig
    from neural_magic_vllm_tpu.lora import LoRARequest

    sched_cfg = SchedulerConfig(max_num_batched_tokens=None, max_num_seqs=8,
                                max_model_len=128)
    cache_cfg = CacheConfig(block_size=4)
    cache_cfg.num_gpu_blocks = 64
    cache_cfg.num_cpu_blocks = 16
    scheduler = Scheduler(sched_cfg, cache_cfg,
                          lora_config=LoRAConfig(max_loras=1,
                                                 max_lora_rank=8))
    g1 = make_group("s1", prompt_len=4)
    g1.lora_request = LoRARequest("a1", 1, "/nonexistent/a1")
    g2 = make_group("s2", prompt_len=4)
    g2.lora_request = LoRARequest("a1", 1, "/nonexistent/a1")
    for g in (g1, g2):
        scheduler.add_seq_group(g)
    meta, out = scheduler.schedule()
    assert {m.request_id for m in meta} == {"s1", "s2"}


def test_lane_budget_math():
    from neural_magic_vllm_tpu.core.scheduler import LaneBudget
    lb = LaneBudget(k=16, c=128)
    assert lb.lanes_for(1) == 1
    assert lb.lanes_for(128) == 1
    assert lb.lanes_for(129) == 2
    assert lb.trim(5000) == 16 * 128
    lb.claim(2048)  # 16 lanes
    assert lb.remaining() == 0
    assert lb.trim(64) == 0
    lb2 = LaneBudget(k=4, c=64)
    lb2.claim(65)  # 2 lanes
    assert lb2.remaining() == 2
    assert lb2.trim(1000) == 128
