"""Block manager unit tests (modeled on reference tests/core/test_block_manager.py)."""
import pytest

from neural_magic_vllm_tpu.core.block_manager import (CachedBlockAllocator,
                                                      PagedBlockSpaceManager,
                                                      UncachedBlockAllocator)
from neural_magic_vllm_tpu.core.interfaces import AllocStatus
from neural_magic_vllm_tpu.sampling_params import SamplingParams
from neural_magic_vllm_tpu.sequence import (Sequence, SequenceGroup,
                                            SequenceStatus)


def make_seq_group(prompt_len=8, block_size=4, num_seqs=1, request_id="0",
                   best_of=1):
    prompt_ids = list(range(prompt_len))
    seqs = [
        Sequence(seq_id=i,
                 prompt=None,
                 prompt_token_ids=prompt_ids,
                 block_size=block_size) for i in range(num_seqs)
    ]
    sp = SamplingParams(best_of=best_of, n=min(best_of, num_seqs),
                        temperature=1.0 if best_of > 1 else 0.0)
    if best_of == 1:
        sp = SamplingParams(temperature=0.0)
    return SequenceGroup(request_id=request_id, seqs=seqs,
                         sampling_params=sp)


def test_uncached_allocate_free():
    alloc = UncachedBlockAllocator("tpu", 4, 4)
    blocks = [alloc.allocate() for _ in range(4)]
    assert alloc.get_num_free_blocks() == 0
    with pytest.raises(ValueError):
        alloc.allocate()
    for b in blocks:
        alloc.free(b)
    assert alloc.get_num_free_blocks() == 4
    with pytest.raises(ValueError):
        alloc.free(blocks[0])


def test_cached_allocator_reuses_by_hash():
    alloc = CachedBlockAllocator("tpu", 4, 4)
    b1 = alloc.allocate(block_hash=123, num_hashed_tokens=4)
    b2 = alloc.allocate(block_hash=123, num_hashed_tokens=4)
    assert b1 is b2
    assert b1.ref_count == 2
    alloc.free(b1)
    alloc.free(b1)
    # Block is now in the evictor, still reusable by hash.
    b3 = alloc.allocate(block_hash=123, num_hashed_tokens=4)
    assert b3 is b1
    assert alloc.get_num_free_blocks() == 3


def test_cached_allocator_evicts_lru():
    alloc = CachedBlockAllocator("tpu", 4, 2)
    b1 = alloc.allocate(block_hash=1, num_hashed_tokens=4)
    b2 = alloc.allocate(block_hash=2, num_hashed_tokens=8)
    b1.last_accessed = 1.0
    b2.last_accessed = 2.0
    alloc.free(b1)
    alloc.free(b2)
    # Allocating a new hash must evict b1 (older last_accessed).
    b3 = alloc.allocate(block_hash=3, num_hashed_tokens=4)
    assert b3 is b1
    assert not alloc.contains_block(1)
    assert alloc.contains_block(2)


def test_can_allocate_watermark():
    bm = PagedBlockSpaceManager(block_size=4, num_gpu_blocks=8,
                                num_cpu_blocks=4, watermark=0.25)
    # 8-token prompt needs 2 blocks; watermark_blocks = 2.
    sg = make_seq_group(prompt_len=8, block_size=4)
    assert bm.can_allocate(sg) == AllocStatus.OK
    # Prompt needing more blocks than total-minus-watermark is NEVER.
    sg_huge = make_seq_group(prompt_len=4 * 7, block_size=4, request_id="1")
    assert bm.can_allocate(sg_huge) == AllocStatus.NEVER


def test_allocate_and_append_cow():
    block_size = 4
    bm = PagedBlockSpaceManager(block_size=block_size, num_gpu_blocks=16,
                                num_cpu_blocks=8)
    sg = make_seq_group(prompt_len=4, block_size=block_size)
    assert bm.can_allocate(sg) == AllocStatus.OK
    bm.allocate(sg)
    seq = sg.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    assert len(bm.get_block_table(seq)) == 1

    # Fork: child shares blocks; appending to parent triggers CoW.
    child = seq.fork(new_seq_id=1)
    sg.add(child)
    bm.fork(seq, child)
    assert bm.get_block_table(seq) == bm.get_block_table(child)

    seq.data.append_token_id(100, 0.0)  # 5th token -> needs block 2
    cows = bm.append_slots(seq)
    assert cows == []  # new block, no CoW

    # Now force CoW: make the shared last block the append target.
    child.data.append_token_id(100, 0.0)
    child.status = SequenceStatus.RUNNING
    # child's table still points at the shared (ref_count 2) block 0...
    # appending token 5 grows table; then token in a shared block is CoW'd
    cows2 = bm.append_slots(child)
    assert cows2 == []  # appended into a fresh block as well


def test_cow_on_shared_last_block():
    block_size = 4
    bm = PagedBlockSpaceManager(block_size=block_size, num_gpu_blocks=16,
                                num_cpu_blocks=8)
    # 3-token prompt: last block is partial.
    sg = make_seq_group(prompt_len=3, block_size=block_size)
    bm.allocate(sg)
    seq = sg.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    child = seq.fork(new_seq_id=1)
    sg.add(child)
    bm.fork(seq, child)

    seq.data.append_token_id(7, 0.0)  # 4th token, same (shared) block
    cows = bm.append_slots(seq)
    assert len(cows) == 1
    src, dst = cows[0]
    assert src != dst
    assert bm.get_block_table(seq) != bm.get_block_table(child)


def test_swap_out_and_in():
    block_size = 4
    bm = PagedBlockSpaceManager(block_size=block_size, num_gpu_blocks=8,
                                num_cpu_blocks=8)
    sg = make_seq_group(prompt_len=8, block_size=block_size)
    bm.allocate(sg)
    seq = sg.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    gpu_table = bm.get_block_table(seq)

    assert bm.can_swap_out(sg)
    mapping = bm.swap_out(sg)
    assert len(mapping) == 2
    assert sorted(m[0] for m in mapping) == sorted(gpu_table)
    seq.status = SequenceStatus.SWAPPED
    assert bm.get_num_free_gpu_blocks() == 8

    assert bm.can_swap_in(sg) == AllocStatus.OK
    mapping_in = bm.swap_in(sg)
    assert len(mapping_in) == 2
    seq.status = SequenceStatus.RUNNING
    assert bm.get_num_free_cpu_blocks() == 8
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == 8


def test_prefix_caching_reuses_full_blocks():
    block_size = 4
    bm = PagedBlockSpaceManager(block_size=block_size, num_gpu_blocks=16,
                                num_cpu_blocks=8, enable_caching=True)
    sg1 = make_seq_group(prompt_len=8, block_size=block_size,
                         request_id="a")
    bm.allocate(sg1)
    seq1 = sg1.get_seqs()[0]
    seq1.status = SequenceStatus.RUNNING
    table1 = bm.get_block_table(seq1)

    # Same prompt again -> same physical blocks (prefix cache hit).
    sg2 = make_seq_group(prompt_len=8, block_size=block_size,
                         request_id="b")
    bm.allocate(sg2)
    seq2 = sg2.get_seqs()[0]
    seq2.status = SequenceStatus.RUNNING
    table2 = bm.get_block_table(seq2)
    assert table1 == table2

    # computed-block tracking
    bm.mark_blocks_as_computed(sg1)
    common = bm.get_common_computed_block_ids([seq1, seq2])
    # last block excluded by design
    assert common == table1[:-1]


def test_prefix_cache_survives_free_until_evicted():
    block_size = 4
    bm = PagedBlockSpaceManager(block_size=block_size, num_gpu_blocks=16,
                                num_cpu_blocks=8, enable_caching=True)
    sg1 = make_seq_group(prompt_len=8, block_size=block_size,
                         request_id="a")
    bm.allocate(sg1)
    seq1 = sg1.get_seqs()[0]
    table1 = bm.get_block_table(seq1)
    bm.free(seq1)
    # freed but cached: a new request with the same prompt reuses blocks
    sg2 = make_seq_group(prompt_len=8, block_size=block_size,
                         request_id="b")
    bm.allocate(sg2)
    seq2 = sg2.get_seqs()[0]
    assert bm.get_block_table(seq2) == table1


def test_sliding_window_ring():
    block_size = 4
    # window = 8 tokens -> 2 blocks + 1 ring slack = 3 blocks max
    bm = PagedBlockSpaceManager(block_size=block_size, num_gpu_blocks=16,
                                num_cpu_blocks=8, sliding_window=8)
    sg = make_seq_group(prompt_len=20, block_size=block_size)
    bm.allocate(sg)
    seq = sg.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    table = bm.get_block_table(seq)
    assert len(table) == 5  # logical blocks
    assert len(set(table)) <= 3  # physical ring of 3
    free_before = bm.get_num_free_gpu_blocks()
    # long decode keeps the ring stable
    for i in range(12):
        seq.data.append_token_id(1, 0.0)
        bm.append_slots(seq)
    assert bm.get_num_free_gpu_blocks() == free_before
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == 16


def test_computed_block_tracking_multi_seq():
    """get_common_computed_block_ids over forked multi-seq groups
    (reference prefix_caching_block.py:542): full shared-prefix blocks,
    never the last block, intersection stops at the first divergence."""
    bm = PagedBlockSpaceManager(block_size=4, num_gpu_blocks=16,
                                num_cpu_blocks=0, enable_caching=True)
    group = make_seq_group(prompt_len=12, block_size=4)  # 3 full blocks
    parent = group.get_seqs()[0]
    bm.allocate(group)
    bm.mark_blocks_as_computed(group)
    # Last block is never reported: even when full, at least one query
    # token must re-run so sampling has a position.
    assert bm.get_common_computed_block_ids([parent]) == \
        [b.block_number for b in bm.block_tables[parent.seq_id][:-1]]

    # Fork (n>1): child shares every block; common prefix = parent's.
    child = Sequence(seq_id=99, prompt=None,
                     prompt_token_ids=list(range(12)), block_size=4)
    bm.fork(parent, child)
    common = bm.get_common_computed_block_ids([parent, child])
    assert common == bm.get_common_computed_block_ids([parent])

    # Diverge: both sequences grow into NEW (different) fourth blocks.
    # The three original shared blocks become common (block 2 stops being
    # the last block), the divergent fourth blocks never do.
    for seq, tok in ((parent, 100), (child, 200)):
        seq.status = SequenceStatus.RUNNING
        for t in (tok, tok + 1, tok + 2, tok + 3, tok + 4):
            from neural_magic_vllm_tpu.sequence import Logprob
            seq.append_token_id(t, {t: Logprob(0.0)})
            bm.append_slots(seq, 0)
    bm.mark_blocks_as_computed(group)
    bm.compute_full_blocks_in_seq(child)
    common2 = bm.get_common_computed_block_ids([parent, child])
    parent_blocks = [b.block_number for b in bm.block_tables[parent.seq_id]]
    child_blocks = [b.block_number for b in bm.block_tables[child.seq_id]]
    assert common2 == parent_blocks[:3] == child_blocks[:3]
    assert parent_blocks[3] != child_blocks[3]  # divergence excluded

    # Disabled caching reports nothing.
    bm2 = PagedBlockSpaceManager(block_size=4, num_gpu_blocks=16,
                                 num_cpu_blocks=0, enable_caching=False)
    g2 = make_seq_group(prompt_len=12, block_size=4, request_id="1")
    bm2.allocate(g2)
    bm2.mark_blocks_as_computed(g2)
    assert bm2.get_common_computed_block_ids(g2.get_seqs()) == []
