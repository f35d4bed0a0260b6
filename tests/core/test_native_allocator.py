"""Native C++ prefix-caching allocator vs the Python implementation:
randomized operation sequences must produce identical observable state
(ref counts, cache hits, free counts, eviction choices)."""
import numpy as np
import pytest

from neural_magic_vllm_tpu.core import native_allocator
from neural_magic_vllm_tpu.core.block_manager import CachedBlockAllocator

pytestmark = pytest.mark.skipif(not native_allocator.is_available(),
                                reason="no g++ toolchain")


def make_pair(num_blocks=16):
    py = CachedBlockAllocator("tpu", 16, num_blocks)
    nat = native_allocator.NativeCachedBlockAllocator("tpu", 16, num_blocks)
    return py, nat


def test_basic_alloc_free_and_hit():
    py, nat = make_pair()
    for alloc in (py, nat):
        b1 = alloc.allocate(block_hash=111, num_hashed_tokens=16)
        b2 = alloc.allocate(block_hash=111, num_hashed_tokens=16)
        assert b1.block_number == b2.block_number  # cache hit
        assert b1.ref_count == 2
        alloc.free(b1)
        assert b2.ref_count == 1
        alloc.free(b2)
        assert alloc.get_num_free_blocks() == alloc.get_num_total_blocks()
        assert alloc.contains_block(111)  # lives on in the evictor
        b3 = alloc.allocate(block_hash=111)
        assert b3.block_number == b1.block_number  # resurrected
        with pytest.raises(ValueError):
            alloc.free(b3)
            alloc.free(b3)


def test_placeholder_and_promote():
    py, nat = make_pair()
    for alloc in (py, nat):
        b = alloc.allocate()  # placeholder hash
        ph = b.block_hash
        assert ph < 0
        alloc.update_hash(777, b)
        assert b.block_hash == 777
        assert alloc.contains_block(777)
        assert not alloc.contains_block(ph)


def test_eviction_order_lru_then_longest_prefix():
    py, nat = make_pair(num_blocks=2)
    for alloc in (py, nat):
        a = alloc.allocate(block_hash=1, num_hashed_tokens=16)
        b = alloc.allocate(block_hash=2, num_hashed_tokens=32)
        a.last_accessed = 10.0
        b.last_accessed = 5.0
        alloc.free(a)
        alloc.free(b)
        # full: next allocate must evict b (older last_accessed)
        c = alloc.allocate(block_hash=3, num_hashed_tokens=16)
        assert c.block_number == b.block_number
        assert alloc.contains_block(1)
        assert not alloc.contains_block(2)


def test_eviction_tie_breaks_on_num_hashed_tokens():
    py, nat = make_pair(num_blocks=2)
    for alloc in (py, nat):
        a = alloc.allocate(block_hash=1, num_hashed_tokens=16)
        b = alloc.allocate(block_hash=2, num_hashed_tokens=48)
        a.last_accessed = 7.0
        b.last_accessed = 7.0
        alloc.free(a)
        alloc.free(b)
        c = alloc.allocate(block_hash=3, num_hashed_tokens=16)
        # tie on time: evict the LONGEST prefix (b)
        assert c.block_number == b.block_number


def test_randomized_equivalence():
    rng = np.random.default_rng(0)
    py, nat = make_pair(num_blocks=12)
    live_py, live_nat = {}, {}  # hash -> block
    for step in range(2000):
        op = rng.random()
        if op < 0.55 or not live_py:
            h = int(rng.integers(1, 40))
            nht = int(rng.integers(1, 64))
            try:
                pb = py.allocate(block_hash=h, num_hashed_tokens=nht)
                ok_py = True
            except ValueError:
                ok_py = False
            try:
                nb = nat.allocate(block_hash=h, num_hashed_tokens=nht)
                ok_nat = True
            except ValueError:
                ok_nat = False
            assert ok_py == ok_nat, step
            if ok_py:
                assert pb.ref_count == nb.ref_count, step
                live_py.setdefault(h, []).append(pb)
                live_nat.setdefault(h, []).append(nb)
                ts = float(step)
                pb.last_accessed = ts
                nb.last_accessed = ts
        else:
            h = list(live_py)[int(rng.integers(0, len(live_py)))]
            pb = live_py[h].pop()
            nb = live_nat[h].pop()
            if not live_py[h]:
                del live_py[h], live_nat[h]
            py.free(pb)
            nat.free(nb)
        assert py.get_num_free_blocks() == nat.get_num_free_blocks(), step
        for h in live_py:
            assert py.contains_block(h) and nat.contains_block(h), (step, h)


def test_engine_prefix_caching_with_native(tiny_llama_dir, monkeypatch):
    """End-to-end: prefix caching through the engine with the native
    allocator forced on gives identical greedy tokens."""
    monkeypatch.setenv("NMV_TPU_NATIVE_ALLOCATOR", "1")
    from neural_magic_vllm_tpu import LLM, SamplingParams
    prompts = [[1, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
                22, 23],
               [1, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
                22, 99]]
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
              enforce_eager=True, disable_log_stats=True,
              enable_prefix_caching=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    out1 = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    out2 = [list(o.outputs[0].token_ids) for o in llm.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    assert out1 == out2

    monkeypatch.setenv("NMV_TPU_NATIVE_ALLOCATOR", "0")
    llm_py = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                 block_size=16, num_gpu_blocks_override=64, max_num_seqs=8,
                 enforce_eager=True, disable_log_stats=True,
                 enable_prefix_caching=True)
    out_py = [list(o.outputs[0].token_ids) for o in llm_py.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    assert out_py == out1
