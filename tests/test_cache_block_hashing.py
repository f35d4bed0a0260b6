"""Prefix-cache block hashing invariants
(reference tests/test_cache_block_hashing.py)."""
from neural_magic_vllm_tpu.lora.request import LoRARequest
from neural_magic_vllm_tpu.sequence import Sequence


def _seq(prompt_ids, block_size=16, lora_request=None, mm_hash=0, seq_id=0):
    return Sequence(seq_id=seq_id, prompt=None,
                    prompt_token_ids=list(prompt_ids),
                    block_size=block_size, lora_request=lora_request,
                    mm_hash=mm_hash)


def test_identical_prefixes_share_hashes():
    a = _seq(range(100), seq_id=0)
    b = _seq(range(100), seq_id=1)
    for blk in range(100 // 16):
        assert a.hash_of_block(blk) == b.hash_of_block(blk)


def test_divergent_suffix_changes_only_later_blocks():
    a = _seq(list(range(64)))
    ids = list(range(64))
    ids[40] = 999  # mutate a token inside block 2
    b = _seq(ids)
    assert a.hash_of_block(0) == b.hash_of_block(0)
    assert a.hash_of_block(1) == b.hash_of_block(1)
    assert a.hash_of_block(2) != b.hash_of_block(2)
    # hashes are cumulative over the whole prefix, so all later blocks
    # differ too
    assert a.hash_of_block(3) != b.hash_of_block(3)


def test_num_hashed_tokens_is_cumulative():
    s = _seq(range(64), block_size=16)
    assert [s.num_hashed_tokens_of_block(i) for i in range(4)] == \
        [16, 32, 48, 64]


def test_lora_id_mixes_into_hash():
    """Same tokens under different adapters must NOT share KV blocks."""
    base = _seq(range(32))
    lora = _seq(range(32), lora_request=LoRARequest(
        lora_name="a", lora_int_id=7, lora_local_path="/dev/null"))
    assert base.hash_of_block(0) != lora.hash_of_block(0)


def test_mm_hash_mixes_into_hash():
    """Identical image-placeholder prompts with different image bytes must
    not collide (multimodal/registry.py mixes image content hashes in)."""
    a = _seq(range(32), mm_hash=0x1234)
    b = _seq(range(32), mm_hash=0x5678)
    assert a.hash_of_block(0) != b.hash_of_block(0)
    assert a.hash_of_block(0) == _seq(range(32), mm_hash=0x1234) \
        .hash_of_block(0)
