"""Block space manager: ref-counted paged KV blocks, prefix caching,
copy-on-write, swap.

Semantics follow the reference BlockSpaceManagerV1
(vllm/core/block_manager_v1.py:213): hash-based prefix caching with block
promotion, CoW on append when ref_count > 1, sliding-window block ring,
a 1% watermark to avoid allocation thrash, per-block CPU<->device swap maps.
The implementation is new and TPU-aware: block tables it emits are padded to
static shapes downstream, and the block id space is contiguous [0, num_blocks)
so tables index directly into the paged KV arrays.
"""
from typing import Dict, List, Optional, Sequence as Seq, Set, Tuple

from neural_magic_vllm_tpu.core.block import BlockTable, PhysicalTokenBlock
from neural_magic_vllm_tpu.core.evictor import (EvictionPolicy, Evictor,
                                                make_evictor)
from neural_magic_vllm_tpu.core.interfaces import (AllocStatus,
                                                   BlockSpaceManager)
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.sequence import Sequence, SequenceGroup, \
    SequenceStatus
from neural_magic_vllm_tpu.utils import cdiv

logger = init_logger(__name__)


class BlockAllocatorBase:

    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        raise NotImplementedError

    def free(self, block: PhysicalTokenBlock) -> None:
        raise NotImplementedError

    def get_num_free_blocks(self) -> int:
        raise NotImplementedError

    def get_num_total_blocks(self) -> int:
        raise NotImplementedError

    def contains_block(self, block_hash: int) -> bool:
        raise NotImplementedError

    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        raise NotImplementedError


class CachedBlockAllocator(BlockAllocatorBase):
    """Prefix-caching allocator (reference block_manager_v1.py:64).

    Maintains hash -> block. Freed cached blocks go to the evictor rather
    than a free list, so their contents stay reusable until evicted.
    """

    def __init__(self, device: str, block_size: int, num_blocks: int,
                 eviction_policy: EvictionPolicy = EvictionPolicy.LRU):
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.current_num_blocks = 0
        self.cached_blocks: Dict[int, PhysicalTokenBlock] = {}
        self.evictor: Evictor = make_evictor(eviction_policy)
        self.default_hash_ctr = 0  # unique placeholder hashes

    def _revive_or_lookup(self,
                          block_hash: int) -> Optional[PhysicalTokenBlock]:
        """Find a live or evictor-held block for this hash.

        A hit in the evictor is a prefix-cache revival: the block's KV
        contents are still intact on device, so pulling it back out is a
        free cache hit. It rejoins the live table here.
        """
        if block_hash in self.evictor:
            revived = self.evictor.remove(block_hash)
            assert revived.ref_count == 0 and revived.block_hash == block_hash
            self.cached_blocks[block_hash] = revived
            return revived
        return self.cached_blocks.get(block_hash)

    def _mint_block(self, block_hash: int,
                    num_hashed_tokens: int) -> PhysicalTokenBlock:
        """Produce a writable block: a never-used id while any remain,
        otherwise recycle the evictor's LRU victim under the new hash."""
        if self.current_num_blocks < self.num_blocks:
            self.current_num_blocks += 1
            return PhysicalTokenBlock(device=self.device,
                                      block_number=self.current_num_blocks - 1,
                                      block_size=self.block_size,
                                      block_hash=block_hash,
                                      num_hashed_tokens=num_hashed_tokens)
        victim = self.evictor.evict()
        victim.block_hash = block_hash
        victim.num_hashed_tokens = num_hashed_tokens
        return victim

    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if block_hash is None:
            # Tail blocks that are not yet full get a unique placeholder
            # hash (negative, so it cannot shadow a promoted content hash);
            # update_hash() promotes them once full.
            self.default_hash_ctr += 1
            block_hash = -self.default_hash_ctr
        block = self._revive_or_lookup(block_hash)
        if block is None:
            block = self._mint_block(block_hash, num_hashed_tokens)
            self.cached_blocks[block_hash] = block
        block.ref_count += 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count > 0:
            return
        # Last reference gone: the block leaves the live table but keeps
        # its contents in the evictor, reusable until evicted.
        del self.cached_blocks[block.block_hash]
        self.evictor.add(block)

    def get_num_free_blocks(self) -> int:
        return (self.num_blocks - self.current_num_blocks +
                self.evictor.num_blocks)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return block_hash in self.cached_blocks or block_hash in self.evictor

    def update_hash(self, block_hash: int, block: PhysicalTokenBlock) -> None:
        # Promote a placeholder-hashed block to its real content hash
        # once the block is full (reference block_manager_v1.py:360-423).
        assert not self.contains_block(block_hash)
        old_hash = block.block_hash
        block.block_hash = block_hash
        del self.cached_blocks[old_hash]
        self.cached_blocks[block_hash] = block


class UncachedBlockAllocator(BlockAllocatorBase):
    """Plain free-list allocator (reference block_manager_v1.py:154)."""

    def __init__(self, device: str, block_size: int, num_blocks: int):
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.free_blocks: List[PhysicalTokenBlock] = [
            PhysicalTokenBlock(device=device,
                               block_number=i,
                               block_size=block_size,
                               block_hash=-1,
                               num_hashed_tokens=0)
            for i in range(num_blocks)
        ]

    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if not self.free_blocks:
            raise ValueError("Out of memory! No free blocks are available.")
        block = self.free_blocks.pop()
        block.ref_count = 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            self.free_blocks.append(block)

    def get_num_free_blocks(self) -> int:
        return len(self.free_blocks)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return False

    def update_hash(self, block_hash: int, block: PhysicalTokenBlock) -> None:
        raise NotImplementedError(
            "Invalid codepath for uncached block allocator.")


def _make_cached_allocator(device: str, block_size: int, num_blocks: int):
    """Prefer the native C++ prefix-caching allocator (csrc/
    block_allocator.cc — O(log n) LRU eviction vs the Python linear scan);
    NMV_TPU_NATIVE_ALLOCATOR=0 forces Python, =1 requires native."""
    import os
    mode = os.getenv("NMV_TPU_NATIVE_ALLOCATOR", "auto")
    if mode != "0":
        from neural_magic_vllm_tpu.core import native_allocator
        if native_allocator.is_available():
            return native_allocator.NativeCachedBlockAllocator(
                device, block_size, num_blocks)
        if mode == "1":
            raise RuntimeError("NMV_TPU_NATIVE_ALLOCATOR=1 but the native "
                               "allocator could not be built")
    return CachedBlockAllocator(device, block_size, num_blocks)


class PagedBlockSpaceManager(BlockSpaceManager):
    """The production block manager (reference BlockSpaceManagerV1)."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks

        if enable_caching and sliding_window is not None:
            raise NotImplementedError(
                "Sliding window is not allowed with prefix caching enabled!")

        self.block_sliding_window: Optional[int] = None
        if sliding_window is not None:
            # +1: when the window is block-aligned, the next token still
            # attends to a token in the oldest block until it rolls off.
            self.block_sliding_window = cdiv(sliding_window, block_size) + 1

        self.watermark = watermark
        assert watermark >= 0.0
        self.enable_caching = enable_caching
        self.watermark_blocks = int(watermark * num_gpu_blocks)

        if enable_caching:
            self.gpu_allocator: BlockAllocatorBase = \
                _make_cached_allocator("tpu", block_size, num_gpu_blocks)
            self.cpu_allocator: BlockAllocatorBase = \
                _make_cached_allocator("cpu", block_size, num_cpu_blocks)
        else:
            self.gpu_allocator = UncachedBlockAllocator(
                "tpu", block_size, num_gpu_blocks)
            self.cpu_allocator = UncachedBlockAllocator(
                "cpu", block_size, num_cpu_blocks)
        # seq_id -> BlockTable
        self.block_tables: Dict[int, BlockTable] = {}

    # --- allocation --------------------------------------------------------
    def _get_seq_num_required_blocks(self, seq: Optional[Sequence]) -> int:
        return 0 if seq is None else cdiv(seq.get_len(), self.block_size)

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_required_blocks = self._get_seq_num_required_blocks(seq)
        if self.block_sliding_window is not None:
            num_required_blocks = min(num_required_blocks,
                                      self.block_sliding_window)
        num_free_gpu_blocks = self.gpu_allocator.get_num_free_blocks()
        if (self.num_total_gpu_blocks - num_required_blocks
                < self.watermark_blocks):
            return AllocStatus.NEVER
        if num_free_gpu_blocks - num_required_blocks >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        # All WAITING seqs of a group share the same prompt -> same blocks.
        wait_seqs = seq_group.get_seqs(status=SequenceStatus.WAITING)
        seq = wait_seqs[0]
        num_prompt_blocks = self._get_seq_num_required_blocks(seq)

        block_table: BlockTable = BlockTable()
        for logical_idx in range(num_prompt_blocks):
            if (self.block_sliding_window is not None
                    and logical_idx >= self.block_sliding_window):
                # Ring reuse: the table repeats the block, but ref counting
                # treats each distinct block once per sequence (free()
                # releases only the last window's worth of distinct blocks).
                block = block_table[logical_idx % self.block_sliding_window]
                block.ref_count = seq_group.num_seqs()
            elif (self.enable_caching
                  and self._is_block_full_at(seq, logical_idx)):
                block = self.gpu_allocator.allocate(
                    seq.hash_of_block(logical_idx),
                    seq.num_hashed_tokens_of_block(logical_idx))
                # Cached blocks may be shared ACROSS requests: allocate()
                # already counted this group's reference, so only add the
                # group's extra seqs — overwriting would clobber other
                # requests' shares (double-free on release).
                if seq_group.num_seqs() > 1:
                    block.ref_count += seq_group.num_seqs() - 1
            else:
                block = self.gpu_allocator.allocate()
                block.ref_count = seq_group.num_seqs()
            block_table.append(block)

        for s in wait_seqs:
            self.block_tables[s.seq_id] = block_table.copy()

    def _is_block_full_at(self, seq: Sequence, logical_idx: int) -> bool:
        return seq.get_len() >= (logical_idx + 1) * self.block_size

    # --- decode append ------------------------------------------------------
    def can_append_slots(self, seq_group: SequenceGroup,
                         num_lookahead_slots: int = 0) -> bool:
        # Heuristic: one new block per running seq per lookahead slot + 1
        # is the worst case (reference block_manager_v1.py:425).
        num_free_gpu_blocks = self.gpu_allocator.get_num_free_blocks()
        num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return num_seqs * (1 + num_lookahead_slots) <= num_free_gpu_blocks

    def _promote_last_block(self, seq: Sequence,
                            last_block: PhysicalTokenBlock
                            ) -> PhysicalTokenBlock:
        assert self.enable_caching
        new_hash = seq.hash_of_block(
            (seq.get_len() - 1) // self.block_size)
        if self.gpu_allocator.contains_block(new_hash):
            # Content already cached elsewhere; swap to the cached block.
            self.gpu_allocator.free(last_block)
            return self.gpu_allocator.allocate(new_hash)
        self.gpu_allocator.update_hash(new_hash, last_block)
        return last_block

    def _is_last_block_full(self, seq: Sequence) -> bool:
        return seq.get_len() % self.block_size == 0

    def _maybe_promote_last_block(self, seq: Sequence,
                                  last_block: PhysicalTokenBlock
                                  ) -> PhysicalTokenBlock:
        if self._is_last_block_full(seq):
            return self._promote_last_block(seq, last_block)
        return last_block

    def _allocate_last_physical_block(self,
                                      seq: Sequence) -> PhysicalTokenBlock:
        if not self.enable_caching:
            return self.gpu_allocator.allocate()
        block_hash: Optional[int] = None
        if self._is_last_block_full(seq):
            block_hash = seq.hash_of_block(
                (seq.get_len() - 1) // self.block_size)
        num_hashed_tokens = seq.data.get_len() if block_hash is not None \
            else 0
        new_block = self.gpu_allocator.allocate(block_hash, num_hashed_tokens)
        if block_hash is None:
            assert new_block.ref_count == 1
        return new_block

    def append_slots(self, seq: Sequence,
                     num_lookahead_slots: int = 0) -> List[Tuple[int, int]]:
        """Allocate a slot for seq's newly appended token(s). Returns
        (src_block, dst_block) copy-on-write pairs."""
        logical_blocks_needed = cdiv(seq.get_len() + num_lookahead_slots,
                                     self.block_size)
        block_table = self.block_tables[seq.seq_id]

        # Grow the table if new logical blocks are needed (decode adds at
        # most one; lookahead slots may add more).
        if len(block_table) < logical_blocks_needed:
            while len(block_table) < logical_blocks_needed:
                if (self.block_sliding_window
                        and len(block_table) >= self.block_sliding_window):
                    # ring reuse (reference block_manager_v1.py:438-442); no
                    # extra ref: free() only sees the last window's slots.
                    block_table.append(block_table[len(block_table) %
                                                   self.block_sliding_window])
                else:
                    block_table.append(
                        self._allocate_last_physical_block(seq))
            return []

        # Appending into the existing last block.
        last_block = block_table[-1]
        assert last_block.device == "tpu"
        if last_block.ref_count == 1:
            if self.enable_caching:
                maybe_new = self._maybe_promote_last_block(seq, last_block)
                block_table[-1] = maybe_new
            return []
        # Copy on write (reference block_manager_v1.py:453-469).
        new_block = self._allocate_last_physical_block(seq)
        block_table[-1] = new_block
        self.gpu_allocator.free(last_block)
        return [(last_block.block_number, new_block.block_number)]

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        if parent_seq.seq_id not in self.block_tables:
            return
        src = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = src.copy()
        for block in set(src):
            block.ref_count += 1

    # --- swap ---------------------------------------------------------------
    def _get_physical_blocks(
            self, seq_group: SequenceGroup) -> List[PhysicalTokenBlock]:
        blocks: Set[PhysicalTokenBlock] = set()
        for seq in seq_group.get_seqs():
            if seq.is_finished():
                continue
            if seq.seq_id in self.block_tables:
                blocks.update(self.block_tables[seq.seq_id])
        return list(blocks)

    def can_swap_in(self, seq_group: SequenceGroup,
                    num_lookahead_slots: int = 0) -> AllocStatus:
        blocks = self._get_physical_blocks(seq_group)
        num_swapped_seqs = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
        num_free_blocks = self.gpu_allocator.get_num_free_blocks()
        # one extra block per seq for the next appended token
        num_required = len(blocks) + num_swapped_seqs \
            + num_lookahead_slots * num_swapped_seqs
        if self.gpu_allocator.get_num_total_blocks() < num_required:
            return AllocStatus.NEVER
        if num_free_blocks - num_required >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def swap_in(self, seq_group: SequenceGroup) -> List[Tuple[int, int]]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            new_table: BlockTable = BlockTable()
            for cpu_block in self.block_tables[seq.seq_id]:
                if cpu_block in mapping:
                    gpu_block = mapping[cpu_block]
                    gpu_block.ref_count += 1
                else:
                    gpu_block = self.gpu_allocator.allocate(
                        cpu_block.block_hash, cpu_block.num_hashed_tokens)
                    mapping[cpu_block] = gpu_block
                new_table.append(gpu_block)
                self.cpu_allocator.free(cpu_block)
            self.block_tables[seq.seq_id] = new_table
        return [(cpu.block_number, gpu.block_number)
                for cpu, gpu in mapping.items()]

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> List[Tuple[int, int]]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            new_table: BlockTable = BlockTable()
            for gpu_block in self.block_tables[seq.seq_id]:
                if gpu_block in mapping:
                    cpu_block = mapping[gpu_block]
                    cpu_block.ref_count += 1
                else:
                    cpu_block = self.cpu_allocator.allocate(
                        gpu_block.block_hash, gpu_block.num_hashed_tokens)
                    mapping[gpu_block] = cpu_block
                new_table.append(cpu_block)
                self.gpu_allocator.free(gpu_block)
            self.block_tables[seq.seq_id] = new_table
        return [(gpu.block_number, cpu.block_number)
                for gpu, cpu in mapping.items()]

    # --- free / queries ------------------------------------------------------
    def _free_block_table(self, block_table: BlockTable) -> None:
        blocks_to_free = (block_table[-self.block_sliding_window:]
                          if self.block_sliding_window is not None
                          else block_table)
        seen: Set[int] = set()
        for block in blocks_to_free:
            if id(block) in seen:
                continue
            seen.add(id(block))
            if block.device == "tpu":
                self.gpu_allocator.free(block)
            else:
                self.cpu_allocator.free(block)

    def free(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return
        block_table = self.block_tables[seq.seq_id]
        self._free_block_table(block_table)
        del self.block_tables[seq.seq_id]

    def reset(self) -> None:
        for table in list(self.block_tables.values()):
            self._free_block_table(table)
        self.block_tables.clear()

    def get_block_table(self, seq: Sequence) -> List[int]:
        return [b.block_number for b in self.block_tables[seq.seq_id]]

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()

    def access_all_blocks_in_seq(self, seq: Sequence,
                                 access_time: float) -> None:
        if self.enable_caching and seq.seq_id in self.block_tables:
            for block in self.block_tables[seq.seq_id]:
                block.last_accessed = access_time

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return
        # Last (partial) block is never marked computed.
        max_full_block = seq.get_len() // self.block_size - 1
        block_table = self.block_tables[seq.seq_id]
        for i in range(max_full_block, -1, -1):
            if i >= len(block_table):
                continue
            if block_table[i].computed:
                break
            block_table[i].computed = True

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        if seq.seq_id not in self.block_tables:
            return []
        block_table = self.block_tables[seq.seq_id]
        # The last block is excluded: even if computed, the scheduler must
        # re-run at least one token so sampling has a query position.
        computed = []
        for b in block_table[:-1]:
            if not b.computed:
                break
            computed.append(b.block_number)
        return computed

    def get_common_computed_block_ids(self,
                                      seqs: List[Sequence]) -> List[int]:
        if not self.enable_caching:
            return []
        ids_list = [self.get_all_computed_blocks(seq) for seq in seqs]
        if not ids_list:
            return []
        common = ids_list[0]
        for ids in ids_list[1:]:
            n = 0
            for a, b in zip(common, ids):
                if a != b:
                    break
                n += 1
            common = common[:n]
        return common

    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        if self.enable_caching:
            for seq in seq_group.get_seqs():
                self.compute_full_blocks_in_seq(seq)
