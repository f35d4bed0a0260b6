"""Block evictors for the prefix-caching allocator
(reference vllm/core/evictor_v1.py / evictor_v2.py)."""
import enum
from abc import ABC, abstractmethod
from typing import Dict

from neural_magic_vllm_tpu.core.block import PhysicalTokenBlock


class EvictionPolicy(enum.Enum):
    LRU = enum.auto()


class Evictor(ABC):

    @abstractmethod
    def __contains__(self, block_hash: int) -> bool:
        ...

    @abstractmethod
    def evict(self) -> PhysicalTokenBlock:
        ...

    @abstractmethod
    def add(self, block: PhysicalTokenBlock) -> None:
        ...

    @abstractmethod
    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        ...

    @property
    @abstractmethod
    def num_blocks(self) -> int:
        ...


class LRUEvictor(Evictor):
    """Evict by oldest last_accessed; ties broken by max num_hashed_tokens
    (longest prefix evicted first — it is cheapest to recompute per token
    cached; reference evictor_v2.py:84-102)."""

    def __init__(self):
        self.free_table: Dict[int, PhysicalTokenBlock] = {}

    def __contains__(self, block_hash: int) -> bool:
        return block_hash in self.free_table

    def evict(self) -> PhysicalTokenBlock:
        if len(self.free_table) == 0:
            raise ValueError("No usable cache memory left")
        evicted = next(iter(self.free_table.values()))
        for block in self.free_table.values():
            if evicted.last_accessed < block.last_accessed:
                continue
            if (evicted.last_accessed > block.last_accessed or
                    evicted.num_hashed_tokens < block.num_hashed_tokens):
                evicted = block
        del self.free_table[evicted.block_hash]
        evicted.computed = False
        return evicted

    def add(self, block: PhysicalTokenBlock) -> None:
        self.free_table[block.block_hash] = block

    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        if block_hash not in self.free_table:
            raise ValueError("Attempting to remove block that's not in the evictor")
        block = self.free_table[block_hash]
        del self.free_table[block_hash]
        return block

    @property
    def num_blocks(self) -> int:
        return len(self.free_table)


def make_evictor(policy: EvictionPolicy) -> Evictor:
    if policy == EvictionPolicy.LRU:
        return LRUEvictor()
    raise ValueError(f"Unknown eviction policy: {policy}")
