"""Physical KV-cache block (reference vllm/block.py:9)."""
from typing import Optional

DEFAULT_LAST_ACCESSED_TIME = -1


class PhysicalTokenBlock:
    """State of one physical block in device or host KV memory."""

    __slots__ = ("device", "block_number", "block_size", "block_hash",
                 "num_hashed_tokens", "ref_count", "last_accessed",
                 "computed")

    def __init__(self, device: str, block_number: int, block_size: int,
                 block_hash: int, num_hashed_tokens: int) -> None:
        self.device = device  # "tpu" | "cpu"
        self.block_number = block_number
        self.block_size = block_size
        self.block_hash = block_hash
        self.num_hashed_tokens = num_hashed_tokens
        self.ref_count = 0
        self.last_accessed = DEFAULT_LAST_ACCESSED_TIME
        self.computed = False

    def __repr__(self) -> str:
        return (f"PhysicalTokenBlock(device={self.device}, "
                f"block_number={self.block_number}, "
                f"num_hashed_tokens={self.num_hashed_tokens}, "
                f"ref_count={self.ref_count}, "
                f"last_accessed={self.last_accessed}, "
                f"computed={self.computed})")


class BlockTable(list):
    """Mapping of logical -> physical blocks for one sequence."""

    def copy(self) -> "BlockTable":
        return BlockTable(self)
