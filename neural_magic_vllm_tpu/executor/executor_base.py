"""Executor contract (reference vllm/executor/executor_base.py)."""
from abc import ABC, abstractmethod
from typing import List, Tuple

from neural_magic_vllm_tpu.sequence import ExecuteModelRequest, SamplerOutput


class ExecutorBase(ABC):

    @abstractmethod
    def determine_num_available_blocks(self) -> Tuple[int, int]:
        ...

    @abstractmethod
    def initialize_cache(self, num_gpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        ...

    @abstractmethod
    def execute_model(self,
                      req: ExecuteModelRequest) -> List[SamplerOutput]:
        ...

    @abstractmethod
    def check_health(self) -> None:
        ...

    def shutdown(self) -> None:
        pass


class ExecutorAsyncBase(ExecutorBase):

    async def execute_model_async(
            self, req: ExecuteModelRequest) -> List[SamplerOutput]:
        raise NotImplementedError

    async def check_health_async(self) -> None:
        self.check_health()
