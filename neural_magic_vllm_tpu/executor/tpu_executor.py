"""Single-host TPU executor (reference vllm/executor/tpu_executor.py, plus
the multi-chip mesh the reference never built — its TPU executor was
single-chip only, tpu_executor.py:15).

With tensor_parallel_size > 1 a jax.sharding.Mesh is created over the local
chips; GSPMD partitions the jitted step across them, so a single process
drives all chips (no per-GPU worker processes / Ray as on the CUDA path).
"""
import asyncio
from typing import List, Optional, Tuple

import jax
import numpy as np

from neural_magic_vllm_tpu.executor.executor_base import ExecutorAsyncBase
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.sequence import ExecuteModelRequest, SamplerOutput
from neural_magic_vllm_tpu.worker.worker import Worker

logger = init_logger(__name__)


def build_mesh(parallel_config) -> Optional[jax.sharding.Mesh]:
    tp = parallel_config.tensor_parallel_size
    pp = parallel_config.pipeline_parallel_size
    dp = parallel_config.data_parallel_size
    if tp * pp * dp <= 1:
        return None
    devices = jax.devices()
    if len(devices) < tp * pp * dp:
        raise ValueError(
            f"Requested data_parallel={dp} x pipeline_parallel={pp} x "
            f"tensor_parallel={tp} but only {len(devices)} devices are "
            "visible.")
    if pp > 1:
        # In-graph GPipe: layer stacks shard over "stage"
        # (parallel/pipeline.py); shard_map is manual over it, "model"
        # stays automatic for GSPMD TP.
        mesh_devices = np.array(devices[:dp * pp * tp]).reshape(dp, pp, tp)
        return jax.sharding.Mesh(mesh_devices, ("data", "stage", "model"))
    mesh_devices = np.array(devices[:dp * tp]).reshape(dp, tp)
    return jax.sharding.Mesh(mesh_devices, ("data", "model"))


class TPUExecutor(ExecutorAsyncBase):

    def __init__(self, model_config, cache_config, parallel_config,
                 scheduler_config, device_config, load_config,
                 lora_config=None, speculative_config=None) -> None:
        self.parallel_config = parallel_config
        self.mesh = build_mesh(parallel_config)
        if self.mesh is not None:
            # GSPMD cannot partition pallas_call: under a multi-chip mesh
            # the XLA reference ops (fully partitionable) are used unless
            # explicitly overridden. shard_map-wrapped kernels are the
            # planned upgrade path.
            import os
            os.environ.setdefault("NMV_TPU_ATTENTION_BACKEND", "jnp")
            os.environ.setdefault("NMV_TPU_QUANT_BACKEND", "ref")
        self.driver_worker = Worker(model_config, cache_config,
                                    scheduler_config, parallel_config,
                                    device_config, load_config,
                                    mesh=self.mesh,
                                    speculative_config=speculative_config,
                                    lora_config=lora_config)
        self.driver_worker.init_device()
        self.driver_worker.load_model()

    def determine_num_available_blocks(self) -> Tuple[int, int]:
        return self.driver_worker.determine_num_available_blocks()

    def initialize_cache(self, num_gpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        self.driver_worker.initialize_cache(num_gpu_blocks, num_cpu_blocks)

    def execute_model(self,
                      req: ExecuteModelRequest) -> List[SamplerOutput]:
        return self.driver_worker.execute_model(req)

    async def execute_model_async(
            self, req: ExecuteModelRequest) -> List[SamplerOutput]:
        return await asyncio.get_event_loop().run_in_executor(
            None, self.execute_model, req)

    def save_state(self, model_dir: str) -> None:
        self.driver_worker.save_state(model_dir)

    def add_lora(self, lora_request) -> bool:
        return self.driver_worker.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        return self.driver_worker.remove_lora(lora_id)

    def list_loras(self):
        return self.driver_worker.list_loras()

    def check_health(self) -> None:
        self.driver_worker.check_health()
