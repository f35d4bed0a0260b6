"""TPU worker: owns the model runner + cache engine on one host
(analogue of reference vllm/worker/worker.py + tpu_worker.py)."""
import os
from typing import List, Optional, Tuple

import jax

from neural_magic_vllm_tpu import envs
from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.sequence import ExecuteModelRequest, SamplerOutput
from neural_magic_vllm_tpu.utils import cdiv, device_hbm_bytes
from neural_magic_vllm_tpu.worker.cache_engine import (
    CacheEngine, get_kv_cache_dtype, kv_cache_bytes_per_block)
from neural_magic_vllm_tpu.worker.model_runner import TPUModelRunner

logger = init_logger(__name__)

_DEFAULT_CPU_TEST_BLOCKS = 512


class Worker:

    def __init__(self, model_config, cache_config, scheduler_config,
                 parallel_config, device_config, load_config,
                 mesh=None, speculative_config=None,
                 lora_config=None) -> None:
        self.model_config = model_config
        self.cache_config = cache_config
        self.scheduler_config = scheduler_config
        self.parallel_config = parallel_config
        self.device_config = device_config
        self.load_config = load_config
        self.mesh = mesh
        self.model_runner = TPUModelRunner(
            model_config, cache_config, scheduler_config, parallel_config,
            device_config, load_config, mesh,
            speculative_config=speculative_config, lora_config=lora_config)
        self.cache_engine: Optional[CacheEngine] = None

    # --- init ------------------------------------------------------------------
    def init_device(self) -> None:
        # Persistent XLA compile cache (reference tpu_worker.py:101):
        # first-run warmup compiles are reused across restarts. Disabled
        # under the axon-tunneled device unless the user points
        # NMV_TPU_XLA_CACHE_PATH somewhere explicitly: cache-HIT
        # deserialization through the tunnel stalls for many minutes per
        # executable (measured round 4: fresh compile of the 8B prefill
        # bucket 168 s, warm-cache "hit" of the same bucket >600 s and
        # killed), so a populated cache makes every restart slower, not
        # faster.
        if jax.default_backend() in ("tpu", "axon"):
            on_axon_tunnel = (
                jax.default_backend() == "axon"
                or "axon" in os.environ.get("JAX_PLATFORMS", "").lower())
            explicit = "NMV_TPU_XLA_CACHE_PATH" in os.environ
            if on_axon_tunnel and not explicit:
                logger.info(
                    "Skipping persistent XLA compile cache on the axon "
                    "tunnel (hit-deserialization stalls; set "
                    "NMV_TPU_XLA_CACHE_PATH to force).")
                return
            cache_dir = envs.NMV_TPU_XLA_CACHE_PATH
            try:
                os.makedirs(cache_dir, exist_ok=True)
                from jax.experimental.compilation_cache import \
                    compilation_cache
                compilation_cache.set_cache_dir(cache_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("Could not set XLA compile cache: %s", e)

    def load_model(self) -> None:
        self.model_runner.load_model()

    # --- memory profiling -------------------------------------------------------
    def _per_chip_kv_heads(self, mc) -> int:
        """Physical kv heads stored per chip. Must mirror
        model_runner.kv_sharding(): the head axis shards over TP only when
        it divides evenly; otherwise the cache REPLICATES (every chip
        stores all heads), so sizing must not divide."""
        tp = self.parallel_config.tensor_parallel_size
        total = mc.get_total_num_kv_heads()
        return total // tp if total % tp == 0 else total

    def _block_bytes(self, per_chip: bool = True) -> int:
        """Bytes per paged block. per_chip=True sizes against one chip's
        HBM (kv heads per kv_sharding, layers / pp — each stage holds
        layers/pp of every block); per_chip=False gives the GLOBAL block
        footprint, which is what the single-controller host actually
        allocates for the CPU swap pool (cache_engine.py cpu_shape)."""
        kv_dtype = get_kv_cache_dtype(self.cache_config.cache_dtype,
                                      self.model_config.dtype)
        pp = self.parallel_config.pipeline_parallel_size if per_chip else 1

        def one(mc):
            heads = self._per_chip_kv_heads(mc) if per_chip \
                else mc.get_total_num_kv_heads()
            return kv_cache_bytes_per_block(
                self.cache_config.block_size, heads, mc.get_head_size(),
                cdiv(mc.get_num_layers(self.parallel_config), pp),
                kv_dtype)

        total = one(self.model_config)
        dmc = self.model_runner.draft_model_config
        if dmc is not None:
            # the draft cache shares block NUMBERS with the target's tables,
            # so it is sized with the same block count
            total += one(dmc)
        return total

    def determine_num_available_blocks(self) -> Tuple[int, int]:
        """Profile a worst-case prefill and size the KV cache from leftover
        HBM (reference worker.py:155-198 / tpu_worker.py:107-141)."""
        block_bytes = self._block_bytes()
        num_cpu_blocks = int(self.cache_config.swap_space_bytes //
                             self._block_bytes(per_chip=False))
        override = self.cache_config.num_gpu_blocks_override
        if override is not None:
            return override, num_cpu_blocks

        dev = jax.devices()[0]
        total = device_hbm_bytes(dev)
        if total is None:
            logger.info("No device memory stats (CPU backend?); using "
                        "default %d device blocks", _DEFAULT_CPU_TEST_BLOCKS)
            return _DEFAULT_CPU_TEST_BLOCKS, num_cpu_blocks

        peak = self.model_runner.profile_peak_bytes()
        if peak < 0:
            # PJRT client exposes no memory_stats (seen on tunneled
            # plugins): estimate peak as resident params + a prefill
            # activation margin (logits at the widest bucket dominate).
            peak = self.model_runner.param_bytes() + (1536 << 20)
            logger.info(
                "No memory_stats on %s; estimated peak %.2fGiB from "
                "param bytes", dev.device_kind, peak / 2**30)
        usable = int(total * self.cache_config.hbm_utilization) - peak
        num_blocks = max(usable // block_bytes, 0)
        # round down to a multiple of 8 (reference tpu_worker.py:135)
        num_blocks = (num_blocks // 8) * 8
        logger.info(
            "HBM total=%.2fGiB peak=%.2fGiB -> %d KV blocks "
            "(%d tokens), %d CPU swap blocks", total / 2**30, peak / 2**30,
            num_blocks, num_blocks * self.cache_config.block_size,
            num_cpu_blocks)
        return num_blocks, num_cpu_blocks

    def initialize_cache(self, num_gpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        self.cache_config.num_gpu_blocks = num_gpu_blocks
        self.cache_config.num_cpu_blocks = num_cpu_blocks
        kv_dtype = get_kv_cache_dtype(self.cache_config.cache_dtype,
                                      self.model_config.dtype)
        self.cache_engine = CacheEngine(
            num_layers=self.model_config.get_num_layers(
                self.parallel_config),
            # GLOBAL kv-head count: under GSPMD the cache array keeps its
            # global shape and the kv-head axis is sharded by kv_sharding()
            num_kv_heads=self.model_config.get_total_num_kv_heads(),
            head_dim=self.model_config.get_head_size(),
            block_size=self.cache_config.block_size,
            num_device_blocks=num_gpu_blocks,
            num_cpu_blocks=num_cpu_blocks,
            kv_dtype=kv_dtype,
            sharding=self.model_runner.kv_sharding(),
            extra_state=self.model_runner.build_state_arrays())
        dmc = self.model_runner.draft_model_config
        if dmc is not None:
            self.model_runner.draft_cache_engine = CacheEngine(
                num_layers=dmc.get_num_layers(self.parallel_config),
                num_kv_heads=dmc.get_total_num_kv_heads(),
                head_dim=dmc.get_head_size(),
                block_size=self.cache_config.block_size,
                num_device_blocks=num_gpu_blocks,
                num_cpu_blocks=0, kv_dtype=kv_dtype,
                sharding=self.model_runner.draft_kv_sharding())
        warm = not self.model_config.enforce_eager
        # Warmup is a TPU concern (AOT bucket lattice), but adaptive
        # fused-K needs the warmup measurements wherever it is enabled
        # (keeps the policy testable on the CPU backend).
        if warm and (jax.default_backend() in ("tpu", "axon")
                     or self.scheduler_config.fused_dispatch_target_ms > 0):
            self.model_runner.warmup(
                self.cache_engine,
                full=self.scheduler_config.full_warmup)

    # --- execution ---------------------------------------------------------------
    def execute_model(
            self,
            req: ExecuteModelRequest) -> List[SamplerOutput]:
        assert self.cache_engine is not None
        if req.finished_request_ids or req.finished_seq_ids:
            self.model_runner.purge_finished(req.finished_request_ids,
                                             req.finished_seq_ids)
        if req.blocks_to_swap_out and \
                getattr(self.model_runner.model, "has_state", False):
            raise NotImplementedError(
                "CPU swap is unsupported for stateful (mamba) models; use "
                "RECOMPUTE preemption (--preemption-mode recompute).")
        if req.blocks_to_swap_out:
            self.cache_engine.swap_out(req.blocks_to_swap_out)
        if req.blocks_to_swap_in:
            self.cache_engine.swap_in(req.blocks_to_swap_in)
        if req.blocks_to_copy:
            self.cache_engine.copy(req.blocks_to_copy)
        if not req.seq_group_metadata_list:
            return []
        return self.model_runner.execute_model(req.seq_group_metadata_list,
                                               self.cache_engine,
                                               num_waiting=req.num_waiting)

    def save_state(self, model_dir: str) -> None:
        self.model_runner.save_state(model_dir)

    def add_lora(self, lora_request) -> bool:
        mgr = self.model_runner.lora_manager
        return mgr.add_lora(lora_request) if mgr else False

    def remove_lora(self, lora_id: int) -> bool:
        mgr = self.model_runner.lora_manager
        return mgr.remove_lora(lora_id) if mgr else False

    def list_loras(self):
        mgr = self.model_runner.lora_manager
        return mgr.list_loras() if mgr else []

    # Multi-host: the launcher installs a callable that raises
    # HostDeadError when a follower's pongs go stale (multihost_serve.py).
    follower_health_check = None

    def check_health(self) -> None:
        # in-process worker is alive by construction; followers are not
        if self.follower_health_check is not None:
            self.follower_health_check()
