"""Multi-host serving control plane.

TPU-native replacement for the reference's scheduler->worker control
machinery (vllm/distributed shm_broadcast.py ring + broadcast_tensor_dict,
worker_base.py start_worker_execution_loop): on a multi-host pod slice,
every host runs the SAME jitted step over the global mesh (GSPMD handles
ICI/DCN collectives); only host 0 runs the scheduler, and the per-step
batch metadata (token ids, positions, block tables, sampling tensors —
small host arrays) is broadcast over DCN with zmq + msgpack.

Design contract (single-controller continuous batching across hosts):
  host 0:  schedule() -> StepPayload -> broadcast -> run jitted step
  host i:  recv StepPayload            -> run the SAME jitted step
All hosts enter the same executable with identical host inputs, so the
global-mesh computation is consistent; sampled tokens come back through
the jitted step's replicated outputs on every host (no return channel
needed, matching the reference's one-way metadata broadcast).

The TPU pod runtime (jax.distributed) must be initialized by the launcher;
this module only provides the metadata plane + the follower loop.
"""
import pickle
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_SHUTDOWN = b"__shutdown__"


@dataclass
class StepPayload:
    """One step's worth of host inputs (the scheduler->worker wire format
    flattened to numpy, analogue of broadcast_tensor_dict's metadata+tensor
    split, parallel_state.py:477-560)."""
    kind: str  # "prefill" | "prefill_batch" | "decode" | "decode_multi"
    arrays: Dict[str, np.ndarray] = field(default_factory=dict)
    scalars: Dict[str, Any] = field(default_factory=dict)

    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_bytes(cls, data: bytes) -> "StepPayload":
        obj = pickle.loads(data)
        assert isinstance(obj, StepPayload)
        return obj


class HostControlPlane:
    """zmq PUB/SUB broadcast from the driver host to followers over DCN."""

    def __init__(self, rank: int, num_hosts: int, driver_addr: str,
                 port: int = 18515) -> None:
        import zmq
        self.rank = rank
        self.num_hosts = num_hosts
        self._ctx = zmq.Context.instance()
        if rank == 0:
            self._sock = self._ctx.socket(zmq.PUB)
            self._sock.bind(f"tcp://*:{port}")
        else:
            self._sock = self._ctx.socket(zmq.SUB)
            self._sock.connect(f"tcp://{driver_addr}:{port}")
            self._sock.setsockopt(zmq.SUBSCRIBE, b"")

    def broadcast(self, payload: StepPayload) -> None:
        assert self.rank == 0
        self._sock.send(payload.to_bytes())

    def recv(self, timeout_ms: Optional[int] = None
             ) -> Optional[StepPayload]:
        """Followers: next step payload, or None on shutdown/timeout."""
        import zmq
        assert self.rank != 0
        if timeout_ms is not None:
            if not self._sock.poll(timeout_ms):
                return None
        data = self._sock.recv()
        if data == _SHUTDOWN:
            return None
        return StepPayload.from_bytes(data)

    def shutdown(self) -> None:
        if self.rank == 0:
            self._sock.send(_SHUTDOWN)
        self._sock.close(0)


def follower_loop(control: HostControlPlane, runner,
                  cache_engine) -> None:
    """Follower-host execution loop (analogue of the reference
    start_worker_execution_loop, worker_base.py:57-66): replay each
    broadcast step against the local runner so every host enters the same
    global-mesh executable."""
    import jax.numpy as jnp

    from neural_magic_vllm_tpu.layers.attention import AttentionMetadata
    from neural_magic_vllm_tpu.ops.sampling import SamplingTensors
    while True:
        payload = control.recv()
        if payload is None:
            logger.info("follower loop: shutdown")
            return
        a = {k: jnp.asarray(v) for k, v in payload.arrays.items()}
        meta = AttentionMetadata(
            slot_mapping=a["slot_mapping"],
            block_tables=a["block_tables"],
            context_lens=a["context_lens"],
            seq_ids=a.get("seq_ids"),
            q_pos=a.get("q_pos"))
        samp = SamplingTensors(**{
            f: a[f"samp_{f}"] for f in SamplingTensors._fields
            if f"samp_{f}" in a
        })
        fn = runner._get_fn(payload.kind, payload.scalars["num_logprobs"])
        if payload.kind == "decode_sample":
            new_kv, _ = fn(runner.params, cache_engine.kv_caches,
                           a["tokens"], a["positions"], meta, samp, None,
                           None)
        elif payload.kind == "decode_multi":
            new_kv, _ = fn(runner.params, cache_engine.kv_caches,
                           a["tokens"], a["positions"], a["block_tables"],
                           a["valid"], samp, None, None)
        else:  # prefill kinds
            new_kv, _ = fn(runner.params, cache_engine.kv_caches,
                           a["tokens"], a["positions"], meta,
                           a["sample_idx"], samp, None, None)
        cache_engine.kv_caches = new_kv
