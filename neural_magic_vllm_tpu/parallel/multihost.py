"""Multi-host serving control plane.

TPU-native replacement for the reference's scheduler->worker control
machinery (vllm/distributed shm_broadcast.py ring + broadcast_tensor_dict,
worker_base.py start_worker_execution_loop): on a multi-host pod slice,
every host runs the SAME jitted step over the global mesh (GSPMD handles
ICI/DCN collectives); only host 0 runs the scheduler, and the per-step
batch metadata (token ids, positions, block tables, sampling tensors —
small host arrays) is broadcast over DCN with zmq, using a fixed
length-prefixed json+raw-bytes schema (never pickle).

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
import json
import struct
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_SHUTDOWN = b"__shutdown__"
_HEARTBEAT = b"__hb__"


class HostDeadError(RuntimeError):
    """A peer host stopped answering the control plane. Raised instead of
    letting the next XLA collective deadlock (reference role: Ray actor /
    process liveness checks, multiproc_gpu_executor.py:136-147)."""

# Wire format: a fixed schema, NOT pickle — a DCN control plane must never
# deserialize arbitrary objects. Layout:
#   <u32 header_len> <json header> <raw array bytes, concatenated>
# header = {"kind", "scalars" (json-safe), "arrays": [[name, dtype, shape]]}
_DTYPES = {"int32", "int64", "float32", "float64", "uint32", "bool",
           "bfloat16", "uint16", "uint8"}


@dataclass
class StepPayload:
    """One step's worth of host inputs (the scheduler->worker wire format
    flattened to numpy, analogue of broadcast_tensor_dict's metadata+tensor
    split, parallel_state.py:477-560)."""
    kind: str  # "prefill" | "prefill_batch" | "decode" | "decode_multi"
    arrays: Dict[str, np.ndarray] = field(default_factory=dict)
    scalars: Dict[str, Any] = field(default_factory=dict)

    def to_bytes(self) -> bytes:
        names = sorted(self.arrays)
        metas = []
        blobs = []
        for n in names:
            src = np.asarray(self.arrays[n])
            a = np.ascontiguousarray(src)
            dt = "bfloat16" if a.dtype.name == "bfloat16" else a.dtype.name
            assert dt in _DTYPES, dt
            # note list(src.shape), not a.shape: ascontiguousarray promotes
            # 0-d scalars to (1,), but scalar-vs-vector is a different jit
            # signature (dynamic_slice indices must stay 0-d)
            metas.append([n, dt, list(src.shape)])
            blobs.append(a.tobytes())
        head = json.dumps({
            "kind": self.kind,
            "scalars": self.scalars,
            "arrays": metas
        }).encode()
        return b"".join([struct.pack("<I", len(head)), head] + blobs)

    @classmethod
    def from_bytes(cls, data: bytes) -> "StepPayload":
        (hlen, ) = struct.unpack_from("<I", data, 0)
        head = json.loads(data[4:4 + hlen].decode())
        if not isinstance(head.get("kind"), str):
            raise ValueError("malformed StepPayload header")
        off = 4 + hlen
        arrays: Dict[str, np.ndarray] = {}
        for name, dt, shape in head["arrays"]:
            if dt not in _DTYPES:
                raise ValueError(f"disallowed dtype {dt!r}")
            if dt == "bfloat16":
                import ml_dtypes
                dtype = np.dtype(ml_dtypes.bfloat16)
            else:
                dtype = np.dtype(dt)
            n = int(np.prod(shape)) if shape else 1
            nbytes = n * dtype.itemsize
            arrays[name] = np.frombuffer(
                data, dtype=dtype, count=n, offset=off).reshape(shape)
            off += nbytes
        # json cannot carry tuples: _get_fn cache keys use tuple scalars
        scalars = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in head["scalars"].items()
        }
        return cls(kind=head["kind"], arrays=arrays, scalars=scalars)


class HostControlPlane:
    """zmq broadcast from the driver host to followers over DCN, plus a
    liveness lane: PUB/SUB carries step payloads + idle heartbeats
    (driver -> followers); a PUSH/PULL back-channel on port+1 carries
    follower pongs so the driver's check_health() detects a dead follower
    BEFORE entering a collective that would deadlock on it."""

    def __init__(self, rank: int, num_hosts: int, driver_addr: str,
                 port: int = 18515, heartbeat_s: float = 0.0) -> None:
        import zmq
        self.rank = rank
        self.num_hosts = num_hosts
        self.heartbeat_s = heartbeat_s
        self._ctx = zmq.Context.instance()
        self._lock = threading.Lock()  # PUB socket shared w/ hb thread
        self._last_send = time.monotonic()
        self.shutdown_seen = False  # followers: clean shutdown vs timeout
        self._hb_thread: Optional[threading.Thread] = None
        self._closing = False
        if rank == 0:
            self._sock = self._ctx.socket(zmq.PUB)
            self._sock.bind(f"tcp://*:{port}")
            self._pong = self._ctx.socket(zmq.PULL)
            self._pong.bind(f"tcp://*:{port + 1}")
            self._last_pong: Dict[int, float] = {}
            if heartbeat_s > 0:
                self._hb_thread = threading.Thread(
                    target=self._heartbeat_loop, daemon=True)
                self._hb_thread.start()
        else:
            self._sock = self._ctx.socket(zmq.SUB)
            self._sock.connect(f"tcp://{driver_addr}:{port}")
            self._sock.setsockopt(zmq.SUBSCRIBE, b"")
            self._pong = self._ctx.socket(zmq.PUSH)
            self._pong.connect(f"tcp://{driver_addr}:{port + 1}")

    # --- driver side -----------------------------------------------------
    def _heartbeat_loop(self) -> None:
        """Keep followers' liveness timers fed while the engine is idle
        (payload broadcasts reset the timer too)."""
        while not self._closing:
            time.sleep(self.heartbeat_s / 2)
            with self._lock:
                if self._closing:
                    return
                if time.monotonic() - self._last_send >= self.heartbeat_s / 2:
                    self._sock.send(_HEARTBEAT)
                    self._last_send = time.monotonic()

    def broadcast(self, payload: StepPayload) -> None:
        assert self.rank == 0
        with self._lock:
            self._sock.send(payload.to_bytes())
            self._last_send = time.monotonic()

    def check_followers(self, timeout_s: float) -> None:
        """Driver health check: raise HostDeadError if a follower that was
        alive has not ponged within timeout_s. Called from the engine's
        check_health chain (reference llm_engine.py:1087-1090)."""
        assert self.rank == 0
        now = time.monotonic()
        while self._pong.poll(0):
            msg = self._pong.recv()
            try:
                r = int(msg)
            except ValueError:
                continue
            self._last_pong[r] = now
        for r, t in self._last_pong.items():
            if now - t > timeout_s:
                raise HostDeadError(
                    f"follower host {r} silent for {now - t:.1f}s "
                    f"(> {timeout_s}s); failing fast instead of "
                    "deadlocking the next collective")

    # --- follower side ---------------------------------------------------
    def _send_pong(self) -> None:
        self._pong.send(str(self.rank).encode())

    def recv(self, timeout_ms: Optional[int] = None
             ) -> Optional[StepPayload]:
        """Followers: next step payload, or None on shutdown/timeout.
        Heartbeats refresh the timeout window without returning."""
        assert self.rank != 0
        deadline = None if timeout_ms is None else (
            time.monotonic() + timeout_ms / 1e3)
        while True:
            if deadline is not None:
                remaining_ms = int((deadline - time.monotonic()) * 1e3)
                if remaining_ms <= 0 or not self._sock.poll(remaining_ms):
                    return None
            data = self._sock.recv()
            if data == _SHUTDOWN:
                self.shutdown_seen = True
                return None
            if data == _HEARTBEAT:
                if deadline is not None:
                    deadline = time.monotonic() + timeout_ms / 1e3
                self._send_pong()
                continue
            return StepPayload.from_bytes(data)

    def shutdown(self) -> None:
        self._closing = True
        if self.rank == 0:
            with self._lock:
                self._sock.send(_SHUTDOWN)
        self._sock.close(0)
        self._pong.close(0)


def follower_step(payload: StepPayload, runner, cache_engine) -> None:
    """Replay ONE broadcast dispatch against the local runner, mirroring
    exactly the driver's jitted call in worker/model_runner.py (same kind,
    same arrays) so every host enters the same global-mesh executable."""
    import jax.numpy as jnp

    from neural_magic_vllm_tpu.layers.attention import AttentionMetadata
    from neural_magic_vllm_tpu.ops.sampling import SamplingTensors

    a = {k: jnp.asarray(v) for k, v in payload.arrays.items()}
    kind = payload.kind
    nlp = payload.scalars["num_logprobs"]
    samp = None
    if "samp_temperature" in a:
        samp = SamplingTensors(**{
            f: a[f"samp_{f}"] for f in SamplingTensors._fields
            if f"samp_{f}" in a
        })
    # optional extras that change the jit signature: multimodal features
    # and mamba state slots must replay exactly as dispatched
    mm = (a["mm_flat"], a["mm_idx"]) if "mm_flat" in a else None
    ss = a.get("state_slots")
    params, kv = runner.params, cache_engine.kv_caches
    if kind == "spec_draft":
        # fused draft-propose + verify + rejection (two KV caches)
        dce = runner.draft_cache_engine
        out = runner._get_spec_fn()(
            params, runner.draft_params, kv, dce.kv_caches,
            a["cu_tok"], a["cu_pos"], a["cu_valid"], a["last_tokens"],
            a["positions"], a["block_tables"], a["valid"],
            a["temperature"], a["keys"])
        cache_engine.kv_caches = out[0]
        dce.kv_caches = out[1]
        return
    fn = runner._get_fn(kind, nlp)
    # LoRA serving (all remaining kinds take (lora, lidx) args): mirror
    # the driver's slot table (adapters load from their checkpoint path,
    # which must be reachable on every host — the reference's per-worker
    # adapter loading contract), then pass the stacks so all hosts enter
    # the same executable. The draft/speculator kinds never carry LoRA
    # state (adapters apply to the target model; its scoring dispatches
    # are decode_logits/_hidden, which do).
    lora = lidx = None
    if kind not in ("mlp_propose", "draft_prefill"):
        if runner.lora_manager is not None:
            if "lora_lidx" not in a:
                raise RuntimeError(
                    "driver dispatched without LoRA state but this "
                    "follower has LoRA serving enabled (config mismatch "
                    "across hosts)")
            runner.lora_manager.apply_slot_assignment(
                payload.scalars.get("lora_slots") or [])
            lora = runner.lora_manager.lora_params()
            lidx = a["lora_lidx"]
        elif "lora_lidx" in a:
            raise RuntimeError(
                "driver dispatched LoRA state but this follower has LoRA "
                "serving disabled (config mismatch across hosts)")
    if kind == "mlp_propose":
        fn(runner.mlp_spec_params, a["last_tokens"], a["hidden"])
        return
    if kind == "draft_prefill":
        dce = runner.draft_cache_engine
        if "seq_ids" in a:  # ragged batched-prefill segment metadata
            meta = AttentionMetadata(
                slot_mapping=a["slot_mapping"],
                block_tables=jnp.zeros((1, 4), jnp.int32),
                context_lens=jnp.zeros((1, ), jnp.int32),
                seq_ids=a["seq_ids"], q_pos=a["q_pos"])
        else:
            meta = AttentionMetadata(slot_mapping=a["slot_mapping"],
                                     block_tables=a["block_tables"],
                                     context_lens=a["context_lens"])
        dce.kv_caches = fn(runner.draft_params, dce.kv_caches,
                           a["tokens"], a["positions"], meta)
        return
    if kind == "prefill_batch":
        meta = AttentionMetadata(
            slot_mapping=a["slot_mapping"],
            block_tables=jnp.zeros((1, 4), jnp.int32),  # unused; matches
            context_lens=jnp.zeros((1, ), jnp.int32),  # the driver's dummy
            seq_ids=a["seq_ids"], q_pos=a["q_pos"])
        new_kv, _ = fn(params, kv, a["tokens"], a["positions"], meta,
                       a["sample_idx"], samp, lora, lidx)
    elif kind in ("prefill_sample", "prefill_logits", "prefill_hidden"):
        meta = AttentionMetadata(slot_mapping=a["slot_mapping"],
                                 block_tables=a["block_tables"],
                                 context_lens=a["context_lens"],
                                 state_slots=ss)
        if kind == "prefill_sample":
            new_kv, _ = fn(params, kv, a["tokens"], a["positions"], meta,
                           a["sample_idx"], samp, lora, lidx, mm)
        else:
            new_kv, _ = fn(params, kv, a["tokens"], a["positions"], meta,
                           lora, lidx, mm)
    elif kind in ("decode_sample", "decode_logits",
                  "decode_logits_hidden", "decode_spec_verify"):
        meta = AttentionMetadata(slot_mapping=a["slot_mapping"],
                                 block_tables=a["block_tables"],
                                 context_lens=a["context_lens"],
                                 state_slots=ss)
        if kind == "decode_sample":
            new_kv, _ = fn(params, kv, a["tokens"], a["positions"], meta,
                           samp, lora, lidx)
        elif kind == "decode_spec_verify":
            new_kv, _ = fn(params, kv, a["tokens"], a["positions"], meta,
                           a["proposals"], a["plen"], lora, lidx)
        else:
            new_kv, _ = fn(params, kv, a["tokens"], a["positions"], meta,
                           lora, lidx)
    elif kind == "decode_multi":
        new_kv, _ = fn(params, kv, a["tokens"], a["positions"],
                       a["block_tables"], a["valid"], samp, lora, lidx)
    else:
        raise ValueError(f"unknown step kind {kind!r}")
    cache_engine.kv_caches = new_kv


def follower_loop(control: HostControlPlane, runner, cache_engine,
                  liveness_timeout_s: Optional[float] = None) -> None:
    """Follower-host execution loop (analogue of the reference
    start_worker_execution_loop, worker_base.py:57-66): replay each
    broadcast step until shutdown. With liveness_timeout_s set, a driver
    that stops sending payloads AND heartbeats for that long raises
    HostDeadError so the follower process exits instead of blocking on
    recv forever."""
    timeout_ms = None if liveness_timeout_s is None else int(
        liveness_timeout_s * 1e3)
    # followers must trace the same executables as the driver: disable
    # driver-local arg rewrites (e.g. LoRA active-slot compaction)
    runner.is_follower = True
    while True:
        payload = control.recv(timeout_ms=timeout_ms)
        if payload is None:
            if timeout_ms is not None and not control.shutdown_seen:
                raise HostDeadError(
                    f"driver host silent for {liveness_timeout_s}s "
                    "(no payloads or heartbeats)")
            logger.info("follower loop: shutdown")
            return
        follower_step(payload, runner, cache_engine)
        control._send_pong()
