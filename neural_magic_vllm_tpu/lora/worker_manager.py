"""Per-worker LoRA slot manager (reference vllm/lora/worker_manager.py:83 +
LRUCacheLoRAModelManager, lora/models.py:760).

Owns the layer-stacked device tensors
    A[key]: [L, S, r_max, in]   B[key]: [L, S, r_max, out]
(A is r-major: an [.., in, r] layout pads r=8 to the 128-lane tile, a
16x HBM blowup at rest — measured 6.6 GiB of padding at S=32 on the 8B
model before the flip)
(L leading so the model's lax.scan slices one layer per step; S = 1 null
slot + max_loras). Activating an adapter writes its matrices into a slot
with an in-place jitted update; eviction is LRU over inactive slots.
"""
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.logger import init_logger
from neural_magic_vllm_tpu.lora.models import LoRAModel
from neural_magic_vllm_tpu.lora.request import LoRARequest

logger = init_logger(__name__)

_TARGET_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


@functools.partial(jax.jit, donate_argnums=(0, ))
def _set_slot(stack: jax.Array, slot: jax.Array,
              value: jax.Array) -> jax.Array:
    return stack.at[:, slot].set(value)


class WorkerLoRAManager:

    def __init__(self, lora_config, model, dtype=jnp.bfloat16,
                 mesh=None) -> None:
        self.max_loras = lora_config.max_loras
        self.max_rank = lora_config.max_lora_rank
        self.num_slots = lora_config.max_loras + 1  # slot 0 = null
        self.model = model
        self.dtype = dtype
        self.mesh = mesh
        self.fully_sharded = bool(
            getattr(lora_config, "fully_sharded_loras", False))
        self.long_factors = getattr(lora_config,
                                    "long_lora_scaling_factors", None)
        self.base_max_len = int(
            getattr(model.cfg, "max_position_embeddings", 2048) or 2048)
        self._slot_of: Dict[int, int] = {}  # lora_int_id -> slot
        self._lru: List[int] = []  # lora ids, most recent last
        self._registered: Dict[int, LoRARequest] = {}

        L = model.num_layers
        r = self.max_rank
        dims = self._linear_dims()
        self.a_stacks = {
            k: self._place(jnp.zeros((L, self.num_slots, r, dims[k][0]),
                                     dtype), k, "a")
            for k in _TARGET_KEYS
        }
        self.b_stacks = {
            k: self._place(jnp.zeros((L, self.num_slots, r, dims[k][1]),
                                     dtype), k, "b")
            for k in _TARGET_KEYS
        }
        self.scaling = jnp.zeros((self.num_slots, ), jnp.float32)
        # per-slot rope position divisor (long-context LoRA, reference
        # LongContextLoRAContext, lora/models.py:30)
        self.pos_scale = jnp.ones((self.num_slots, ), jnp.float32)

    _ROW_KEYS = ("o", "down")  # row-parallel targets (input dim sharded)

    def _spec(self, key: str, which: str, shape) -> "jax.sharding.PartitionSpec":
        """TP PartitionSpec for one stack [L, S, in|r, r|out].

        Default (reference layers.py WithLoRA): column targets shard B on
        out, A replicated; row targets shard A on in, B replicated. With
        --fully-sharded-loras (reference fully_sharded_layers.py, S-LoRA):
        additionally shard the RANK dim — A's r for column targets, B's r
        for row targets; GSPMD inserts the all-gather on the [T, r]
        intermediate the reference codes by hand."""
        from jax.sharding import PartitionSpec as P
        tp = self.mesh.shape.get("model", 1) if self.mesh else 1

        def ok(dim):
            return dim % tp == 0

        row = key in self._ROW_KEYS
        if which == "a":
            # A is [L, S, r, in]: in = dim 3, r = dim 2
            if row and ok(shape[3]):
                return P(None, None, None, "model")
            if not row and self.fully_sharded and ok(shape[2]):
                return P(None, None, "model", None)
        else:
            if not row and ok(shape[3]):
                return P(None, None, None, "model")
            if row and self.fully_sharded and ok(shape[2]):
                return P(None, None, "model", None)
        return P(None, None, None, None)

    def _place(self, arr: jax.Array, key: str, which: str) -> jax.Array:
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding
        return jax.device_put(
            arr, NamedSharding(self.mesh, self._spec(key, which,
                                                     arr.shape)))

    def _linear_dims(self) -> Dict[str, tuple]:
        m = self.model
        H, I = m.hidden_size, m.intermediate_size
        nh, kvh, hd = m.num_heads, m.num_kv_heads, m.head_dim
        return {
            "q": (H, nh * hd), "k": (H, kvh * hd), "v": (H, kvh * hd),
            "o": (nh * hd, H), "gate": (H, I), "up": (H, I), "down": (I, H),
        }

    # --- management API (reference add_lora/remove_lora/list_loras) -----------
    def add_lora(self, req: LoRARequest) -> bool:
        if req.lora_int_id in self._registered:
            return False
        self._registered[req.lora_int_id] = req
        return True

    def remove_lora(self, lora_id: int) -> bool:
        self._registered.pop(lora_id, None)
        slot = self._slot_of.pop(lora_id, None)
        if lora_id in self._lru:
            self._lru.remove(lora_id)
        return slot is not None

    def list_loras(self) -> List[int]:
        return list(self._registered)

    # --- activation -------------------------------------------------------------
    def slots_for(self, reqs: List[Optional[LoRARequest]]) -> List[int]:
        """Ensure every request's adapter is resident; returns slot per
        request (0 for None)."""
        needed = {r.lora_int_id: r for r in reqs if r is not None}
        if len(needed) > self.max_loras:
            raise ValueError(
                f"{len(needed)} distinct LoRAs in one batch > max_loras="
                f"{self.max_loras}")
        for lora_id, req in needed.items():
            self._activate(req)
        out = []
        for r in reqs:
            if r is None:
                out.append(0)
            else:
                self._lru.remove(r.lora_int_id)
                self._lru.append(r.lora_int_id)
                out.append(self._slot_of[r.lora_int_id])
        return out

    def _activate(self, req: LoRARequest) -> None:
        lora_id = req.lora_int_id
        if lora_id in self._slot_of:
            return
        self.add_lora(req)
        used = set(self._slot_of.values())
        free = [s for s in range(1, self.num_slots) if s not in used]
        if free:
            slot = free[0]
        else:
            victim = self._lru.pop(0)
            slot = self._slot_of.pop(victim)
        model_lora = LoRAModel.from_local_checkpoint(
            req.lora_local_path, self.model.num_layers, self.max_rank)
        self._load_into_slot(slot, model_lora)
        factor = 1.0
        if req.long_lora_max_len:
            factor = req.long_lora_max_len / self.base_max_len
            if self.long_factors and \
                    not any(abs(factor - f) < 1e-6
                            for f in self.long_factors):
                raise ValueError(
                    f"long-LoRA scaling factor {factor} not in "
                    f"--long-lora-scaling-factors {self.long_factors}")
        self.pos_scale = self.pos_scale.at[slot].set(factor)
        self._slot_of[lora_id] = slot
        self._lru.append(lora_id)
        logger.info("Activated LoRA %s (id=%d) in slot %d", req.lora_name,
                    lora_id, slot)

    def _load_into_slot(self, slot: int, lora: LoRAModel) -> None:
        dims = self._linear_dims()
        L = self.model.num_layers
        r = self.max_rank
        sl = jnp.int32(slot)
        for k in _TARGET_KEYS:
            a_np = np.zeros((L, r, dims[k][0]), np.float32)
            b_np = np.zeros((L, r, dims[k][1]), np.float32)
            for layer in range(L):
                a_l, b_np[layer] = lora.padded(
                    k, layer, dims[k][0], dims[k][1], r)
                a_np[layer] = a_l.T
            self.a_stacks[k] = _set_slot(self.a_stacks[k], sl,
                                         jnp.asarray(a_np, self.dtype))
            self.b_stacks[k] = _set_slot(self.b_stacks[k], sl,
                                         jnp.asarray(b_np, self.dtype))
        self.scaling = self.scaling.at[slot].set(lora.scaling)

    def lora_params(self) -> Dict:
        """The pytree handed to the model forward (scan slices layer axis)."""
        return {"a": self.a_stacks, "b": self.b_stacks,
                "scaling": self.scaling, "pos_scale": self.pos_scale}

    # --- multi-host slot mirroring ----------------------------------------------
    def slot_assignment(self) -> List[list]:
        """JSON-safe snapshot of the current slot table, broadcast with
        every multi-host dispatch so follower hosts hold identical stacks
        (the reference analogue: every Ray worker loads adapters from the
        shared path itself, worker_manager.py)."""
        out = []
        for lora_id, slot in sorted(self._slot_of.items()):
            req = self._registered[lora_id]
            out.append([slot, lora_id, req.lora_local_path,
                        req.long_lora_max_len])
        return out

    def apply_slot_assignment(self, assignment: List[list]) -> None:
        """Mirror a driver's slot table: load each adapter (from its
        checkpoint path, which must be reachable on this host) into the
        EXACT slot the driver assigned. Idempotent per (slot, id) pair."""
        want = {int(slot): (int(lora_id), str(path), int(long_max))
                for slot, lora_id, path, long_max in assignment}
        for slot, (lora_id, path, long_max) in want.items():
            if self._slot_of.get(lora_id) == slot:
                continue
            # evict whatever currently claims this slot or this id
            for other_id, s in list(self._slot_of.items()):
                if s == slot or other_id == lora_id:
                    del self._slot_of[other_id]
            req = LoRARequest(lora_name=f"follower-{lora_id}",
                              lora_int_id=lora_id, lora_local_path=path,
                              long_lora_max_len=long_max)
            self._registered[lora_id] = req
            model_lora = LoRAModel.from_local_checkpoint(
                path, self.model.num_layers, self.max_rank)
            self._load_into_slot(slot, model_lora)
            factor = 1.0
            if long_max:
                factor = long_max / self.base_max_len
            self.pos_scale = self.pos_scale.at[slot].set(factor)
            self._slot_of[lora_id] = slot
            logger.info("Mirrored LoRA id=%d into slot %d", lora_id, slot)
