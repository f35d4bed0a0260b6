"""Device mesh + sharding utilities.

TPU-native replacement for the reference's distributed groups
(vllm/distributed/parallel_state.py GroupCoordinator / TP / PP group init):
parallelism is a ``jax.sharding.Mesh`` over ("data", "model") axes and a
PartitionSpec tree parallel to the params; GSPMD inserts the collectives the
reference codes by hand (custom all-reduce / PyNccl — not needed on TPU, the
ICI all-reduce is compiler-generated).
"""
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(parallel_config, devices=None) -> Optional[Mesh]:
    """Mesh from ParallelConfig (data_parallel_size x tensor_parallel_size).
    Returns None for the trivial 1x1 case (single-chip fast path: no
    GSPMD annotations at all)."""
    tp = getattr(parallel_config, "tensor_parallel_size", 1)
    dp = getattr(parallel_config, "data_parallel_size", 1)
    if tp * dp <= 1:
        return None
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp * dp:
        raise ValueError(
            f"need {tp * dp} devices for dp={dp} x tp={tp}, "
            f"have {len(devices)}")
    arr = np.array(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def lookup_spec(specs: Any, path) -> P:
    """Walk a (possibly partial) PartitionSpec tree by a tree_map_with_path
    key path; unknown leaves default to replicated."""
    node = specs
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "idx", None)
        if isinstance(node, dict) and key in node:
            node = node[key]
        elif isinstance(node, (list, tuple)) and isinstance(key, int) \
                and key < len(node):
            node = node[key]
        else:
            return P()
    return node if isinstance(node, P) else P()


def build_shardings(mesh: Mesh, params: Any, specs: Any) -> Any:
    """NamedSharding tree STRUCTURALLY MATCHED to params (specs may carry
    extra optional keys — e.g. quantized linears declare zeros/input_perm
    specs whether or not the checkpoint has them)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, lookup_spec(specs, path)),
        params)
