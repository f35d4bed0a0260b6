"""gptq_marlin_24: 2:4-sparse W4A16/W8A16 checkpoint ingestion -> TPU
sparse datapath (ops/sparse24.py).

Capability parity with the reference's sparse Marlin method
(vllm/model_executor/layers/quantization/gptq_marlin_24.py:123,
csrc/quantization/marlin/sparse/marlin_24_cuda_kernel.cu). The checkpoint
format is decoded host-side to dense quantization levels and re-compressed
into the TPU tile layout; on TPU the value of 2:4 sparsity is halved
weight streaming, not skipped FLOPs (see ops/sparse24.py).

Checkpoint tensor formats (per linear; K = in_features, N = out_features,
pf = 32/bits, zp = 2^(bits-1); spec: gptq_marlin_24.py:182-243 and
utils/{format_24.py,marlin_24_perms.py}):
  B_24  [K/32, N*16/pf] int32 — the CUTLASS-compressed value matrix
        [K/2, N] (+zp re-added after signed compression), laid out in
        16x16 marlin tiles, permuted by the mma-fragment table, packed
        pf-per-word column-interleaved.
  B_meta [K/32, N*2] int16 — flat buffer of the CUTLASS reordered metadata
        for the [N, K] (output-major) view: one 4-bit code per quadruple
        (low 2 bits = position of the first kept element, high 2 = second),
        4 codes per int16, elements scattered by the ColumnMajorInterleaved<2>
        offset formula (format_24.py:22-46).
  s     [G, N] fp16 — group scales, columns permuted by the marlin scale
        permutation (grouped only; group_size -1 stores natural order).
The compressed-tensors ``w4a16_24`` scheme ships the same buffers as
weight_packed / meta / scale_packed (compressed_tensors_w4a16_24.py:44-112).
"""
import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np

from neural_magic_vllm_tpu.layers.linear import LinearMethod
from neural_magic_vllm_tpu.quantization.base import QuantizationConfig

MARLIN_24_SUPPORTED_BITS = (4, 8)
MARLIN_24_SUPPORTED_GROUPS = (-1, 128)


# --- format tables (derived from the NVIDIA mma.m16n8k16 fragment layout;
# --- reference generator: utils/marlin_24_perms.py get_perms_24) -----------
@functools.lru_cache()
def _weight_perm(bits: int) -> np.ndarray:
    """Destination->source index table for one 1024-element span (four
    16x16 tiles flattened as [4 col-groups, 16 rows, 16 cols])."""
    i = np.arange(32).reshape(32, 1, 1, 1)       # lane/thread
    j = np.arange(4).reshape(1, 4, 1, 1)         # fragment repeat
    b = np.arange(2).reshape(1, 1, 2, 1)         # 8-col block
    r = np.arange(4).reshape(1, 1, 1, 4)         # row slot
    m = i % 4
    row = np.where(r < 2, 2 * m + r, 2 * (m + 4) + (r - 2))
    col = i // 4
    perm = ((col // 2) * 256 + 16 * row + 8 * (col % 2) + 4 * b +
            j).reshape(-1)
    # sub-word interleave so consecutive packed slots decode adjacent rows
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7]) if bits == 4 else \
        np.array([0, 2, 1, 3])
    return perm.reshape(-1, interleave.size)[:, interleave].reshape(-1)


@functools.lru_cache()
def _scale_perm() -> np.ndarray:
    """64-wide column permutation for grouped scales."""
    return (np.arange(8).reshape(8, 1) * 8 +
            np.array([0, 4, 1, 5, 2, 6, 3, 7])).reshape(-1)


def _meta_offsets(m: int, ncols: int) -> np.ndarray:
    """Flat offsets of natural meta element (r, c) inside the CUTLASS
    ColumnMajorInterleaved<2> reordered buffer (int16 meta: 32-row row
    groups, 64-row column groups; format_24.py:22-46)."""
    r = np.arange(m).reshape(m, 1)
    c = np.broadcast_to(np.arange(ncols), (m, ncols))
    dr = (r // 64 * 64 + (r % 2) * 2 + (r % 8) // 4 +
          ((r % 32) % 4) // 2 * 32 + ((r % 64) // 8) * 4)
    dr = np.broadcast_to(dr, (m, ncols)).copy()
    dc = c.copy()
    swap = ((dr % 2 == 0) & (dc % 2 == 1)).astype(np.int64) - \
        ((dr % 2 == 1) & (dc % 2 == 0)).astype(np.int64)
    dr += swap
    dc -= swap
    return (dc // 2) * (m * 2) + dr * 2 + dc % 2


def decode_marlin24(b24: np.ndarray, bmeta: np.ndarray, s: np.ndarray,
                    bits: int, group_size: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Checkpoint buffers -> (dense levels [K, N] uint32 with the zero
    point at pruned slots, scales [G, N] f32 in natural column order)."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    zp = 1 << (bits - 1)
    K = b24.shape[0] * 32
    N = b24.shape[1] * pf // 16
    Kc = K // 2

    # 1. un-pack the column-interleaved words -> permuted [Kc/16, N*16]
    words = b24.view(np.uint32) if b24.dtype != np.uint32 else b24
    cols = np.empty((words.shape[0], words.shape[1] * pf), np.uint32)
    for i in range(pf):
        cols[:, i::pf] = (words >> (bits * i)) & mask
    # 2. invert the fragment permutation (1024-element spans)
    perm = _weight_perm(bits)
    cols = cols.reshape(-1, perm.size)[:, np.argsort(perm)]
    # 3. un-tile 16x16 -> compressed values [Kc, N]
    comp = cols.reshape(Kc // 16, N // 16, 16, 16).transpose(
        0, 2, 1, 3).reshape(Kc, N)

    # 4. meta: flat buffer is the reordered [N, K/16] int16 matrix
    flat = np.ascontiguousarray(bmeta).view(np.uint16).reshape(-1)
    nat = flat[_meta_offsets(N, K // 16).reshape(-1)].reshape(N, K // 16)
    codes = np.empty((N, K // 4), np.uint16)
    for j in range(4):
        codes[:, j::4] = (nat >> (4 * j)) & 0xF
    idx0 = (codes & 3).astype(np.int64)
    idx1 = ((codes >> 2) & 3).astype(np.int64)

    # 5. scatter values back to dense quadruples (output-major view)
    comp_nk = comp.T  # [N, Kc]; kept pairs interleaved per quadruple
    dense = np.full((N, K), zp, np.uint32)
    rows = np.arange(N).reshape(N, 1)
    base = np.arange(K // 4) * 4
    dense[rows, base + idx0] = comp_nk[:, 0::2]
    dense[rows, base + idx1] = comp_nk[:, 1::2]

    scales = np.asarray(s, np.float32)
    if scales.ndim == 1:
        scales = scales.reshape(1, -1)
    if group_size not in (-1, None) and group_size < K:
        sp = _scale_perm()
        scales = scales.reshape(-1, sp.size)[:, np.argsort(sp)].reshape(
            -1, N)
    return dense.T.copy(), scales


class Marlin24LinearMethod(LinearMethod):
    """2:4-sparse WNA16: compressed values stream from HBM, a Pallas
    kernel expands them in VMEM and runs dense MXU dots
    (ops/sparse24.sparse24_matmul_pallas)."""

    # gptq_marlin_24 names + compressed-tensors w4a16_24 aliases
    hf_param_names = ("B_24", "B_meta", "s", "weight_packed", "meta",
                      "scale_packed", "weight_shape", "workspace", "bias")
    hf_transpose = ()

    _MERGE_AXIS = {"qweight": 1, "meta": 1, "scales": 1, "bias": 0}

    def __init__(self, bits: int, group_size: int) -> None:
        if bits not in MARLIN_24_SUPPORTED_BITS:
            raise ValueError(f"marlin_24 bits={bits} unsupported")
        self.bits = bits
        self.group_size = group_size
        self.pack_factor = 32 // bits

    def _k_tile(self, K: int) -> int:
        from neural_magic_vllm_tpu.ops.sparse24 import select_k_tile_24
        return select_k_tile_24(K, self.group_size)

    def convert_hf(self, raw: Dict[str, np.ndarray]) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.ops.sparse24 import (compress_24,
                                                        pack_sparse24)
        b24 = raw.get("B_24", raw.get("weight_packed"))
        bmeta = raw.get("B_meta", raw.get("meta"))
        s = raw.get("s", raw.get("scale_packed"))
        if b24 is None or bmeta is None or s is None:
            raise ValueError("marlin_24 checkpoint missing "
                             "B_24/B_meta/s tensors")
        levels, scales = decode_marlin24(np.asarray(b24), np.asarray(bmeta),
                                         s, self.bits, self.group_size)
        kt = self._k_tile(levels.shape[0])
        vals, pos = compress_24(levels, float(1 << (self.bits - 1)))
        vals_packed, meta_packed = pack_sparse24(vals, pos, self.bits, kt)
        params = {"qweight": vals_packed, "meta": meta_packed,
                  "scales": scales}
        if "bias" in raw:
            params["bias"] = raw["bias"].astype(np.float32)
        return params

    def create_params(self, rng, in_features, out_features, use_bias):
        """Random 2:4-sparse quantized init (dummy load format)."""
        from neural_magic_vllm_tpu.ops.sparse24 import pack_sparse24
        Kq = in_features // 4
        vals = rng.integers(0, 1 << self.bits, (Kq, 2, out_features),
                            dtype=np.int64).astype(np.uint32)
        first = rng.integers(0, 3, (Kq, out_features), dtype=np.int64)
        second = rng.integers(1, 4, (Kq, out_features), dtype=np.int64)
        second = np.maximum(second, first + 1)
        pos = np.stack([first, second], axis=1).astype(np.int32)
        kt = self._k_tile(in_features)
        vals_packed, meta_packed = pack_sparse24(vals, pos, self.bits, kt)
        G = 1 if self.group_size in (-1, None) else \
            in_features // self.group_size
        scale = (1.0 / np.sqrt(in_features)) / (1 << (self.bits - 1))
        scales = (scale * rng.uniform(0.7, 1.3, (G, out_features))).astype(
            np.float32)
        params = {"qweight": vals_packed, "meta": meta_packed,
                  "scales": scales}
        if use_bias:
            params["bias"] = np.zeros((out_features, ), np.float32)
        return params

    def param_specs(self, partition, use_bias):
        from jax.sharding import PartitionSpec as P
        if partition == "column":
            spec2d, bias_spec = P(None, "model"), P("model")
        elif partition == "row":
            spec2d, bias_spec = P("model", None), P(None)
        else:
            spec2d, bias_spec = P(None, None), P(None)
        specs = {"qweight": spec2d, "meta": spec2d, "scales": spec2d}
        if use_bias:
            specs["bias"] = bias_spec
        return specs

    def apply(self, params: Dict[str, Any], x):
        import jax
        from neural_magic_vllm_tpu.ops.sparse24 import (
            sparse24_matmul_pallas, sparse24_matmul_ref)
        orig_dtype = x.dtype
        K = x.shape[-1]
        kt = self._k_tile(K)
        bias = params.get("bias")
        from neural_magic_vllm_tpu import envs
        override = envs.NMV_TPU_QUANT_BACKEND
        use_pallas = override == "pallas" if override is not None else \
            jax.default_backend() in ("tpu", "axon")
        if use_pallas:
            out = sparse24_matmul_pallas(x, params["qweight"],
                                         params["meta"], params["scales"],
                                         bits=self.bits, k_tile=kt,
                                         group_size=self.group_size,
                                         bias=bias)
        else:
            out = sparse24_matmul_ref(x, params["qweight"], params["meta"],
                                      params["scales"], self.bits, kt,
                                      self.group_size, bias=bias)
        return out.astype(orig_dtype)


class GPTQMarlin24Config(QuantizationConfig):
    """Parsed from AutoGPTQ quantize_config.json with
    checkpoint_format == "marlin_24" (reference gptq_marlin_24.py:96-110
    override negotiation)."""

    def __init__(self, bits: int = 4, group_size: int = 128) -> None:
        if bits not in MARLIN_24_SUPPORTED_BITS:
            raise ValueError(f"gptq_marlin_24 bits={bits} unsupported "
                             f"({MARLIN_24_SUPPORTED_BITS} only)")
        if group_size not in MARLIN_24_SUPPORTED_GROUPS:
            raise ValueError(
                f"gptq_marlin_24 group_size={group_size} unsupported "
                f"({MARLIN_24_SUPPORTED_GROUPS} only)")
        self.bits = bits
        self.group_size = group_size

    @classmethod
    def get_name(cls) -> str:
        return "gptq_marlin_24"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "GPTQMarlin24Config":
        return cls(bits=int(cls.get_from_keys(config, ["bits"])),
                   group_size=int(cls.get_from_keys(config,
                                                    ["group_size"])))

    def get_linear_method(self) -> Marlin24LinearMethod:
        return Marlin24LinearMethod(self.bits, self.group_size)
