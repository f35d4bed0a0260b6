"""Pallas TPU attention kernels (prefill flash attention + paged decode).

Implements the same contracts as ops/attention.py's jnp reference. Until the
hand-written kernels land (tracked for this round), these delegate to the
XLA-compiled reference implementations, which are already static-shape and
fuse well; the Pallas versions exist to cut HBM traffic via VMEM-resident
softmax accumulation.
"""
from neural_magic_vllm_tpu.ops.attention import (decode_attention_ref,
                                                 prefill_attention_ref)

prefill_attention = prefill_attention_ref
decode_attention = decode_attention_ref
