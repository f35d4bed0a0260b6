"""In-graph guided-decoding mask + state advance (VERDICT r4 #2).

Companions to guided_decoding/device_fsm.py: pure-jnp ops that run
INSIDE the fused-K decode scan so guided rows never leave the device.
The reference has no on-accelerator equivalent — its outlines backend
masks on host per step (outlines_logits_processors.py:67-148).

Per fused step, for each row carrying a DFA state id (gstate >= 0):
  mask:    logits[v] allowed iff bit v of allow_bytes[gstate] is set
           (LSB-first) — one [B, V/8] uint8 row gather + bit expand.
  advance: rank(s, t) = #transition-tokens < t in state s, computed as
           block_cum[s, t>>11] + popcount of the in-block bytes below t
           (jax.lax.population_count on the same gathered row);
           next = next_compact[row_offset[s] + rank]. EOS keeps the
           state; unguided rows (gstate < 0) pass through untouched.

All ops are O(V/8) bytes per row and fuse into the surrounding
elementwise work — no new HBM-resident intermediates beyond the [B, V]
logits that already exist.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from neural_magic_vllm_tpu.guided_decoding.device_fsm import (BLOCK_BYTES,
                                                              TOKEN_BLOCK)


class GuidedTables(NamedTuple):
    """Fixed-shape packed DFA tables (see GuidedTableManager)."""
    allow_bytes: jax.Array   # [S, VB_pad] uint8 (mask bits, incl. EOS)
    rank_bytes: jax.Array    # [S, VB_pad] uint8 (transition bits only)
    block_cum: jax.Array     # [S, NB] int32
    row_offset: jax.Array    # [S+1] int32
    next_compact: jax.Array  # [NNZ] int32


def guided_gather_rows(tables: GuidedTables, gstate: jax.Array):
    """Per-row byte gathers shared by mask + advance. gstate [B] int32
    (-1 = unguided; clipped — the row's result is discarded)."""
    s = jnp.clip(gstate, 0)
    return tables.allow_bytes[s], tables.rank_bytes[s]  # [B, VB_pad] x2


def guided_mask(logits: jax.Array, gstate: jax.Array,
                allow_rows: jax.Array) -> jax.Array:
    """Mask disallowed tokens to a large negative for guided rows.

    logits [B, V]; allow_rows [B, VB_pad] uint8 from guided_gather_rows.
    """
    B, V = logits.shape
    bits = (allow_rows[:, :, None] >>
            jnp.arange(8, dtype=jnp.uint8)[None, None, :]) & jnp.uint8(1)
    allowed = bits.reshape(B, -1)[:, :V] != 0
    neg = jnp.asarray(-1e30, logits.dtype)
    masked = jnp.where(allowed, logits, neg)
    return jnp.where((gstate >= 0)[:, None], masked, logits)


def guided_advance(tables: GuidedTables, gstate: jax.Array,
                   token: jax.Array, eos_ids: jax.Array,
                   rank_rows: jax.Array) -> jax.Array:
    """Post-sampling DFA step for guided rows.

    gstate [B] int32 global state ids (-1 = unguided); token [B] int32
    sampled ids; eos_ids [B] int32 (-1 = none); rank_rows [B, VB_pad]
    uint8 from guided_gather_rows. Returns the next gstate [B].
    """
    s = jnp.clip(gstate, 0)
    tok = jnp.clip(token, 0)
    blk = tok // TOKEN_BLOCK                      # [B]
    base = tables.block_cum[s, blk]               # [B]
    tbyte = tok >> 3
    # bytes of the token's 2048-token block, from the already-gathered row
    idx = blk[:, None] * BLOCK_BYTES + jnp.arange(BLOCK_BYTES)[None, :]
    blk_bytes = jnp.take_along_axis(rank_rows, idx, axis=1)  # [B, 256]
    nbefore = tbyte - blk * BLOCK_BYTES           # full bytes below t
    keep = jnp.arange(BLOCK_BYTES)[None, :] < nbefore[:, None]
    cnt = jnp.sum(jax.lax.population_count(
        jnp.where(keep, blk_bytes, jnp.uint8(0))).astype(jnp.int32),
        axis=1)
    pb = jnp.take_along_axis(rank_rows, tbyte[:, None], axis=1)[:, 0]
    tbit = (tok & 7).astype(jnp.uint8)
    lowmask = (jnp.left_shift(jnp.uint8(1), tbit) - jnp.uint8(1))
    cnt = cnt + jax.lax.population_count(pb & lowmask).astype(jnp.int32)
    rank = base + cnt
    slot = jnp.clip(tables.row_offset[s] + rank, 0,
                    tables.next_compact.shape[0] - 1)
    nxt = tables.next_compact[slot]
    # a sampled token with no transition bit (only EOS / stuck extras can
    # be sampled that way) keeps the state; EOS explicitly keeps it
    has_edge = ((pb >> tbit) & jnp.uint8(1)) != 0
    nxt = jnp.where(has_edge, nxt, gstate)
    nxt = jnp.where(token == eos_ids, gstate, nxt)
    return jnp.where(gstate < 0, gstate, nxt)
