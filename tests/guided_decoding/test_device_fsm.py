"""Device-FSM tables must agree exactly with the lazy host FSM: same
allowed-token sets per reachable state, same token-level transitions,
same accepting flags — and the in-graph mask/advance ops must replay a
host-FSM walk bit-for-bit (the fused guided dispatch rides on them)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_magic_vllm_tpu.guided_decoding.device_fsm import (
    DeviceFSM, GuidedTableManager, build_device_fsm)
from neural_magic_vllm_tpu.guided_decoding.fsm import RegexFSM
from neural_magic_vllm_tpu.ops.guided import (guided_advance,
                                              guided_gather_rows,
                                              guided_mask)
from tests.guided_decoding.test_fsm import VOCAB

EOS = 2  # </s> in VOCAB

PATTERNS = [
    r"abc",
    r"a+b*",
    r"(ab|cd)+",
    r"[a-c]{2,3}",
    r"(-)?(0|[1-9][0-9]*)(\.[0-9]+)?",
    r"(true|false|null)",
    r"\d+\.\d+",
]


def _fresh(pattern):
    fsm = RegexFSM(pattern, VOCAB)
    dfsm = build_device_fsm(fsm, vocab_size=len(VOCAB), eos_token_id=EOS,
                            time_budget_s=30.0)
    assert dfsm is not None
    return fsm, dfsm


@pytest.mark.parametrize("pattern", PATTERNS)
def test_device_fsm_matches_lazy_walk(pattern):
    fsm, dfsm = _fresh(pattern)
    # BFS both automata in lockstep from their starts
    seen = {}
    stack = [(fsm.start, dfsm.start)]
    seen[fsm.start] = dfsm.start
    while stack:
        hs, ds = stack.pop()
        host_allowed = fsm.allowed_tokens(hs)
        row = dfsm.allowed_row(ds)
        ids = sorted(host_allowed)
        # mask = transitions plus EOS when accepting
        expect = set(ids)
        if fsm.is_accepting(hs) or not ids:
            expect.add(EOS)
        assert set(np.nonzero(row)[0].tolist()) == expect, pattern
        assert dfsm.is_accepting(ds) == fsm.is_accepting(hs)
        for tid, hnxt in host_allowed.items():
            dnxt = dfsm.advance(ds, tid)
            if hnxt in seen:
                assert seen[hnxt] == dnxt
            else:
                seen[hnxt] = dnxt
                stack.append((hnxt, dnxt))


@pytest.mark.parametrize("pattern", PATTERNS)
def test_device_ops_replay_host_walk(pattern):
    """Drive guided_mask/guided_advance through greedy walks with random
    logits and check tokens + states against the host FSM."""
    fsm, dfsm = _fresh(pattern)
    mgr = GuidedTableManager(vocab_size=len(VOCAB), max_states=256,
                             max_transitions=4096)
    bases = mgr.admit([dfsm])
    assert bases is not None
    tables = mgr.device_tables
    base = bases[id(dfsm)]
    rng = np.random.default_rng(hash(pattern) & 0xffff)
    V = len(VOCAB)

    for trial in range(4):
        hstate = fsm.start
        lstate = dfsm.start  # host-tracked local device state
        gstate = jnp.asarray([base + lstate], jnp.int32)
        emitted = []
        for step in range(12):
            logits = rng.standard_normal((1, V)).astype(np.float32)
            host_allowed = fsm.allowed_tokens(hstate) \
                if hstate is not None else {}
            allow_ids = set(host_allowed)
            if hstate is None or fsm.is_accepting(hstate) or not allow_ids:
                allow_ids.add(EOS)

            arows, rrows = guided_gather_rows(tables, gstate)
            masked = np.asarray(guided_mask(jnp.asarray(logits), gstate,
                                            arows))[0]
            finite = masked > -1e29
            assert set(np.nonzero(finite)[0].tolist()) == allow_ids

            tok = int(np.argmax(masked))
            nxt = guided_advance(tables, gstate,
                                 jnp.asarray([tok], jnp.int32),
                                 jnp.asarray([EOS], jnp.int32), rrows)
            # device advance == host-side DeviceFSM.advance == lazy FSM
            lnext = dfsm.advance(lstate, tok)
            assert int(nxt[0]) == base + lnext
            emitted.append(tok)
            if tok == EOS:
                break
            hstate = host_allowed.get(tok)
            lstate = lnext
            gstate = nxt
        # stateless host recompute reproduces the tracked state
        tail = emitted[:-1] if emitted and emitted[-1] == EOS else emitted
        assert dfsm.state_for(tail) == lstate


def test_unguided_rows_pass_through():
    fsm, dfsm = _fresh(r"abc")
    mgr = GuidedTableManager(vocab_size=len(VOCAB), max_states=64,
                             max_transitions=512)
    mgr.admit([dfsm])
    tables = mgr.device_tables
    gstate = jnp.asarray([-1], jnp.int32)
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, len(VOCAB))).astype(np.float32))
    arows, rrows = guided_gather_rows(tables, gstate)
    out = guided_mask(logits, gstate, arows)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))
    nxt = guided_advance(tables, gstate, jnp.asarray([5], jnp.int32),
                         jnp.asarray([EOS], jnp.int32), rrows)
    assert int(nxt[0]) == -1


def test_manager_multi_fsm_packing():
    fsms = [_fresh(p) for p in (r"abc", r"(ab|cd)+", r"\d+")]
    mgr = GuidedTableManager(vocab_size=len(VOCAB), max_states=256,
                             max_transitions=8192)
    bases = mgr.admit([d for _, d in fsms])
    assert bases is not None and len(set(bases.values())) == 3
    tables = mgr.device_tables
    # each fsm's start mask must be intact at its base offset
    for fsm, dfsm in fsms:
        base = bases[id(dfsm)]
        gstate = jnp.asarray([base + dfsm.start], jnp.int32)
        arows, _ = guided_gather_rows(tables, gstate)
        row = np.asarray(arows)[0]
        np.testing.assert_array_equal(row, dfsm.allow_bytes[dfsm.start])
    # admitting a subset again is a no-op (same bases)
    again = mgr.admit([fsms[0][1]])
    assert again[id(fsms[0][1])] == bases[id(fsms[0][1])]


def test_overflow_falls_back():
    fsm = RegexFSM(r"a{60}", VOCAB)
    out = build_device_fsm(fsm, vocab_size=len(VOCAB), eos_token_id=EOS,
                           max_states=8)
    assert out is None
    # cached failure
    assert build_device_fsm(fsm, vocab_size=len(VOCAB),
                            eos_token_id=EOS) is None
