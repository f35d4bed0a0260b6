"""Host control plane: step payloads must round-trip across processes
(the metadata side of multi-host continuous batching; no TPU pod needed)."""
import multiprocessing as mp
import time

import numpy as np


def _follower(port, q):
    from neural_magic_vllm_tpu.parallel.multihost import HostControlPlane
    ctl = HostControlPlane(rank=1, num_hosts=2, driver_addr="127.0.0.1",
                          port=port)
    q.put("ready")
    got = []
    while True:
        p = ctl.recv(timeout_ms=10000)
        if p is None:
            break
        got.append((p.kind, {k: v.tolist() for k, v in p.arrays.items()},
                    p.scalars))
    q.put(got)
    ctl.shutdown()


def test_payload_broadcast_roundtrip():
    from neural_magic_vllm_tpu.parallel.multihost import (HostControlPlane,
                                                          StepPayload)
    port = 19321
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_follower, args=(port, q))
    proc.start()
    driver = HostControlPlane(rank=0, num_hosts=2, driver_addr="127.0.0.1",
                              port=port)
    assert q.get(timeout=120) == "ready"  # follower SUB is up
    time.sleep(1.0)  # PUB/SUB subscription settle
    payloads = [
        StepPayload(kind="decode_sample",
                    arrays={"tokens": np.arange(8, dtype=np.int32),
                            "positions": np.ones(8, np.int32)},
                    scalars={"num_logprobs": 0}),
        StepPayload(kind="prefill_batch",
                    arrays={"tokens": np.zeros(16, np.int32)},
                    scalars={"num_logprobs": 4}),
    ]
    for p in payloads:
        driver.broadcast(p)
    driver.shutdown()
    got = q.get(timeout=30)
    proc.join(timeout=10)
    assert len(got) == 2
    assert got[0][0] == "decode_sample"
    assert got[0][1]["tokens"] == list(range(8))
    assert got[1][2]["num_logprobs"] == 4


def test_payload_serialization():
    from neural_magic_vllm_tpu.parallel.multihost import StepPayload
    p = StepPayload(kind="decode_multi",
                    arrays={"tables": np.arange(12).reshape(3, 4)},
                    scalars={"num_logprobs": (8, 0)})
    p2 = StepPayload.from_bytes(p.to_bytes())
    assert p2.kind == p.kind
    np.testing.assert_array_equal(p2.arrays["tables"], p.arrays["tables"])
    assert p2.scalars == p.scalars


def test_payload_scalar_shape_preserved():
    """0-d arrays must stay 0-d across the wire: scalar-vs-(1,) is a
    different jit signature (dynamic_slice indices must be scalars)."""
    from neural_magic_vllm_tpu.parallel.multihost import StepPayload
    p = StepPayload(kind="prefill_sample",
                    arrays={"sample_idx": np.int32(7),
                            "vec": np.arange(3, dtype=np.int32)},
                    scalars={"num_logprobs": 0})
    p2 = StepPayload.from_bytes(p.to_bytes())
    assert p2.arrays["sample_idx"].shape == ()
    assert int(p2.arrays["sample_idx"]) == 7
    assert p2.arrays["vec"].shape == (3, )
