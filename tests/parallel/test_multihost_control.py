"""Host control plane: step payloads must round-trip across processes
(the metadata side of multi-host continuous batching; no TPU pod needed)."""
import pytest

pytestmark = pytest.mark.slow  # multi-process zmq plane timing tests
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


def test_follower_detects_dead_driver():
    """follower_loop with a liveness timeout must raise HostDeadError when
    the driver never sends payloads or heartbeats (a killed driver), not
    block on recv forever."""
    import pytest
    from neural_magic_vllm_tpu.parallel.multihost import (HostControlPlane,
                                                          HostDeadError,
                                                          follower_loop)
    port = 19327
    follower = HostControlPlane(rank=1, num_hosts=2,
                                driver_addr="127.0.0.1", port=port)
    try:
        with pytest.raises(HostDeadError):
            follower_loop(follower, runner=None, cache_engine=None,
                          liveness_timeout_s=1.0)
    finally:
        follower.shutdown()


def _pong_follower(port, q):
    """A follower that just answers heartbeats (recv loops internally on
    heartbeats, ponging each one — a live host at an idle engine)."""
    from neural_magic_vllm_tpu.parallel.multihost import HostControlPlane
    ctl = HostControlPlane(rank=1, num_hosts=2, driver_addr="127.0.0.1",
                           port=port)
    q.put("ready")
    ctl.recv(timeout_ms=60000)  # heartbeats keep this looping + ponging


def test_heartbeats_and_killed_follower_detection():
    """Idle-driver heartbeats keep a follower's liveness window open (and
    elicit pongs); once the follower process is KILLED, the driver's
    check_followers raises HostDeadError within the timeout — failing
    fast instead of deadlocking the next collective."""
    import time

    import pytest
    from neural_magic_vllm_tpu.parallel.multihost import (HostControlPlane,
                                                          HostDeadError)
    port = 19331
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_pong_follower, args=(port, q))
    proc.start()
    driver = HostControlPlane(rank=0, num_hosts=2, driver_addr="127.0.0.1",
                              port=port, heartbeat_s=0.2)
    try:
        assert q.get(timeout=120) == "ready"
        # the follower is alive: pongs arrive, checks pass for > timeout
        deadline = time.monotonic() + 2.0
        while time.monotonic() < deadline:
            driver.check_followers(timeout_s=1.5)
            time.sleep(0.1)
        assert driver._last_pong, "no pongs ever arrived"
        # kill the follower process: pongs stop, check must raise
        proc.kill()  # exact PID we spawned, never by pattern
        proc.join(timeout=10)
        with pytest.raises(HostDeadError):
            deadline = time.monotonic() + 10.0
            while time.monotonic() < deadline:
                driver.check_followers(timeout_s=1.5)
                time.sleep(0.2)
    finally:
        if proc.is_alive():
            proc.kill()
        driver.shutdown()


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
