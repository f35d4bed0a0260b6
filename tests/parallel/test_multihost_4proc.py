"""Multi-host serving at FOUR processes over one global dp2 x tp4 mesh.

Each process owns 2 CPU devices (8 global); the mesh is data=2 x model=4,
so each data replica's TP group SPANS two processes — rank-indexing bugs
that are invisible at n=2 (e.g. conflating process rank with mesh
coordinate, or assuming the TP group lives on one host) deadlock or
mis-shard here. Process 0 runs the full engine and broadcasts dispatches;
processes 1-3 replay via follower_loop. Greedy outputs must exactly match
a single-process single-device run.

Reference contract: driver/follower loop, worker_base.py:57-66,215-282;
Megatron-style group slicing parallel_state.py:832-900.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WORKER = r'''
import json, os, sys, time
rank = int(sys.argv[1])
out_path = sys.argv[2]
model_dir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:19881",
                           num_processes=4, process_id=rank)
from jax.experimental import multihost_utils
from neural_magic_vllm_tpu import LLM, SamplingParams
from neural_magic_vllm_tpu.parallel.multihost import (HostControlPlane,
                                                      follower_loop)

# Identical construction on all four hosts: dp2 x tp4 over 8 global
# devices; each TP group spans two processes.
llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
          block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
          tensor_parallel_size=4, data_parallel_size=2,
          enforce_eager=True)
worker = llm.llm_engine.model_executor.driver_worker
plane = HostControlPlane(rank, 4, "127.0.0.1", port=18541)
multihost_utils.sync_global_devices("engines-constructed")

if rank == 0:
    time.sleep(1.0)  # zmq PUB/SUB slow-joiner settle
    worker.model_runner.control_plane = plane
    prompts = [f"Counting up from {i}:" for i in range(6)]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=10))
    plane.shutdown()
    toks = [list(o.outputs[0].token_ids) for o in outs]
    with open(out_path, "w") as f:
        json.dump(toks, f)
else:
    follower_loop(plane, worker.model_runner, worker.cache_engine)
multihost_utils.sync_global_devices("done")
'''


@pytest.mark.slow
def test_four_process_dp2_tp4_matches_single(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from utils import create_tiny_llama_checkpoint
    model_dir = create_tiny_llama_checkpoint(str(tmp_path / "tiny"))

    # golden: single-process, single-device (this pytest process is CPU)
    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
              enforce_eager=True)
    prompts = [f"Counting up from {i}:" for i in range(6)]
    golden = [list(o.outputs[0].token_ids)
              for o in llm.generate(prompts, SamplingParams(
                  temperature=0.0, max_tokens=10))]
    del llm

    script = tmp_path / "mh4_worker.py"
    script.write_text(WORKER)
    out_path = tmp_path / "driver_out.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(out_path),
             model_dir], env=env, cwd=REPO)
        for rank in range(4)
    ]
    try:
        for p in procs:
            assert p.wait(timeout=600) == 0, f"worker rc={p.returncode}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned, never by pattern

    got = json.loads(out_path.read_text())
    assert got == golden
