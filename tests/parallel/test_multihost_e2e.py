"""Multi-host serving, end to end: TWO real processes, one global JAX mesh.

Process 0 runs the full engine (scheduler + model runner) and broadcasts
each jitted dispatch over the zmq control plane; process 1 builds the SAME
engine stack and replays the dispatches via follower_loop. Both processes
participate in every global-mesh executable (tp=4 over 2 CPU devices per
process), which is the real multi-host contract — a dropped or reordered
dispatch deadlocks the collective and fails the test.

Greedy outputs must exactly match a single-process run.

Reference contract: driver/follower loop, worker_base.py:57-66,215-282.
"""
import json
import os
import subprocess
import sys

import pytest
pytestmark = pytest.mark.slow  # heavy e2e: full engines / multi-process / model-family goldens


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
jax.distributed.initialize(coordinator_address="127.0.0.1:19877",
                           num_processes=2, process_id=rank)
from jax.experimental import multihost_utils
from neural_magic_vllm_tpu import LLM, SamplingParams
from neural_magic_vllm_tpu.parallel.multihost import (HostControlPlane,
                                                      follower_loop)

# Identical construction on both hosts: same checkpoint, same configs,
# same global (tp=4) mesh -> identical param/cache placement.
llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
          block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
          tensor_parallel_size=4, enforce_eager=True)
worker = llm.llm_engine.model_executor.driver_worker
plane = HostControlPlane(rank, 2, "127.0.0.1", port=18533)
multihost_utils.sync_global_devices("engines-constructed")

if rank == 0:
    time.sleep(1.0)  # zmq PUB/SUB slow-joiner settle
    worker.model_runner.control_plane = plane
    prompts = [f"Counting up from {i}:" for i in range(6)]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=12))
    plane.shutdown()
    toks = [list(o.outputs[0].token_ids) for o in outs]
    with open(out_path, "w") as f:
        json.dump(toks, f)
else:
    follower_loop(plane, worker.model_runner, worker.cache_engine)
multihost_utils.sync_global_devices("done")
'''


def test_two_process_serving_matches_single(tmp_path):
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
                  temperature=0.0, max_tokens=12))]
    del llm

    script = tmp_path / "mh_worker.py"
    script.write_text(WORKER)
    out_path = tmp_path / "driver_out.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(out_path),
             model_dir], env=env, cwd=REPO)
        for rank in (0, 1)
    ]
    try:
        for p in procs:
            assert p.wait(timeout=420) == 0, f"worker rc={p.returncode}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned, never by pattern

    got = json.loads(out_path.read_text())
    assert got == golden


def test_multihost_serve_launcher(tmp_path):
    """The production launcher (entrypoints/multihost_serve): rank 0 serves
    the OpenAI API with the control plane attached, rank 1 follows; a
    streamed completion through HTTP must match the single-process engine."""
    import time
    import urllib.request

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from utils import create_tiny_llama_checkpoint
    model_dir = create_tiny_llama_checkpoint(str(tmp_path / "tiny"))

    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              block_size=16, num_gpu_blocks_override=64, max_num_seqs=4,
              enforce_eager=True)
    golden = llm.generate(["Hello multihost"], SamplingParams(
        temperature=0.0, max_tokens=8))[0].outputs[0].text
    del llm

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env.update(PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    common = [sys.executable, "-m",
              "neural_magic_vllm_tpu.entrypoints.multihost_serve",
              "--num-hosts", "2", "--coordinator", "127.0.0.1:19879",
              "--driver-addr", "127.0.0.1", "--control-port", "18537",
              "--model", model_dir, "--dtype", "float32",
              "--max-model-len", "128", "--block-size", "16",
              "--num-gpu-blocks-override", "64", "--max-num-seqs", "4",
              "--tensor-parallel-size", "4", "--enforce-eager",
              "--port", "18638"]
    procs = [subprocess.Popen(common + ["--rank", str(r)], env=env,
                              cwd=REPO) for r in (0, 1)]
    try:
        payload = json.dumps({
            "model": model_dir, "prompt": "Hello multihost",
            "max_tokens": 8, "temperature": 0.0,
        }).encode()
        deadline = time.time() + 300
        text = None
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                raise AssertionError("a launcher process died early")
            try:
                req = urllib.request.Request(
                    "http://127.0.0.1:18638/v1/completions", data=payload,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=30) as resp:
                    text = json.loads(resp.read())["choices"][0]["text"]
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(3.0)
        assert text == golden
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned, never by pattern
        for p in procs:
            p.wait(timeout=30)
