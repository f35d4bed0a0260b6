"""EngineArgs hostile-value rejection (reference: per-flag validation in
vllm/engine/arg_utils.py)."""
import argparse

import pytest

from neural_magic_vllm_tpu.engine.arg_utils import EngineArgs


@pytest.mark.parametrize("kw", [
    {"swap_space": -1.0},
    {"block_size": 13},
    {"max_num_seqs": 0},
    {"gpu_memory_utilization": 1.5},
    {"gpu_memory_utilization": 0.0},
    {"tensor_parallel_size": -2},
    {"preemption_mode": "teleport"},
    {"kv_cache_dtype": "int3"},
    {"num_scheduler_steps": 0},
    {"max_model_len": -5},
])
def test_hostile_values_rejected(kw):
    with pytest.raises(ValueError):
        EngineArgs(model="x", **kw).create_engine_config()


def test_cli_has_help_and_choices():
    parser = argparse.ArgumentParser()
    EngineArgs.add_cli_args(parser)
    text = parser.format_help()
    assert "paged-KV block size" in text
    assert "fp8_e4m3" in text
    with pytest.raises(SystemExit):
        parser.parse_args(["--kv-cache-dtype", "nonsense"])
