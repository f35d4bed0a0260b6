"""Usage telemetry (reference vllm/usage/usage_lib.py:98). This build
records a LOCAL json line per engine start (no network reporting in this
environment); disabled entirely via NMV_TPU_NO_USAGE_STATS=1 (the
default — privacy-forward)."""
import json
import os
import time
from typing import Any, Dict

from neural_magic_vllm_tpu import envs

_USAGE_PATH = os.path.expanduser("~/.cache/nmv_tpu/usage_stats.jsonl")


def report_usage(model_architecture: str, context: Dict[str, Any]) -> None:
    if envs.NMV_TPU_NO_USAGE_STATS or envs.NMV_TPU_DO_NOT_TRACK:
        return
    try:
        os.makedirs(os.path.dirname(_USAGE_PATH), exist_ok=True)
        with open(_USAGE_PATH, "a") as f:
            f.write(json.dumps({
                "ts": time.time(),
                "model_architecture": model_architecture,
                **context,
            }) + "\n")
    except OSError:
        pass
