"""Logging for neural_magic_vllm_tpu.

Mirrors the behavior of the reference logger (vllm/logger.py): a package-level
logger configured once, child loggers per module, env-controlled verbosity.
"""
import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root_logger = logging.getLogger("nmv_tpu")
_default_handler = None


def _setup_logger():
    global _default_handler
    _root_logger.setLevel(logging.DEBUG)
    if _default_handler is None:
        _default_handler = logging.StreamHandler(sys.stdout)
        _default_handler.flush = sys.stdout.flush  # type: ignore
        level = os.environ.get("NMV_TPU_LOGGING_LEVEL", "INFO").upper()
        _default_handler.setLevel(level)
        _root_logger.addHandler(_default_handler)
    fmt = logging.Formatter(_FORMAT, _DATE_FORMAT)
    _default_handler.setFormatter(fmt)
    _root_logger.propagate = False


def _setup_from_config_file(path: str) -> None:
    """NMV_TPU_LOGGING_CONFIG_PATH: full logging.config.dictConfig JSON
    (reference VLLM_LOGGING_CONFIG_PATH, vllm/logger.py:63-85) —
    overrides the built-in handler entirely."""
    import json
    import logging.config
    if not os.path.exists(path):
        raise RuntimeError(
            f"NMV_TPU_LOGGING_CONFIG_PATH={path} does not exist")
    with open(path) as f:
        logging.config.dictConfig(json.load(f))


if os.environ.get("NMV_TPU_CONFIGURE_LOGGING", "1") == "1":
    _config_path = os.environ.get("NMV_TPU_LOGGING_CONFIG_PATH")
    if _config_path:
        _setup_from_config_file(_config_path)
    else:
        _setup_logger()


def init_logger(name: str) -> logging.Logger:
    if name.startswith("neural_magic_vllm_tpu"):
        name = "nmv_tpu" + name[len("neural_magic_vllm_tpu"):]
    logger = logging.getLogger(name)
    logger.setLevel(os.environ.get("NMV_TPU_LOGGING_LEVEL", "INFO").upper())
    return logger
