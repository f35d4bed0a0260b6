"""Multi-host serving launcher (reference role: the Ray/multiproc
distributed executor launch path, vllm/executor/ray_gpu_executor.py +
worker_base.py:57-66 start_worker_execution_loop — re-shaped for TPU
pods' one-process-per-host model).

Run the SAME command on every host of a pod slice, varying --rank:

    python -m neural_magic_vllm_tpu.entrypoints.multihost_serve \
        --rank R --num-hosts N --coordinator HOST:PORT \
        --driver-addr DRIVER_IP [--control-port 18515] \
        --model ... [any api_server / engine args]

Every host initializes jax.distributed (global mesh over all chips),
builds the IDENTICAL engine stack (same checkpoint, same configs — so
param/cache placement matches), then:
  rank 0:  attaches the zmq control plane to the model runner and serves
           the OpenAI API; every jitted dispatch is broadcast.
  rank >0: runs follower_loop, replaying each broadcast dispatch so all
           hosts enter the same global-mesh executable.

On a real TPU pod --coordinator may be omitted: jax.distributed
auto-detects the TPU environment.
"""
import argparse
import asyncio

from neural_magic_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def make_arg_parser() -> argparse.ArgumentParser:
    from neural_magic_vllm_tpu.entrypoints.openai.api_server import \
        make_arg_parser as base_parser
    parser = base_parser()
    parser.add_argument("--rank", type=int, required=True,
                        help="This host's process index (0 = driver).")
    parser.add_argument("--num-hosts", type=int, required=True)
    parser.add_argument("--coordinator", type=str, default=None,
                        help="jax.distributed coordinator HOST:PORT "
                             "(omit on TPU pods with auto-detection).")
    parser.add_argument("--driver-addr", type=str, default="127.0.0.1",
                        help="Driver host address for the zmq control "
                             "plane (followers connect to it).")
    parser.add_argument("--control-port", type=int, default=18515)
    parser.add_argument("--liveness-timeout", type=float, default=60.0,
                        help="Seconds of control-plane silence after which "
                             "a host declares its peer dead and exits "
                             "(driver heartbeats at a third of this; "
                             "0 disables).")
    return parser


def main() -> None:
    args = make_arg_parser().parse_args()
    import jax
    if args.coordinator:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_hosts,
                                   process_id=args.rank)
    else:
        jax.distributed.initialize()

    from jax.experimental import multihost_utils

    from neural_magic_vllm_tpu.engine.arg_utils import AsyncEngineArgs
    from neural_magic_vllm_tpu.parallel.multihost import (HostControlPlane,
                                                          follower_loop)

    plane = HostControlPlane(args.rank, args.num_hosts, args.driver_addr,
                             port=args.control_port,
                             heartbeat_s=(args.liveness_timeout / 3
                                          if args.rank == 0
                                          and args.liveness_timeout > 0
                                          else 0.0))
    engine_args = AsyncEngineArgs.from_cli_args(args)

    if args.rank == 0:
        from neural_magic_vllm_tpu.engine.async_llm_engine import \
            AsyncLLMEngine
        from neural_magic_vllm_tpu.entrypoints.openai.api_server import \
            serve_engine
        engine = AsyncLLMEngine.from_engine_args(engine_args)
        worker = engine.engine.model_executor.driver_worker
        multihost_utils.sync_global_devices("nmv-engines-constructed")
        import time
        time.sleep(1.0)  # zmq PUB/SUB slow-joiner settle
        worker.model_runner.control_plane = plane
        if args.liveness_timeout > 0:
            # engine check_health() -> executor -> worker; a dead follower
            # fails the engine fast instead of deadlocking the collective
            worker.follower_health_check = (
                lambda: plane.check_followers(args.liveness_timeout))
        try:
            asyncio.run(serve_engine(engine, args))
        finally:
            plane.shutdown()
    else:
        from neural_magic_vllm_tpu.engine.llm_engine import LLMEngine
        engine = LLMEngine(engine_args.create_engine_config(),
                           log_stats=False)
        worker = engine.model_executor.driver_worker
        multihost_utils.sync_global_devices("nmv-engines-constructed")
        logger.info("follower %d ready", args.rank)
        follower_loop(plane, worker.model_runner, worker.cache_engine,
                      liveness_timeout_s=(args.liveness_timeout
                                          if args.liveness_timeout > 0
                                          else None))
    multihost_utils.sync_global_devices("nmv-shutdown")


if __name__ == "__main__":
    main()
