from neural_magic_vllm_tpu.parallel.mesh import (build_mesh,
                                                 build_shardings,
                                                 lookup_spec)

__all__ = ["build_mesh", "build_shardings", "lookup_spec"]
