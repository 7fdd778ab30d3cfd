"""mrcnn3d — TPU-native 3D Multi-Resolution R-CNN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
arthur801031/3d-multi-resolution-rcnn (3D instance segmentation of cerebral
microbleeds from SWI-MRI, two-resolution Mask R-CNN with refinement head).

Design stance (vs. the CUDA/PyTorch reference):
  * pure functions + pytree params instead of nn.Module/hook mutation
  * static padded shapes + validity masks instead of dynamic tensor lists
  * Pallas / fused XLA kernels instead of CUDA ops (NMS3D, RoIAlign3D)
  * shard_map + psum over a jax.sharding.Mesh instead of NCCL DDP
  * channel-last (B, D, H, W, C) layouts for TPU conv efficiency
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MRCNN3D_NO_COMPILE_CACHE") != "1":
    # XLA compiles of the whole-volume graphs are expensive (minutes via
    # the remote compile service); persist them across processes.  Only
    # a DEFAULT: callers that already configured a cache dir (the test
    # conftest and the multichip dryrun use per-CPU-fingerprint dirs so
    # CPU AOT executables never mix with TPU entries — loading an AOT
    # result compiled for another ISA can SIGILL) must not be overridden
    # by this import.
    try:
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get(
                    "MRCNN3D_COMPILE_CACHE", "/tmp/mrcnn3d_jax_cache"
                ),
            )
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10
            )
    except Exception:
        pass
