"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), a capability the
GPU reference never had (SURVEY.md section 4).  The axon sitecustomize in
this image pins jax to the tunnelled TPU, so the platform is re-pinned to
CPU via jax.config (env vars alone are overridden).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # tests prove semantics, not CPU codegen quality: LLVM opt level 0
    # cuts the compile-dominated suite wall substantially on this
    # 1-core box (same trick as the dryrun child; full tier passes
    # under it — numerics are unchanged at the HLO level)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _cpu_cache_dir():
    # persistent XLA compile cache, fingerprinted by host CPU flags:
    # AOT executables compiled for a different ISA can SIGILL when
    # loaded (same scheme as __graft_entry__._cpu_cache_dir) — suite
    # wall time is dominated by CPU recompiles without this
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:12]
                    break
            else:
                fp = "noflags"
    except OSError:
        fp = "nocpuinfo"
    return f"/tmp/mrcnn3d_jax_cache_cpu_{fp}"


if os.environ.get("MRCNN3D_NO_COMPILE_CACHE") != "1":
    # (the no-cache escape hatch exists because XLA:CPU aborts when
    # RELOADING serialized multi-device SPMD executables for some 2-D
    # mesh programs — the isolated hybrid-mesh tests compile fresh)
    try:
        jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0
        )
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
