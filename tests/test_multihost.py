"""2-process distributed DP smoke test (VERDICT r3 item 8).

Exercises the one SURVEY §2.8 axis nothing else covers: real
`jax.distributed.initialize` across processes (the --launcher path,
reference mmdet/apis/env.py:13-50 init_dist), per-host loader sharding
(batch/world rows per host), and a global-mesh DP train step built from
process-local data via make_array_from_process_local_data.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_train(tmp_path):
    from mrcnn3d.data.synthetic import make_synthetic_coco3d

    root = str(tmp_path)
    # hw=128: the quarter-crop (32) must be able to contain the synthetic
    # lesions, else every sample is crop-rejected
    ann_file, img_dir = make_synthetic_coco3d(
        root, num_volumes=4, hw=128, depth=16, seed=5
    )

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # fresh in-process compiles; cached multi-device CPU executables can
    # SIGABRT on reload (see conftest note)
    env["MRCNN3D_NO_COMPILE_CACHE"] = "1"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    here = os.path.dirname(os.path.abspath(__file__))
    child = os.path.join(here, "multihost_child.py")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(i), root,
             ann_file, img_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(here),
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"PROCESS_OK {i} 2 2" in out, out[-2000:]
