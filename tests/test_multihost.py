"""Two-process jax.distributed smoke test on CPU (SURVEY.md §4: 'a
multi-host test using jax.distributed with a CPU mesh')."""

import os
import socket
import subprocess
import sys

import pytest


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum():
    port = free_port()
    coord = "127.0.0.1:{}".format(port)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # jax.distributed.initialize must run before ANY backend touch; this
    # box's sitecustomize (pulled in via PYTHONPATH) registers a TPU
    # platform at interpreter start, so strip it from the workers
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ciri_long_tpu.parallel.multihost_worker",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(pid)],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail("multihost worker timed out:\n" + out[-2000:])
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "MULTIHOST_RESULT" in out
        line = [l for l in out.splitlines() if "MULTIHOST_RESULT" in l][0]
        fields = dict(kv.split("=") for kv in line.split()[1:])
        assert fields["got"] == fields["expected"]
        gline = [l for l in out.splitlines() if "MULTIHOST_GATHER" in l][0]
        gfields = dict(kv.split("=") for kv in gline.split()[1:])
        assert gfields["ids_ok"] == "True"
        assert gfields["n"] == "10"   # 2 processes x (6 - 1 invalid) rows
