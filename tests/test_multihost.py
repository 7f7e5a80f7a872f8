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
        # tolerate interleaved stderr tokens on a loaded host: only k=v
        # pairs AFTER the marker belong to the record
        def parse(marker):
            line = [l for l in out.splitlines() if marker in l][0]
            toks = line.split(marker, 1)[1].split()
            return dict(kv.split("=", 1) for kv in toks if "=" in kv)

        fields = parse("MULTIHOST_RESULT")
        assert fields["got"] == fields["expected"]
        gfields = parse("MULTIHOST_GATHER")
        assert gfields["ids_ok"] == "True"
        assert gfields["n"] == "10"   # 2 processes x (6 - 1 invalid) rows


def test_two_process_cohort_scan(tmp_path):
    """Full cohort scan over 2 jax.distributed processes: each scans its
    read shard, candidates merge via the device all_gather, both
    processes write files byte-identical to a serial in-process scan
    (VERDICT round-1 item 5)."""
    import hashlib

    port = free_port()
    coord = "127.0.0.1:{}".format(port)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = []
    outs_paths = []
    for pid in range(2):
        out_fa = tmp_path / "cohort_{}.fa".format(pid)
        outs_paths.append(out_fa)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ciri_long_tpu.parallel.multihost_worker",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(pid), "--scan-out", str(out_fa)],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=400)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail("cohort worker timed out:\n" + out[-2000:])
        outs.append(out)
    md5s = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        line = [l for l in out.splitlines() if "MULTIHOST_SCAN" in l][0]
        fields = dict(kv.split("=") for kv in line.split()[1:])
        assert int(fields["n_rec"]) >= 8
        md5s.append(fields["md5"])
    assert md5s[0] == md5s[1]
    assert outs_paths[0].read_bytes() == outs_paths[1].read_bytes()

    # serial reference: same deterministic world, plain scan in-process
    from ciri_long_tpu.parallel.multihost_worker import build_demo_world
    from ciri_long_tpu.pipeline.find_bsj import scan_ccs_reads

    ctx, ccs_seq = build_demo_world()
    ref_dir = tmp_path / "serial"
    ref_dir.mkdir()
    scan_ccs_reads(ctx, ccs_seq, True, str(ref_dir), "p")
    ref_bytes = (ref_dir / "p.cand_circ.fa").read_bytes()
    assert hashlib.md5(ref_bytes).hexdigest() == md5s[0]
