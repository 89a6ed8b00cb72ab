"""Multi-host runtime bootstrap (SURVEY.md 5.4: 'multi-host DCN logic tested
by spawning multiple jax.distributed processes on localhost').

Two separate processes initialise through parallel.mesh.initialize_multihost
(Gloo CPU collectives stand in for DCN), build a process-spanning mesh and
reduce a global array across hosts.
"""

import os
import socket
import subprocess
import sys

def test_two_process_global_reduction():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "multihost", "worker.py"),
         str(port), str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env) for i in range(2)]
    outs = [p.communicate(timeout=220)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-2000:]}"
    assert "MULTIHOST_OK" in outs[0], outs[0][-2000:]


def test_two_process_production_forward():
    """The REAL sharded forward (nu-halo tier) across two processes: ring
    ppermutes cross the process boundary (Gloo standing in for DCN) and
    the gathered radiances match the single-device reference on every
    process (round 4 — upgrades C20 evidence from a bare reduction to the
    production code path)."""
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    procs = [subprocess.Popen(
        [sys.executable,
         os.path.join(repo, "tests", "multihost", "worker_forward.py"),
         str(port), str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env) for i in range(2)]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
    assert "MULTIHOST_FORWARD_OK" in outs[0], outs[0][-3000:]


def test_two_process_distributed_oe():
    """The REAL distributed LM retrieval across two processes: normal
    equations psum-assembled across the process boundary each iteration,
    host-side float64 LM bookkeeping running identically (SPMD) on both —
    converges and pulls the biased start toward truth (round 4: made
    possible by argument-passing of staged mesh inputs + replicated
    outputs in parallel/oe.py)."""
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    procs = [subprocess.Popen(
        [sys.executable,
         os.path.join(repo, "tests", "multihost", "worker_oe.py"),
         str(port), str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env) for i in range(2)]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
    assert "MULTIHOST_OE_OK" in outs[0], outs[0][-3000:]
