"""Multi-host execution test: two real OS processes, 4 virtual CPU devices
each, one jax.distributed job spanning both (SURVEY §4 / BASELINE config 5
evidence; first executable coverage of dist/mesh.py::init_multihost).

The sharded batch encode must produce the same bytes on every process, and
those bytes must equal the single-process encoder's output.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("nproc", [2, 4])
def test_multihost_matches_single(tmp_path, nproc):
    port = _free_port()
    outs = [tmp_path / f"out{i}.pkl" for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i), str(outs[i]),
             str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        results.append((p.returncode, out, err))
    for rc, out, err in results:
        assert rc == 0, f"worker failed:\n{err.decode()[-3000:]}"

    results_by_proc = [pickle.loads(o.read_bytes()) for o in outs]
    assert all(r == results_by_proc[0] for r in results_by_proc), \
        "processes disagree on output bytes"

    # Single-process ground truth (this process: 8 virtual CPU devices).
    # Covers BOTH restart modes: 'rows' (restart-segment sharding) and 0
    # (ppermute DC exchange + bit-level merge across process boundaries).
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nproc, 128, 32, 3), dtype=np.uint8)
    for restart in ("rows", 0):
        cfg = EncoderConfig(quality=75, subsampling="420",
                            restart_interval=restart)
        enc = Encoder(cfg)
        singles = [enc.encode(im) for im in imgs]
        assert results_by_proc[0][restart] == singles, restart


def test_multihost_pallas_tier_matches_single(tmp_path):
    """The Pallas kernel tier (interpret mode) across a REAL process
    boundary: device-stuff on and off must byte-match the single-process
    encoder (VERDICT r4 #6 — _jit_replicated_out /
    make_array_from_callback behave differently multi-process, and the
    cross-shard RST numbering + seg_start slicing of the device-stuff
    path never crossed a process before)."""
    nproc = 2
    port = _free_port()
    outs = [tmp_path / f"out{i}.pkl" for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i), str(outs[i]),
             str(nproc), "pallas"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(nproc)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost pallas worker timed out")
        results.append((p.returncode, out, err))
    for rc, out, err in results:
        assert rc == 0, f"worker failed:\n{err.decode()[-3000:]}"

    results_by_proc = [pickle.loads(o.read_bytes()) for o in outs]
    assert all(r == results_by_proc[0] for r in results_by_proc), \
        "processes disagree on output bytes"

    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nproc, 128, 32, 3), dtype=np.uint8)
    cfg = EncoderConfig(quality=75, subsampling="420",
                        restart_interval="rows")
    singles = [Encoder(cfg).encode(im) for im in imgs]
    for device_stuff in (True, False):
        assert results_by_proc[0][device_stuff] == singles, device_stuff
