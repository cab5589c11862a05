"""True multi-process jax.distributed test (2 procs x 4 virtual CPU devices).

The reference has no multi-node tests at all (SURVEY.md section 4); this
validates the multi-host path: distributed init, a global mesh spanning both
processes, a psum, and the frames->nodes all-to-all on a global array.
Skips gracefully when the sandbox forbids the coordinator socket.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc
    devs = jax.devices()
    assert len(devs) == 8  # 4 local x 2 processes
    from upsp_tpu.parallel.mesh import make_mesh, global_transpose
    mesh = make_mesh()

    # global frame-sharded array built from per-process shards
    F, N = 16, 12
    full = np.arange(F * N, dtype=np.float32).reshape(F, N)
    sharding = NamedSharding(mesh, P("frames"))
    arrs = []
    local = [d for d in devs if d.process_index == jax.process_index()]
    per_dev = F // len(devs)
    arr = jax.make_array_from_callback(
        (F, N), sharding, lambda idx: full[idx]
    )
    t = global_transpose(mesh, arr)

    # global reduction across both processes
    total = jnp.sum(arr)
    from jax.experimental import multihost_utils
    got = float(jax.device_get(multihost_utils.process_allgather(jnp.ones(1))).sum())
    assert got == nproc, got
    # NOTE: collectives must run on EVERY process — a pid-gated
    # process_allgather deadlocks the job (this very bug made this test
    # time out and masquerade as a sandbox limitation for a full round)
    if pid == 0:
        print("DIST_OK", float(total), t.shape)
    """
)


_DRIVER_WORKER = textwrap.dedent(
    """
    import os, sys, json
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    tmp = sys.argv[4]
    from upsp_tpu.parallel.launcher import initialize_distributed
    ppid, pcount = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert (ppid, pcount) == (pid, nproc)
    from upsp_tpu.parallel.mesh import make_mesh
    from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
    from upsp_tpu.pipeline.run import run_datapoint
    from upsp_tpu.pipeline.synthetic import make_plate_grid
    from upsp_tpu.io.plot3d import write_p3d_grid

    grid_path = os.path.join(tmp, "plate.grid")
    if pid == 0:
        write_p3d_grid(grid_path, make_plate_grid(13, 11))
        with open(os.path.join(tmp, "cam.json"), "w") as fh:
            json.dump({"uPSP_cameraMatrix": [[200.0,0,0],[0,200.0,0],[0,0,1]],
                       "distCoeffs": [[0,0,0,0,0]],
                       "rmat": [[1,0,0],[0,-1,0],[0,0,-1]],
                       "tvec": [-5.0,4.0,20.0]}, fh)
        with open(os.path.join(tmp, "ready"), "w") as fh:
            fh.write("1")
    else:
        import time
        while not os.path.exists(os.path.join(tmp, "ready")):
            time.sleep(0.05)

    cfg = ProcessingConfig(
        test_id="dist", run=1, sequence=1,
        cameras=[CameraInputs(number=1,
                              calibration=os.path.join(tmp, "cam.json"))],
        grid=grid_path, registration="none", target_patcher="none",
    )
    F, H, W = 16, 32, 48
    yy, xx = np.mgrid[0:H, 0:W]
    frames = np.stack([
        (2000 + 5.0*xx + 3.0*yy)[None] * (1 + 0.01*np.sin(2*np.pi*f/7))
        for f in range(F)
    ]).astype(np.float32)

    mesh = make_mesh()  # global mesh spanning both processes
    assert mesh.devices.size == 8
    out = run_datapoint(cfg, frames_array=frames, mesh=mesh,
                        write_outputs=False)
    from jax.experimental import multihost_utils
    total = multihost_utils.process_allgather(
        jnp.asarray(np.nansum(out.intensity))
    )
    assert np.allclose(total, total[0])
    if pid == 0:
        np.save(os.path.join(tmp, "intensity.npy"), out.intensity)
        print("DRIVER_OK", out.intensity.shape)
    """
)


def test_two_process_distributed(tmp_path):
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=90)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed coordinator timed out in sandbox")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0 and ("UNAVAILABLE" in err or "Permission" in err):
            pytest.skip(f"sandbox blocks distributed init: {err[-200:]}")
        assert rc == 0, err[-2000:]
    assert "DIST_OK" in outs[0][1]


def test_two_process_production_driver(tmp_path):
    """run_datapoint over a GLOBAL mesh spanning two processes (4 virtual
    devices each) matches the single-process oracle — the true multi-host
    driver path: shard_map phase 1, all-to-all into node-sharded phase 2,
    all across process boundaries."""
    import numpy as np

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    worker = tmp_path / "driver_worker.py"
    worker.write_text(_DRIVER_WORKER)
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=100)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed coordinator timed out in sandbox")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    assert "DRIVER_OK" in outs[0][1]

    # single-process oracle in a subprocess with the IDENTICAL environment
    # (the pytest process runs with x64 enabled, which perturbs phase-0
    # projection at the visibility margin — the workers run default f32)
    oracle_path = tmp_path / "oracle.npy"
    oracle_src = textwrap.dedent(
        f"""
        import sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.run import run_datapoint

        cfg = ProcessingConfig(
            test_id="dist", run=1, sequence=1,
            cameras=[CameraInputs(number=1,
                                  calibration=r"{tmp_path}/cam.json")],
            grid=r"{tmp_path}/plate.grid",
            registration="none", target_patcher="none",
        )
        F, H, W = 16, 32, 48
        yy, xx = np.mgrid[0:H, 0:W]
        frames = np.stack([
            (2000 + 5.0 * xx + 3.0 * yy)[None]
            * (1 + 0.01 * np.sin(2 * np.pi * f / 7))
            for f in range(F)
        ]).astype(np.float32)
        out = run_datapoint(cfg, frames_array=frames, write_outputs=False)
        np.save(r"{oracle_path}", out.intensity)
        """
    )
    oracle_py = tmp_path / "oracle.py"
    oracle_py.write_text(oracle_src)
    r = subprocess.run(
        [sys.executable, str(oracle_py)], env=env, capture_output=True,
        text=True, timeout=100,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    oracle = np.load(oracle_path)
    dist = np.load(tmp_path / "intensity.npy")
    np.testing.assert_allclose(dist, oracle, rtol=1e-6, atol=1e-4)
