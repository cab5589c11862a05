"""Probe the TPU tunnel with escalating device_put sizes (CLAUDE.md wedge-recovery recipe)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

devs = jax.devices()
print("devices:", devs, flush=True)
for mb in (1, 8, 64, 256):
    a = np.random.default_rng(0).standard_normal(mb * 131072).astype(np.float32)  # mb MB
    t0 = time.perf_counter()
    d = jax.device_put(a, devs[0])
    d.block_until_ready()
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = np.asarray(d)
    dn = time.perf_counter() - t0
    print(f"{mb:4d} MB  up {mb/up:7.1f} MB/s  down {mb/dn:7.1f} MB/s", flush=True)
print("TUNNEL_OK", flush=True)
