"""One health probe: host-numpy MB/s + tunnel link MB/s. Prints one JSON
line. Run under `timeout` — the tunnel can hang outright (jax.devices()
blocks forever; CLAUDE.md timing gotchas), so the caller must enforce a
hard wall-clock bound around this whole process."""
import json
import time

import numpy as np

res = {"ts": time.time()}

x = np.random.rand(25_000_000).astype("float32")  # 100 MB, incompressible
t0 = time.time()
float(x.sum())
res["host_MBps"] = round(100 / (time.time() - t0), 1)
# Interim line: if the device path below hangs and the caller's timeout
# kills us, the last JSON line still carries the host reading (the gate
# takes the last {-prefixed line; missing keys default to hang values).
print(json.dumps(res), flush=True)

import jax  # noqa: E402

d = jax.devices()[0]
# Warm: first dispatch in a fresh process pays the ~23-40 s remote
# executable load; measure on the second.
small = np.random.rand(256, 256).astype("float32")
y = jax.device_put(small, d)
float(jax.numpy.sum(y))
big = np.random.rand(4096, 4096).astype("float32")  # 64 MB incompressible
t0 = time.time()
yb = jax.device_put(big, d)
float(jax.numpy.sum(yb))
res["link_MBps"] = round(64 / (time.time() - t0), 1)

# Warm dispatch roundtrip: the quantity the slope-method benchmarks
# actually depend on. 2026-08-18 showed a NEW tunnel state — link
# plateaued at 30-40 MB/s for hours while dispatch stayed a normal
# ~28 ms and device compute ran fine; bulk bandwidth alone must not
# block device-compute measurements.
f = jax.jit(lambda v: v + 1)
zs = jax.device_put(np.float32(1.0), d)
float(f(zs))  # second warm (first-run remote load already paid above)
t0 = time.time()
for _ in range(3):
    float(f(zs))
res["dispatch_ms"] = round((time.time() - t0) / 3 * 1e3, 1)

print(json.dumps(res), flush=True)
