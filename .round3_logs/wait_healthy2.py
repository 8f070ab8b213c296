"""Block until the VM + tunnel are in a healthy measurement window.

Healthy = host numpy >= HOST_MIN MB/s AND tunnel link >= LINK_MIN MB/s,
both read from a probe subprocess run under a hard `timeout` (the tunnel
can hang `jax.devices()` forever — a 90 s+ throttle or full outage;
CLAUDE.md timing gotchas). Exits 0 when healthy, 1 only if MAX_HOURS
elapse without one healthy window.
"""
import json
import subprocess
import sys
import time

HOST_MIN = 150.0   # healthy host numpy is ~400 MB/s; throttled is 4-44
# 2026-08-18: the tunnel entered a NEW plateau — link bouncing 5-41 MB/s
# for hours while dispatch stayed a normal ~28 ms and device compute was
# fine. The queued measurements are slope-method (dispatch-latency-
# cancelling) device compute plus host-side streaming folds that ship
# ~1 MB total; NONE times a bulk transfer. Gate on dispatch latency and
# host health only — a link criterion would block valid measurements
# indefinitely (the single-64MB-transfer link probe is also noisy under
# any concurrent tunnel use).
LINK_MIN = 0.0   # recorded for diagnosis, not gated on
DISPATCH_MAX_MS = 150.0  # healthy warm roundtrip ~28 ms; hang state = inf
PROBE_TIMEOUT = 240  # covers the ~40 s first-dispatch load with margin
# Post-VM-restart the remote compile/load path is COLD: the probe's own
# first dispatch can cost 300-900+ s, so a 240 s kill leaves the tunnel
# forever unwarmed and the gate spins (observed 3x in session h, again
# session i — only an untimed manual probe un-wedged it). Escalate every
# third consecutive device-hang attempt to a long warm probe.
PROBE_TIMEOUT_WARM = 1200
SLEEP = 180
MAX_HOURS = 10

here = "/root/repo/.round3_logs"
t_start = time.time()
attempt = 0
hangs = 0  # consecutive attempts with no device roundtrip
while time.time() - t_start < MAX_HOURS * 3600:
    attempt += 1
    budget = PROBE_TIMEOUT_WARM if (hangs and hangs % 3 == 0) else PROBE_TIMEOUT
    try:
        out = subprocess.run(
            ["timeout", str(budget), sys.executable,
             f"{here}/probe_once.py"],
            capture_output=True, text=True, cwd="/root/repo")
        # Scan BACKWARDS for the last JSON line: probe_once prints an
        # interim host-only line before the device probe, and any trailing
        # non-JSON stdout (library warnings) must not zero the reading
        # (ADVICE r4).
        line = next((ln for ln in reversed(out.stdout.strip().splitlines())
                     if ln.startswith("{")), "")
        res = json.loads(line) if line else {}
    except Exception as e:  # noqa: BLE001 — watchdog must never die
        res = {"error": repr(e)}
    host = res.get("host_MBps", 0.0)
    link = res.get("link_MBps", 0.0)
    disp = res.get("dispatch_ms", float("inf"))
    hangs = hangs + 1 if disp == float("inf") else 0
    healthy = (host >= HOST_MIN and link >= LINK_MIN
               and disp <= DISPATCH_MAX_MS)
    print(f"[wait_healthy] attempt {attempt} (budget {budget}s): "
          f"host={host} MB/s link={link} MB/s dispatch={disp} ms -> "
          f"{'HEALTHY' if healthy else 'throttled'}",
          flush=True)
    if healthy:
        sys.exit(0)
    time.sleep(SLEEP)
print("[wait_healthy] gave up after MAX_HOURS", flush=True)
sys.exit(1)
