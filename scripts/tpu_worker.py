"""Persistent TPU job worker.

The axon tunnel claims a TPU grant per Python process and claims can
block for many minutes, so iterate by keeping ONE process alive: this
worker claims the chip once, then executes job files dropped into
/tmp/tpu_jobs/*.py (in-process exec, stdout captured to <job>.out).

Run inside tmux:  python scripts/tpu_worker.py
Submit a job:     cp myjob.py /tmp/tpu_jobs/
Read the result:  cat /tmp/tpu_jobs/myjob.py.out
"""

import contextlib
import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("worker ready:", jax.devices(), flush=True)

_hb = jax.jit(lambda x: x + 1.0)
_hb_val = jnp.float32(0)
_last_hb = 0.0

while True:
    # Heartbeat: touch the device every ~20s so the tunnel grant stays
    # warm while idle (idle sessions have been observed to wedge).
    if time.time() - _last_hb > 20:
        try:
            _hb_val = _hb(_hb_val)
            float(_hb_val)
        except Exception as e:  # pragma: no cover
            # Device session is wedged/crashed: exit so the launcher's
            # restart loop claims a fresh grant.
            print(f"heartbeat failed, exiting: {e}", flush=True)
            sys.exit(17)
        _last_hb = time.time()
    for name in sorted(os.listdir(JOBS)):
        if not name.endswith(".py"):
            continue
        path = os.path.join(JOBS, name)
        try:
            src = open(path).read()
        except OSError:
            continue
        os.rename(path, path + ".running")
        print(f"=== running {name}", flush=True)
        # Jobs share this interpreter: drop cached project modules so
        # edits made between jobs take effect.
        for mod in [m for m in list(sys.modules)
                    if m.startswith("opencl_path_tracer_tpu")]:
            del sys.modules[mod]
        class Tee(io.StringIO):
            def write(self, s2):
                sys.stderr.write(s2)
                sys.stderr.flush()
                return super().write(s2)
        buf = Tee()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(src, name, "exec"), {"__name__": "__job__"})
            status = "ok"
        except Exception:
            buf.write(traceback.format_exc())
            status = "err"
        dt = time.time() - t0
        with open(path + ".out", "w") as fh:
            fh.write(f"{status} {dt:.1f}s\n{buf.getvalue()}")
        os.remove(path + ".running")
        print(f"=== {name}: {status} in {dt:.1f}s", flush=True)
    time.sleep(2)
