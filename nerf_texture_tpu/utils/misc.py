"""Misc utilities: seeding, metrics logging, profiling hooks.

Reference parity: ``seed_everything`` (nerf/utils.py:241-248), the
append-mode ``log_*.txt`` + scalar logging (nerf/utils.py:487-497,
939-940), and the CUDA-event frame timing replaced by ``jax.profiler``
traces (SURVEY.md 5.1/5.5).
"""

from __future__ import annotations

import contextlib
import json
import os
import random
import time


def dput(x, dtype=None):
    """Host->device upload with the cast done in numpy.

    ``jnp.asarray(np_f64, jnp.float32)`` compiles a one-off
    convert_element_type program per (shape, dtype) -- a remote-compiler
    round trip each on a cold TPU start.  Casting host-side first makes
    the upload a pure device_put."""
    import jax.numpy as jnp
    import numpy as np

    return jnp.asarray(np.asarray(x, dtype))


def seed_everything(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import numpy as np

    np.random.seed(seed)


class MetricsLogger:
    """Append-mode jsonl scalar log + plain-text mirror."""

    def __init__(self, workspace: str, name: str = "train"):
        os.makedirs(workspace, exist_ok=True)
        self.jsonl = os.path.join(workspace, f"log_{name}.jsonl")
        self.txt = os.path.join(workspace, f"log_{name}.txt")

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in scalars.items()}}
        with open(self.jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        with open(self.txt, "a") as f:
            f.write(f"[{rec['step']}] " + " ".join(
                f"{k}={v:.6g}" for k, v in scalars.items()) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (TPU equivalent of the reference's CUDA
    event timing, nerf/gui.py:95-107)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def machine_scoped_cache_dir(base: str) -> str:
    """Persistent-compilation-cache dir scoped to THIS machine's CPU.

    XLA:CPU cache entries are AOT machine code; loading one compiled on
    a host with different CPU features segfaults inside
    ``compilation_cache.get_executable_and_time`` (observed when the
    repo's cache directory moved between machines with different
    avx512/amx feature sets).  Keying the directory by a fingerprint of
    the CPU flags makes a foreign host start a fresh cache instead of
    loading incompatible code.  TPU caches don't need this (their
    payload is device code)."""
    import hashlib
    import platform

    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        flags = platform.processor()
    tag = hashlib.sha1(
        (platform.machine() + flags).encode()).hexdigest()[:10]
    return f"{base}_{tag}"
