"""Checkpoint / resume of (state, time, iteration) — a capability the
reference lacks entirely (SURVEY.md §5: "no resume"). NPZ-based with atomic
rename; orbax is available in the environment but NPZ keeps restart files
human-inspectable and dependency-free for these flat-array states."""

from __future__ import annotations

import os
import tempfile

import numpy as np


def save_checkpoint(path: str, state, t: float, it: int, extra: dict | None = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"state": np.asarray(state), "t": np.float64(t), "it": np.int64(it)}
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str):
    with np.load(path) as z:
        state = z["state"]
        t = float(z["t"])
        it = int(z["it"])
        extra = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
    return state, t, it, extra
