"""Workarounds for quirks of the axon TPU backend (single v5e chip via tunnel).

Empirically established (2026-08, jax 0.9.0, platform 'axon'):

1. Device-to-host transfer of complex64 arrays is UNIMPLEMENTED. Keep complex
   values (FFT spectra, eigenvalue diagonals) strictly device-resident inside
   jitted graphs; only real arrays may cross the host boundary.
2. Executables involving FFT layouts whose *outputs* are 0-d (or sub-tile)
   scalars fail at D2H with UNIMPLEMENTED or hang — even a separate follow-up
   scalar-reduce executable on an FFT-produced array can hang. Broadcasting
   the scalar to a full (8, 128) float32 tile *inside the same jit* works
   reliably.
3. A failed transfer can poison subsequent dispatches in the process, and
   concurrent TPU processes through the tunnel cause transient failures —
   run one TPU process at a time and retry transients.

None of this affects CPU or standard Cloud TPU runtimes; the helpers below
are no-ops in spirit and cheap everywhere, so framework drivers use them
unconditionally.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

T = TypeVar("T")

# Minimum float32 TPU tile (sublane × lane); see /opt/skills/guides/pallas_guide.md.
_TILE = (8, 128)


def enable_compile_cache(path: str = "/tmp/jax_comp_cache") -> None:
    """Enable JAX's persistent compilation cache. The axon remote compiler
    has multi-minute latency variance on identical graphs; cache hits bring
    driver/bench startup from minutes to seconds. Safe to call repeatedly."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def tile_scalar(s: jax.Array) -> jax.Array:
    """Broadcast a 0-d scalar to a full (8,128) f32 tile — call INSIDE jit on
    any scalar that will be fetched to host from an FFT-touching graph."""
    return jnp.full(_TILE, s, dtype=jnp.float32)


def fetch_scalar(arr: jax.Array) -> float:
    """Host-side: read back a scalar produced by `tile_scalar` (or any array
    whose [0,0]/flat[0] element is the value)."""
    a = np.asarray(arr)
    return float(a.reshape(-1)[0])


def retry_transient(fn: Callable[[], T], tries: int = 4, backoff_s: float = 1.0) -> T:
    """Run `fn`, retrying on transient axon JaxRuntimeErrors (UNIMPLEMENTED /
    tunnel hiccups). Blocks until the result is ready so the failure surfaces
    inside the retry loop."""
    last: Exception | None = None
    for i in range(tries):
        try:
            return jax.block_until_ready(fn())
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            last = e
            if i < tries - 1:
                time.sleep(backoff_s * (i + 1))
    raise last  # type: ignore[misc]
