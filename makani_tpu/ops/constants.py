"""Device-constant cache for large transform tables.

Closing over a raw numpy array in a jitted function embeds it into the HLO as
a literal — for the SFNO's Legendre tables that is O(100MB) per transform and
breaks compilation (and bloats every recompile). A concrete jax.Array
closed over is instead threaded as a runtime parameter. This cache does the
device_put once per table (safe to call during tracing: device_put of host
data is an eager transfer, not a traced op, so no tracer can leak).
"""

import jax

_CACHE = {}


def device_constant(arr):
    """numpy array -> cached jax.Array on the default device.

    The cache entry keeps a reference to the host array: the key is id(arr),
    and a freed array's id can be reused by a new allocation."""
    key = id(arr)
    cached = _CACHE.get(key)
    if cached is None:
        # force an eager transfer even when called during tracing (a traced
        # device_put would return a tracer and leak through the cache)
        with jax.ensure_compile_time_eval():
            dev = jax.device_put(arr)
        cached = (arr, dev)
        _CACHE[key] = cached
    return cached[1]


def clear_cache():
    _CACHE.clear()
