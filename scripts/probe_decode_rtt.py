"""Decode end-to-end latency forensics (round-4 VERDICT #7).

BENCH_r03 showed p50 single-mesh decode = 27 ms end-to-end while the
device+dispatch cost is <1 ms, and the int16 transfer (half the bytes)
saved only ~0.4 ms — so the gap is NOT bandwidth. This probe separates
the per-call components on the tunneled backend:

  1. fresh tiny fetch: device_get of a freshly-computed 4-byte scalar
     (varying input so no host-side result caching) — the pure
     dispatch+sync round trip.
  2. fresh payload fetch: same but a (1, V, 3)-sized fp32 buffer — adds
     the payload bytes.
  3. pipelined window: N chained decodes, one sync — the device floor.

If (1) ~= (2) ~= the bench p50, the latency is the tunnel's per-call
round trip, not the decode path; batching (app /api/decode batched) is
the lever, not payload shrinking.

Usage: python scripts/probe_decode_rtt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def med_ms(samples):
    return float(np.median(samples) * 1e3)


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    @jax.jit
    def tiny(i):
        return jnp.sum(jnp.arange(8.0)) + i

    @jax.jit
    def payload(i):
        # ~123 KB fp32: the s=5 decode output (10242 verts x 3)
        return jnp.zeros((1, 10242, 3), jnp.float32) + i

    jax.device_get(tiny(0.0)); jax.device_get(payload(0.0))

    lat = []
    for i in range(60):
        t0 = time.perf_counter()
        jax.device_get(tiny(float(i + 1)))
        lat.append(time.perf_counter() - t0)
    t_tiny = med_ms(lat)

    lat = []
    for i in range(60):
        t0 = time.perf_counter()
        jax.device_get(payload(float(i + 1)))
        lat.append(time.perf_counter() - t0)
    t_payload = med_ms(lat)

    # pipelined: 100 chained tiny calls, one sync
    t0 = time.perf_counter()
    for i in range(100):
        o = tiny(float(i))
    jax.device_get(o)
    t_pipe = (time.perf_counter() - t0) / 100 * 1e3

    # one repeated get of the SAME buffer (host cache, the old bogus "RTT")
    buf = tiny(0.0)
    jax.device_get(buf)
    lat = []
    for _ in range(60):
        t0 = time.perf_counter()
        jax.device_get(buf)
        lat.append(time.perf_counter() - t0)
    t_cached = med_ms(lat)

    out = {
        "fresh_tiny_get_ms": round(t_tiny, 3),
        "fresh_123KB_get_ms": round(t_payload, 3),
        "payload_delta_ms": round(t_payload - t_tiny, 3),
        "pipelined_dispatch_ms": round(t_pipe, 3),
        "cached_get_ms": round(t_cached, 3),
    }
    import json

    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts", "decode_rtt.json"),
            "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
