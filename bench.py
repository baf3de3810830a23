"""Benchmark: batched RegisterIdentity witness generation on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's witness generator is single-core circom wasm for
which no published numbers exist (BASELINE.md); the wasm toolchain is not
installed in this image, so the baseline is the documented estimate in
BASELINE.md (0.2 witnesses/sec/core for the ~1.5M-constraint flagship
config). vs_baseline = our witnesses/sec/chip divided by that estimate.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax  # noqa: E402

WASM_BASELINE_WPS = 0.2  # documented estimate, see BASELINE.md


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))

    from __graft_entry__ import _flagship_inputs
    from passport_zk_circuits_tpu.models import register_identity as ri

    p, inputs = _flagship_inputs(batch=batch)
    # Steady-state throughput: inputs live on device (production streams
    # batches ahead of compute; re-uploading the same 7.7 MB of host numpy
    # through the tunnel every call measures the link, not the chip).
    inputs = jax.device_put(inputs)
    fwd = jax.jit(lambda i: ri.forward(p, i))

    out = fwd(inputs)
    jax.block_until_ready(out)          # compile + first run

    t0 = time.time()
    for _ in range(iters):
        out = fwd(inputs)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    wps = batch / dt
    n_chips = max(1, len(jax.devices()))
    wps_chip = wps / n_chips
    print(json.dumps({
        "metric": "register_identity_witnesses_per_sec_per_chip",
        "value": round(wps_chip, 3),
        "unit": "witnesses/s/chip",
        "vs_baseline": round(wps_chip / WASM_BASELINE_WPS, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
