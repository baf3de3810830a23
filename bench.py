"""Benchmark: batched RegisterIdentity witness generation on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's witness generator is single-core circom wasm for
which no published numbers exist (BASELINE.md); the wasm toolchain is not
installed in this image, so the baseline is the documented estimate in
BASELINE.md (0.2 witnesses/sec/core for the ~1.5M-constraint flagship
config). vs_baseline = our witnesses/sec/chip divided by that estimate.

Methodology (round 3, "inputs": "chained_device_resident"): every timed
step's inputs DEPEND on the previous step's outputs (sk_identity is
perturbed with a value derived from the previous pk_identity_hash), so the
steps must serialize and every step must really execute. This matters:
round 1/2 timed repeated calls on *identical* device buffers, and the
execution environment turns out to elide repeated executions with identical
inputs (round 3 measured 0.06 ms/step for identical-input repeats vs
~476 ms/step for chained steps of the same jitted program — a ~8000x
inflation). The r1 (~611k w/s) and r2 (~7.7M w/s) recorded numbers measured
dispatch/caching, not compute, and are superseded; see BASELINE.md.

Every witness op is branchless/constant-time in its values, so perturbing
sk_identity does not change the work per step; the passport blobs are
untouched, so the flow/signature/SMT verdicts stay true and are
sanity-checked after timing.
"""

import json
import os
import sys
import time

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# This jax build ignores the JAX_COMPILATION_CACHE_DIR env var (config
# stays None); only the explicit config update enables the persistent
# cache — without it every bench run pays the full ~12 min of XLA+Mosaic
# compiles instead of ~1 min warm.
jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

WASM_BASELINE_WPS = 0.2  # documented estimate, see BASELINE.md


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    from __graft_entry__ import _flagship_inputs, _FLAGSHIP
    from passport_zk_circuits_tpu.models import register_identity as ri

    # BENCH_CONFIG selects any registerIdentity_* specialization (e.g. the
    # ECDSA p256 config for the non-RSA on-chip numbers); default flagship.
    config = os.environ.get("BENCH_CONFIG", _FLAGSHIP)
    p, inputs = _flagship_inputs(batch=batch, config=config)
    inputs = jax.device_put(inputs)

    def step(inp):
        out = ri.forward(p, inp)
        # derive the next sk_identity from this step's outputs: forces true
        # sequential execution of every step. Mask keeps limbs 16-bit and
        # the top limb 10-bit, so sk stays a valid (< 2^250) field element.
        mix = out["passport_hash"] ^ out["pk_identity_hash"]
        sk = (inp.sk_identity ^ mix).at[-1].set(
            (inp.sk_identity[-1] ^ mix[-1]) & jnp.uint32(0x3FF))
        return inp._replace(sk_identity=sk), out

    stepj = jax.jit(step)
    x, out = stepj(inputs)
    _ = jax.device_get(out["flow_ok"])  # compile + first run, forced

    t0 = time.time()
    for _ in range(iters):
        x, out = stepj(x)
    # Force the whole chain INSIDE the timed region with a device_get of a
    # value that depends on the final step. block_until_ready is not a
    # reliable fence in this environment (it returned after ~0.1 ms for
    # chains that provably take ~0.5 s/step); fetching concrete bytes is.
    ok = jax.device_get(out["flow_ok"] & out["sig_ok"] & out["smt_ok"])
    chain_guard = jax.device_get(x.sk_identity[0, 0])
    dt = (time.time() - t0) / iters

    assert bool(ok.all()), "witness verdicts must stay valid during bench"
    del chain_guard

    wps = batch / dt
    n_chips = max(1, len(jax.devices()))
    wps_chip = wps / n_chips
    print(json.dumps({
        "metric": "register_identity_witnesses_per_sec_per_chip",
        "value": round(wps_chip, 3),
        "unit": "witnesses/s/chip",
        "vs_baseline": round(wps_chip / WASM_BASELINE_WPS, 2),
        "baseline_estimated": True,  # 0.2 w/s wasm figure is a documented
        # estimate (BASELINE.md); circom/snarkjs/node are not installed in
        # this image, so the denominator has never been measured here
        "inputs": "chained_device_resident",
        "batch": batch,
        "config": config,
    }))


if __name__ == "__main__":
    sys.exit(main())
