"""Validate + microbenchmark the Pallas ISLA kernel on the real TPU.

Run: python scripts/check_pallas_tpu.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layout2img_tpu.ops.pallas.isla import _xla_reference, isla_modulate


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    for b, o, h, w, c, dtype in [
        (16, 8, 128, 128, 64, jnp.float32),
        (16, 8, 64, 64, 128, jnp.bfloat16),
        (16, 8, 8, 8, 1024, jnp.bfloat16),
    ]:
        xn = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
        mask = jnp.asarray(rng.random((b, o, h, w)), dtype)
        gamma = jnp.asarray(rng.standard_normal((b, o, c)), dtype)
        beta = jnp.asarray(rng.standard_normal((b, o, c)), dtype)

        fused = jax.jit(isla_modulate)
        ref = jax.jit(_xla_reference)
        got = np.asarray(fused(xn, mask, gamma, beta), np.float32)
        want = np.asarray(ref(xn, mask, gamma, beta), np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        print(f"shape b{b} o{o} {h}x{w}x{c} {dtype.__name__}: rel err {err:.2e}")
        assert err < (2e-2 if dtype == jnp.bfloat16 else 1e-5), err

        # microbench via scan (amortize dispatch). The carry feeds the input
        # so XLA cannot hoist the loop-invariant op out of the scan; the seed
        # arg keeps the timed call distinct from the warmup call (the axon
        # service memoizes identical executable+args calls); a VALUE readback
        # replaces block_until_ready (which can return before remote
        # execution completes).
        def many(f):
            def run(args, seed, n=50):
                xn_, mask_, gamma_, beta_ = args

                def body(carry, _):
                    out = f(xn_ + carry, mask_, gamma_, beta_)
                    s = out[0, 0, 0, 0]
                    return s.astype(xn_.dtype) * 1e-6, s

                return jax.lax.scan(body, seed.astype(xn_.dtype), None, length=n)[1]

            return jax.jit(run)

        for name, f in (("pallas", fused), ("xla", ref)):
            jf = many(f)  # ONE jit wrapper — a fresh many(f) per call would
            # put the recompile inside the timed region
            r = jf((xn, mask, gamma, beta), jnp.float32(0))
            _ = float(r[-1])
            t0 = time.perf_counter()
            r = jf((xn, mask, gamma, beta), jnp.float32(1))
            _ = float(r[-1])
            dt = (time.perf_counter() - t0) / 50
            print(f"  {name}: {dt * 1e6:8.1f} us/call")


if __name__ == "__main__":
    main()
