"""Fixed per-scan-step cost on this backend: slope of a trivial carried
step at two scan lengths. Calibrates every scan-marginal measurement."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    for n in (1 << 12, 1 << 19, 1 << 22):
        xs = jnp.asarray(np.random.default_rng(0).standard_normal((48, n)).astype(np.float32))
        @jax.jit
        def run(c, xs):
            return lax.scan(lambda c, x: (c * 0.5 + x[..., :1], x * 2.0 + c), c, xs)
        def timed(k):
            c, ys = run(jnp.zeros((1,)), xs[:k]); jax.block_until_ready(ys)
            t0 = time.perf_counter()
            c, ys = run(jnp.zeros((1,)), xs[:k]); jax.block_until_ready(ys)
            return time.perf_counter() - t0
        t1 = min(timed(4), timed(4), timed(4)); t2 = min(timed(40), timed(40), timed(40))
        print(json.dumps({"n": n, "per_step_ms": round((t2 - t1) / 36 * 1e3, 4)}), flush=True)

if __name__ == "__main__":
    main()
