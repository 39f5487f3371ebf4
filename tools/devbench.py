"""Device-side microbench helper for the axon tunnel (block_until_ready
returns early there; host timing carries ~30 ms of RPC latency).

dev_ms(fn, *args): per-iteration device time of fn by differencing a
51-iteration and a 1-iteration fori_loop around it (input perturbed by the
loop index so XLA cannot hoist the body; output reduced to a scalar carry)."""
import time
import jax
import jax.numpy as jnp


def _loop(fn, n, args):
    def body(i, carry):
        out = fn(*jax.tree.map(
            lambda a: (a + i * 1e-12).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, args))
        leaves = jax.tree.leaves(out)
        return carry + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


def dev_ms(fn, *args, n: int = 50, reps: int = 3, label: str | None = None):
    f1 = jax.jit(lambda *a: _loop(fn, 1, a))
    fn1 = jax.jit(lambda *a: _loop(fn, n + 1, a))
    float(f1(*args)); float(fn1(*args))          # compile both
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(*args))
        t1 = time.perf_counter(); float(fn1(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / n * 1000)
    if label:
        print(f"{label:32s} {best:8.3f} ms")
    return best
