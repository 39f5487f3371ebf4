"""jit wrapper that hoists embedded array constants into runtime arguments.

On this TPU stack (remote chip behind the axon tunnel), ANY array-shaped
constant embedded in a compiled program is served from HOST memory: every op
that touches one stalls ~25 ms (one tunnel round trip — measured identically
for a (3,) vector, a (128,2) table, and a (1080,1920) image), and the first
such touch flips the runtime into a degraded synchronous dispatch mode for
the remainder of the session (~40 ms floor per dispatch; plain 2M-row
gathers go 0.06 ms -> 12-15 ms inside the same program). Scalar literals,
`lax.iota`, and runtime ARGUMENTS are unaffected.

The robust fix is structural: never let jit embed an array constant. This
wrapper traces the function to a jaxpr, pulls out every captured concrete
array (`ClosedJaxpr.consts`), and re-enters jit with those constants passed
as ordinary device arguments. Measured effect on the known-pathological
programs: sky_radiance 96x128 went 25 ms + session wedge -> 0.14 ms clean;
the full 1080p hybrid frame's gathers stop running in the degraded mode.

Use `jit_hoisted` anywhere `jax.jit` would be used for a program that runs
on the TPU. (CPU execution is unaffected by the pathology, but the wrapper
is harmless there.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _eval_jaxpr(jaxpr, consts, *args):
    # jax.core.eval_jaxpr's stable home moved across jax versions
    try:
        from jax.extend.core import jaxpr_as_fun  # jax >= 0.4.x extend API
        del jaxpr_as_fun
    except Exception:
        pass
    return jax.core.eval_jaxpr(jaxpr, consts, *args)


def jit_hoisted(f):
    """jax.jit(f) with every captured array constant hoisted to a runtime
    argument. Retraces per input-structure/shape/dtype combination, like jit.
    """
    cache: dict = {}

    def call(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        key = (in_tree,
               tuple((jnp.shape(x), str(jnp.result_type(x))) for x in flat))
        entry = cache.get(key)
        if entry is None:
            cj, out_shape = jax.make_jaxpr(f, return_shape=True)(*args)
            consts = [jnp.asarray(c) for c in cj.consts]
            out_tree = jax.tree_util.tree_structure(out_shape)
            jaxpr = cj.jaxpr

            def g(consts_, flat_args):
                out_flat = _eval_jaxpr(jaxpr, consts_, *flat_args)
                return jax.tree_util.tree_unflatten(out_tree, out_flat)

            entry = (jax.jit(g), consts)
            cache[key] = entry
        jg, consts = entry
        return jg(consts, flat)

    call._hoist_cache = cache  # introspection/testing
    return call
