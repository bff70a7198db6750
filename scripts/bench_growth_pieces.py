"""Time isolated growth-loop pieces at representative shapes, batch 32."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from octa_tpu.sim import greenhouse as gh

B, SC, NC, CH = 32, 8192, 4096, 1024
key = jax.random.PRNGKey(0)
sinks = jax.random.uniform(key, (B, SC, 3))
nodes = jax.random.uniform(key, (B, NC, 3))
valid = jnp.ones((B, NC), bool)
alive = jnp.ones((B, SC), bool)
seg_idx = jax.random.randint(key, (B, SC), 0, NC)
vals = jax.random.uniform(key, (B, SC, 18))
cand = jax.random.uniform(key, (B, 2048, 3))
cvalid = jnp.ones((B, 2048), bool)


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    r = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:45s} {dt:8.2f} ms")
    return dt


# 1. chunked nearest (vmapped, as in the growth loop)
def nearest(s, n, v):
    return jax.vmap(lambda a, b, c: gh._chunked_nearest(a, b, c, chunk=CH))(
        s, n, v)[0]

timeit("chunked_nearest SCxNC", nearest, sinks, nodes, valid)


# 2. segsum via scatter-add (current _grow pattern)
def segsum_scatter(si, va):
    def one(seg, x):
        return jnp.zeros((NC + 1, 18), jnp.float32).at[seg].add(x)[:NC]
    return jax.vmap(one)(si, va)

timeit("segsum scatter-add [SC]->[NC]x18", segsum_scatter, seg_idx, vals)


# 3. segsum via one-hot matmul (chunked)
def segsum_matmul(si, va):
    def one(seg, x):
        out = jnp.zeros((NC, 18), jnp.float32)
        segc = seg.reshape(8, -1)
        xc = x.reshape(8, -1, 18)
        def body(acc, inp):
            s, v = inp
            oh = jax.nn.one_hot(s, NC, dtype=jnp.float32)
            return acc + oh.T @ v, None
        out, _ = jax.lax.scan(body, out, (segc, xc))
        return out
    return jax.vmap(one)(si, va)

timeit("segsum one-hot matmul", segsum_matmul, seg_idx, vals)


# 4. blocked greedy spacing
def greedy(c, v):
    return jax.vmap(lambda a, b: gh._blocked_greedy_spacing(a, b, 0.01))(c, v)

timeit("blocked_greedy 64 blocks", greedy, cand, cvalid)


# 5. power iteration 3x3
M = jax.random.uniform(key, (B, NC, 3, 3))
M = M + jnp.swapaxes(M, -1, -2)

def powit(m):
    return jax.vmap(gh._power_iteration_3x3)(m)

timeit("power_iteration_3x3 (24 fori)", powit, M)


# 6. murray sweeps: 8 fori of scatter-add
parent = jax.random.randint(key, (B, NC), 0, NC)
radius = jax.random.uniform(key, (B, NC))

def murray(par, rad):
    def one(p, r):
        def body(i, rr):
            s = jnp.zeros((NC + 1,), jnp.float32).at[p].add(rr**3)[:NC]
            return jnp.where(s > 0, s ** (1 / 3), rr)
        return jax.lax.fori_loop(0, 8, body, r)
    return jax.vmap(one)(par, rad)

timeit("murray 8 scatter sweeps", murray, parent, radius)


# 7. append_sinks (compacted compare_all inversion + small scatter)
acc = jax.random.bernoulli(key, 0.1, (B, SC))

def append(a):
    def one(aa):
        s = gh.SinkState(jnp.zeros((SC, 3)), jnp.zeros((SC,), bool))
        return gh._append_sinks(s, jnp.zeros((SC, 3)), aa)[0].alive
    return jax.vmap(one)(a)

timeit("append_sinks (compacted)", append, acc)
